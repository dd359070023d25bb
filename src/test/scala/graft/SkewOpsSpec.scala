package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewOps
import graft.ops.SkewOps.AggSpec

class SkewOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg == direct agg for every salt factor (long/count/min/max)") {
    val li = Tables.table(spark, TestSpark.Sf, "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), min($"l_partkey").as("mn"), max($"l_partkey").as("mx"),
        sum($"l_orderkey").as("s"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    for (salt <- Seq(1, 4, 64)) {
      val salted = SkewOps.saltedAgg(li, Seq("l_returnflag"),
        Seq(AggSpec("count", "", "cnt"), AggSpec("min", "l_partkey", "mn"),
          AggSpec("max", "l_partkey", "mx"), AggSpec("sum", "l_orderkey", "s")),
        salt = salt)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(salted == direct, s"salt=$salt")
    }
  }

  test("saltedAgg rejects non-algebraic aggregates") {
    val li = Tables.table(spark, TestSpark.Sf, "lineitem")
    intercept[IllegalArgumentException] {
      SkewOps.saltedAgg(li, Seq("l_returnflag"), Seq(AggSpec("avg", "l_quantity", "a")))
        .collect()
    }
  }

  test("saltedJoin == plain inner join (row multiset) for every salt factor") {
    val li = Tables.table(spark, TestSpark.Sf, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
    val o = Tables.table(spark, TestSpark.Sf, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select($"l_orderkey", $"o_orderpriority")
    val plain = li.join(o, "l_orderkey")
      .as[(Long, Double, String)].collect().sorted.toSeq
    for (salt <- Seq(1, 3, 16)) {
      val salted = SkewOps.saltedJoin(li, o, Seq("l_orderkey"), salt)
        .as[(Long, Double, String)].collect().sorted.toSeq
      assert(salted == plain, s"salt=$salt")
    }
    assert(plain.nonEmpty)
  }

  test("approx_count_distinct within declared rsd of exact") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, TestSpark.Sf)
      .as[(String, Long)].collect().toMap
    val exact = SparkEntry.queries("q_distinct_parts")(spark, TestSpark.Sf)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (flag, a) =>
      assert(math.abs(a - exact(flag)).toDouble / exact(flag) < 0.1,
        s"$flag: approx $a vs exact ${exact(flag)}")
    }
  }
}
