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

  test("aqeSkewJoin: AQE splits the hot partition at runtime (skew=true in final plan)") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of left rows hit key 0 → one shuffle partition dwarfs the rest
      val left = spark.range(200000)
        .select(when($"id" % 20 =!= 0, lit(0L)).otherwise($"id").as("k"), $"id".as("v"))
      val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("w"))
      val j = SkewOps.aqeSkewJoin(left, right, Seq("k"))
      val n = j.count()
      // row set identical to the plain join: key 0 (hot: the 190000
      // non-multiples of 20, plus id=0 itself) and the right-side keys
      // 1..99 that are ≡ 0 (mod 20)
      val expected = 190001L + (1 to 99).count(_ % 20 == 0)
      assert(n == expected, s"row count $n != $expected")
      val materialized = SkewOps.aqeSkewJoin(left, right, Seq("k"))
      materialized.collect()
      val p = materialized.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"expected an AQE skew split in:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected SMJ (the hinted strategy) in:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
