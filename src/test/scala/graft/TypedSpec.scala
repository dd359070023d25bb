package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed Dataset pipeline == untyped DataFrame pipeline") {
    val typed = Types.docs(spark, TestSpark.Sf)
      .filter(_.lang == "en")
      .groupByKey(_.source)
      .mapGroups((src, docs) => {
        val ds = docs.toSeq
        (src, ds.size.toLong, ds.map(_.n_chars).sum)
      })
      .collect().toSet
    val untyped = Tables.table(spark, TestSpark.Sf, "documents")
      .filter($"lang" === "en")
      .groupBy($"source")
      .agg(count(lit(1)), sum($"n_chars"))
      .as[(String, Long, Long)].collect().toSet
    assert(typed == untyped)
    assert(typed.nonEmpty)
  }

  test("typed join with compile-time field access") {
    val joined = Types.orders(spark, TestSpark.Sf)
      .joinWith(Types.customers(spark, TestSpark.Sf),
        $"o_custkey" === $"c_custkey")
      .map { case (o, c) => (c.c_mktsegment, math.round(o.o_totalprice)) }
      .groupByKey(_._1)
      .mapGroups((seg, it) => (seg, it.map(_._2).sum))
      .collect().toMap
    val check = Tables.table(spark, TestSpark.Sf, "orders")
      .join(Tables.table(spark, TestSpark.Sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum(round($"o_totalprice", 0).cast("long")))
      .as[(String, Long)].collect().toMap
    assert(joined.keySet == check.keySet)
    assert(joined.nonEmpty)
  }
}
