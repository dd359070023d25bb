package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IdOps

class IdOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sequentialIdsAtScale == sequentialIds (window) — same bijection 1..N") {
    val customer = Tables.table(spark, TestSpark.Sf, "customer")
    val order = Seq("c_name", "c_custkey")
    val a = IdOps.sequentialIds(customer, order, "id")
      .select($"c_custkey", $"id").as[(Long, Long)].collect().toMap
    val b = IdOps.sequentialIdsAtScale(customer, order, "id")
      .select($"c_custkey", $"id").as[(Long, Long)].collect().toMap
    assert(a == b)
    val ids = a.values.toSeq.sorted
    assert(ids == (1L to a.size.toLong))
  }

  test("sampleK: deterministic for a seed, k rows, dense 0..k-1 index") {
    val customer = Tables.table(spark, TestSpark.Sf, "customer")
    val s1 = IdOps.sampleK(customer, 10, 42L).select($"idx", $"c_custkey")
      .as[(Int, Long)].collect().sorted.toSeq
    val s2 = IdOps.sampleK(customer, 10, 42L).select($"idx", $"c_custkey")
      .as[(Int, Long)].collect().sorted.toSeq
    assert(s1 == s2)
    assert(s1.map(_._1) == (0 until 10))
    assert(s1.map(_._2).distinct.size == 10)
  }
}
