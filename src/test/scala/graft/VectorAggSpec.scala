package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorAgg

class VectorAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sum_vectors == exploded groupBy sum on map-shaped K-Means vectors") {
    // array vectors → sparse maps keyed by dim index, grouped by label
    val emb = Tables.table(spark, TestSpark.Sf, "embeddings")
      .select($"label", graft.ops.KMeansOps.asDouble($"embedding").as("v"))
      .select($"label",
        map_from_arrays(
          transform(sequence(lit(0), size($"v") - 1), i => concat(lit("d"), i)),
          $"v").as("m"))
      .persist()
    val viaAggregator = emb.groupBy($"label")
      .agg(VectorAgg.sum_vectors($"m").as("s"))
      .as[(Int, Map[String, Double])].collect().toMap
    val viaExplode = emb
      .select($"label", explode($"m").as(Seq("k", "x")))
      .groupBy($"label", $"k").agg(sum($"x").as("x"))
      .as[(Int, String, Double)].collect()
      .groupBy(_._1).map { case (l, rows) => l -> rows.map(r => r._2 -> r._3).toMap }
    assert(viaAggregator.keySet == viaExplode.keySet)
    viaAggregator.foreach { case (l, m) =>
      val e = viaExplode(l)
      assert(m.keySet == e.keySet)
      m.foreach { case (k, v) => assert(math.abs(v - e(k)) < 1e-9, s"$l/$k") }
    }
  }

  test("sum_vectors handles disjoint and empty maps") {
    val df = Seq(
      (1, Map("a" -> 1.0, "b" -> 2.0)),
      (1, Map("b" -> 3.0, "c" -> 4.0)),
      (1, Map.empty[String, Double]),
      (2, Map("z" -> 9.0)))
      .toDF("g", "m")
    val got = df.groupBy($"g").agg(VectorAgg.sum_vectors($"m").as("s"))
      .as[(Int, Map[String, Double])].collect().toMap
    assert(got(1) == Map("a" -> 1.0, "b" -> 5.0, "c" -> 4.0))
    assert(got(2) == Map("z" -> 9.0))
  }
}
