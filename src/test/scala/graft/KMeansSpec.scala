package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeansOps

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val points = Tables.table(spark, TestSpark.Sf, "embeddings")
    .select($"vec_id", KMeansOps.asDouble($"embedding").as("v"))

  test("lloyd: SSE non-increasing, <=k clusters, every point assigned once") {
    val n = points.count()
    val res = KMeansOps.lloyd(points, "vec_id", "v", k = 5, seed = 7L, maxIter = 10)
    val totals = res.sseHistory.map(_.values.sum)
    totals.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-6, s"SSE increased: $totals")
    }
    assert(res.centroids.length <= 5)
    assert(res.assignments.count() == n)
    assert(res.assignments.select($"vec_id").distinct().count() == n)
    assert(res.converged || res.iterations == 10)
  }

  test("fused assign == composed crossJoin+groupBy argmin, bit-identically") {
    val centroids = points.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"v".as("cvec"))
    val cArr = centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val fused = KMeansOps.assign(points, "vec_id", "v", cArr)
    val composed = points
      .crossJoin(broadcast(centroids))
      .withColumn("dist", KMeansOps.euclid($"v", $"cvec"))
      .groupBy($"vec_id")
      .agg(min(struct($"dist", $"cid")).as("m"), first($"v").as("v"))
      .select($"vec_id", $"m.cid".as("cluster"), $"m.dist".as("dist"), $"v")
    val a = fused.orderBy("vec_id").collect()
    val b = composed.orderBy("vec_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("L2-normalized tfidf vectors have unit norm per nonzero doc") {
    val tfidf = SparkEntry.queries("q_tfidf")(spark, TestSpark.Sf)
    val norms = tfidf.groupBy($"doc_id")
      .agg(sum($"weight" * $"weight").as("n2"))
      .filter($"n2" > 0)
      .select($"n2").as[Double].collect()
    assert(norms.nonEmpty)
    norms.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-3, s"norm² = $n2"))
  }
}
