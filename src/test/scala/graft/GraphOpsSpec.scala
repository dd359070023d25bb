package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraphOps, Similarity}

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: closed form on a 2-cycle and on a dangling-node star") {
    // a<->b cycle: symmetric, ranks stay 1/2 forever
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val rc = GraphOps.pageRank(cycle, "s", "d", iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(rc(1L) - 0.5) < 1e-12 && math.abs(rc(2L) - 0.5) < 1e-12)

    // a->b with b dangling: after one iteration
    //   dm = r(b) = 1/2
    //   r'(a) = 0.15/2 + 0.85*(0 + dm/2)      = 0.2875
    //   r'(b) = 0.15/2 + 0.85*(1/2 + dm/2)    = 0.7125
    val star = Seq((1L, 2L)).toDF("s", "d")
    val rs = GraphOps.pageRank(star, "s", "d", iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(rs(1L) - 0.2875) < 1e-12, rs)
    assert(math.abs(rs(2L) - 0.7125) < 1e-12, rs)
  }

  test("pageRank: mass conservation and positivity on the real kNN graph") {
    val edges = Similarity.knnGraph(
        Tables.table(spark, TestSpark.Sf, "embeddings"), "vec_id", "embedding", k = 5)
      .select($"src", $"dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Double)].collect()
    assert(r.length == 500, "every node ranked")
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-9, "Σ rank = 1 (dangling mass kept)")
    assert(r.forall(_._2 >= 0.15 / 500 - 1e-15), "rank floor = (1-d)/n")
  }

  test("pageRank: iters=0 returns the uniform start vector") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = GraphOps.pageRank(g, "s", "d", iters = 0)
      .as[(Long, Double)].collect().toMap
    assert(r.size == 3 && r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
  }
}
