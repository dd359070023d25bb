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

  test("labelPropagate: one hop per round, smallest-label ties, seeds immutable, unreached stays null") {
    // path 1->2->3->4 (edges point at out-neighbors; votes flow from
    // dst labels to src), seeds: 3 has label 7, 4 has label 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val seeds = Seq((3L, 7), (4L, 9)).toDF("id", "label")
    def run(iters: Int) = GraphOps.labelPropagate(
        edges, "s", "d", seeds, "id", "label", iters)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    val r1 = run(1)
    assert(r1(2L) == Some(7), "node 2 sees labeled neighbor 3 after one round")
    assert(r1(1L) == None, "node 1's only neighbor was unlabeled at round 1")
    assert(r1(3L) == Some(7) && r1(4L) == Some(9), "seeds never change")
    val r2 = run(2)
    assert(r2(1L) == Some(7), "round 2 reaches node 1 through node 2")

    // tie-break: node 1 -> {2 (label 5), 3 (label 3)} — one vote each,
    // smallest label wins
    val tie = GraphOps.labelPropagate(
        Seq((1L, 2L), (1L, 3L)).toDF("s", "d"),
        "s", "d", Seq((2L, 5), (3L, 3)).toDF("id", "label"), "id", "label", 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tie(1L) == 3)
  }

  test("labelPropagate: coverage is monotone in iters on the real kNN graph; seed fifth intact") {
    val emb = Tables.table(spark, TestSpark.Sf, "embeddings")
    val edges = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
      .select($"src", $"dst")
    val seeds = emb.filter($"vec_id" % 5 === 0)
    def labeled(iters: Int) = GraphOps.labelPropagate(
        edges, "src", "dst", seeds, "vec_id", "label", iters)
      .filter($"label".isNotNull).count()
    val c0 = labeled(0); val c1 = labeled(1); val c2 = labeled(2)
    assert(c0 == 100, "exactly the seeded fifth at iter 0")
    assert(c0 <= c1 && c1 <= c2, s"coverage must not shrink: $c0 $c1 $c2")
    assert(c2 > c0, "propagation must actually reach new nodes")
    val seedLabels = seeds.select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    GraphOps.labelPropagate(edges, "src", "dst", seeds, "vec_id", "label", 2)
      .filter($"id" % 5 === 0).as[(Long, Int)].collect()
      .foreach { case (id, l) => assert(l == seedLabels(id), s"seed $id moved") }
  }

  test("textRank: path-graph closed form; Σ rank = 1; keyed ≡ long-id pageRank") {
    // docs [a b] and [b c] → undirected path a−b−c; bigram repeats and
    // the (b,b) self-loop candidate must not add edges
    val docs = Seq(
      (1L, Seq("a", "b")), (2L, Seq("b", "c")),
      (3L, Seq("a", "b", "b")))  // repeat bigram + adjacent-dup "b b"
      .toDF("id", "toks")
    val got = GraphOps.textRank(docs, "toks", iters = 3)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == Set("a", "b", "c"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"Σ rank = ${got.values.sum}")
    // same graph through the long-keyed entry point: identical values
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
    val asLong = Map("a" -> 0L, "b" -> 1L, "c" -> 2L)
    val viaLong = GraphOps.pageRank(
        edges.map { case (s, d) => (asLong(s), asLong(d)) }.toDF("s", "d"),
        "s", "d", iters = 3)
      .as[(Long, Double)].collect().toMap
    asLong.foreach { case (w, id) =>
      assert(math.abs(got(w) - viaLong(id)) < 1e-12, s"$w") }
    // path-graph structure: the middle word outranks the endpoints
    assert(got("b") > got("a") && got("b") > got("c"))
    assert(math.abs(got("a") - got("c")) < 1e-12, "endpoints symmetric")
  }

  test("hits: star closed form — center is the sole authority, leaves the hubs") {
    // leaves 2,3,4 all point at center 1:
    //   auth1: raw = (1,0,0,0)·indeg = center 3, leaves 0 → auth = (1,0,0,0)
    //   hub1:  each leaf raw = auth(center) = 1, center raw 0 → hubs = 1/3 each
    // iteration 2 is a fixed point of the same shape
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("s", "d")
    val h = GraphOps.hits(star, "s", "d", iters = 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, hb) => id -> (a, hb) }.toMap
    assert(h(1L)._1 == 1.0 && h(1L)._2 == 0.0, h)
    Seq(2L, 3L, 4L).foreach { l =>
      assert(h(l)._1 == 0.0, h)
      assert(math.abs(h(l)._2 - 1.0 / 3) < 1e-9, h)
    }
  }

  test("hits: L1 mass = 1 for both scores on the real kNN graph; all non-negative") {
    val edges = Similarity.knnSelfJoin(
        Tables.table(spark, TestSpark.Sf, "embeddings"), "vec_id", "embedding",
        Tables.table(spark, TestSpark.Sf, "embeddings")
          .select($"vec_id".cast("long"),
            graft.ops.KMeansOps.asDouble($"embedding").as("v"))
          .filter($"vec_id" < 8).orderBy("vec_id").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray),
        k = 5, nprobe = 5)
      .select($"qid".as("src"), $"nbr".as("dst"))
    val rows = GraphOps.hits(edges, "src", "dst", iters = 2)
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, a, hb) => a >= 0 && hb >= 0 })
    // L1 normalization at 9 dp: sums land within n·5e-10 of 1
    val tol = rows.length * 5e-10
    assert(math.abs(rows.map(_._2).sum - 1.0) < tol)
    assert(math.abs(rows.map(_._3).sum - 1.0) < tol)
  }

  test("pageRank: iters=0 returns the uniform start vector") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = GraphOps.pageRank(g, "s", "d", iters = 0)
      .as[(Long, Double)].collect().toMap
    assert(r.size == 3 && r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
  }
}
