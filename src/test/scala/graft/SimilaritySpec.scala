package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.table(spark, TestSpark.Sf, "embeddings")

  test("cosine basics: self=1, orthogonal=0, zero-norm guarded") {
    val df = Seq(
      (1L, Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (2L, Seq(1.0, 0.0), Seq(0.0, 2.0)),
      (3L, Seq(0.0, 0.0), Seq(1.0, 1.0)))
      .toDF("id", "a", "b")
      .select($"id", Similarity.cosine($"a", $"b").as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(df(1L) - 1.0) < 1e-12)
    assert(math.abs(df(2L)) < 1e-12)
    assert(df(3L) == 0.0)
  }

  test("IVF top-k: subset of brute-force result with reasonable recall@5") {
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteTopK(queries, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
      k = 5, cells = 8, nprobe = 3)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // unclustered gaussian data: nprobe 3/8 cells ≈ 3/8 of the corpus scanned
    assert(recall >= 0.25, s"recall@5 = $recall")
    assert(ivf.size <= brute.size)
    info(s"IVF recall@5 = $recall")
  }

  test("IVF nprobe: fixed centroids, recall monotone in nprobe; nprobe=cells equals brute force") {
    val queries = emb.filter($"vec_id" % 50 === 0)
    val pts = emb.select($"vec_id", graft.ops.KMeansOps.asDouble($"embedding").as("v"))
    val cents = pts.filter($"vec_id" < 8).select($"vec_id".as("cid"), $"v".as("cvec"))
    val brute = Similarity.bruteTopK(queries, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    def recallAt(np: Int): Double = {
      val got = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 5, cells = 8, nprobe = np, centroids = Some(cents))
        .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2); val r8 = recallAt(8)
    info(s"IVF recall@5: nprobe=1 $r1, nprobe=2 $r2, nprobe=8 $r8")
    assert(r2 >= r1, "widening the probe set must not lose neighbors")
    assert(r2 >= 0.4, s"nprobe=2/8 cells must clear the recall floor, got $r2")
    // probing every cell scans the whole corpus: IVF must equal brute force
    assert(r8 == 1.0, s"nprobe=cells must have full recall, got $r8")
  }

  test("quantizeInt8: codes in [-127,127], reconstruction within one scale step, zero vector safe") {
    val rows = emb.select($"vec_id", graft.ops.KMeansOps.asDouble($"embedding").as("v"))
      .unionByName(Seq((999999L, Seq(0.0, 0.0, 0.0))).toDF("vec_id", "v"))
      .select($"vec_id", $"v", Similarity.quantizeInt8($"v").as("z"))
      .select($"vec_id", $"v", $"z.scale".as("s"), $"z.q".as("q"))
      .as[(Long, Seq[Double], Double, Seq[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v, s, q) =>
      assert(v.length == q.length, s"vec $id dims")
      assert(q.forall(c => c >= -127 && c <= 127), s"vec $id code range")
      if (s == 0.0) assert(q.forall(_ == 0), s"zero vector $id")
      else v.zip(q).foreach { case (x, c) =>
        assert(math.abs(c * s - x) <= s + 1e-12, s"vec $id reconstruction error > scale")
      }
    }
  }

  /** embeddings ∪ near-dup perturbed copies — mirrors SparkEntry.perturbedEmb. */
  def perturbed(sf: String) = {
    val base = Tables.table(spark, sf, "embeddings")
      .select($"vec_id", graft.ops.KMeansOps.asDouble($"embedding").as("v"))
    base.unionByName(base.select(
      ($"vec_id" + lit(1000000L)).as("vec_id"),
      transform($"v", (x, i) => x * (lit(0.98) + lit(0.01) * (i % 3).cast("double"))).as("v")))
  }

  test("cosinePairsBlocked == cosinePairsFast (exact distributed kernel parity)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.table(spark, sf, "embeddings")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("cos", round($"cos", 9))
          .as[(Long, Long, Double)].collect().toSet
      val fast = canon(Similarity.cosinePairsFast(emb, "vec_id", "embedding", 0.4))
      val blocked = canon(Similarity.cosinePairsBlocked(emb, "vec_id", "embedding", 0.4, blocks = 7))
      assert(blocked == fast, s"$sf: blocked kernel diverges from collect kernel")
      assert(fast.nonEmpty)
    }
  }

  test("cosinePairsLsh: full recall vs exact pairs at the near-dup threshold (2 SFs)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val corpus = perturbed(sf)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("cos", round($"cos", 9))
          .as[(Long, Long, Double)].collect().toSet
      val exact = canon(Similarity.cosinePairsBlocked(corpus, "vec_id", "v", 0.9))
      val lsh = canon(Similarity.cosinePairsLsh(corpus, "vec_id", "v", 0.9))
      assert(lsh == exact, s"$sf: LSH must recover every ≥0.9 pair (miss p ~1e-19)")
      // one planted near-dup partner per original vector
      val n = Tables.table(spark, sf, "embeddings").count()
      assert(exact.size >= n, s"$sf: expected ≥ $n planted pairs, got ${exact.size}")
    }
  }

  test("HyperplaneSigns expression == driver-side reference band hashes") {
    val bands = 4; val bits = 8; val seed = 42L
    val unit = Similarity.withUnitVec(
      emb.select($"vec_id", graft.ops.KMeansOps.asDouble($"embedding").as("v")), "v", "u")
      .select($"vec_id", $"u")
    val dim = unit.select(size($"u")).as[Int].head()
    val planes = Similarity.hyperplanes(bands, bits, dim, seed)
    val got = unit.select($"vec_id",
        graft.functions.HyperplaneSigns.hyperplane_signs($"u", planes, bands, bits).as("bhs"))
      .as[(Long, Seq[Long])].collect().toMap
    val vecs = unit.as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, u) =>
      val exp = (0 until bands).map { b =>
        (0 until bits).foldLeft(0L) { (bh, j) =>
          val off = (b * bits + j) * dim
          var s = 0.0
          var k = 0
          while (k < dim) { s += u(k) * planes(off + k); k += 1 }
          if (s >= 0) bh | (1L << j) else bh
        }
      }
      assert(got(id) == exp, s"vec $id")
    }
    assert(got.nonEmpty)
  }

  test("cosinePairsLsh: exact-verify step keeps only true ≥ minCos pairs (no false positives)") {
    val corpus = perturbed(TestSpark.Sf)
    val lsh = Similarity.cosinePairsLsh(corpus, "vec_id", "v", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(lsh.forall(_._3 >= 0.9))
    assert(lsh.forall(p => p._1 < p._2))
  }

  test("cosinePairsAuto: routes small corpora to the collect kernel with identical output") {
    val emb = Tables.table(spark, TestSpark.Sf, "embeddings")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("cos", round($"cos", 9)).as[(Long, Long, Double)].collect().toSet
    assert(canon(Similarity.cosinePairsAuto(emb, "vec_id", "embedding", 0.4))
      == canon(Similarity.cosinePairsFast(emb, "vec_id", "embedding", 0.4)))
  }

  test("semanticDedup: identical-direction twins in one cell collapse; cross-cell twins are NOT seen (recall contract)") {
    // two centroids on the x and y axes; three x-ish near-dup vectors,
    // one y-ish vector whose exact copy sits across the cell boundary
    // cannot be caught — that is SemDeDup's documented recall tradeoff
    val pts = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.999, 0.01)), (3L, Array(0.998, 0.02)),
      (10L, Array(0.0, 1.0)), (11L, Array(0.05, 0.998))
    ).toDF("id", "v")
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("cid", "cvec")
    val labels = Similarity.semanticDedup(pts, "id", "v", cents, 0.99)
      .as[(Long, Long)].collect().toMap
    // 1,2,3 share cell 0 and are pairwise cos>0.99 -> one component, rep=1
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    // 10 and 11 share cell 1 and cos(10,11)>0.99 -> component rep=10
    assert(labels(10L) == 10L && labels(11L) == 10L)
    // cross-cell pair is invisible by construction: put 11's copy in cell 0
    val split = Seq(
      (1L, Array(1.0, 0.0)), (20L, Array(0.6, 0.8)), (21L, Array(0.62, 0.785))
    ).toDF("id", "v")
    val cents2 = Seq((0L, Array(0.61, 0.79)), (1L, Array(0.0, 1.0))).toDF("cid", "cvec")
    // 20 and 21 both route to cell 0 (closest) -> caught
    val got = Similarity.semanticDedup(split, "id", "v", cents2, 0.99)
      .as[(Long, Long)].collect().toMap
    assert(got.get(20L).contains(20L) && got.get(21L).contains(20L))
  }

  test("cosinePairsSparse: prefix-filtered APSS ≡ brute inverted-index join on the real corpus") {
    // tf-idf sparse vectors over the documents corpus — the exact input
    // family q_allpairs_tfidf runs on
    val docs = Tables.table(spark, TestSpark.Sf, "documents")
      .select($"doc_id", graft.ops.TextOps.tokenizeFiltered(
        $"text", graft.Dictionaries.Stopwords, Nil).as("toks"))
    val n = docs.agg(count(lit(1)).as("n"))
    val vocab = graft.ops.Tfidf.docFreq(docs, "doc_id", "toks")
      .crossJoin(n)
      .filter($"df" <= lit(0.3) * $"n")
      .withColumn("idf", log(($"n" + lit(1.0)) / ($"df" + lit(1.0))) + lit(1.0))
      .select($"word", $"idf")
    val e = graft.ops.Tfidf.tfidfVectors(docs, "doc_id", "toks", vocab, scale = 6)
      .filter($"weight" > 0)
      .select($"doc_id".as("id"), $"word", $"weight".as("w"))
      .localCheckpoint()
    val theta = 0.3  // lower than the gated 0.5 — more boundary pairs exercised
    val brute = e.as("a")
      .join(e.as("b"), $"a.word" === $"b.word" && $"a.id" < $"b.id")
      .groupBy($"a.id".as("id1"), $"b.id".as("id2"))
      .agg(sum($"a.w" * $"b.w").as("cos"))
      .filter($"cos" >= theta)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val pref = Similarity.cosinePairsSparse(e, theta, materialize = false)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pref == brute, s"prefix ${pref.size} vs brute ${brute.size}")
    assert(brute.nonEmpty)  // the parity must witness actual pairs
  }

  test("bruteTopK: ranks are 1..k per query, cos within [-1,1], no self-pairs") {
    val r = Similarity.bruteTopK(emb.filter($"vec_id" % 100 === 0), emb,
      "vec_id", "embedding", 5).collect()
    val byQ = r.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      rows.foreach { row =>
        assert(row.getLong(2) != q)
        val c = row.getDouble(3)
        assert(c <= 1.0 + 1e-9 && c >= -1.0 - 1e-9)
      }
    }
  }
}
