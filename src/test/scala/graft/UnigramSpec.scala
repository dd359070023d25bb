package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Unigram

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("viterbiSegment: hand-computed DP fixture, incl. the shortest-piece tie-break") {
    // dp over "_abab" with this model (units of 1e9):
    //   dp1 = _ (-1); dp2 = _a (-2, beats _+a=-4)
    //   dp3: b after dp2 = -5 TIES ab after dp1 = -5 -> smallest j wins (b)
    //   dp4 = dp3 + a = -8 (ba is -12); dp5 = dp3 + ab = -9 (beats dp4+b=-11)
    // backtrack: ab <- b <- _a, score -9e9
    val words = Seq(("_abab", 1L)).toDF("word", "freq")
    val model = Seq(
      ("_", -1000000000L), ("a", -3000000000L), ("b", -3000000000L),
      ("ab", -4000000000L), ("_a", -2000000000L), ("ba", -10000000000L))
      .toDF("piece", "lp9")
    val r = Unigram.viterbiSegment(words, model).collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("pieces").toSeq == Seq("_a", "b", "ab"),
      s"got ${r.getAs[scala.collection.Seq[String]]("pieces")}")
    assert(r.getAs[Long]("score9") == -9000000000L)
  }

  test("viterbiSegment: single-char fallback segments a word no multi-char piece covers") {
    val words = Seq(("_xyz", 2L)).toDF("word", "freq")
    val model = Seq(("_", -1000000000L), ("x", -2000000000L),
      ("y", -2000000000L), ("z", -2000000000L)).toDF("piece", "lp9")
    val r = Unigram.viterbiSegment(words, model).collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("pieces").toSeq == Seq("_", "x", "y", "z"))
    assert(r.getAs[Long]("score9") == -7000000000L)
  }

  test("train + encode invariants at 3 SFs: coverage, roundtrip, score consistency, oracle bounds") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val words = Unigram.wordFreqs(Tables.table(spark, sf, "documents"), "text")
        .localCheckpoint()
      // the generated oracle unrolls DP positions to maxW = 9 — guard
      // the assumption ('_' marker + tokenize's \w\w+ tokens)
      val wl = words.agg(max(length($"word"))).as[Int].head()
      assert(wl <= 9, s"$sf: max word length $wl breaks the oracle unroll")
      val model = Unigram.train(words, rounds = 2, maxMulti = 90)
        .localCheckpoint()
      // every single char survives in the vocabulary (coverage)
      val chars = words.select(explode(split($"word", "")).as("c"))
        .filter($"c" =!= "").distinct().as[String].collect().toSet
      val pieces = model.select($"piece").as[String].collect().toSet
      assert(chars.subsetOf(pieces), s"$sf: missing single chars")
      // segmentation is a PARTITION of each word: pieces concat back,
      // and the exact integer score equals the sum of piece lp9s
      val lp = model.select($"piece", $"lp9").as[(String, Long)]
        .collect().toMap
      val seg = Unigram.viterbiSegment(
        words, model.select($"piece", $"lp9"))
        .select($"word", $"pieces", $"score9")
        .as[(String, Seq[String], Long)].collect()
      assert(seg.nonEmpty)
      seg.foreach { case (w, ps, s9) =>
        assert(ps.mkString == w, s"$sf: $ps does not partition $w")
        assert(ps.map(lp).sum == s9, s"$sf: score9 inconsistent for $w")
      }
      // EM actually concentrated mass: the segmentations prefer
      // multi-char pieces somewhere (a pure char spelling would make
      // the unigram LM pointless)
      assert(seg.exists(_._2.exists(_.length > 1)),
        s"$sf: no multi-char piece ever used")
    }
  }
}
