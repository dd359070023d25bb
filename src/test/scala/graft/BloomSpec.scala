package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Bloom-filter decontamination: build/probe correctness and the two
  * properties that make it usable — zero false negatives always, and a
  * false-positive rate near the (1 − e^(−kn/m))^k sizing formula.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 3
  private val MBits = 16 // 65536 bits — small so the fpp test has teeth

  private def gramsDf(gs: Seq[String]) =
    Seq((1L, gs)).toDF("id", "g")

  /** Reference bitset build + probe, independent of the Spark path. */
  private def refBits(grams: Seq[String]): Array[Long] = {
    val bits = new Array[Long](1 << (MBits - 6))
    grams.distinct.foreach { g =>
      val (h1, h2) = refHashes(g)
      (0 until K).foreach { i =>
        val pos = java.lang.Math.floorMod(h1 + i * h2, 1L << MBits)
        bits((pos >> 6).toInt) |= 1L << (pos & 63)
      }
    }
    bits
  }
  private def refHashes(g: String): (Long, Long) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16),
      java.lang.Long.parseLong(hex.substring(8, 16), 16))
  }
  private def refContains(bits: Array[Long], g: String): Boolean = {
    val (h1, h2) = refHashes(g)
    (0 until K).forall { i =>
      val pos = java.lang.Math.floorMod(h1 + i * h2, 1L << MBits)
      (bits((pos >> 6).toInt) & (1L << (pos & 63))) != 0L
    }
  }

  private val benchGrams = (0 until 500).map(i => s"bench gram number $i")
  private val otherGrams = (0 until 2000).map(i => s"novel probe text $i")

  test("bloomBitsFromGrams matches an independent reference build bit-for-bit") {
    val bits = Dedup.bloomBitsFromGrams(gramsDf(benchGrams), "g", K, MBits)
    assert(bits.sameElements(refBits(benchGrams)))
  }

  test("distributed build is partitioning-invariant (merge = OR)") {
    val one = Dedup.bloomBitsFromGrams(
      gramsDf(benchGrams).repartition(1), "g", K, MBits)
    val many = Dedup.bloomBitsFromGrams(
      gramsDf(benchGrams).withColumn("g", explode($"g"))
        .repartition(13).groupBy("id").agg(collect_list("g").as("g")),
      "g", K, MBits)
    assert(one.sameElements(many))
  }

  test("no false negatives: every inserted gram probes true") {
    val bits = Dedup.bloomBitsFromGrams(gramsDf(benchGrams), "g", K, MBits)
    val corpus = benchGrams.zipWithIndex.map { case (g, i) => (i.toLong, Seq(g)) }
      .toDF("doc_id", "g5")
    val hits = Dedup.bloomContaminationHits(corpus, "doc_id", "g5", bits, K, MBits)
    assert(hits.count() == benchGrams.size.toLong)
  }

  test("false-positive rate is close to the sizing formula, and expression == reference") {
    val bits = Dedup.bloomBitsFromGrams(gramsDf(benchGrams), "g", K, MBits)
    val corpus = otherGrams.zipWithIndex.map { case (g, i) => (i.toLong, Seq(g)) }
      .toDF("doc_id", "g5")
    val flagged = Dedup.bloomContaminationHits(corpus, "doc_id", "g5", bits, K, MBits)
      .select($"id").as[Long].collect().toSet
    // expression-vs-reference parity on EVERY probe, not just the rate
    val expected = otherGrams.zipWithIndex.collect {
      case (g, i) if refContains(bits, g) => i.toLong
    }.toSet
    assert(flagged == expected)
    // n=500, k=3, m=65536: fpp = (1 - e^(-3*500/65536))^3 ≈ 1.1e-5;
    // with 2000 disjoint probes even 10 hits would mean a broken build
    assert(flagged.size <= 10, s"fpp too high: ${flagged.size}/2000")
  }

  test("empty benchmark flags nothing") {
    val bits = Dedup.bloomBitsFromGrams(
      gramsDf(Nil).filter($"id" < 0), "g", K, MBits)
    assert(bits.forall(_ == 0L))
    val corpus = Seq((1L, Seq("anything"))).toDF("doc_id", "g5")
    assert(Dedup.bloomContaminationHits(corpus, "doc_id", "g5", bits, K, MBits)
      .count() == 0L)
  }
}
