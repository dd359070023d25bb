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

  test("shuffleDeterministic: a salt-keyed bijection 1..N, stable across partitionings, epoch-sensitive") {
    val docs = Tables.table(spark, TestSpark.Sf, "documents").select($"doc_id")
    val a = IdOps.shuffleDeterministic(docs, "doc_id", salt = "e1")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(a.values.toSeq.sorted == (1L to a.size.toLong), "dense 1..N positions")
    val b = IdOps.shuffleDeterministic(docs.repartition(7), "doc_id", salt = "e1")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(a == b, "order is a pure function of (salt, key), not of partitioning")
    val c = IdOps.shuffleDeterministic(docs, "doc_id", salt = "e2")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(a != c, "a different epoch salt must permute differently")
    // matches the driver-side md5 ranking exactly
    val exp = a.keys.toSeq
      .map { id =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"e1_$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        (d, id)
      }.sorted.zipWithIndex.map { case ((_, id), i) => id -> (i + 1L) }.toMap
    assert(a == exp)
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

  test("stratifiedSampleByHash: rate 1 keeps all, rate 0 keeps none, unknown strata get defaultRate") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, TestSpark.Sf, "documents")
    val got = IdOps.stratifiedSampleByHash(docs, "doc_id", "source",
        rates = Map("src0" -> 1.0, "src1" -> 0.0), salt = "t")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(got("src0") == all("src0"), "rate 1.0 must keep the whole stratum")
    assert(!got.contains("src1"), "rate 0.0 must drop the whole stratum")
    assert(got.keySet == Set("src0"), "strata not in rates must fall to defaultRate=0")
    // deterministic: same inputs → same sample
    val a = IdOps.stratifiedSampleByHash(docs, "doc_id", "source",
      rates = Map("src2" -> 0.5), salt = "t").select($"doc_id").as[Long].collect().toSet
    val b = IdOps.stratifiedSampleByHash(docs, "doc_id", "source",
      rates = Map("src2" -> 0.5), salt = "t").select($"doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("temperatureSample keeps the rarest stratum whole, downsamples the dominant") {
    // heavy: 900 rows of weight 10; rare: 100 rows of weight 1.
    // T=2 → q ∝ √p pulls shares toward uniform, so `rare` keeps rate 1
    // (it is the most under-represented) and `heavy` drops a chunk.
    val rows = (1L to 900L).map(i => (i, "heavy", 10.0)) ++
      (901L to 1000L).map(i => (i, "rare", 1.0))
    val df = rows.toDF("id", "src", "w")
    val kept = IdOps.temperatureSample(df, "id", "src", "w",
        temperature = 2.0, salt = "s")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("rare") == 100L, s"rare stratum must be kept whole: $kept")
    assert(kept("heavy") < 900L && kept("heavy") > 0L, s"heavy must downsample: $kept")
    // expected heavy rate: (q/p)/(max q/p) with p=9000/9100, q=√p-normalized
    val (ph, pr) = (9000.0 / 9100.0, 100.0 / 9100.0)
    val (qh, qr) = (math.sqrt(ph), math.sqrt(pr))
    val rate = (qh / ph) / (qr / pr)
    val expected = math.floor(rate * 256 + 1e-9) / 256.0
    assert(math.abs(kept("heavy").toDouble / 900.0 - expected) < 0.08,
      s"heavy keep fraction ${kept("heavy") / 900.0} vs expected ~$expected")
    // deterministic under the same salt
    val again = IdOps.temperatureSample(df, "id", "src", "w", 2.0, "s")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }
}
