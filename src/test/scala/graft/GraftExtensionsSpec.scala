package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registerAll: every kernel callable from plain SQL on a live session, equal to the Column API") {
    GraftExtensions.registerAll(spark)

    assert(spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0)

    val viaSql = spark.sql("SELECT char_shingle_hashes('abcdef', 3) AS h")
      .as[Seq[Long]].head()
    val viaCol = Seq("abcdef").toDF("s")
      .select(CharShingleHashes.char_shingle_hashes($"s", 3).as("h"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.nonEmpty)

    val keptSql = spark.sql(
      "SELECT span_cover_mask(array('a','b','c','d'), array(2), 2) AS kept")
      .as[Seq[String]].head()
    assert(keptSql == Seq("a", "d"))  // 1-based span [2,4) covers b,c

    val sigSql = spark.sql(
      "SELECT minhash_sigs(array(10L, 99L), array(3L, 7L), array(1L, 5L), 2147483647L) AS s")
      .as[Seq[Long]].head()
    val sigCol = Seq(Seq(10L, 99L)).toDF("hs")
      .select(MinHashSigs.minhash_sigs($"hs", Seq(3L, 7L), Seq(1L, 5L), 2147483647L).as("s"))
      .as[Seq[Long]].head()
    assert(sigSql == sigCol && sigSql.length == 2)

    val bandSql = spark.sql("SELECT band_hashes(array(11L, 22L, 33L, 44L), 2, 42L) AS b")
      .as[Seq[Long]].head()
    val bandCol = Seq(Seq(11L, 22L, 33L, 44L)).toDF("sig")
      .select(BandHashes.band_hashes($"sig", 2).as("b")).as[Seq[Long]].head()
    assert(bandSql == bandCol && bandSql.length == 2)

    val nc = spark.sql(
      """SELECT nearest_centroid(array(1.0D, 1.0D),
        |  array(5L, 9L),
        |  array(array(0.0D, 0.0D), array(1.0D, 1.0D))) AS c""".stripMargin)
      .select($"c.cid").as[Long].head()
    assert(nc == 9L)
  }

  test("withExtensions: a fresh session built with GraftExtensions resolves the kernels without registerAll") {
    val orig = spark  // force TestSpark init before touching default session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // same SparkContext, NEW session state with the extensions applied
      assert(s2 ne orig)
      assert(s2.sql("SELECT dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D))")
        .head().getDouble(0) == 23.0)
      assert(s2.sql("SELECT char_shingle_hashes('xyzw', 2) AS h")
        .head().getSeq[Long](0).length == 3)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
