package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.CharShingleHashes
import graft.functions.CharShingleHashes.char_shingle_hashes

class CharShingleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val K = 5
  val B = 1000003L

  /** Independent reference implementation: direct per-window polynomial. */
  def reference(s: String, k: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) Seq.empty
    else (0 to bytes.length - k).map { i =>
      var h = 0L
      (i until i + k).foreach(j => h = h * B + (bytes(j) & 0xffL))
      h
    }
  }

  test("codegen path (DataFrame) matches the direct polynomial on random strings") {
    val gen = Gen.listOfN(80, Gen.asciiPrintableChar).map(_.mkString)
    val strs = Gen.listOfN(60, gen).sample.get ++
      Seq("", "ab", "aaaaa", "héllo wörld ünïcode")  // edge + multi-byte UTF-8
    val got = strs.toDF("s")
      .select($"s", char_shingle_hashes($"s", K).as("h"))
      .as[(String, Seq[Long])].collect().toMap
    strs.foreach(s => assert(got(s) == reference(s, K), s"s=$s"))
  }

  test("interpreted eval matches codegen output") {
    val s = "the quick brown fox jumps over the lazy dog"
    val interpreted = CharShingleHashes(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(s)), K)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val viaDf = Seq(s).toDF("s").select(char_shingle_hashes($"s", K))
      .as[Seq[Long]].head()
    assert(interpreted == viaDf)
    assert(interpreted == reference(s, K))
  }

  test("SQL registration: char_shingle_hashes callable from spark.sql") {
    CharShingleHashes.register(spark)
    val r = spark.sql("SELECT char_shingle_hashes('abcdefgh', 5) AS h")
      .as[Seq[Long]].head()
    assert(r == reference("abcdefgh", 5))
  }

  test("char-level MinHash dedup: near-identical strings share most shingle hashes") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = a.replace("quick", "quickk")  // single insertion
    val df = Seq((1L, a), (2L, b)).toDF("id", "s")
      .select($"id", explode(char_shingle_hashes($"s", K)).as("h"))
      .distinct()
    val sets = df.as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val inter = (sets(1L) & sets(2L)).size.toDouble
    val jacc = inter / (sets(1L) | sets(2L)).size
    assert(jacc > 0.7, s"one edit should keep most shingles, j=$jacc")
  }
}
