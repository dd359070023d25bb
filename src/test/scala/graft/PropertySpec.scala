package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.ops.{Tfidf, TextOps}

/** Property tests (SURVEY §5.3): parity of Spark's rounding/formulas
  * with the reference's BigDecimal semantics, over generated inputs.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round(x, 6) == BigDecimal HALF_UP for arbitrary doubles") {
    val gen = Gen.chooseNum(-1e6, 1e6)
    val xs = Gen.listOfN(500, gen).sample.get
    val got = xs.toDF("x").select(round($"x", 6).as("r")).as[Double].collect()
    xs.zip(got).foreach { case (x, r) =>
      val want = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r == want, s"x=$x")
    }
  }

  test("idf formula strictly decreasing in df; df=0 backfill is the max") {
    val n = 1000L
    def idf(df: Long) = math.log((n + 1.0) / (df + 1.0)) + 1.0
    val dfs = (0L to 20L) ++ Seq(100L, 999L, 1000L)
    val got = dfs.toDF("df")
      .withColumn("idf", log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
      .as[(Long, Double)].collect().toMap
    dfs.foreach(d => assert(got(d) == idf(d)))
    dfs.sliding(2).foreach { case Seq(a, b) => assert(got(a) > got(b)) }
  }

  test("tokenize: arbitrary ASCII strings — every token matches \\w\\w+, order/dups kept") {
    val gen = Gen.listOfN(30,
      Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const(" "), Gen.const("!"), Gen.const("_a")))
      .map(_.mkString(""))
    val texts = Gen.listOfN(100, gen).sample.get
    val toks = texts.toDF("text").select(TextOps.tokenize($"text").as("t"))
      .as[Seq[String]].collect()
    val re = java.util.regex.Pattern.compile("(?u)\\b\\w\\w+\\b")
    texts.zip(toks).foreach { case (text, ts) =>
      val m = re.matcher(text.toLowerCase)
      val want = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toList
      assert(ts == want, s"text=$text")
    }
  }

  test("L2 norm of tfidf vectors ~ 1 for random synthetic corpora") {
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val rnd = new scala.util.Random(7)
    val docs = (1L to 50L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
    }.toDF("id", "toks")
    val n = docs.count()
    val vocab = Tfidf.withIdf(Tfidf.docFreq(docs, "id", "toks"), n)
    val w = Tfidf.tfidfVectors(docs, "id", "toks", vocab, scale = 9)
    val norms = w.groupBy($"id").agg(sum($"weight" * $"weight").as("n2"))
      .as[(Long, Double)].collect()
    assert(norms.length == 50)
    norms.foreach { case (id, n2) => assert(math.abs(n2 - 1.0) < 1e-6, s"doc $id: $n2") }
  }
}
