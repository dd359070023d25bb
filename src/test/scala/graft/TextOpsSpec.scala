package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenize: sklearn token_pattern semantics — >=2 word chars, lowercased, order+dups kept") {
    val got = Seq("The quick-quick a b bb X9 foo_bar")
      .toDF("text")
      .select(TextOps.tokenize($"text").as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("the", "quick", "quick", "bb", "x9", "foo_bar"))
  }

  test("stopword + dictionary filter: stopword wins, duplicates and order preserved") {
    val got = Seq("a fast fast the slow big dog")
      .toDF("text")
      .select(TextOps.tokenizeFiltered($"text",
        stopwords = Seq("the", "a", "fast"),
        dict = Seq("fast", "slow", "big")).as("t"))
      .as[Seq[String]].head()
    // "fast" is both stopword and dict word → removed (predicate order,
    // MapperExtractTransform.java:81); dog not in dict → removed.
    assert(got == Seq("slow", "big"))
  }

  test("filterByDictDf (broadcast scale path) == keepDictionary literal path") {
    val docs = Tables.table(spark, TestSpark.Sf, "documents")
      .select($"doc_id", TextOps.tokenize($"text").as("toks"))
    val dictDf = Dictionaries.Adjectives.toDF("word")
    val viaJoin = TextOps.filterByDictDf(docs, "doc_id", "toks", dictDf)
      .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
    val viaLit = docs
      .select($"doc_id", TextOps.keepDictionary($"toks", Dictionaries.Adjectives).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaJoin == viaLit)
  }
}
