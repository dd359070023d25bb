package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Counters

class CountersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observed counters piggyback on one action — values match direct aggregates") {
    val docs = Tables.table(spark, TestSpark.Sf, "documents")
    val (observedDf, obs) = Counters.observed(docs, "ingest",
      count(lit(1)).as("rows"),
      sum(col("n_chars")).as("total_chars"),
      count(when(col("lang") === "en", 1)).as("en_rows"))
    // ONE action drives both the query result and the counters
    val materialized = observedDf.filter($"n_chars" > 0).count()
    val m = obs.get
    assert(m("rows") == docs.count())
    assert(m("total_chars") == docs.agg(sum($"n_chars")).as[Long].head())
    assert(m("en_rows") == docs.filter($"lang" === "en").count())
    assert(materialized > 0)
  }
}
