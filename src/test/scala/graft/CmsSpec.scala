package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val toks = Tables.table(spark, TestSpark.Sf, "documents")
    .select(explode(graft.ops.TextOps.tokenizeFiltered(
      $"text", Dictionaries.Stopwords, Nil)).as("w"))
    .localCheckpoint()

  test("CMS: bounded cell table; no word underestimated over the FULL vocabulary") {
    val cells = Sketches.cmsCells(toks, d = 4, m = 4096)
    assert(cells.count() <= 4L * 4096)
    val truth = toks.groupBy($"w").agg(count(lit(1)).as("cnt"))
    val est = Sketches.cmsEstimate(truth, cells, d = 4, m = 4096)
    assert(est.filter($"est" < $"cnt").count() == 0)
  }

  test("CMS: depth tightens the estimate — true ≤ est(d=4) ≤ est(d=1) per word") {
    // d=1 reads only row j=0 of the same cell table, so its estimate is
    // one of the four values d=4 minimizes over — a hard dominance, not
    // a statistical tendency. m=16 < the corpus's 29-word vocabulary
    // forces real collisions (wider sketches degenerate to exact counts
    // here and the overcount assertions would be vacuous).
    val cells = Sketches.cmsCells(toks, d = 4, m = 16)
    val truth = toks.groupBy($"w").agg(count(lit(1)).as("cnt"))
    val e4 = Sketches.cmsEstimate(truth, cells, d = 4, m = 16)
      .select($"w", $"cnt", $"est".as("e4"))
    val e1 = Sketches.cmsEstimate(truth.select($"w"),
        cells.filter($"j" === 0), d = 1, m = 16)
      .select($"w", $"est".as("e1"))
    val joined = e4.join(e1, "w")
    assert(joined.filter($"e4" > $"e1" || $"cnt" > $"e4").count() == 0)
    // the narrow sketch genuinely overcounts somewhere (it is a sketch,
    // not a copy) — otherwise this spec proves nothing
    assert(joined.filter($"e1" > $"cnt").count() > 0)
  }
}
