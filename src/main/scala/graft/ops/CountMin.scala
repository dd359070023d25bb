package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a token
  * relation — the bounded-state frequency summary for heavy-hitter
  * queries at corpus scale: the sketch is d rows x m cells of counts
  * (a few thousand longs REGARDLESS of vocabulary), merges by
  * cell-wise addition (partial aggs — every executor combines its
  * local sketch before one tiny shuffle), and estimates any token's
  * count as the min over its d cells, an overestimate by at most
  * (e/m)·N with probability 1−e^−d. At 100 TB the exact `groupBy
  * token` alternative shuffles the full vocabulary; the sketch
  * shuffles m·d cells.
  *
  * Hashes are the engine's md5-u32 portable family (the
  * q_cws_err/minhash device), so the WHOLE sketch — cells, estimates,
  * min — is deterministic integer arithmetic both engines replay:
  * unlike HLL/t-digest, this sketch value-oracles directly
  * (`q_countmin_topk`).
  */
object CountMin {

  /** Cell index of `w` in sketch row j: u32(md5(w|j|salt)) mod m. */
  private def cell(w: Column, j: Int, m: Int, salt: String): Column =
    conv(substring(md5(concat_ws("|", w, lit(j.toString), lit(salt))), 1, 8),
      16, 10).cast("long") % m

  /** Build the sketch: one (j, i, cnt) row per non-empty cell.
    * `tokens` is a relation with one row per token OCCURRENCE.
    */
  def sketch(tokens: DataFrame, wCol: String,
      m: Int = 1024, d: Int = 3, salt: String = "cm16"): DataFrame = {
    require(m >= 2 && d >= 1)
    tokens
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), cell(col(wCol), j, m, salt).as("i"))): _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.i").as("i"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `cands`(wCol): min over the d cells. The
    * sketch is m·d rows by construction — broadcast, never shuffled;
    * a candidate absent from the stream reads empty cells as 0.
    */
  def estimate(cands: DataFrame, wCol: String, sk: DataFrame,
      m: Int = 1024, d: Int = 3, salt: String = "cm16"): DataFrame =
    cands
      .select(col(wCol), explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), cell(col(wCol), j, m, salt).as("i"))): _*)).as("c"))
      .select(col(wCol), col("c.j").as("j"), col("c.i").as("i"))
      .join(broadcast(sk), Seq("j", "i"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(wCol))
      .agg(min("cnt").as("est"))
}
