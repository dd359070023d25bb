package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches over token streams — Count-Min (Cormode &
  * Muthukrishnan 2003, "An improved data stream summary: the count-min
  * sketch and its applications"). Beyond-reference surface: the
  * constant-memory term-frequency estimator for corpora whose
  * vocabulary cannot be aggregated exactly.
  *
  * Hashes are md5-derived via Kirsch–Mitzenmacher double hashing
  * (h1 + j·h2 mod m) — the same portable device as the Bloom
  * decontamination path — so an independent engine (the DuckDB oracle)
  * rebuilds the cell table bit-for-bit and the sketch's OVERCOUNTS are
  * value-checkable, not just its lower bound.
  *
  * Scale shape: [[cmsCells]] aggregates the raw token stream straight
  * into ≤ d·m cells — map-side partial aggregation collapses every
  * partition to a constant-size partial table, so the vocabulary never
  * shuffles to build the sketch. That is the entire point of CMS at
  * 100 TB: exact per-word counts need a vocabulary-sized shuffle; the
  * sketch needs a fixed 4×4096-row one.
  */
object Sketches {

  private[graft] def h1(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  private[graft] def h2(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  private def pos(w: Column, j: Column, m: Int): Column =
    pmod(h1(w) + j * h2(w), lit(m))

  /** Build the d×m Count-Min cell table from a token frame (column
    * `w`, one row per token OCCURRENCE). Output: (j, pos, cell) with
    * at most d·m rows.
    */
  def cmsCells(toks: DataFrame, d: Int, m: Int): DataFrame =
    // hash BEFORE the ×d explode: one md5 per token occurrence (the two
    // substrings CSE to a single digest), not d of them
    toks.select(h1(col("w")).as("h1"), h2(col("w")).as("h2"))
      .select(col("h1"), col("h2"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .select(col("j"), pmod(col("h1") + col("j") * col("h2"), lit(m)).as("pos"))
      .groupBy(col("j"), col("pos")).agg(count(lit(1)).as("cell"))

  /** Point-query the sketch for each word in `words` (column `w`,
    * other columns carried through): est = min_j cell[j][pos_j(w)].
    * The cell table broadcasts — it is ≤ d·m rows by construction.
    * CMS guarantee: est ≥ true count, always (every cell the word
    * touches contains its full count plus non-negative collision mass).
    */
  def cmsEstimate(words: DataFrame, cells: DataFrame, d: Int, m: Int): DataFrame = {
    val carried = words.columns.map(col)
    words.select(carried :+ explode(sequence(lit(0), lit(d - 1))).as("j"): _*)
      .withColumn("pos", pos(col("w"), col("j"), m))
      .join(broadcast(cells), Seq("j", "pos"))
      .groupBy(carried: _*).agg(min(col("cell")).as("est"))
  }
}
