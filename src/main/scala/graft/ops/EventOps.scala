package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence operators over keyed, timestamped rows: gap
  * sessionization, as-of join, and bounded range join. Beyond-reference
  * surface; all are single-shuffle window/join compositions — no range
  * explosion, no custom plan nodes.
  *
  * Timestamps are int64 nanos (`ts_ns`-style columns) — integer
  * arithmetic keeps oracle parity exact.
  */
object EventOps {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapNs`. One window pass
    * (lag + running sum of session-start flags), one aggregation.
    * Output: (key, session_id 1.., n_events, start_ns, end_ns).
    */
  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String, gapNs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapNs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ns"), max(col(tsCol)).as("end_ns"))
  }

  /** As-of join: attach to each left row the `payloadCol` of the most
    * recent right row with right ts <= left ts, per key (null when none
    * precedes). Implemented as union + running `last(ignoreNulls)` —
    * one shuffle on the key, no per-row range scan, ties at equal ts
    * resolved right-before-left (inclusive <=). If several right rows
    * share the qualifying timestamp the in-order last one wins —
    * callers needing a total tie-break pre-sort on a secondary column.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payloadCol: String, outCol: String): DataFrame = {
    val payloadType = right.schema(payloadCol).dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__p", lit(null).cast(payloadType))
    val r = right.select(
      keys.map(col) :+ col(rightTs).as("__ts") :+ col(payloadCol).as("__p"): _*)
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol, last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__ts", "__side", "__p")
  }

  /** Bounded range-join count: for each left row, the number of right
    * rows with the same key and right ts in [left ts − windowNs,
    * left ts). The scale path buckets both sides by windowNs and
    * expands each right row into its own and the next bucket — the
    * equi-join then covers exactly the candidate range, turning an
    * inequality join into a hash join + residual filter.
    */
  def rangeCount(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, windowNs: Long,
      leftId: String, outCol: String): DataFrame = {
    val lb = left.withColumn("__b", expr(s"$leftTs div $windowNs"))
    val rb = right
      .select(keys.map(col) :+ col(rightTs).as("__rts"): _*)
      .withColumn("__b0", expr(s"__rts div $windowNs"))
      .withColumn("__b", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val cnt = lb.join(rb, keys :+ "__b")
      .filter(col("__rts") < col(leftTs) && col("__rts") >= col(leftTs) - windowNs)
      .groupBy(col(leftId))
      .agg(count(lit(1)).as(outCol))
    left.join(cnt, Seq(leftId), "left")
      .withColumn(outCol, coalesce(col(outCol), lit(0L)))
  }
}
