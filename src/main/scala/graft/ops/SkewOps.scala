package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase salted
  * aggregation. A key receiving 1e9 rows melts one reducer; salting
  * splits it across `salt` sub-keys for the expensive first shuffle,
  * then combines the (keys × salt)-sized partials — the second shuffle
  * is tiny by construction.
  *
  * Only algebraic aggregates decompose this way (sum, count, min, max —
  * avg as sum/count). Spark's own partial aggregation already handles
  * skew *within* a partition; salting handles skew *across* the shuffle
  * — the case AQE's skew-join handling does not cover for aggregations.
  */
object SkewOps {

  /** One aggregate spec: function ∈ {sum, count, min, max}, input
    * column, output alias.
    */
  final case class AggSpec(fn: String, in: String, out: String)

  private def phase1(a: AggSpec): Column = a.fn match {
    case "sum"   => sum(col(a.in)).as(a.out)
    case "count" => count(lit(1)).as(a.out)
    case "min"   => min(col(a.in)).as(a.out)
    case "max"   => max(col(a.in)).as(a.out)
    case other   => throw new IllegalArgumentException(s"non-algebraic agg: $other")
  }

  private def phase2(a: AggSpec): Column = a.fn match {
    case "sum" | "count" => sum(col(a.out)).as(a.out)
    case "min"           => min(col(a.out)).as(a.out)
    case "max"           => max(col(a.out)).as(a.out)
    case other           => throw new IllegalArgumentException(s"non-algebraic agg: $other")
  }

  /** groupBy(keys).agg(aggs) computed via a salted first phase. Results
    * are identical to the direct aggregation for the supported
    * functions (floating-point sums may differ in association order —
    * round outputs, as everywhere in the oracle discipline).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[AggSpec],
      salt: Int = 16, seed: Long = 42L): DataFrame = {
    require(salt > 0)
    val specs1 = aggs.map(phase1)
    val specs2 = aggs.map(phase2)
    df.withColumn("__salt", (rand(seed) * salt).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(specs1.head, specs1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(specs2.head, specs2.tail: _*)
  }

  /** Skew-safe inner equi-join: the large (skewed) left side gets a
    * uniform random salt, the right side is replicated once per salt
    * value, and the join key becomes (keys…, salt) — each hot key's
    * rows spread over `salt` reducers instead of melting one. The
    * output row set is identical to the plain equi-join (the salt only
    * routes rows). Use when the right side is too big to broadcast but
    * cheap to replicate salt× (the 100 MB–10 GB dim-table band), or
    * when a known-hot key must not serialize one task; AQE's skew-join
    * split covers many cases at runtime — salting is the static
    * guarantee.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int = 16, seed: Long = 42L): DataFrame = {
    require(salt > 0)
    val l = left.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** The adaptive complement of [[saltedJoin]]: a plain sort-merge
    * equi-join that leaves hot keys to AQE's runtime skew split
    * (`spark.sql.adaptive.skewJoin.*`, on by default) — no salt column,
    * no right-side replication, no row-set change. The `merge` hint
    * pins the sort-merge strategy AQE's skew handling applies to.
    *
    * Trade-off vs salting: AQE splits a skewed partition only after
    * observing real map-output sizes, handles skew it could not have
    * predicted, and costs nothing when data turns out uniform; but it
    * will not split when the split would introduce an extra shuffle
    * for a downstream stage (set
    * `spark.sql.adaptive.forceOptimizeSkewedJoin=true` for join→agg
    * pipelines), and it cannot help a skewed *aggregation* — that is
    * [[saltedAgg]]'s territory. Static salting remains the guarantee
    * for a known-pathological key.
    */
  def aqeSkewJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.hint("merge").join(right, keys)
}
