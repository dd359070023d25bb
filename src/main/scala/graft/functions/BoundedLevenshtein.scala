package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Levenshtein

/** Threshold-limited (Ukkonen-banded) Levenshtein with a PER-ROW bound.
  *
  * Spark ships the banded k-limited DP inside
  * `UTF8String.levenshteinDistance(other, threshold)` — the classic
  * O(k·min(L1,L2)) diagonal band with early exit — but the public
  * `functions.levenshtein(l, r, threshold: Int)` only accepts a
  * LITERAL bound, which is useless for near-dup verification where the
  * admissible distance scales with each pair's own length
  * (k = maxNed·max(L1,L2)). The catalyst expression underneath takes
  * an arbitrary `Expression` threshold evaluated per row (both in
  * `eval` and in codegen), so this helper is nothing but the missing
  * Column-level constructor: same operator the SQL function compiles
  * to, full whole-stage codegen, no UDF.
  *
  * Contract (Spark's): returns the exact distance when it is ≤ k,
  * and -1 when it exceeds k — callers filter `dist >= 0`.
  */
object BoundedLevenshtein {
  def apply(l: Column, r: Column, k: Column): Column =
    GraftSqlBridge.toColumn(Levenshtein(
      GraftSqlBridge.toExpression(l),
      GraftSqlBridge.toExpression(r),
      Some(GraftSqlBridge.toExpression(k.cast("int")))))
}
