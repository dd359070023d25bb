package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Kept-token projection for span scrubbing: given `toks`
  * (`array<string>`) and `starts` (`array<int>`, 1-based span starts),
  * return the tokens NOT covered by any k-token span `[s, s+k)` — the
  * kernel of [[graft.ops.Dedup.scrubHotSpans]] /
  * [[graft.ops.Dedup.scrubRepeatedSpans]].
  *
  * The HOF formulation `filter(toks, (t, p) -> !exists(starts, ...))`
  * evaluates two interpreted lambdas per token — O(n·m) dispatch
  * outside whole-stage codegen. This expression sorts the start list
  * once and sweeps tokens with a covered-until watermark: O(n + m log
  * m), one fused codegen loop, and the kept set is identical by
  * construction (coverage is a pure predicate of position), so the
  * DuckDB oracle parity of both scrub queries is unaffected.
  */
case class SpanCoverMask(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"span_cover_mask requires (array<string>, array<int>) and k >= 1, got ($l, $r, k=$k)")
    }
  // propagate the token array's element nullability — declaring
  // containsNull=false over a nullable-element child would let a null
  // token flow into an array Spark believes non-null (ADVICE r7)
  override def dataType: DataType = left.dataType match {
    case ArrayType(_, containsNull) => ArrayType(StringType, containsNull)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = "span_cover_mask"

  override def nullSafeEval(t: Any, s: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val starts = s.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = starts.numElements()
    val ss = new Array[Int](m)
    var j = 0
    while (j < m) { ss(j) = starts.getInt(j); j += 1 }
    java.util.Arrays.sort(ss)
    val kept = new java.util.ArrayList[AnyRef](n)
    var coveredUntil = 0
    var p = 1
    j = 0
    while (p <= n) {
      while (j < m && ss(j) <= p) {
        val end = ss(j) + k - 1
        if (end > coveredUntil) coveredUntil = end
        j += 1
      }
      if (p > coveredUntil)
        kept.add(if (toks.isNullAt(p - 1)) null else toks.getUTF8String(p - 1))
      p += 1
    }
    new GenericArrayData(kept.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val ss = ctx.freshName("ss")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val end = ctx.freshName("end")
      val cov = ctx.freshName("cov")
      val kept = ctx.freshName("kept")
      s"""
        int $n = $t.numElements();
        int $m = $s.numElements();
        int[] $ss = new int[$m];
        for (int $j = 0; $j < $m; $j++) { $ss[$j] = $s.getInt($j); }
        java.util.Arrays.sort($ss);
        java.util.ArrayList<Object> $kept = new java.util.ArrayList<Object>($n);
        int $cov = 0;
        int $j = 0;
        for (int $p = 1; $p <= $n; $p++) {
          while ($j < $m && $ss[$j] <= $p) {
            int $end = $ss[$j] + ${k - 1};
            if ($end > $cov) $cov = $end;
            $j++;
          }
          if ($p > $cov)
            $kept.add($t.isNullAt($p - 1) ? null : (Object) $t.getUTF8String($p - 1));
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($kept.toArray());
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCoverMask =
    copy(left = newLeft, right = newRight)
}

object SpanCoverMask {
  /** Column-API handle: tokens of `toks` not covered by any k-span of `starts`. */
  def span_kept(toks: Column, starts: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      SpanCoverMask(org.apache.spark.sql.GraftSqlBridge.toExpression(toks),
        org.apache.spark.sql.GraftSqlBridge.toExpression(starts), k))
}
