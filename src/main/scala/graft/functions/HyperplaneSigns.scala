package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH band hashes of a dense double vector — the hot
  * inner loop of cosine near-dup blocking (Similarity.cosinePairsLsh).
  *
  * Composing built-ins costs bands·bits interpreted
  * `aggregate(zip_with(u, plane, _*_))` higher-order-function
  * evaluations per row (lambda HOFs do not participate in whole-stage
  * codegen) — measured as the dominant cost of the LSH query. Here all
  * bands·bits·dim multiply-adds run as one fused primitive loop inside
  * codegen, with the plane matrix attached once per task as a reference
  * object rather than a per-row literal.
  *
  * Output: `array<long>` of length `bands`; element b packs
  * `bits` sign bits — bit j set iff dot(u, plane[b·bits+j]) ≥ 0,
  * identical IEEE evaluation order (sequential over dims) to the
  * zip_with formulation it replaces.
  */
case class HyperplaneSigns(
    child: Expression, planes: Seq[Double], bands: Int, bits: Int)
    extends UnaryExpression {

  require(bands >= 1 && bits >= 1 && bits <= 64,
    s"need 1 <= bits <= 64 and bands >= 1, got bands=$bands bits=$bits")
  require(planes.length % (bands * bits) == 0,
    s"plane matrix size ${planes.length} is not bands*bits*dim")

  @transient private lazy val planesArr: Array[Double] = planes.toArray
  private def dim: Int = planes.length / (bands * bits)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signs requires array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_signs"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    val d = math.min(dim, u.numElements())
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bh = 0L
      var j = 0
      while (j < bits) {
        val off = (b * bits + j) * dim
        var s = 0.0
        var k = 0
        while (k < d) { s += u.getDouble(k) * planesArr(off + k); k += 1 }
        if (s >= 0) bh |= (1L << j)
        j += 1
      }
      out(b) = bh
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val bh = ctx.freshName("bh")
      s"""
        int $d = java.lang.Math.min($dim, $c.numElements());
        long[] $out = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $bh = 0L;
          for (int $j = 0; $j < $bits; $j++) {
            int $off = ($b * $bits + $j) * $dim;
            double $s = 0.0;
            for (int $k = 0; $k < $d; $k++) {
              $s += $c.getDouble($k) * $planesRef[$off + $k];
            }
            if ($s >= 0) $bh |= (1L << $j);
          }
          $out[$b] = $bh;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigns =
    copy(child = newChild)
}

object HyperplaneSigns {
  /** Column-API handle. */
  def hyperplane_signs(c: Column, planes: Seq[Double], bands: Int, bits: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      HyperplaneSigns(org.apache.spark.sql.GraftSqlBridge.toExpression(c),
        planes, bands, bits))
}
