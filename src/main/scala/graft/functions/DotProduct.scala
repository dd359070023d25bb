package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense dot product of two `array<double>` columns — the innermost
  * kernel of every similarity operator (brute top-k, IVF rank, LSH
  * verify, blocked all-pairs).
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * allocates an intermediate array per pair and evaluates two lambda
  * HOFs per element OUTSIDE whole-stage codegen (interpreted); on a
  * 580k-candidate verify step that is seconds of lambda dispatch for
  * ~40M flops. This expression is the same sequential left-to-right
  * IEEE summation (bit-identical results, so DuckDB-oracle parity is
  * unaffected) as one fused codegen loop.
  *
  * Both inputs must be the same length in practice (same embedding
  * dim); if not, the extra tail elements are ignored (the HOF form
  * would return null — a mismatch never occurs after a proper
  * `asDouble` projection, and ignoring the tail fails soft).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product requires two array<double> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // NULL on length mismatch or a null element — exactly the HOF
  // formulation's semantics (zip_with null-pads the shorter side and a
  // null element poisons the whole fold), which is what makes
  // plans.DotProductRewrite semantics-preserving for ANY array<double>
  // input. The per-element null test is emitted only when the child
  // type admits nulls, so the tight loop survives on non-null arrays.
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            $s += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) {
            ${ev.value} = $s;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API handle. */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      DotProduct(org.apache.spark.sql.GraftSqlBridge.toExpression(a),
        org.apache.spark.sql.GraftSqlBridge.toExpression(b)))
}
