package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDNA ToASCII normalization of a hostname — unicode labels become
  * their punycode (`xn--`) form so they hit the ASCII-normalized
  * Public Suffix List probes and URL dedup keys (VERDICT r13 #5:
  * unicode hosts previously missed every suffix probe).
  *
  * Semantics, per dot-separated label via the pure-JVM
  * `java.net.IDN.toASCII` (RFC 3490 ToASCII with ALLOW_UNASSIGNED —
  * the lenient registry profile):
  *   - an all-ASCII label is returned UNCHANGED (already-punycode
  *     `xn--` labels included) — the fast path that makes this a
  *     bitwise no-op on ASCII corpora, which is what keeps the
  *     DuckDB-oracled URL queries engine-portable;
  *   - a label IDN rejects (malformed, overlong) falls back to itself
  *     lowercased — fail-soft, no task deaths on crawl garbage;
  *   - null in, null out; the codegen path is one static call, so the
  *     expression stays inside whole-stage codegen.
  *
  * Callers hand in an already-lowercased host ([[graft.ops.TextOps.urlHost]]
  * lowercases first); IDN's nameprep lowercases the unicode side
  * consistently.
  */
case class IdnAscii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"idn_ascii requires a string argument, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_ascii"

  override def nullSafeEval(input: Any): Any =
    IdnAscii.toAsciiHost(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.IdnAscii$$.MODULE$$.toAsciiHost($c)")

  override protected def withNewChildInternal(newChild: Expression): IdnAscii =
    copy(child = newChild)
}

object IdnAscii {

  /** Column-API handle. */
  def idn_ascii(host: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      IdnAscii(org.apache.spark.sql.GraftSqlBridge.toExpression(host)))

  /** UTF8String entry point for eval + codegen: the ASCII fast path
    * short-circuits on the raw bytes with zero allocation. */
  def toAsciiHost(host: UTF8String): UTF8String = {
    val n = host.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((host.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) host
    else UTF8String.fromString(toAsciiHostString(host.toString))
  }

  /** String form, shared with driver-side rule parsing
    * ([[graft.ops.TextOps.parsePsl]] normalizes the PSL's 466 unicode
    * rules through the SAME function, so rules and hosts meet in one
    * canonical ASCII space). */
  def toAsciiHostString(host: String): String = {
    if (host.forall(_ < 0x80)) host
    else host.split("\\.", -1).map { label =>
      if (label.forall(_ < 0x80)) label
      else
        try java.net.IDN.toASCII(label, java.net.IDN.ALLOW_UNASSIGNED)
          .toLowerCase(java.util.Locale.ROOT)
        catch { case _: IllegalArgumentException =>
          label.toLowerCase(java.util.Locale.ROOT)
        }
    }.mkString(".")
  }
}
