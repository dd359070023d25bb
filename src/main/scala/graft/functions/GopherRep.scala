package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All five Gopher repetition fractions (Rae et al. arXiv:2112.11446
  * Table A1) in ONE compiled pass over the token array — the fused
  * replacement for [[graft.ops.TextStats.gopherRepetition]]'s
  * higher-order-function cascade.
  *
  * Why an expression: `transform`/`filter`/`aggregate` are
  * interpreted lambda dispatch per ELEMENT (no whole-stage codegen),
  * and the HOF formulation needed O(d·g) occurrence counting plus an
  * O(g²) duplicate-position scan per (row, n) — the r17 bench
  * measured the query at 5.2 s warm at sf0.1 with two localCheckpoint
  * barriers just to stop Catalyst re-inlining the gram arrays into
  * every inner lambda. Here each row is one virtual call that builds
  * the n-gram counts with a hash map: O(Σ_n g·n) work, no barriers,
  * no lambda dispatch, and the surrounding projection stays inside
  * whole-stage codegen.
  *
  * Semantics are IDENTICAL to the HOF form for null-free token
  * arrays (the tokenize() contract; unit-tested closed forms + the
  * unchanged DuckDB oracle gate the parity):
  *  - gram = tokens joined by a single space (concat_ws semantics);
  *  - `top{n}_frac` = maxCount × (token chars of the most frequent
  *    n-gram) / total token chars, ties to the BINARY-smallest gram
  *    (UTF8String byte order — exactly Spark's array_min on strings);
  *  - `dup{n}_frac` = fraction of token chars covered by any n-gram
  *    occurring ≥ 2×, each char counted once (coveredUntil sweep, the
  *    [[SpanCoverMask]] kernel);
  *  - nt < n or zero total chars → 0.0 for that column.
  * A null token array yields a null struct (the HOF form yields null
  * fracs through null-total arithmetic; no gated path produces null
  * tokens). Char accounting is over TOKEN characters — `numChars`,
  * like Spark's `length`.
  */
case class GopherRep(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {

  require(topNs.nonEmpty || dupNs.nonEmpty, "need at least one n")
  require((topNs ++ dupNs).forall(_ >= 1), "n must be >= 1")

  @transient private lazy val allNs: Array[Int] = (topNs ++ dupNs).distinct.toArray

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_rep requires array<string>, got $other")
  }
  override def dataType: DataType = StructType(
    topNs.map(n => StructField(s"top${n}_frac", DoubleType, nullable = false)) ++
      dupNs.map(n => StructField(s"dup${n}_frac", DoubleType, nullable = false)))
  override def prettyName: String = "gopher_rep"

  /** One row's fractions; `toks` non-null (nullSafeEval contract). */
  private[functions] def compute(toksData: ArrayData): InternalRow = {
    val nt = toksData.numElements()
    val toks = new Array[UTF8String](nt)
    var totalChars = 0L
    var i = 0
    while (i < nt) {
      // null tokens: impossible through tokenize(); treat as empty so
      // the sweep stays total (the HOF form would null the row out)
      val t = if (toksData.isNullAt(i)) UTF8String.EMPTY_UTF8
              else toksData.getUTF8String(i)
      toks(i) = t
      totalChars += t.numChars()
      i += 1
    }
    val topOut = new Array[Double](topNs.length)
    val dupOut = new Array[Double](dupNs.length)
    if (totalChars > 0L) {
      val sep = UTF8String.fromString(" ")
      var k = 0
      while (k < allNs.length) {
        val n = allNs(k)
        val g = nt - n + 1
        if (g >= 1) {
          // grams + occurrence counts in one pass
          val grams = new Array[UTF8String](g)
          val counts = new java.util.HashMap[UTF8String, Array[Int]](g * 2)
          var s = 0
          while (s < g) {
            val parts = new Array[UTF8String](n)
            var j = 0
            while (j < n) { parts(j) = toks(s + j); j += 1 }
            val gram = UTF8String.concatWs(sep, parts: _*)
            grams(s) = gram
            val c = counts.get(gram)
            if (c == null) counts.put(gram, Array(1)) else c(0) += 1
            s += 1
          }
          val ti = topNs.indexOf(n)
          if (ti >= 0) {
            // max count, ties to the binary-smallest gram
            var maxC = 0
            var topW: UTF8String = null
            val it = counts.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val c = e.getValue()(0)
              if (c > maxC || (c == maxC && e.getKey.compareTo(topW) < 0)) {
                maxC = c; topW = e.getKey
              }
            }
            // token chars of the gram = joined chars − (n−1) separators
            val tokChars = topW.numChars().toLong - (n - 1)
            topOut(ti) = maxC.toLong * tokChars / totalChars.toDouble
          }
          val di = dupNs.indexOf(n)
          if (di >= 0) {
            // chars NOT covered by any ≥2×-occurring n-gram window —
            // the SpanCoverMask coveredUntil sweep (starts are already
            // in ascending order here)
            var keptChars = 0L
            var coveredUntil = 0 // 1-based inclusive
            var p = 0
            while (p < nt) {
              if (p < g && counts.get(grams(p))(0) >= 2) {
                val end = p + n // 1-based inclusive end of span [p+1, p+n]
                if (end > coveredUntil) coveredUntil = end
              }
              if (p + 1 > coveredUntil) keptChars += toks(p).numChars()
              p += 1
            }
            dupOut(di) = (totalChars - keptChars) / totalChars.toDouble
          }
        }
        k += 1
      }
    }
    val out = new Array[Any](topNs.length + dupNs.length)
    var o = 0
    while (o < topOut.length) { out(o) = topOut(o); o += 1 }
    var d = 0
    while (d < dupOut.length) { out(topOut.length + d) = dupOut(d); d += 1 }
    new GenericInternalRow(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into compute() — the row does real
    // O(Σ g·n) work, so the call overhead is noise, and the reference
    // object keeps the surrounding projection in whole-stage codegen
    val ref = ctx.addReferenceObj("gopherRep", this,
      classOf[GopherRep].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRep =
    copy(child = newChild)
}

object GopherRep {
  def gopher_rep(toks: Column, topNs: Seq[Int], dupNs: Seq[Int]): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(GopherRep(
      org.apache.spark.sql.GraftSqlBridge.toExpression(toks), topNs, dupNs))
}
