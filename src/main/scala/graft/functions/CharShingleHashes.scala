package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hashes of all byte-level k-shingles of a string —
  * the hot inner loop of character-level MinHash deduplication.
  *
  * This is the library's one custom Catalyst `Expression`, and the
  * justification is concrete: composing built-ins
  * (`transform(sequence(...), i -> xxhash64(substring(str, i, k)))`)
  * is O(n·k) with a string allocation per window and — worse — the
  * unaliased array-building tree gets re-evaluated through explode's
  * implicit filter (measured ~7× on the word-shingle pipeline, see
  * Dedup.shingleHashes). A rolling hash is O(n) with zero allocations
  * per window, and `doGenCode` keeps it inside whole-stage codegen.
  *
  * Hash: h(w) = Σ byte[j]·B^(k−1−j) mod 2⁶⁴ over UTF-8 bytes,
  * B = 1000003 (a prime with good avalanche for 64-bit wraparound);
  * rolled as h' = (h − byte_out·B^(k−1))·B + byte_in. Deterministic
  * across partitionings and sessions; strings shorter than k yield an
  * empty array.
  */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_shingle_hashes requires a string argument, got ${child.dataType}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  private val B: Long = 1000003L
  /** B^(k-1) mod 2^64, for removing the outgoing byte. */
  private val Bk1: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](n - k + 1)
      var h = 0L
      var i = 0
      while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
      out(0) = h
      i = k
      while (i < n) {
        h = (h - (bytes(i - k) & 0xffL) * Bk1) * B + (bytes(i) & 0xffL)
        out(i - k + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        byte[] $bytes = $c.getBytes();
        int $n = $bytes.length;
        if ($n < $k) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
        } else {
          long[] $out = new long[$n - $k + 1];
          long $h = 0L;
          int $i = 0;
          for (; $i < $k; $i++) { $h = $h * ${B}L + ($bytes[$i] & 0xffL); }
          $out[0] = $h;
          for ($i = $k; $i < $n; $i++) {
            $h = ($h - ($bytes[$i - $k] & 0xffL) * ${Bk1}L) * ${B}L + ($bytes[$i] & 0xffL);
            $out[$i - $k + 1] = $h;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

object CharShingleHashes {
  /** Column-API handle. */
  def char_shingle_hashes(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      CharShingleHashes(org.apache.spark.sql.GraftSqlBridge.toExpression(c), k))

  /** Register as a SQL function: `SELECT char_shingle_hashes(text, 5)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_shingle_hashes",
      exprs => CharShingleHashes(exprs.head, exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Int]
      }),
      "scala_udf")
}
