package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership primitives for benchmark decontamination at
  * corpus scale.
  *
  * The exact decontamination path ([[graft.ops.Dedup.contaminationHits]])
  * broadcasts the benchmark gram set; at 100 TB an eval suite of 10M
  * distinct grams is a multi-hundred-MB broadcast hash set per executor.
  * A Bloom filter probes the same membership question in m/8 bytes
  * (16 MB at m=2²⁷ for ~1% fpp on 10M grams), trading a deterministic,
  * quantifiable false-positive rate — harmless for decontamination,
  * where a false positive merely drops one extra training doc.
  *
  * Probing uses Kirsch–Mitzenmacher double hashing: bit_i(g) =
  * (h1 + i·h2) mod m for i in 0..k-1 — only two base hashes per gram
  * regardless of k (Kirsch & Mitzenmacher, "Less Hashing, Same
  * Performance", ESA'06). The expression takes h1/h2 as ordinary LONG
  * child columns, so the caller picks the hash family: md5-derived
  * lanes for the cross-engine-oracled witness (DuckDB reproduces the
  * filter bit-for-bit), xxhash64(g, seed1/seed2) for the scale path.
  *
  * The bit array rides into codegen as a plan reference object — it
  * ships to executors with the serialized stage, like a Literal. For a
  * filter too large for the plan (≳100 MB), wrap it in a Spark
  * broadcast instead; at that size you are past eval-set shapes anyway.
  */
case class BloomMightContain(
    left: Expression, right: Expression,
    bits: Array[Long], k: Int, mBits: Int)
    extends BinaryExpression {
  require(k >= 1 && mBits >= 6 && mBits <= 31,
    "bloom_might_contain: need k >= 1 and 6 <= mBits <= 31")
  require(bits.length == (1 << (mBits - 6)),
    s"bloom_might_contain: bits must hold 2^$mBits bits")

  private val m: Long = 1L << mBits

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires two bigint hash arguments, got $l and $r")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val h1 = a.asInstanceOf[Long]
    val h2 = b.asInstanceOf[Long]
    var i = 0
    var ok = true
    while (ok && i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      ok = (bits((pos >> 6).toInt) & (1L << (pos & 63))) != 0L
      i += 1
    }
    ok
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val arr = ctx.addReferenceObj("bloomBits", bits, "long[]")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val ok = ctx.freshName("ok")
      s"""
        boolean $ok = true;
        for (int $i = 0; $ok && $i < $k; $i++) {
          long $pos = java.lang.Math.floorMod($a + $i * $b, ${m}L);
          $ok = ($arr[(int) ($pos >> 6)] & (1L << ($pos & 63))) != 0L;
        }
        ${ev.value} = $ok;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Distributed Bloom-bitset build: each partition ORs gram probes into
  * a local m-bit buffer, partial buffers OR together — a standard
  * partial-aggregation plan, no shuffle of the gram rows themselves
  * (only k·words longs per partition move). Input rows are (h1, h2)
  * base-hash pairs, matching [[BloomMightContain]]'s probe family.
  */
final class BloomBitsAgg(k: Int, mBits: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  private val m: Long = 1L << mBits
  private val words: Int = 1 << (mBits - 6)

  def zero: Array[Long] = new Array[Long](words)
  def reduce(buf: Array[Long], hs: (Long, Long)): Array[Long] = {
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(hs._1 + i * hs._2, m)
      buf((pos >> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] = LongArrayEnc
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] = LongArrayEnc
  private lazy val LongArrayEnc =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object Bloom {
  /** Column-API handle for the membership probe. */
  def bloom_might_contain(
      h1: Column, h2: Column, bits: Array[Long], k: Int, mBits: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      BloomMightContain(
        org.apache.spark.sql.GraftSqlBridge.toExpression(h1),
        org.apache.spark.sql.GraftSqlBridge.toExpression(h2),
        bits, k, mBits))

  /** Driver-side probe over a collected bitset — the same
    * Kirsch–Mitzenmacher loop as [[BloomMightContain]], for callers
    * (manifest file pruning) that hold the bits locally and test ONE
    * value, where planning a 1-row Spark job per probe would cost more
    * than the answer. */
  def mightContain(
      bits: Array[Long], k: Int, mBits: Int, h1: Long, h2: Long): Boolean = {
    val m = 1L << mBits
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      if ((bits((pos >> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
