package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** LSH band hashes of a MinHash signature in one fused pass: the
  * signature is split into `bands` equal bands of `len/bands` values
  * and each band is reduced to one 64-bit bucket key by chaining
  * Spark's XXH64 — `h = hashLong(band, seed)` then
  * `h = hashLong(sig[i], h)` over the band's values, exactly the
  * seed-chaining scheme of the built-in `xxhash64(c1, c2, …)`.
  *
  * The composed formulation (`transform(sequence(...), b =>
  * xxhash64(b, concat_ws("_", transform(slice(sig, ...),
  * cast-to-string))))`) evaluates three interpreted lambda HOFs and
  * builds `bands` strings per row — measured ~6× slower than codegen
  * on this corpus's LSH stage. Banding only needs SOME well-mixed
  * 64-bit key per band; the two formulations bucket identically up to
  * 64-bit collisions.
  *
  * Null/too-short handling: a signature shorter than `bands` has
  * band length 0 — every doc would share one degenerate bucket (the
  * composed form hashes an empty string with the same pathology) —
  * so it yields null; filter nulls before banding. Trailing elements
  * beyond `bands·(len/bands)` are ignored, matching the slice form.
  */
case class BandHashes(child: Expression, bands: Int, seed: Long)
    extends UnaryExpression {

  require(bands > 0, "bands must be positive")

  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_hashes requires array<long>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val len = sig.numElements() / bands
    if (len == 0) null
    else {
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = XXH64.hashLong(b.toLong, seed)
        var i = b * len
        val end = i + len
        while (i < end) { h = XXH64.hashLong(sig.getLong(i), h); i += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      s"""
        int $len = $c.numElements() / $bands;
        if ($len == 0) {
          ${ev.isNull} = true;
        } else {
          long[] $out = new long[$bands];
          for (int $b = 0; $b < $bands; $b++) {
            long $h = $xxh.hashLong((long) $b, ${seed}L);
            int $end = ($b + 1) * $len;
            for (int $i = $b * $len; $i < $end; $i++) {
              $h = $xxh.hashLong($c.getLong($i), $h);
            }
            $out[$b] = $h;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  /** Column-API handle. */
  def band_hashes(sig: Column, bands: Int, seed: Long = 42L): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      BandHashes(org.apache.spark.sql.GraftSqlBridge.toExpression(sig), bands, seed))
}
