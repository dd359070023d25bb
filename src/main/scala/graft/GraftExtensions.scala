package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.functions._

/** SQL front door for the graft codegen kernels, wired through the
  * standard `SparkSessionExtensions` mechanism — the library is usable
  * from pure SQL, not just the Column API:
  *
  *   - static conf: `spark.sql.extensions=graft.GraftExtensions`
  *     (cluster-wide; extensions is a STATIC conf, set before the
  *     first session is built)
  *   - programmatic: `SparkSession.builder().withExtensions(new
  *     GraftExtensions)`
  *   - live session: `GraftExtensions.registerAll(spark)` injects the
  *     same builders into an already-running session's registry
  *     (temp-function scope)
  *
  * Scalar/array parameters that configure a kernel (hash coefficients,
  * plane matrices, bloom bitsets) are passed as SQL literals —
  * `minhash_sigs(hs, array(3L, 7L), array(1L, 5L), 2147483647L)` —
  * and folded at plan time; the kernels themselves stay whole-stage
  * codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // textbook aggregate(zip_with(..)) dot products → the codegen kernel
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}

object GraftExtensions {

  private def lit(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal, got $e")
    e.eval()
  }
  private def litInt(e: Expression): Int = lit(e, "int parameter") match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected INT, got $other")
  }
  private def litLong(e: Expression): Long = lit(e, "long parameter") match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(s"expected BIGINT, got $other")
  }
  private def litLongs(e: Expression): Array[Long] =
    lit(e, "array<long> parameter").asInstanceOf[ArrayData].toLongArray()
  private def litDoubles(e: Expression): Array[Double] =
    lit(e, "array<double> parameter").asInstanceOf[ArrayData].toDoubleArray()
  private def litVecs(e: Expression): Array[Array[Double]] =
    lit(e, "array<array<double>> parameter").asInstanceOf[ArrayData]
      .toObjectArray(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
      .map(_.asInstanceOf[ArrayData].toDoubleArray())

  /** Every kernel by SQL name. Builders coerce trailing literal
    * parameters at resolution time.
    */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" ->
      ((es: Seq[Expression]) => DotProduct(es(0), es(1))),
    "char_shingle_hashes" ->
      ((es: Seq[Expression]) => CharShingleHashes(es(0), litInt(es(1)))),
    "span_cover_mask" ->
      ((es: Seq[Expression]) => SpanCoverMask(es(0), es(1), litInt(es(2)))),
    "band_hashes" ->
      ((es: Seq[Expression]) => BandHashes(es(0), litInt(es(1)), litLong(es(2)))),
    "minhash_sigs" ->
      ((es: Seq[Expression]) => MinHashSigs(es(0),
        litLongs(es(1)).toSeq, litLongs(es(2)).toSeq, litLong(es(3)))),
    "hyperplane_signs" ->
      ((es: Seq[Expression]) => HyperplaneSigns(es(0),
        litDoubles(es(1)).toSeq, litInt(es(2)), litInt(es(3)))),
    "bloom_might_contain" ->
      ((es: Seq[Expression]) => BloomMightContain(es(0), es(1),
        litLongs(es(2)), litInt(es(3)), litInt(es(4)))),
    "nearest_centroid" ->
      ((es: Seq[Expression]) => NearestCentroid(es(0),
        litLongs(es(1)), litVecs(es(2)))))

  /** Inject every kernel into a LIVE session's function registry
    * (temp-function scope — the dynamic twin of the static-conf path).
    */
  def registerAll(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    // the live-session twin of injectOptimizerRule
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DotProductRewrite
  }
}
