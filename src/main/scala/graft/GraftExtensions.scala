package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CharShingleHashes, DotProduct}

/** `spark.sql.extensions` entry point — registers the library's
  * SQL-callable custom expressions in every session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (the standard
  * cluster-wide deployment path, vs the per-session
  * `CharShingleHashes.register`). Only the scalar-argument expressions
  * are SQL-surfaced; `MinHashSigs`/`HyperplaneSigns` take array
  * parameters and are Column-API-only (`Dedup.minhashSigsCol`,
  * `HyperplaneSigns.hyperplane_signs`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => other.eval() match {
      case i: Int => i
      case v => throw new IllegalArgumentException(s"$what must be an int literal, got $v")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("char_shingle_hashes"),
      new ExpressionInfo(classOf[CharShingleHashes].getName, "char_shingle_hashes"),
      (exprs: Seq[Expression]) =>
        CharShingleHashes(exprs.head, intArg(exprs(1), "shingle size"))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
  }
}
