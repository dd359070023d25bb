package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregators for map-typed sparse vectors — the one optional
  * custom extension point SURVEY §2.10 declares: the reference's
  * element-wise vector sum (ReducerKMean.java:33-46, merging
  * `map<string,double>` values with `Double::sum`) exposed as a public
  * operator on the map representation.
  *
  * The exploded relation `(id, term, weight)` + groupBy/sum remains the
  * canonical scale path (SURVEY §7.4); these aggregators serve the
  * map-shaped boundary where callers keep reference-fidelity rows.
  * `Aggregator` (not TypedImperativeAggregate) is enough: buffers are
  * per-group maps, merge is associative, and Spark runs it with
  * partial aggregation map-side like any other agg.
  */
object VectorAgg {

  /** Element-wise sum of map-vectors: absent keys are zero. */
  val sumVectors: Aggregator[Map[String, Double], Map[String, Double], Map[String, Double]] =
    new Aggregator[Map[String, Double], Map[String, Double], Map[String, Double]] {
      def zero: Map[String, Double] = Map.empty
      def reduce(b: Map[String, Double], v: Map[String, Double]): Map[String, Double] =
        merge(b, v)
      def merge(a: Map[String, Double], b: Map[String, Double]): Map[String, Double] = {
        // fold the smaller into the larger — merge cost is O(min)
        val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
        small.foldLeft(big) { case (acc, (k, v)) =>
          acc.updated(k, acc.getOrElse(k, 0.0) + v)
        }
      }
      def finish(r: Map[String, Double]): Map[String, Double] = r
      def bufferEncoder: Encoder[Map[String, Double]] = ExpressionEncoderMap
      def outputEncoder: Encoder[Map[String, Double]] = ExpressionEncoderMap
    }

  private lazy val ExpressionEncoderMap: Encoder[Map[String, Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]()

  /** Column-API handle: `df.groupBy(...).agg(sum_vectors($"vec"))`. */
  lazy val sum_vectors = udaf(sumVectors)
}
