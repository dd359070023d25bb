package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as per-partition batch
  * stubs.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration
  * shape) is real and tested; the actual media decode is STUBBED with
  * a deterministic fake — image/audio codecs are not available in this
  * environment. A production deployment swaps [[decodeStub]]'s body
  * for a real codec (or a pandas/Arrow UDF on PySpark) without
  * touching any plan shape.
  */
object Multimodal {

  /** Canonical multimodal record layout (nullability as Spark derives it
    * for computed columns — advisory only).
    */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = true),
      StructField("sha256", StringType, nullable = true),
      StructField("source", StringType, nullable = true))), nullable = false)))

  /** Wrap any (id, string payload) table into the canonical media
    * layout — the text bytes stand in for an encoded image/audio blob.
    * Metadata (length, content hash) is computed with codegen'd
    * expressions, not the stub.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("text").as("modality"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        length(col(textCol)).cast(LongType).as("byte_len"),
        sha2(col(textCol).cast(BinaryType), 256).as("sha256"),
        col(sourceCol).as("source")).as("meta"))

  /** STUB decode: deterministic fake "features" from the payload bytes
    * (dim strided byte averages, scaled to [0,1]). Signature, schema and
    * per-partition batch iteration match a real decoder; only the body
    * is fake. Runs as mapPartitions — one batch per partition, no
    * per-row task overhead, mirroring an Arrow-batch UDF.
    */
  def decodeStub(media: DataFrame, dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { batch =>
      batch.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val feats = Array.tabulate(dim) { d =>
          if (bytes.isEmpty) 0.0
          else {
            var s = 0L; var i = d
            while (i < bytes.length) { s += (bytes(i) & 0xff); i += dim }
            val n = (bytes.length - d + dim - 1) / dim
            if (n == 0) 0.0 else (s.toDouble / n) / 255.0
          }
        }
        Row(id, feats)
      }
    }(enc)
  }

  /** Frame sampling plumbing for video-like payloads: split the payload
    * into fixed-size "frames" and keep every `stride`-th — pure
    * expressions (substring on binary), no stub needed.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast(IntegerType)
    media.select(col("media_id"), col("payload"), nFrames.as("n_frames"))
      .select(col("media_id"), col("n_frames"),
        posexplode(transform(
          filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0),
          i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
  }
}
