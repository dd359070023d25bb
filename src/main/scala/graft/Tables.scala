package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, see TESTDATA.md).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` normalized to expose BOTH a proper microsecond
    * TimestampType `ts` and a nanosecond-epoch LongType `ts_ns`,
    * regardless of testdata vintage:
    *  - `ts` stored as TIMESTAMP (micros): pass through, derive
    *    `ts_ns = unix_micros(ts) * 1000`.
    *  - `ts` stored as TIMESTAMP(NANOS) read as BIGINT (via
    *    spark.sql.legacy.parquet.nanosAsLong): it IS `ts_ns`; derive
    *    `ts = timestamp_micros(ts_ns / 1000)`.
    * All downstream integer arithmetic (sessionize gaps, range joins)
    * uses `ts_ns`; event-time windows use `ts`.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
      case TimestampType =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // NTZ wall-clock → session-TZ instant (all graft sessions run UTC).
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }
  }
}
