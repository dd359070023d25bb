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

  /** `events` with its TIMESTAMP(NANOS) parquet column (read as long via
    * spark.sql.legacy.parquet.nanosAsLong — Spark has no nanosecond
    * timestamp type) exposed both raw (`ts_ns`) and truncated to a
    * proper microsecond TimestampType (`ts`).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }
}
