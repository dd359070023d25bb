package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink helpers (SURVEY §2.1 S4-S5).
  *
  * The reference writes Snappy Avro containers everywhere
  * (JobExtractTransform.java:67-71); this environment ships no
  * spark-avro module, so Avro is routed through the generic writer and
  * the harness standardizes on Parquet (also Snappy). ORC/CSV/JSON come
  * free from the DataFrameWriter surface.
  */
object Sinks {

  /** Snappy-compressed columnar write, format ∈ {parquet, orc}. */
  def writeColumnar(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.write.mode("overwrite").format(format).option("compression", "snappy").save(path)

  /** Line-format write (csv with header, or json). */
  def writeLines(df: DataFrame, path: String, format: String = "csv"): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  /** Hive-style partitioned write: one directory per distinct value of
    * `partCols`. Downstream filters on those columns become partition
    * pruning (no data read at all for excluded values) — the coarse
    * analog of parquet row-group pushdown.
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*)
      .option("compression", "snappy").parquet(path)

  /** Bucketed table write: pre-hash-partitioned and sorted on the join
    * key, so equi-joins and aggregations on `bucketCols` plan with NO
    * shuffle on this side. Requires a table catalog (`saveAsTable`) —
    * buckets are metadata, plain files can't carry them.
    */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Side/branch output (SURVEY §2.1 S5): the reference's
    * AvroMultipleOutputs writes a filtered branch of one reduce pass to
    * a second file set (ReducerExtractFeatureTFIDF.java:85-88). Spark
    * has no multi-sink single-pass at the DataFrame level, so: persist
    * the parent once, run each branch write against the cached plan —
    * one upstream computation, n sink scans.
    */
  def writeBranches(df: DataFrame, branches: Seq[(DataFrame => DataFrame, String)]): Unit = {
    val cached = df.persist()
    try branches.foreach { case (f, path) => writeColumnar(f(cached), path) }
    finally cached.unpersist()
  }
}
