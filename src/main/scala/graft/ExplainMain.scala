package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan and wall time
  * of named SparkEntry queries. Usage:
  *   ExplainMain <sfDir> <queryName> [queryName...]
  * With no query names, times every query (two runs each, reporting the
  * warm one).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      val t0 = System.nanoTime(); df.count()
      val t1 = System.nanoTime(); df.count()
      val t2 = System.nanoTime()
      println(f"TIME $name cold=${(t1 - t0) / 1e9}%.2f warm=${(t2 - t1) / 1e9}%.2f")
    }
    spark.stop()
  }
}
