package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev harness: head-to-head timings for alternative formulations of
  * one operator (the inner loop for plan-choice decisions; not part of
  * the driver contract). Usage: runMain graft.MicroBench <sfDir>
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Bench.scratchDir())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TextOps
    def docsTokens = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextOps.tokenizeFiltered(col("text"), Dictionaries.Stopwords, Nil).as("toks"))
    def e3 = Dedup.shingleHashesViaArrays(docsTokens, "doc_id", "toks", k = 3)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    for (round <- 1 to 3) {
      println(s"-- round $round")
      time("direct")   { Dedup.jaccardPairsFromHashes(e3, 0.5, materialize = true).count() }
      time("prefix")   { Dedup.jaccardPairsPrefix(e3, 0.5).count() }
      time("bucketed") { Dedup.jaccardPairsBucketed(e3, 0.5).count() }
      time("cc_prefix")   { Dedup.dedupClusters(Dedup.jaccardPairsPrefix(e3, 0.5)).count() }
      time("cc_bucketed") { Dedup.dedupClusters(Dedup.jaccardPairsBucketed(e3, 0.5)).count() }
    }
    spark.stop()
  }
}
