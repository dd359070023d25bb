package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._

/** The reference's full 3-stage pipeline (App.java:39-156), wired
  * end-to-end on Spark. One job per stage instead of five MapReduce
  * jobs; no HDFS round-trips between stages — DataFrames flow in
  * memory, with Parquet at the outer boundaries (the environment ships
  * no spark-avro module; the reference's Avro container I/O maps to
  * `format("avro")` where that module is on the classpath).
  */
object Stages {

  /** Stage 1 — extract/transform (SURVEY §3.1; JobExtractTransform +
    * Mapper/ReducerExtractTransform): JSON-lines reviews → header-line
    * filter → field-presence predicate → tokenize/stopword/dictionary →
    * global sort by asin → sequential ids 1..N.
    *
    * Returned frame has the ReviewBook shape: (id, reviewerID, asin,
    * reviewerName, adjectiveWord, reviewText).
    */
  def stage1(
      spark: SparkSession, inputJsonl: String,
      stopwords: Seq[String], dict: Seq[String],
      parityIds: Boolean = false): DataFrame = {
    val raw = spark.read.text(inputJsonl)
      // header guard (MapperExtractTransform.java:66) — applied to the raw
      // line, pre-parse, exactly as the reference
      .filter(!col("value").contains("review/text"))
    val reviewSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "reviewerID STRING, asin STRING, reviewerName STRING, reviewText STRING")
    val parsed = raw.select(from_json(col("value"), reviewSchema).as("r"))
      .select(col("r.*"))
      // field-presence predicate (MapperExtractTransform.java:69-72)
      .filter(Seq("reviewText", "reviewerID", "asin", "reviewerName")
        .map(col(_).isNotNull).reduce(_ && _))
      .withColumn("adjectiveWord",
        TextOps.tokenizeFiltered(col("reviewText"), stopwords, dict))
    // total order by asin + renumber (SURVEY §2.6 O1-O2). Default is the
    // scale-safe path (range-repartition + per-partition offsets — no
    // single-partition stage); parityIds=true keeps the reference's
    // literal single-reducer window (ReducerExtractTransform.java:34-48)
    // for bit-level plan parity. Both produce the identical id→asin map
    // (PipelineSpec asserts it).
    val withId =
      if (parityIds)
        parsed.withColumn("id", row_number().over(Window.orderBy("asin")).cast("long"))
      else IdOps.sequentialIdsAtScale(parsed, Seq("asin"), "id")
    withId.select(col("id"), col("reviewerID"), col("asin"), col("reviewerName"),
      col("adjectiveWord"), col("reviewText"))
  }

  /** Stage-2 output bundle: the dense TF-IDF matrix in exploded form,
    * the IDF model, and the k seeded initial centroids (side-output
    * analog of ReducerExtractFeatureTFIDF.java:85-88).
    */
  final case class Stage2Out(tfidf: DataFrame, idf: DataFrame,
      centroids: Array[(Long, Array[Double])], vocab: Seq[String])

  /** Stage 2 — feature extraction (SURVEY §3.2; JobExtractFeature):
    * document frequency → smoothed IDF over the dictionary vocabulary
    * (words never seen get the df=0 smoothing ln(N+1)+1,
    * MapperExtractFeatureTFIDF.java:80-84) → dense L2-normalized TF-IDF
    * (round 6) → seeded random k docs become centroids 0..k-1.
    */
  def stage2(stage1Out: DataFrame, dict: Seq[String], k: Int, seed: Long): Stage2Out = {
    val spark = stage1Out.sparkSession
    import spark.implicits._
    val docs = stage1Out.select(col("id"), col("adjectiveWord").as("toks"))
    val n = docs.count()
    // IDF over the *dictionary* vocabulary, not just observed words
    val observed = Tfidf.withIdf(Tfidf.docFreq(docs, "id", "toks"), n)
    val idf = dict.toDF("word")
      .join(observed, Seq("word"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("idf", coalesce(col("idf"), lit(math.log(n + 1.0) + 1.0)))
    val tfidf = Tfidf.tfidfVectors(docs, "id", "toks", idf, scale = 6, dense = true)
    // centroid side-output: k seeded docs, re-keyed 0..k-1
    val sampled = IdOps.sampleK(tfidf.select(col("id")).distinct(), k, seed, "cidx")
    val vocab = dict.sorted
    val centroidRows = tfidf.join(sampled, Seq("id"))
      .groupBy(col("cidx"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("weight")))).as("m"))
      .collect()
      .map { r =>
        val m = r.getMap[String, Double](1)
        r.getInt(0).toLong -> vocab.map(w => m.getOrElse(w, 0.0)).toArray
      }
    Stage2Out(tfidf, idf, centroidRows, vocab)
  }

  /** Stage 3 — K-Means (SURVEY §3.3; JobClustering): Lloyd loop from
    * the stage-2 centroids over the dense TF-IDF vectors (as arrays in
    * vocab order), converging on exact round-10 equality.
    */
  def stage3(s2: Stage2Out, maxIter: Int): KMeansOps.KMeansResult = {
    val asArray = s2.tfidf
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("word"), col("weight")))).as("wv"))
      .select(col("id"), transform(col("wv"), _.getField("weight")).as("v"))
    KMeansOps.lloydInit(asArray, "id", "v", s2.centroids, maxIter)
  }
}
