package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding
  * columns (`array<float>` → cast to `array<double>`). Beyond-reference
  * surface (SURVEY §7.2 M6 north star).
  *
  * Scale design: brute force is the oracle baseline — O(|Q|·|C|·dim)
  * with the query side broadcast. The scale path is IVF: cluster the
  * corpus once with [[KMeansOps]] (cells ≈ √N), then search only the
  * `nprobe` nearest cells per query — a broadcast-join pruned
  * cross join, ~nprobe/cells of the brute cost, recall tunable via
  * nprobe. All expressions are codegen'd zip_with/aggregate — no UDFs.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b) / (l2norm(a) * l2norm(b))
    when(l2norm(a) === 0 || l2norm(b) === 0, lit(0.0)).otherwise(d)
  }

  /** Pre-normalize vectors so downstream cosine = plain dot product —
    * normalize once, not once per pair.
    */
  def withUnitVec(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val n = l2norm(col(vecCol))
    df.withColumn(outCol,
      when(n === 0, col(vecCol)).otherwise(transform(col(vecCol), _ / n)))
  }

  /** Brute-force cosine top-k: every query against the whole corpus.
    * `queries` is broadcast (the small side); ranking is per-query via
    * window, ties broken by corpus id. Self-pairs excluded.
    * Output: (query_id, rank, vec_id, cos).
    */
  def bruteTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // cast to double BEFORE any arithmetic: zip_with on float arrays
    // multiplies in float precision (~1e-8 relative error) — enough to
    // flip rounded outputs and rankings vs double-precision engines
    val q = withUnitVec(queries.select(col(idCol).as("query_id"),
      KMeansOps.asDouble(col(vecCol)).as("qv")), "qv", "qu").drop("qv")
    val c = withUnitVec(corpus.select(col(idCol).as("vec_id"),
      KMeansOps.asDouble(col(vecCol)).as("cv")), "cv", "cu").drop("cv")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("qu"), col("cu")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** All corpus pairs with cosine ≥ minCos, optionally equality-blocked
    * (e.g. by a class/label/shard column). Output: (id1, id2, cos).
    */
  def cosinePairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      minCos: Double, blockCol: Option[String] = None): DataFrame = {
    val c = withUnitVec(
      corpus.select(col(idCol).as("id") +: blockCol.map(col).toSeq: _*)
        .join(corpus.select(col(idCol).as("id"),
          KMeansOps.asDouble(col(vecCol)).as("v")), Seq("id")),
      "v", "u").drop("v")
    val cond = blockCol.map(b => col(s"a.$b") === col(s"b.$b"))
      .foldLeft(col("a.id") < col("b.id"))(_ && _)
    c.as("a").join(c.as("b"), cond)
      .withColumn("cos", dot(col("a.u"), col("b.u")))
      .filter(col("cos") >= minCos)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("cos"))
  }

  /** All-pairs cosine ≥ minCos via broadcast matrix + per-partition
    * primitive-array loops — the O(n²·d) inner product is ~100× faster
    * in tight JVM loops than per-pair Catalyst array allocation, and the
    * broadcast side is only n·d doubles. Same output contract as
    * [[cosinePairs]]; identical IEEE arithmetic order (sequential over
    * dims) so round-6 results agree with the oracle. This is the
    * mapPartitions escape hatch used deliberately: an all-pairs kernel
    * is genuine per-partition imperative logic (SURVEY §1.1).
    */
  def cosinePairsFast(
      corpus: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val unit = withUnitVec(
      corpus.select(col(idCol).cast("long").as("id"),
        KMeansOps.asDouble(col(vecCol)).as("v")), "v", "u")
      .select(col("id"), col("u"))
    val all = unit.as[(Long, Array[Double])].collect().sortBy(_._1)
    val bcast = spark.sparkContext.broadcast(all)
    unit.as[(Long, Array[Double])].mapPartitions { it =>
      val mat = bcast.value
      it.flatMap { case (id1, u1) =>
        mat.iterator.filter(_._1 > id1).flatMap { case (id2, u2) =>
          var s = 0.0
          var i = 0
          while (i < u1.length) { s += u1(i) * u2(i); i += 1 }
          if (s >= minCos) Iterator.single((id1, id2, s)) else Iterator.empty
        }
      }
    }.toDF("id1", "id2", "cos")
  }

  /** IVF (inverted-file) ANN: cluster the corpus into `cells` K-Means
    * cells, then for each query scan only the `nprobe` nearest cells.
    * Returns (query_id, rank, vec_id, cos) like [[bruteTopK]]; recall
    * < 1 by construction, tunable via nprobe/cells.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, cells: Int, nprobe: Int, seed: Long = 42L): DataFrame = {
    val pts = corpus.select(col(idCol), KMeansOps.asDouble(col(vecCol)).as(vecCol))
    // coarse cells are enough for routing — 3 Lloyd iterations, not a
    // converged clustering (each iteration is a full corpus pass)
    val km = KMeansOps.lloyd(pts, idCol, vecCol, cells, seed, maxIter = 3)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = km.centroids.toSeq.toDF("cid", "cvec")
    // corpus side: cell assignment (one broadcast cross join, reused)
    val assigned = KMeansOps.assign(pts, idCol, vecCol, cdf)
      .select(col(idCol).as("vec_id"), col("cluster").as("cell"), col(vecCol).as("cv"))
    // query side: nprobe nearest cells each
    val qw = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cid"))
    val qcells = queries.select(col(idCol).as("query_id"), KMeansOps.asDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(cdf))
      .withColumn("dist", KMeansOps.euclid(col("qv"), col("cvec")))
      .withColumn("r", row_number().over(qw))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
    val qn = withUnitVec(qcells, "qv", "qu").drop("qv")
    val cn = withUnitVec(assigned, "cv", "cu").drop("cv")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    cn.join(broadcast(qn), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("qu"), col("cu")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }
}
