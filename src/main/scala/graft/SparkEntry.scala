package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — named queries + DuckDB oracle SQL.
  * See SURVEY.md §7.6: every query orders its output, seeds all
  * randomness, rounds floating-point outputs, and aliases columns
  * identically on both sides.
  */
object SparkEntry {

  /** One named query: Spark plan + optional DuckDB-dialect oracle SQL. */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  import Dictionaries.{Stopwords => Stop}

  /** documents → (doc_id, toks) after tokenize + stopword filter. */
  private def docsTokens(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))

  /** DuckDB fragment mirroring [[docsTokens]] (RE2 regex, same semantics). */
  private val SqlToks =
    """SELECT doc_id, list_filter(regexp_extract_all(lower(text), '\b\w\w+\b'),
      | x -> x NOT IN ('the', 'a')) AS toks FROM documents""".stripMargin.replace("\n", "")

  /** (word, idf) over the corpus vocabulary, as a single declarative plan
    * (N joined in as a 1-row aggregate — no driver-side count). */
  private def vocabIdf(base: DataFrame): DataFrame = {
    val dfreq = Tfidf.docFreq(base, "doc_id", "toks")
    val n = base.agg(count(lit(1)).as("n"))
    dfreq.crossJoin(n)
      .withColumn("idf", log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
      .select(col("word"), col("df"), col("idf"))
  }

  private val all: Seq[Q] = Seq(

    // ---- M1: tokenization + document frequency + IDF (SURVEY §2.5 C1-C6, §2.4 A2-A3)
    Q("q_tokens",
      (s, dir) => docsTokens(s, dir)
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos"),
      Some(s"""WITH t AS ($SqlToks)
        |SELECT doc_id, CAST(unnest(range(0, len(toks))) AS INT) AS pos,
        |       unnest(toks) AS token
        |FROM t ORDER BY doc_id, pos""".stripMargin)),

    Q("q_tokens_dict",
      (s, dir) => Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenizeFiltered(col("text"), Stop, Dictionaries.Adjectives).as("toks"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos"),
      Some("""WITH t AS (SELECT doc_id,
        | list_filter(regexp_extract_all(lower(text), '\b\w\w+\b'),
        |   x -> x NOT IN ('the', 'a') AND x IN ('fast', 'slow', 'small', 'big')) AS toks
        | FROM documents)
        |SELECT doc_id, CAST(unnest(range(0, len(toks))) AS INT) AS pos,
        |       unnest(toks) AS token
        |FROM t ORDER BY doc_id, pos""".stripMargin)),

    Q("q_docfreq",
      (s, dir) => Tfidf.docFreq(docsTokens(s, dir), "doc_id", "toks").orderBy("word"),
      Some(s"""WITH t AS ($SqlToks)
        |SELECT word, count(*) AS df
        |FROM (SELECT doc_id, unnest(list_distinct(toks)) AS word FROM t)
        |GROUP BY word ORDER BY word""".stripMargin)),

    Q("q_idf",
      (s, dir) => vocabIdf(docsTokens(s, dir))
        .withColumn("idf", round(col("idf"), 6))
        .orderBy("word"),
      Some(s"""WITH t AS ($SqlToks),
        |d AS (SELECT word, count(*) AS df
        |      FROM (SELECT doc_id, unnest(list_distinct(toks)) AS word FROM t) GROUP BY word),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT word, df, round(ln((n + 1.0) / (df + 1.0)) + 1.0, 6) AS idf
        |FROM d, n ORDER BY word""".stripMargin)),

    // ---- M2: term frequency + L2-normalized TF-IDF (SURVEY §2.4 A4, §2.5 C7-C14)
    Q("q_tf",
      (s, dir) => Tfidf.termCounts(docsTokens(s, dir), "doc_id", "toks")
        .withColumn("tf",
          round(when(col("len") === 0, lit(0.0)).otherwise(col("cnt") / col("len")), 6))
        .select(col("doc_id"), col("word"), col("cnt"), col("tf"))
        .orderBy("doc_id", "word"),
      Some(s"""WITH t AS ($SqlToks),
        |e AS (SELECT doc_id, len(toks) AS len, unnest(toks) AS word FROM t)
        |SELECT doc_id, word, count(*) AS cnt,
        |       round(CASE WHEN max(len) = 0 THEN 0.0
        |             ELSE CAST(count(*) AS DOUBLE) / max(len) END, 6) AS tf
        |FROM e GROUP BY doc_id, word ORDER BY doc_id, word""".stripMargin)),

    Q("q_tfidf",
      (s, dir) => {
        val base = docsTokens(s, dir)
        Tfidf.tfidfVectors(base, "doc_id", "toks",
            vocabIdf(base).select("word", "idf"), scale = 6, dense = true)
          .orderBy("doc_id", "word")
      },
      Some(s"""WITH t AS ($SqlToks),
        |b AS (SELECT doc_id, toks, len(toks) AS len FROM t),
        |counts AS (SELECT doc_id, word, count(*) AS cnt
        |           FROM (SELECT doc_id, unnest(toks) AS word FROM b) GROUP BY doc_id, word),
        |dfreq AS (SELECT word, count(*) AS df
        |          FROM (SELECT doc_id, unnest(list_distinct(toks)) AS word FROM b) GROUP BY word),
        |n AS (SELECT count(*) AS n FROM b),
        |vocab AS (SELECT word, ln((n + 1.0) / (df + 1.0)) + 1.0 AS idf FROM dfreq, n),
        |dense AS (SELECT d.doc_id, d.len, v.word, v.idf, COALESCE(c.cnt, 0) AS cnt
        |          FROM (SELECT doc_id, len FROM b) d
        |          CROSS JOIN vocab v
        |          LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.word = v.word),
        |w AS (SELECT doc_id, word,
        |        (CASE WHEN len = 0 THEN 0.0 ELSE CAST(cnt AS DOUBLE) / len END) * idf AS w
        |      FROM dense),
        |norms AS (SELECT doc_id, word, w,
        |            sqrt(sum(w * w) OVER (PARTITION BY doc_id)) AS nrm FROM w)
        |SELECT doc_id, word,
        |       round(CASE WHEN nrm = 0 THEN 0.0 ELSE w / nrm END, 6) AS weight
        |FROM norms ORDER BY doc_id, word""".stripMargin))
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_idf")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
