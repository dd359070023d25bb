package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.multimodal.Multimodal
import graft.sources.Sinks

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

  /** Integer-arithmetic quality score over a `toks` list column —
    * bit-identical to TextStats.qualityScore (see its scaladoc). */
  private val SqlQuality =
    """(CASE WHEN len(toks) = 0 THEN 0.3
      | ELSE (40 * len(list_distinct(toks))
      |      + 30 * (len(toks) - len(list_filter(toks, x -> x IN ('the', 'a'))))
      |      + 3 * least(list_sum(list_transform(toks, x -> length(x))), 10 * len(toks)))
      |      / (100.0 * len(toks)) END)""".stripMargin.replace("\n", "")

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

  private lazy val all: Seq[Q] = Seq(

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
        |FROM norms ORDER BY doc_id, word""".stripMargin)),

    // ---- M3: stage-1 parity — global sort + sequential IDs, count-N, JSON field extract
    //      (SURVEY §2.6 O1-O2, §2.4 A1, §2.5 C1)
    Q("q_seq_ids",  // at-scale form: range-repartition + per-partition
      // offsets — no single-partition WindowExec (PlanAuditSpec asserts);
      // parity with the window form is IdOpsSpec-tested
      (s, dir) => IdOps.sequentialIdsAtScale(
          Tables.table(s, dir, "customer"), Seq("c_name", "c_custkey"), "id")
        .select(col("c_custkey"), col("id"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, row_number() OVER (ORDER BY c_name, c_custkey) AS id
        |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("q_count_n",
      (s, dir) => Tables.table(s, dir, "documents").agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM documents")),

    Q("q_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin)),

    Q("q_sample_k",  // seeded sample via keyed-hash permutation (md5) — unlike
      (s, dir) =>     // rand(seed), both engines reproduce it → fully oracled
        IdOps.sampleKByHash(Tables.table(s, dir, "customer"), "c_custkey", 10, salt = "42")
          .select(col("idx"), col("c_custkey"))
          .orderBy("idx"),
      Some("""SELECT CAST(row_number() OVER w - 1 AS INT) AS idx, c_custkey
        |FROM customer
        |WINDOW w AS (ORDER BY md5('42_' || CAST(c_custkey AS VARCHAR)), c_custkey)
        |QUALIFY row_number() OVER w <= 10
        |ORDER BY idx""".stripMargin)),

    // ---- M4: K-Means — one Lloyd iteration decomposed (SURVEY §3.3, §2.3 J3, §2.6 O4, §2.4 A5-A7)
    Q("q_kmeans_assign",
      (s, dir) => {
        val pts = embDouble(s, dir)
        KMeansOps.assign(pts, "vec_id", "v", fixedCentroids(pts))
          .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
          .orderBy("vec_id")
      },
      Some(s"""$SqlKmeansAssign
        |SELECT vec_id, cid AS cluster, round(dist, 6) AS dist
        |FROM a WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    Q("q_kmeans_centroids",
      (s, dir) => {
        val pts = embDouble(s, dir)
        KMeansOps.newCentroids(
            KMeansOps.assign(pts, "vec_id", "v", fixedCentroids(pts)), "v", scale = 6)
          .orderBy("cluster", "dim")
      },
      Some(s"""$SqlKmeansAssign,
        |asg AS (SELECT vec_id, cid AS cluster FROM a WHERE rn = 1),
        |ex AS (SELECT g.cluster, CAST(unnest(e.embedding) AS DOUBLE) AS x,
        |              CAST(unnest(range(0, len(e.embedding))) AS INT) AS dim
        |       FROM asg g JOIN embeddings e ON e.vec_id = g.vec_id)
        |SELECT cluster, dim, round(avg(x), 6) + 0.0 AS c
        |FROM ex GROUP BY cluster, dim ORDER BY cluster, dim""".stripMargin)),

    Q("q_kmeans_sse",
      (s, dir) => {
        val pts = embDouble(s, dir)
        KMeansOps.sse(KMeansOps.assign(pts, "vec_id", "v", fixedCentroids(pts)))
          .select(col("cluster"), round(col("sse"), 3).as("sse"), col("n"))
          .orderBy("cluster")
      },
      Some(s"""$SqlKmeansAssign
        |SELECT cid AS cluster, round(sum(dist * dist), 3) AS sse, count(*) AS n
        |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cluster""".stripMargin)),

    Q("q_kmeans_iter2",  // TWO unrolled Lloyd iterations in one plan: assign →
      // recompute → REASSIGN to the recomputed centroids → recompute again.
      // This value-oracles the centroid-update→reassignment COMPOSITION (the
      // heart of the reference's loop, App.java:122-145) — q_kmeans_* cover
      // one iteration; the multi-iteration lloyd() loop is the same driver
      // hop repeated (spec-covered). Centroids are rounded to 6 dp between
      // iterations (the reference's HALF_UP inter-iteration rounding, scale
      // lowered so both engines agree on the rounded doubles).
      (s, dir) => {
        val pts = embDouble(s, dir)
        val a1 = KMeansOps.assign(pts, "vec_id", "v", fixedCentroids(pts))
        val c1 = KMeansOps.newCentroids(a1, "v", scale = 6)
          .groupBy(col("cluster").as("cid"))
          .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("s"))
          .select(col("cid"), transform(col("s"), x => x.getField("c")).as("cvec"))
        val a2 = KMeansOps.assign(pts, "vec_id", "v", c1)
        KMeansOps.newCentroids(a2, "v", scale = 6)
          .orderBy("cluster", "dim")
      },
      Some(s"""$SqlKmeansAssign,
        |asg1 AS (SELECT vec_id, cid AS cluster FROM a WHERE rn = 1),
        |c1 AS (SELECT g.cluster, p.i AS dim, round(avg(p.x), 6) AS c
        |       FROM asg1 g JOIN pts p ON p.vec_id = g.vec_id
        |       GROUP BY g.cluster, p.i),
        |d2 AS (SELECT p.vec_id, c1.cluster AS cid,
        |              sqrt(sum((p.x - c1.c) * (p.x - c1.c))) AS dist
        |       FROM pts p JOIN c1 ON p.i = c1.dim GROUP BY p.vec_id, c1.cluster),
        |a2 AS (SELECT vec_id, cid, dist,
        |       row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2),
        |asg2 AS (SELECT vec_id, cid AS cluster FROM a2 WHERE rn = 1),
        |c2 AS (SELECT g.cluster, CAST(p.i AS INT) AS dim,
        |        round(avg(p.x), 6) + 0.0 AS c
        |       FROM asg2 g JOIN pts p ON p.vec_id = g.vec_id GROUP BY g.cluster, p.i)
        |SELECT cluster, dim, c FROM c2 ORDER BY cluster, dim""".stripMargin)),

    // ---- M5: relational surface — hash agg, broadcast/semi/anti/multi joins,
    //      top-k, union, rollup, event-time windows (SURVEY §2.3, §2.4, §2.6, §2.7, §2.8)
    Q("q_agg_lineitem",  // TPC-H Q1 shape: partial-agg-friendly hash aggregation
      (s, dir) => Tables.table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q_join_broadcast",  // small dim broadcast-joined to fact — no fact shuffle
      (s, dir) => Tables.table(s, dir, "orders")
        .join(broadcast(Tables.table(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q_join_multi",  // TPC-H Q5 shape: fact ⋈ chain of broadcast dims
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        val o = Tables.table(s, dir, "orders")
        val c = Tables.table(s, dir, "customer")
        val n = Tables.table(s, dir, "nation")
        val r = Tables.table(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    Q("q_semi_join",  // EXISTS: customers having at least one high-value order
      (s, dir) => Tables.table(s, dir, "customer")
        .join(Tables.table(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin)),

    Q("q_anti_join",  // NOT EXISTS: customers with no very-large order
      (s, dir) => Tables.table(s, dir, "customer")
        .join(Tables.table(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)),

    Q("q_bucket_join",  // co-located join: both sides bucket-pre-hashed and
      (s, dir) => {      // sorted on the key → SMJ with ZERO Exchange below it
        val sfx = dir.replaceAll("[^0-9A-Za-z]", "_")
        Sinks.writeBucketed(
          Tables.table(s, dir, "orders").select(col("o_custkey").as("custkey"),
            col("o_orderkey"), col("o_totalprice")),
          s"orders_bkt$sfx", 8, Seq("custkey"))
        Sinks.writeBucketed(
          Tables.table(s, dir, "customer").select(col("c_custkey").as("custkey"),
            col("c_mktsegment")),
          s"customer_bkt$sfx", 8, Seq("custkey"))
        // merge hint pins SMJ so the bucketed (shuffle-free, sort-free)
        // join is what runs even when one side would auto-broadcast —
        // this is the 100 TB fact-to-fact join shape; plan audited in
        // PartitioningSpec
        s.table(s"orders_bkt$sfx")
          .hint("merge")
          .join(s.table(s"customer_bkt$sfx"), "custkey")
          .select(col("o_orderkey"), col("custkey"), col("c_mktsegment"),
            round(col("o_totalprice"), 2).as("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey AS custkey, c_mktsegment,
        |  round(o_totalprice, 2) AS o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)),

    Q("q_topk",  // global top-k: TakeOrderedAndProject, no full sort
      (s, dir) => Tables.table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice")),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    Q("q_union_distinct",
      (s, dir) => Tables.table(s, dir, "region").select(col("r_name").as("name"))
        .union(Tables.table(s, dir, "nation").select(col("n_name")))
        .distinct()
        .orderBy("name"),
      Some("""SELECT r_name AS name FROM region UNION SELECT n_name FROM nation
        |ORDER BY name""".stripMargin)),

    Q("q_count_distinct",
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q_rollup",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    Q("q_window_hourly",  // tumbling event-time window as batch (SURVEY §2.9)
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(unix_timestamp(col("w.start")).as("hour_epoch"), col("event_type"),
          col("n"), col("total"))
        .orderBy("hour_epoch", "event_type"),
      Some("""SELECT epoch_ns(date_trunc('hour', ts)) // 1000000000 AS hour_epoch,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin)),

    Q("q_window_rank",  // per-user event ordering: row_number window
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))))
          .select(col("user_id"), col("event_id"), col("rn"))
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, event_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn
        |FROM events ORDER BY user_id, rn""".stripMargin)),

    Q("q_running_sum",  // frame-spec window: running total per user
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("running", round(sum(col("value")).over(w), 2))
          .select(col("user_id"), col("event_id"), col("running"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // ---- M6: deduplication suite (beyond-reference, SURVEY §7.2 M6)
    Q("q_dedup_exact",  // normalized-fingerprint duplicate groups
      (s, dir) => {
        val withFp = docsTokens(s, dir)
          .withColumn("fp", Dedup.wordSetFingerprint(col("toks")))
        Dedup.exactDupGroups(withFp, "doc_id", "fp").orderBy("fp")
      },
      Some(s"""WITH t AS ($SqlToks),
        |f AS (SELECT doc_id,
        |        md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
        |      FROM t)
        |SELECT fp, min(doc_id) AS rep, count(*) AS n
        |FROM f GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin)),

    Q("q_dedup_drop",  // corpus after dropping normalized duplicates (keep min id)
      (s, dir) => {
        val withFp = docsTokens(s, dir)
          .withColumn("fp", Dedup.wordSetFingerprint(col("toks")))
        Dedup.dropDupsByKey(withFp.select(col("doc_id"), col("fp")), "doc_id", "fp")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |f AS (SELECT doc_id,
        |        md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
        |      FROM t)
        |SELECT doc_id FROM f
        |QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin)),

    Q("q_jaccard_pairs",  // exact unigram Jaccard ≥ 0.9, blocked by source
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))
        Dedup.jaccardPairsPrefix(
            Dedup.shingleHashes(docs, "doc_id", "toks", k = 1, Some("source")),
            0.9, Some("source"))
          .withColumn("jaccard", round(col("jaccard"), 6))
          .orderBy("id1", "id2")
      },
      Some("""WITH t AS (SELECT doc_id, source,
        |        list_distinct(list_filter(regexp_extract_all(lower(text), '\b\w\w+\b'),
        |          x -> x NOT IN ('the', 'a'))) AS ws FROM documents),
        |e AS (SELECT doc_id, source, unnest(ws) AS w, len(ws) AS sz FROM t),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
        |             max(a.sz) AS s1, max(b.sz) AS s2
        |      FROM e a JOIN e b ON a.w = b.w AND a.source = b.source
        |                        AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(inter AS DOUBLE) / (s1 + s2 - inter), 6) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (s1 + s2 - inter) >= 0.9
        |ORDER BY id1, id2""".stripMargin)),

    Q("q_ngram3_jaccard",  // exact word-3-shingle Jaccard ≥ 0.5, unblocked.
      // SMALL-DATA ORACLE WITNESS, deliberately the direct self-join: on
      // this corpus 3-shingles are near-unique so there is no hot-token
      // fan-out, and the unfiltered join is the cheapest exact plan. It is
      // NOT the 100×-scale form — real crawl data has template headers
      // shared by millions of docs; the gated scale twins are
      // q_ngram3_jaccard_capped (bucket-capped) and the q_dedup_* trio
      // (prefix-filtered), all three value-identical to this witness.
      (s, dir) => Dedup.jaccardPairsFromHashes(
          Dedup.shingleHashesViaArrays(docsTokens(s, dir), "doc_id", "toks", k = 3), 0.5,
          materialize = false)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id1", "id2"),
      Some(s"""WITH t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
        |             max(a.sz) AS s1, max(b.sz) AS s2
        |      FROM e a JOIN e b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(inter AS DOUBLE) / (s1 + s2 - inter), 6) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (s1 + s2 - inter) >= 0.5
        |ORDER BY id1, id2""".stripMargin)),

    Q("q_ngram3_jaccard_capped",  // the 3-shingle Jaccard SCALE form: group
      // ids per shingle bucket, cap pathological buckets at maxBucket
      // (boilerplate shared corpus-wide must be dropped or the pair space
      // itself is the bottleneck), emit in-bucket pairs by suffix explode —
      // no self-join, no quadratic single-key shuffle fan-out. On the gate
      // corpora no 3-shingle bucket exceeds the cap, so the output is
      // value-identical to the q_ngram3_jaccard witness (same oracle).
      (s, dir) => Dedup.jaccardPairsBucketed(
          Dedup.shingleHashesViaArrays(docsTokens(s, dir), "doc_id", "toks", k = 3)
            .localCheckpoint(),  // referenced twice (sizes + buckets)
          0.5, maxBucket = 1000)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id1", "id2"),
      Some(s"""WITH t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
        |             max(a.sz) AS s1, max(b.sz) AS s2
        |      FROM e a JOIN e b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(inter AS DOUBLE) / (s1 + s2 - inter), 6) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (s1 + s2 - inter) >= 0.5
        |ORDER BY id1, id2""".stripMargin)),

    Q("q_cross_dedup",  // cross-corpus near-dup retrieval (R-S Jaccard
      // join): corpus docs with 3-shingle Jaccard ≥ 0.5 against ANY doc
      // of a reference set (here the doc_id%10=0 slice standing in for
      // an eval suite / prior snapshot) — the near-dup generalization
      // of exact decontamination: a paraphrased or re-punctuated eval
      // item slips past verbatim-gram overlap but is caught here. The
      // reference element frame and its size table both broadcast; the
      // corpus stream is probed map-side and only matching (cid, eid)
      // rows shuffle into the intersection count.
      (s, dir) => {
        val all = docsTokens(s, dir)
        val cE = Dedup.shingleHashesViaArrays(
          all.filter(col("doc_id") % 10 =!= 0), "doc_id", "toks", k = 3)
        val eE = Dedup.shingleHashesViaArrays(
          all.filter(col("doc_id") % 10 === 0), "doc_id", "toks", k = 3)
        Dedup.crossJaccardPairs(cE, eE, minJ = 0.5)
          .withColumn("jaccard", round(col("jaccard"), 6))
          .orderBy("cid", "eid")
      },
      Some(s"""WITH t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |p AS (SELECT c.doc_id AS cid, r.doc_id AS eid, count(*) AS inter,
        |             max(c.sz) AS c_sz, max(r.sz) AS e_sz
        |      FROM e c JOIN e r ON c.w = r.w
        |      WHERE c.doc_id % 10 <> 0 AND r.doc_id % 10 = 0
        |      GROUP BY 1, 2)
        |SELECT cid, eid,
        |       round(CAST(inter AS DOUBLE) / (c_sz + e_sz - inter), 6) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (c_sz + e_sz - inter) >= 0.5
        |ORDER BY cid, eid""".stripMargin)),

    Q("q_minhash_lsh_md5",  // the WHOLE MinHash+LSH pipeline, value-level
      // oracled: md5-derived base hash + string band keys are portable SQL,
      // so DuckDB reproduces sig -> band -> bucket-join candidates exactly
      // (the xxhash64/BandHashes path is the scale twin, rows-only+swept).
      // Witness corpus capped at 500 docs (the full sf0.01 gate corpus):
      // md5-per-shingle costs ~10× murmur BY DESIGN, and the witness's
      // verification value doesn't grow with corpus size — the cap keeps
      // the bench about the scale path, not the oracle twin
      (s, dir) => Dedup.minhashPairsPortable(
          docsTokens(s, dir)
            .filter(col("doc_id") < 500)
            .select(col("doc_id"), Dedup.tokenShingles(col("toks"), 3).as("sh")),
          "doc_id", "sh", numHashes = 16, bands = 4, seed = 42L)
        .orderBy("id1", "id2"),
      Some {
        val ps = Dedup.hashParams(16, 42L).zipWithIndex
          .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
        s"""WITH t0 AS ($SqlToks),
        |t AS (SELECT * FROM t0 WHERE doc_id < 500),
        |s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh
        |      FROM t),
        |x AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(unnest(sh)), 1, 8)) AS BIGINT) AS x
        |      FROM s),
        |pr(j, a, b) AS (VALUES $ps),
        |sig AS (SELECT doc_id, j, min((a * (x % 2147483647) + b) % 2147483647) AS h
        |        FROM x, pr GROUP BY doc_id, j),
        |band AS (SELECT doc_id, j // 4 AS band,
        |           string_agg(CAST(h AS VARCHAR), '_' ORDER BY j) AS bh
        |         FROM sig GROUP BY doc_id, j // 4),
        |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |         FROM band a JOIN band b
        |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
        |SELECT id1, id2 FROM cand ORDER BY id1, id2""".stripMargin
      }),

    Q("q_dedup_clusters",  // near-dup CLUSTERING: connected components over the
      // exact 3-shingle Jaccard ≥ 0.5 pairs (star contraction) — A≈B≈C
      // collapses to one survivor even when A≉C; oracled via recursive CTE.
      // Pair generation is the PREFIX-FILTERED exact form: a hot shingle
      // (template boilerplate shared by 10⁶ docs in real crawl data) makes
      // the direct self-join's Σ_h |docs_h|² fan-out quadratic on one key;
      // prefix filtering indexes only each doc's rarest tokens, so the
      // candidate join never sees the hot keys. Exact ⇒ oracle unchanged.
      (s, dir) => Dedup.dedupClusters(
          Dedup.jaccardPairsPrefix(
            Dedup.shingleHashesViaArrays(docsTokens(s, dir), "doc_id", "toks", k = 3), 0.5))
        .orderBy("id"),
      Some(s"""WITH RECURSIVE t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |      FROM e a JOIN e b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2
        |      HAVING CAST(count(*) AS DOUBLE)
        |             / (max(a.sz) + max(b.sz) - count(*)) >= 0.5),
        |ed AS (SELECT id1 AS a, id2 AS b FROM p UNION ALL SELECT id2, id1 FROM p),
        |n AS (SELECT DISTINCT a AS id FROM ed),
        |rr AS (SELECT id, id AS reach FROM n
        |       UNION
        |       SELECT rr.id, ed.b AS reach FROM rr JOIN ed ON ed.a = rr.reach)
        |SELECT id, min(reach) AS rep FROM rr GROUP BY id ORDER BY id""".stripMargin)),

    Q("q_dedup_canonical",  // the cluster-aware corpus after dedup: one
      (s, dir) => {         // representative per near-dup cluster survives
        // prefix-filtered exact pairs — hot-shingle-safe (see q_dedup_clusters)
        val pairs = Dedup.jaccardPairsPrefix(
          Dedup.shingleHashesViaArrays(docsTokens(s, dir), "doc_id", "toks", k = 3), 0.5)
        Dedup.dropClusterDuplicates(
            Tables.table(s, dir, "documents"), "doc_id", Dedup.dedupClusters(pairs))
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |      FROM e a JOIN e b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2
        |      HAVING CAST(count(*) AS DOUBLE)
        |             / (max(a.sz) + max(b.sz) - count(*)) >= 0.5),
        |ed AS (SELECT id1 AS a, id2 AS b FROM p UNION ALL SELECT id2, id1 FROM p),
        |n AS (SELECT DISTINCT a AS id FROM ed),
        |rr AS (SELECT id, id AS reach FROM n
        |       UNION
        |       SELECT rr.id, ed.b AS reach FROM rr JOIN ed ON ed.a = rr.reach),
        |cl AS (SELECT id, min(reach) AS rep FROM rr GROUP BY id)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM cl WHERE id <> rep)
        |ORDER BY doc_id""".stripMargin)),

    Q("q_dedup_best",  // quality-priority canonicalization: per near-dup
      // cluster keep the HIGHEST-quality member (ties → min doc_id), not
      // the min-id one — survivors should be the best copy of a near-dup
      (s, dir) => {
        // tokenization feeds BOTH the pair generator and the scorer —
        // checkpoint once instead of re-tokenizing the corpus twice
        val toks = docsTokens(s, dir).localCheckpoint()
        // prefix-filtered exact pairs — hot-shingle-safe (see q_dedup_clusters)
        val pairs = Dedup.jaccardPairsPrefix(
          Dedup.shingleHashesViaArrays(toks, "doc_id", "toks", k = 3), 0.5)
        val scored = toks.select(col("doc_id"),
          TextStats.qualityScore(col("toks"), Stop).as("q"))
        Dedup.dropClusterDuplicatesBy(scored, "doc_id", "q", Dedup.dedupClusters(pairs))
          .select(col("doc_id"), round(col("q"), 6).as("q"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |      FROM e a JOIN e b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2
        |      HAVING CAST(count(*) AS DOUBLE)
        |             / (max(a.sz) + max(b.sz) - count(*)) >= 0.5),
        |ed AS (SELECT id1 AS a, id2 AS b FROM p UNION ALL SELECT id2, id1 FROM p),
        |n AS (SELECT DISTINCT a AS id FROM ed),
        |rr AS (SELECT id, id AS reach FROM n
        |       UNION
        |       SELECT rr.id, ed.b AS reach FROM rr JOIN ed ON ed.a = rr.reach),
        |cl AS (SELECT id, min(reach) AS rep FROM rr GROUP BY id),
        |sc AS (SELECT doc_id, $SqlQuality AS q FROM t),
        |lb AS (SELECT sc.doc_id, sc.q, COALESCE(cl.rep, sc.doc_id) AS rep
        |       FROM sc LEFT JOIN cl ON cl.id = sc.doc_id),
        |rk AS (SELECT doc_id, q, row_number() OVER
        |         (PARTITION BY rep ORDER BY q DESC, doc_id) AS rk FROM lb)
        |SELECT doc_id, round(q, 6) AS q FROM rk WHERE rk = 1
        |ORDER BY doc_id""".stripMargin)),

    Q("q_dedup_clusters_lsh",  // the COMPLETE 100 TB near-dup funnel in ONE
      // gated plan: MinHash signatures → LSH band buckets → candidate pairs
      // → EXACT Jaccard verify on candidates only → connected components.
      // At scale this composition is the whole point of LSH: banding prunes
      // the pair space from Σ_h|docs_h|² to bucket-mates, verify touches
      // only candidates, CC shuffles only verified edges. This gated
      // witness uses the md5-portable hash family so DuckDB replays
      // sig→band→candidates bit-for-bit (see q_minhash_lsh_md5); the
      // xxhash64 fused-codegen twin (minhashSigsCol + lshCandidates) is
      // the production path, rows-only + recall-swept. Same 500-doc cap
      // rationale as q_minhash_lsh_md5: the witness verifies composition,
      // its cost must not grow with the bench corpus.
      (s, dir) => {
        val docs = docsTokens(s, dir)
          .filter(col("doc_id") < 500)
          .select(col("doc_id"),
            array_distinct(Dedup.tokenShingles(col("toks"), 3)).as("sh"))
          .localCheckpoint()  // feeds both the signature path and verify
        val cand = Dedup.minhashPairsPortable(
          docs, "doc_id", "sh", numHashes = 16, bands = 4, seed = 42L)
        val e = docs.select(col("doc_id").as("id"), explode(col("sh")).as("h"))
        Dedup.dedupClusters(Dedup.verifyJaccard(cand, e, 0.5)).orderBy("id")
      },
      Some {
        val ps = Dedup.hashParams(16, 42L).zipWithIndex
          .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
        s"""WITH RECURSIVE t0 AS ($SqlToks),
        |t AS (SELECT * FROM t0 WHERE doc_id < 500),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |x AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(unnest(sh)), 1, 8)) AS BIGINT) AS x
        |      FROM s),
        |pr(j, a, b) AS (VALUES $ps),
        |sig AS (SELECT doc_id, j, min((a * (x % 2147483647) + b) % 2147483647) AS h
        |        FROM x, pr GROUP BY doc_id, j),
        |band AS (SELECT doc_id, j // 4 AS band,
        |           string_agg(CAST(h AS VARCHAR), '_' ORDER BY j) AS bh
        |         FROM sig GROUP BY doc_id, j // 4),
        |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |         FROM band a JOIN band b
        |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |v AS (SELECT c.id1, c.id2
        |      FROM cand c JOIN e a ON a.doc_id = c.id1
        |                  JOIN e b ON b.doc_id = c.id2 AND b.w = a.w
        |      GROUP BY 1, 2
        |      HAVING CAST(count(*) AS DOUBLE)
        |             / (max(a.sz) + max(b.sz) - count(*)) >= 0.5),
        |ed AS (SELECT id1 AS a, id2 AS b FROM v UNION ALL SELECT id2, id1 FROM v),
        |n AS (SELECT DISTINCT a AS id FROM ed),
        |rr AS (SELECT id, id AS reach FROM n
        |       UNION
        |       SELECT rr.id, ed.b AS reach FROM rr JOIN ed ON ed.a = rr.reach)
        |SELECT id, min(reach) AS rep FROM rr GROUP BY id ORDER BY id""".stripMargin
      }),

    Q("q_decontaminate",  // benchmark decontamination: corpus docs sharing
      // any 5-gram with the doc_id%7 "eval set", + distinct-overlap counts;
      // the benchmark gram set broadcasts, the corpus never shuffles
      (s, dir) => {
        val grams = docsTokens(s, dir)
          .select(col("doc_id"), Dedup.tokenShingles(col("toks"), 5).as("g5"))
          .localCheckpoint()
        Dedup.contaminationHits(
            grams.filter(col("doc_id") % 7 =!= 0), "doc_id", "g5",
            grams.filter(col("doc_id") % 7 === 0), "g5")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 5 THEN []
        |        ELSE list_transform(range(1, len(toks) - 3),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |               || toks[i+3] || ' ' || toks[i+4]) END AS g5
        |      FROM t),
        |bg AS (SELECT DISTINCT unnest(g5) AS g FROM g WHERE doc_id % 7 = 0),
        |cg AS (SELECT DISTINCT doc_id, g FROM
        |        (SELECT doc_id, unnest(g5) AS g FROM g WHERE doc_id % 7 <> 0))
        |SELECT cg.doc_id, count(*) AS n_hits FROM cg JOIN bg USING (g)
        |GROUP BY cg.doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_decontaminate_bloom",  // Bloom-filter decontamination: the same
      // eval-overlap question as q_decontaminate answered by an m-bit
      // filter (m=2^20, k=3) instead of a broadcast gram set — executor
      // memory is m/8 bytes no matter how many benchmark grams, and the
      // probe is one codegen expression (no join operator; nothing
      // shuffles but per-doc hit counts). Hashes are md5-derived
      // (Kirsch–Mitzenmacher double hashing), so DuckDB rebuilds the
      // filter bit-for-bit and the value oracle covers the bloom FALSE
      // POSITIVES too — the output is exact, including them.
      (s, dir) => {
        // repartition BEFORE the checkpoint: the test parquet is one
        // <128 MB file → a 1-partition scan, and the md5 double-hash
        // over every gram would otherwise run on a single core (at
        // real scale the scan is already thousands of splits and this
        // spread is free — it rides the checkpoint materialization)
        val grams = docsTokens(s, dir)
          .select(col("doc_id"), Dedup.tokenShingles(col("toks"), 5).as("g5"))
          .repartition(s.sparkContext.defaultParallelism)
          .localCheckpoint()
        val bits = Dedup.bloomBitsFromGrams(
          grams.filter(col("doc_id") % 7 === 0), "g5", k = 3, mBits = 20)
        Dedup.bloomContaminationHits(
            grams.filter(col("doc_id") % 7 =!= 0), "doc_id", "g5", bits,
            k = 3, mBits = 20)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 5 THEN []
        |        ELSE list_transform(range(1, len(toks) - 3),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |               || toks[i+3] || ' ' || toks[i+4]) END AS g5
        |      FROM t),
        |bg AS (SELECT DISTINCT unnest(g5) AS g FROM g WHERE doc_id % 7 = 0),
        |bpos AS (SELECT DISTINCT
        |          (CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT)
        |           + i * CAST(('0x' || substr(md5(g), 9, 8)) AS BIGINT))
        |          % 1048576 AS pos
        |         FROM bg CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        |cg AS (SELECT DISTINCT doc_id, g FROM
        |        (SELECT doc_id, unnest(g5) AS g FROM g WHERE doc_id % 7 <> 0)),
        |cp AS (SELECT doc_id, g,
        |        (CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT)
        |         + i * CAST(('0x' || substr(md5(g), 9, 8)) AS BIGINT))
        |        % 1048576 AS pos
        |       FROM cg CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        |hit AS (SELECT c.doc_id, c.g FROM cp c
        |        LEFT JOIN bpos b ON c.pos = b.pos
        |        GROUP BY c.doc_id, c.g HAVING count(b.pos) = 3)
        |SELECT doc_id, count(*) AS n_hits FROM hit
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_shuffle_det",  // deterministic training-order shuffle: keyed-hash
      // permutation of the whole corpus, dense 1..N positions, epoch = salt;
      // at-scale offset form (no single-partition window — PlanAuditSpec)
      (s, dir) => IdOps.shuffleDeterministic(
          Tables.table(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", salt = "epoch1")
        .select(col("doc_id"), col("pos"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, row_number() OVER
        |  (ORDER BY md5('epoch1_' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q_dedup_incremental",  // cross-snapshot ingestion dedup: a new shard
      // (source src1) keeps only docs whose content fingerprint is absent
      // from the standing corpus — the per-ingest variant of exact dedup;
      // anti-join hash-shuffles 16-byte fingerprints, never documents
      (s, dir) => {
        val fp = docsTokens(s, dir)
          .select(col("doc_id"), TextStats.contentFingerprint(col("toks")).as("fp"))
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source")).join(fp, Seq("doc_id"))
        docs.filter(col("source") === "src1")
          .join(docs.filter(col("source") =!= "src1").select(col("fp")).distinct(),
            Seq("fp"), "left_anti")
          .select(col("doc_id"), col("fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |f AS (SELECT t.doc_id, md5(array_to_string(toks, ' ')) AS fp, d.source
        |      FROM t JOIN documents d ON d.doc_id = t.doc_id)
        |SELECT doc_id, fp FROM f
        |WHERE source = 'src1'
        |  AND fp NOT IN (SELECT fp FROM f WHERE source <> 'src1')
        |ORDER BY doc_id""".stripMargin)),

    Q("q_span_scrub",  // ExactSubstr-lite duplicated-span scrubbing (Lee et
      // al. arXiv:2107.06499, RefinedWeb's boilerplate removal): every
      // token covered by a 3-token span present in ≥5 distinct docs is
      // dropped — substring-level dedup where whole-doc dedup can't see
      // the shared template. Two shuffles (gram count + per-doc start
      // lists), map-side HOF cover mask, no self-join at any scale.
      (s, dir) => Dedup.scrubHotSpans(
          docsTokens(s, dir).localCheckpoint(), "doc_id", "toks",
          k = 3, minDocs = 5L)
        .orderBy("doc_id"),
      Some(s"""WITH t AS ($SqlToks),
        |g AS (SELECT doc_id, i AS s, md5(array_to_string(toks[i:i+2], ' ')) AS h
        |      FROM t, LATERAL unnest(range(1, greatest(len(toks)-1, 1))) AS u(i)
        |      WHERE len(toks) >= 3),
        |hot AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 5),
        |hs AS (SELECT doc_id, list(s) AS starts FROM g JOIN hot USING (h) GROUP BY doc_id),
        |j AS (SELECT t.doc_id, t.toks, COALESCE(hs.starts, []) AS starts
        |      FROM t LEFT JOIN hs ON hs.doc_id = t.doc_id),
        |c AS (SELECT doc_id,
        |        list_filter(list_transform(range(1, len(toks)+1),
        |            p -> {'p': p, 'tok': toks[p]}),
        |          x -> len(list_filter(starts, s -> s <= x.p AND x.p < s + 3)) = 0) AS kept,
        |        len(toks) AS n0
        |      FROM j)
        |SELECT doc_id,
        |       COALESCE(array_to_string(list_transform(kept, x -> x.tok), ' '), '')
        |         AS cleaned,
        |       CAST(n0 - len(kept) AS BIGINT) AS n_removed
        |FROM c ORDER BY doc_id""".stripMargin)),

    Q("q_span_scrub_intra",  // within-doc repeated-span removal (the other
      // half of ExactSubstr dedup): tokens covered by a 3-gram that
      // already occurred EARLIER in the SAME doc are dropped, first
      // occurrence kept — self-repetition loops fixed, not just flagged.
      // ZERO shuffles: grams, first-occurrence duplicate starts, and the
      // cover mask are array HOFs in one projection, map-side at any SF.
      (s, dir) => Dedup.scrubRepeatedSpans(docsTokens(s, dir), "doc_id", "toks", k = 3)
        .orderBy("doc_id"),
      Some(s"""WITH t AS ($SqlToks),
        |d AS (SELECT doc_id, toks,
        |        CASE WHEN len(toks) >= 3
        |          THEN list_transform(range(1, len(toks)-1),
        |                 i -> md5(array_to_string(toks[i:i+2], ' ')))
        |          ELSE [] END AS grams
        |      FROM t),
        |e AS (SELECT doc_id, toks,
        |        list_filter(range(1, len(grams)+1),
        |          s -> list_position(grams, grams[s]) < s) AS ds
        |      FROM d),
        |c AS (SELECT doc_id,
        |        list_filter(list_transform(range(1, len(toks)+1),
        |            p -> {'p': p, 'tok': toks[p]}),
        |          x -> len(list_filter(ds, s -> s <= x.p AND x.p < s + 3)) = 0) AS kept,
        |        len(toks) AS n0
        |      FROM e)
        |SELECT doc_id,
        |       COALESCE(array_to_string(list_transform(kept, x -> x.tok), ' '), '')
        |         AS cleaned,
        |       CAST(n0 - len(kept) AS BIGINT) AS n_removed
        |FROM c ORDER BY doc_id""".stripMargin)),

    Q("q_span_scrub_exact",  // TRUE ExactSubstr (Lee et al. arXiv:2107.06499
      // §3): every token inside ANY duplicated substring of ≥5 tokens
      // (occurrence threshold 2, counted by position corpus-wide) is
      // dropped — variable-length spans, no ≥minDocs popularity floor;
      // the 2-doc shared-block case q_span_scrub's minDocs=5 provably
      // misses is scrubbed here (DedupSpec). Coverage equivalence to the
      // paper's suffix array: a position is inside a duplicated span of
      // length ≥ L iff inside a duplicated L-window (see scaladoc). The
      // duplicated-gram set is NOT assumed tiny, so the back-join
      // hash-shuffles on doc id — two shuffles, never a self-join, and
      // the cover sweep is the O(n + m log m) SpanCoverMask kernel.
      (s, dir) => Dedup.scrubDupSpans(
          docsTokens(s, dir).localCheckpoint(), "doc_id", "toks",
          minLen = 5, minOcc = 2L)
        .orderBy("doc_id"),
      Some(s"""WITH t AS ($SqlToks),
        |g AS (SELECT doc_id, i AS s, md5(array_to_string(toks[i:i+4], ' ')) AS h
        |      FROM t, LATERAL unnest(range(1, greatest(len(toks)-3, 1))) AS u(i)
        |      WHERE len(toks) >= 5),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |hs AS (SELECT doc_id, list(s) AS starts FROM g JOIN dup USING (h) GROUP BY doc_id),
        |j AS (SELECT t.doc_id, t.toks, COALESCE(hs.starts, []) AS starts
        |      FROM t LEFT JOIN hs ON hs.doc_id = t.doc_id),
        |c AS (SELECT doc_id,
        |        list_filter(list_transform(range(1, len(toks)+1),
        |            p -> {'p': p, 'tok': toks[p]}),
        |          x -> len(list_filter(starts, s -> s <= x.p AND x.p < s + 5)) = 0) AS kept,
        |        len(toks) AS n0
        |      FROM j)
        |SELECT doc_id,
        |       COALESCE(array_to_string(list_transform(kept, x -> x.tok), ' '), '')
        |         AS cleaned,
        |       CAST(n0 - len(kept) AS BIGINT) AS n_removed
        |FROM c ORDER BY doc_id""".stripMargin)),

    Q("q_span_dups",  // the audit twin of q_span_scrub_exact: the maximal
      // duplicated-coverage intervals themselves as (doc_id, start, len)
      // — what WOULD be removed, with positions; gaps-and-islands merge
      // of duplicated 5-window starts, window partitioned per doc (span
      // count bounded by doc length, never corpus-wide).
      (s, dir) => Dedup.dupSpans(
          docsTokens(s, dir).localCheckpoint(), "doc_id", "toks",
          minLen = 5, minOcc = 2L)
        .orderBy("doc_id", "start"),
      Some(s"""WITH t AS ($SqlToks),
        |g AS (SELECT doc_id, i AS s, md5(array_to_string(toks[i:i+4], ' ')) AS h
        |      FROM t, LATERAL unnest(range(1, greatest(len(toks)-3, 1))) AS u(i)
        |      WHERE len(toks) >= 5),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |ds AS (SELECT doc_id, s FROM g JOIN dup USING (h)),
        |m AS (SELECT doc_id, s,
        |        max(s + 4) OVER (PARTITION BY doc_id ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        |      FROM ds),
        |i AS (SELECT doc_id, s, sum(CASE WHEN pe IS NULL OR s > pe + 1 THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY doc_id ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |      FROM m)
        |SELECT doc_id, CAST(min(s) AS INT) AS start,
        |       CAST(max(s) - min(s) + 5 AS INT) AS len
        |FROM i GROUP BY doc_id, isl ORDER BY doc_id, start""".stripMargin)),

    Q("q_line_dedup",  // RefinedWeb/MassiveText line-level dedup (Penedo et
      // al. arXiv:2306.01116): lines occurring verbatim in ≥2 distinct
      // docs are removed from every doc, survivors rejoined in order —
      // document structure preserved, boilerplate gone. "Line" = segment
      // between literal ' the ' separators (this corpus has no newlines;
      // the operator takes any separator). Hot-line set is found with one
      // explode+count shuffle, then rides to every task as ONE broadcast
      // array row — the scrub is a map-side array filter, the corpus
      // never shuffles or regroups.
      (s, dir) => Dedup.scrubHotLines(
          Tables.table(s, dir, "documents"), "doc_id", "text",
          sep = " the ", minDocs = 2L)
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id, str_split(text, ' the ') AS parts FROM documents),
        |l AS (SELECT doc_id, i, parts[i] AS line
        |      FROM p, LATERAL unnest(range(1, len(parts)+1)) AS u(i)),
        |hot AS (SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
        |k AS (SELECT l.doc_id, l.i, l.line FROM l ANTI JOIN hot USING (line)),
        |g AS (SELECT doc_id, list(line ORDER BY i) AS kept FROM k GROUP BY doc_id)
        |SELECT p.doc_id,
        |       COALESCE(array_to_string(g.kept, ' the '), '') AS cleaned,
        |       CAST(len(p.parts) - COALESCE(len(g.kept), 0) AS BIGINT) AS n_removed
        |FROM p LEFT JOIN g USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("q_token_budget",  // token-budget mixture sampling — "sample down to
      // N tokens under this mixture", the form data recipes are actually
      // specified in: budget = 15% of corpus tokens, mixture 40/30/20/10
      // over src0-3 (all other sources dropped). Per-stratum rates are
      // 1/256-quantized with LARGEST-REMAINDER correction toward the
      // budget; src0's allocation exceeds its supply → capped at keep-all
      // (the mixture caps, it does not redistribute). Rate table = one
      // tiny groupBy + windows over THAT table, broadcast back; keep is a
      // map-side keyed-hash predicate — no corpus shuffle. The only
      // driver value is the 1-row corpus token total (k-row-scalar
      // family, like centroids/offsets).
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextOps.tokenizeFiltered(col("text"), Stop, Nil))
              .cast("double").as("w"))
        val total = d.agg(sum(col("w"))).head().getDouble(0)
        val b = math.floor(0.15 * total).toLong
        IdOps.sampleToTokenBudget(d, "doc_id", "source", "w", b,
            Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
            salt = "tb")
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |d AS (SELECT t.doc_id, dd.source, CAST(len(t.toks) AS DOUBLE) AS w
        |      FROM t JOIN documents dd USING (doc_id)),
        |bb AS (SELECT floor(0.15 * sum(w)) AS b FROM d),
        |g AS (SELECT source, sum(w) AS w FROM d GROUP BY source),
        |m AS (SELECT * FROM (VALUES ('src0', 0.4), ('src1', 0.3),
        |        ('src2', 0.2), ('src3', 0.1)) AS mm(source, share)),
        |r AS (SELECT g.source, g.w, least(b * share / g.w, 1.0) AS rate
        |      FROM g JOIN m USING (source) CROSS JOIN bb),
        |q AS (SELECT source, w, floor(rate*256 + 1e-9) AS t0,
        |        rate*256 - floor(rate*256 + 1e-9) AS frac FROM r),
        |df AS (SELECT (SELECT b FROM bb) - sum(w * t0 / 256.0) AS deficit FROM q),
        |c AS (SELECT source, w, t0, frac,
        |        COALESCE(sum(CASE WHEN frac > 1e-12 THEN w / 256.0 END)
        |          OVER (ORDER BY frac DESC, source
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM q),
        |b2 AS (SELECT source,
        |        CASE WHEN frac > 1e-12 AND cb < (SELECT deficit FROM df) - 1e-9
        |             THEN t0 + 1 ELSE t0 END AS t
        |       FROM c),
        |thr AS (SELECT source, CASE WHEN t >= 256 THEN 'zz'
        |          ELSE printf('%02x', CAST(t AS INT)) END AS th FROM b2)
        |SELECT dd.doc_id, dd.source
        |FROM documents dd JOIN thr USING (source)
        |WHERE substring(md5('tb' || '_' || CAST(dd.doc_id AS VARCHAR)), 1, 2) < th
        |ORDER BY doc_id""".stripMargin)),

    Q("q_quality_clf",  // trained-classifier-style quality score: logistic
      // model over the heuristic feature set (diversity, stopword
      // density, word length, bigram repetition, top-token domination)
      // with fixed public weights — the fastText/logreg quality-filter
      // plan shape with deterministic coefficients, so the score
      // value-oracles. Pure codegen column expressions over RAW tokens
      // (stopwords kept — the stopword-density feature needs them);
      // zero shuffles beyond the scan.
      (s, dir) => Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenizeFiltered(col("text"), Nil, Nil).as("toks"))
        .select(col("doc_id"),
          round(TextStats.qualityLogit(col("toks"), Stop), 6).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
        |        regexp_extract_all(lower(text), '\b\w\w+\b') AS toks FROM documents),
        |f AS (SELECT doc_id, len(toks) AS n,
        |        CASE WHEN len(toks) = 0 THEN 0.0
        |          ELSE len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) END AS d,
        |        CASE WHEN len(toks) = 0 THEN 0.0
        |          ELSE len(list_filter(toks, x -> x IN ('the', 'a')))
        |               / CAST(len(toks) AS DOUBLE) END AS s,
        |        CASE WHEN len(toks) = 0 THEN 0.0
        |          ELSE list_sum(list_transform(toks, x -> length(x)))
        |               / CAST(len(toks) AS DOUBLE) END AS ml,
        |        CASE WHEN len(toks) < 2 THEN 0.0
        |          ELSE 1.0 - len(list_distinct(list_transform(range(1, len(toks)),
        |                 i -> toks[i] || ' ' || toks[i+1])))
        |               / CAST(len(toks) - 1 AS DOUBLE) END AS r,
        |        CASE WHEN len(toks) = 0 THEN 0.0
        |          ELSE list_max(list_transform(list_distinct(toks),
        |                 u -> len(list_filter(toks, x -> x = u))))
        |               / CAST(len(toks) AS DOUBLE) END AS tp
        |      FROM t)
        |SELECT doc_id,
        |  round(1.0 / (1.0 + exp(-(-1.5 + 2.0 * d + (1.0 - s) * 1.0
        |    + 1.5 * least(ml / 10.0, 1.0) - 2.0 * r - 1.0 * tp))), 6) AS quality
        |FROM f ORDER BY doc_id""".stripMargin)),

    Q("q_stream_score",  // the first ORACLED streaming row: the CCNet
      // scorer as a Structured Streaming query — parquet file source →
      // stateless score (the broadcast-LM shape of q_lm_score_map, model
      // inlined as one map literal) → exactly-once parquet SINK, then the
      // sink is read back and checked against the same DuckDB oracle as
      // q_lm_score. Exactly-once + stateless ⇒ the sink is deterministic,
      // which is precisely what the hash compare asserts. Model = corpus
      // unigram LM collected once (bounded vocab — k-row scalar family).
      (s, dir) => {
        val docs = docsTokens(s, dir)
        val model = TextStats.unigramLogProbs(docs, "toks").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        val out = Scratch.dir("stream-score-out")
        val cp = Scratch.dir("stream-score-cp")
        val schema = Tables.table(s, dir, "documents").schema
        // FileStreamSource lists a DIRECTORY; the testdata table may be a
        // single parquet file — stage it into scratch when it is
        val src = new java.io.File(s"$dir/documents.parquet")
        val streamDir =
          if (src.isDirectory) src.toString
          else {
            val d = new java.io.File(Scratch.dir("stream-score-src"))
            java.nio.file.Files.copy(src.toPath,
              new java.io.File(d, "documents.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            d.toString
          }
        val stream = s.readStream.schema(schema).parquet(streamDir)
        val toks = stream.select(col("doc_id"),
          TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))
        graft.streaming.StreamOps.scoreStream(toks, "doc_id", "toks", model)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.read.parquet(out)
          .select(col("doc_id"), round(col("xent"), 6).as("xent"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |e AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |f AS (SELECT w, count(*) AS cnt FROM e GROUP BY w),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM f)
        |SELECT doc_id, round(-avg(ln(CAST(cnt AS DOUBLE) / total)), 6) AS xent
        |FROM e JOIN f USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_allpairs_tfidf",  // exact tf-idf weighted-cosine ALL-PAIRS over
      // the corpus — the inverted-index APSS plan (Bayardo et al.
      // WWW'07) in Similarity.cosinePairsSparse: candidates from each
      // doc's rarest-first indexed prefix (suffix bound < θ ⇒ tail
      // can't carry a qualifying pair), exact dot-product verify.
      // Vocab is max_df-capped at 30% — the standard near-dup setting,
      // and the scale lever that keeps hot-term postings out of the
      // quadratic candidate join. Weights are the oracled q_tfidf
      // pipeline's (smoothed idf, L2-normalized, 6dp HALF_UP).
      (s, dir) => {
        val base = docsTokens(s, dir)
        val n = base.agg(count(lit(1)).as("n"))
        val vocab = Tfidf.docFreq(base, "doc_id", "toks")
          .crossJoin(n)
          .filter(col("df") <= lit(0.3) * col("n"))
          .withColumn("idf", log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
          .select(col("word"), col("idf"))
        val e = Tfidf.tfidfVectors(base, "doc_id", "toks", vocab, scale = 6)
          .filter(col("weight") > 0)
          .select(col("doc_id").as("id"), col("word"), col("weight").as("w"))
        Similarity.cosinePairsSparse(e, minCos = 0.5)
          .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
          .orderBy("id1", "id2")
      },
      Some(s"""WITH t AS ($SqlToks),
        |b AS (SELECT doc_id, toks, len(toks) AS len FROM t),
        |n AS (SELECT count(*) AS n FROM b),
        |dfreq AS (SELECT word, count(*) AS df FROM
        |  (SELECT doc_id, unnest(list_distinct(toks)) AS word FROM b) GROUP BY word),
        |vocab AS (SELECT word, ln((n + 1.0) / (df + 1.0)) + 1.0 AS idf
        |          FROM dfreq, n WHERE df <= 0.3 * n),
        |counts AS (SELECT doc_id, word, count(*) AS cnt FROM
        |  (SELECT doc_id, unnest(toks) AS word FROM b) GROUP BY doc_id, word),
        |w AS (SELECT c.doc_id, c.word,
        |        (CASE WHEN d.len = 0 THEN 0.0 ELSE CAST(c.cnt AS DOUBLE) / d.len END)
        |          * v.idf AS w
        |      FROM counts c JOIN vocab v USING (word)
        |      JOIN (SELECT doc_id, len FROM b) d USING (doc_id)),
        |u AS (SELECT doc_id, word,
        |        round(CASE WHEN nrm = 0 THEN 0.0 ELSE w / nrm END, 6) AS w
        |      FROM (SELECT doc_id, word, w,
        |              sqrt(sum(w * w) OVER (PARTITION BY doc_id)) AS nrm FROM w)),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, sum(a.w * b.w) AS cos
        |      FROM (SELECT * FROM u WHERE w > 0) a
        |      JOIN (SELECT * FROM u WHERE w > 0) b
        |        ON a.word = b.word AND a.doc_id < b.doc_id
        |      GROUP BY a.doc_id, b.doc_id)
        |SELECT id1, id2, round(cos, 6) AS cos FROM p WHERE cos >= 0.5
        |ORDER BY id1, id2""".stripMargin)),

    Q("q_contamination_frac",  // per-doc benchmark-overlap FRACTION (the
      // WIMBD/GPT-3-report contamination METRIC, vs q_decontaminate's
      // boolean drop): distinct 5-grams per corpus doc, fraction present
      // in the doc_id%7 eval set. The benchmark gram set broadcasts;
      // the corpus never shuffles — per-doc counts aggregate map-side.
      // Zero-hit docs are part of the contract (left join, count 0).
      (s, dir) => {
        // distinct grams as ROWS, not arrays: explode + hash + row-level
        // distinct is 4-5× faster here than array_distinct over an
        // unmaterialized transform (measured in MicroBench), and grams
        // join as 8-byte longs (xxhash64 collisions ~1e-11 at this
        // cardinality — the distinct-count contract is unchanged, the
        // q_ngram3 device). repartition first: the gate parquet is one
        // file → a 1-partition scan (same note as q_decontaminate_bloom).
        val e = docsTokens(s, dir)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), explode(Dedup.tokenShingles(col("toks"), 5)).as("gs"))
          .select(col("doc_id"), xxhash64(col("gs")).as("g"))
          .distinct()
          .localCheckpoint()
        val bench = e.filter(col("doc_id") % 7 === 0).select("g").distinct()
        val corpus = e.filter(col("doc_id") % 7 =!= 0)
        // inner-join first so only HITS reach the aggregate (the
        // contaminationHits shape), then left-join the k-row hit counts
        // back onto the per-doc counts — zero-hit docs stay in the
        // contract without dragging every miss row through the agg;
        // docs with no grams (< 5 tokens) have no rows, matching the
        // oracle's len(g5) > 0 filter
        val hits = corpus
          .join(broadcast(bench), Seq("g"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        corpus.groupBy(col("doc_id")).agg(count(lit(1)).cast("int").as("n_grams"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            round(coalesce(col("n_hits"), lit(0L)) / col("n_grams"), 6).as("frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 5 THEN []
        |        ELSE list_transform(range(1, len(toks) - 3),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |               || toks[i+3] || ' ' || toks[i+4]) END) AS g5
        |      FROM t),
        |g2 AS (SELECT doc_id, g5 FROM g WHERE len(g5) > 0),
        |bg AS (SELECT DISTINCT unnest(g5) AS g FROM g2 WHERE doc_id % 7 = 0),
        |cg AS (SELECT doc_id, CAST(len(g5) AS INT) AS n_grams, unnest(g5) AS g
        |       FROM g2 WHERE doc_id % 7 <> 0)
        |SELECT cg.doc_id, cg.n_grams, count(bg.g) AS n_hits,
        |       round(CAST(count(bg.g) AS DOUBLE) / cg.n_grams, 6) AS frac
        |FROM cg LEFT JOIN bg ON cg.g = bg.g
        |GROUP BY cg.doc_id, cg.n_grams ORDER BY doc_id""".stripMargin)),

    Q("q_snapshot_diff",  // corpus snapshot diff (CDC between two crawl
      // snapshots): old = docs ∉ id%7=3, new = docs ∉ id%11=5 with
      // id%13=1 texts rewritten — full outer join on id comparing
      // content hashes → added/removed/changed rows. Scale: both sides
      // hash-partition on doc_id (one co-partitioned shuffle join, AQE
      // handles skew); the texts themselves never move, only id+md5.
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
        val old = d.filter(col("doc_id") % 7 =!= 3)
          .select(col("doc_id"), md5(col("text")).as("h_old"), lit(1).as("in_old"))
        val nw = d.filter(col("doc_id") % 11 =!= 5)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 13 === 1, upper(col("text")))
              .otherwise(col("text"))).as("h_new"),
            lit(1).as("in_new"))
        old.join(nw, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when(col("in_new").isNull, lit("removed"))
              .when(col("in_old").isNull, lit("added"))
              .when(col("h_old") =!= col("h_new"), lit("changed")))
          .filter(col("status").isNotNull)
          .select(col("doc_id"), col("status"))
          .orderBy("doc_id")
      },
      Some("""WITH o AS (SELECT doc_id, md5(text) AS h_old FROM documents
        |        WHERE doc_id % 7 <> 3),
        |n AS (SELECT doc_id, md5(CASE WHEN doc_id % 13 = 1 THEN upper(text)
        |        ELSE text END) AS h_new FROM documents WHERE doc_id % 11 <> 5)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN o.h_old <> n.h_new THEN 'changed' END AS status
        |FROM o FULL JOIN n ON o.doc_id = n.doc_id
        |WHERE n.doc_id IS NULL OR o.doc_id IS NULL OR o.h_old <> n.h_new
        |ORDER BY doc_id""".stripMargin)),

    Q("q_dedup_report",  // dedup observability: the duplication-profile
      // histogram every dedup run reports before anything is dropped —
      // at DOC granularity (exact-dup group sizes over the content
      // hash) and LINE granularity (segments shared by k distinct
      // docs, the q_line_dedup threshold-tuning curve), unioned as
      // (level, sz, n_groups). Cheap chained aggregations, partial
      // map-side; the histogram inputs are one row per group/line.
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
        val doc = d.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz")).agg(count(lit(1)).as("n_groups"))
          .withColumn("level", lit("doc"))
        val line = d
          .select(col("doc_id"), explode(split(col("text"), " the ")).as("line"))
          .distinct()
          .groupBy(col("line")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz")).agg(count(lit(1)).as("n_groups"))
          .withColumn("level", lit("line"))
        doc.unionByName(line)
          .select(col("level"), col("sz"), col("n_groups"))
          .orderBy("level", "sz")
      },
      Some("""WITH gd AS (SELECT md5(text) AS h, count(*) AS sz
        |        FROM documents GROUP BY md5(text)),
        |hd AS (SELECT 'doc' AS level, sz, count(*) AS n_groups FROM gd GROUP BY sz),
        |p AS (SELECT doc_id, str_split(text, ' the ') AS parts FROM documents),
        |l AS (SELECT DISTINCT doc_id, unnest(parts) AS line FROM p),
        |gl AS (SELECT line, count(*) AS sz FROM l GROUP BY line),
        |hl AS (SELECT 'line' AS level, sz, count(*) AS n_groups FROM gl GROUP BY sz)
        |SELECT level, sz, n_groups FROM hd UNION ALL
        |SELECT level, sz, n_groups FROM hl ORDER BY level, sz""".stripMargin)),

    Q("q_stream_dedup",  // second ORACLED streaming row, this one
      // STATEFUL: exact dedup as dropDuplicates on the content hash
      // over a parquet file source → exactly-once parquet sink. The
      // emitted key SET is arrival-order-free (same keys whichever
      // duplicate wins), so the sink is deterministic and DuckDB's
      // SELECT DISTINCT oracles a stateful streaming query end-to-end.
      (s, dir) => {
        val out = Scratch.dir("stream-dedup-out")
        val cp = Scratch.dir("stream-dedup-cp")
        val schema = Tables.table(s, dir, "documents").schema
        val src = new java.io.File(s"$dir/documents.parquet")
        val streamDir =
          if (src.isDirectory) src.toString
          else {
            val d = new java.io.File(Scratch.dir("stream-dedup-src"))
            java.nio.file.Files.copy(src.toPath,
              new java.io.File(d, "documents.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            d.toString
          }
        s.readStream.schema(schema).parquet(streamDir)
          .select(md5(col("text")).as("h"))
          .dropDuplicates("h")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.read.parquet(out).select(col("h")).orderBy("h")
      },
      Some("SELECT DISTINCT md5(text) AS h FROM documents ORDER BY h")),

    Q("q_stream_decon",  // ORACLED streaming row exercising the
      // STREAM-STATIC JOIN: ingest-time decontamination — arriving
      // docs' 5-grams probe the static benchmark gram set (the same
      // doc_id%7 eval split as q_decontaminate) via a stateless
      // broadcast stream-static inner join, then a stateful
      // dropDuplicates emits each contaminated id exactly once into an
      // exactly-once parquet sink. The emitted id SET is
      // arrival-order-free, so the sink is deterministic and the batch
      // oracle covers join + dedup semantics end-to-end.
      (s, dir) => {
        val out = Scratch.dir("stream-decon-out")
        val cp = Scratch.dir("stream-decon-cp")
        val schema = Tables.table(s, dir, "documents").schema
        val src = new java.io.File(s"$dir/documents.parquet")
        val streamDir =
          if (src.isDirectory) src.toString
          else {
            val d = new java.io.File(Scratch.dir("stream-decon-src"))
            java.nio.file.Files.copy(src.toPath,
              new java.io.File(d, "documents.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            d.toString
          }
        // static side: checkpoint the gram ARRAYS before exploding —
        // Catalyst re-evaluates unaliased array-builders ~7× through
        // explode (the shingleHashes lesson; measured 7.2 s → 0.6 s here)
        val bench = docsTokens(s, dir)
          .filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), Dedup.tokenShingles(col("toks"), 5).as("g5"))
          .localCheckpoint()
          .select(explode(col("g5")).as("g"))
          .distinct()
        // stream side: a stream cannot localCheckpoint, so the gram
        // explosion crosses an ENCODER boundary (typed flatMap) — the
        // tokenize/shingle work runs exactly once per document
        import s.implicits._
        val stream = s.readStream.schema(schema).parquet(streamDir)
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))
          .as[(Long, Seq[String])]
          .flatMap { case (id, toks) =>
            if (toks.length < 5) Iterator.empty
            else toks.sliding(5).map(w => (id, w.mkString(" ")))
          }.toDF("doc_id", "g")
        graft.streaming.StreamOps.contaminatedGrams(stream, "doc_id", "g", bench)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
        // explicit schema: a zero-contamination run leaves the sink with
        // no data files, and schema inference would throw on the read-back
        s.read.schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType))))
          .parquet(out).select(col("doc_id")).orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 5 THEN []
        |        ELSE list_transform(range(1, len(toks) - 3),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |               || toks[i+3] || ' ' || toks[i+4]) END AS g5
        |      FROM t),
        |bg AS (SELECT DISTINCT unnest(g5) AS g FROM g WHERE doc_id % 7 = 0)
        |SELECT DISTINCT doc_id FROM
        |  (SELECT doc_id, unnest(g5) AS g FROM g WHERE doc_id % 7 <> 0)
        |JOIN bg USING (g) ORDER BY doc_id""".stripMargin)),

    Q("q_stream_window",  // third ORACLED streaming row — WATERMARKED,
      // WINDOWED, APPEND: hourly event-type counts with a 2 h watermark
      // over a parquet file source into an exactly-once append sink.
      // Append emits exactly the windows whose end is ≤ the FINAL
      // watermark (max event time − 2 h; AvailableNow runs the trailing
      // no-data batch that advances it); on static input that set is
      // closed-form, so DuckDB oracles watermark semantics themselves —
      // which windows a stateful streaming aggregation may finalize —
      // not just a stateless pass-through.
      (s, dir) => {
        val out = Scratch.dir("stream-window-out")
        val cp = Scratch.dir("stream-window-cp")
        val src = new java.io.File(s"$dir/events.parquet")
        val streamDir =
          if (src.isDirectory) src.toString
          else {
            val d = new java.io.File(Scratch.dir("stream-window-src"))
            java.nio.file.Files.copy(src.toPath,
              new java.io.File(d, "events.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            d.toString
          }
        val schema = s.read.parquet(streamDir).schema
        val stream = s.readStream.schema(schema).parquet(streamDir)
          // same NTZ-wall-clock → UTC-instant adaptation as Tables.events
          // (sessions pin spark.sql.session.timeZone=UTC); watermarks
          // need a TimestampType event-time column
          .select(col("ts").cast(org.apache.spark.sql.types.TimestampType).as("ts"),
            col("event_type"), col("value"))
        graft.streaming.StreamOps.hourlyCounts(stream)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.read.parquet(out).orderBy("hour_epoch", "event_type")
      },
      Some("""WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events)
        |SELECT epoch_ns(date_trunc('hour', ts)) // 1000000000 AS hour_epoch,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events, wm
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
        |GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin)),

    Q("q_containment_pairs",  // Broder CONTAINMENT ≥ 0.8 over word-3-
      // shingles — the quote/sub-document duplication detector (a short
      // doc fully embedded in a long one is ~1.0 containment but ~0.01
      // Jaccard, invisible to every Jaccard-thresholded query). Bucketed
      // in-bucket pair-gen with hot-bucket caps (Dedup.containmentPairs).
      (s, dir) => Dedup.containmentPairs(
          Dedup.shingleHashesViaArrays(docsTokens(s, dir), "doc_id", "toks", k = 3)
            .localCheckpoint(),  // referenced twice (sizes + buckets)
          minC = 0.8)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("id1", "id2"),
      Some(s"""WITH t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w, len(sh) AS sz FROM s),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
        |             max(a.sz) AS s1, max(b.sz) AS s2
        |      FROM e a JOIN e b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(inter AS DOUBLE) / least(s1, s2), 6) AS containment
        |FROM p WHERE CAST(inter AS DOUBLE) / least(s1, s2) >= 0.8
        |ORDER BY id1, id2""".stripMargin)),

    Q("q_cms_counts",  // Count-Min sketch (Cormode & Muthukrishnan 2003)
      // term-frequency estimation, VALUE-ORACLED: buckets are md5-derived
      // (Kirsch–Mitzenmacher double hashing, the q_decontaminate_bloom
      // device), so DuckDB rebuilds the d=4 × m cell table bit-for-bit —
      // the output is exact INCLUDING the sketch's overcounts. m=16 here
      // (not a production 2^20): the synthetic corpus has a 29-word
      // vocabulary, and only a width below it makes the oracle actually
      // exercise the collision/min-over-rows math rather than degenerate
      // to exact counts. Scale shape: the BUILD aggregates the raw token
      // stream straight into ≤ d·m cells (map-side partial agg into a
      // constant-size table — the vocabulary never shuffles to build the
      // sketch); only the evaluation harness (top-50 true counts) runs a
      // word-level aggregation, and the cell table broadcasts back.
      (s, dir) => {
        val d = 4; val m = 16
        val toks = docsTokens(s, dir).select(explode(col("toks")).as("w"))
          .localCheckpoint()  // two consumers: cells + true counts
        val cells = Sketches.cmsCells(toks, d, m)
        val top = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(50)
        Sketches.cmsEstimate(top, cells, d, m)
          .withColumn("over", col("est") - col("cnt"))
          .orderBy(col("cnt").desc, col("w"))
      },
      Some(s"""WITH t AS ($SqlToks),
        |e AS (SELECT unnest(toks) AS w FROM t),
        |hp AS (SELECT w,
        |         CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h1,
        |         CAST(('0x' || substr(md5(w), 9, 8)) AS BIGINT) AS h2
        |       FROM e),
        |cells AS (SELECT j, (h1 + j * h2) % 16 AS pos, count(*) AS cell
        |          FROM hp CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
        |          GROUP BY 1, 2),
        |top AS (SELECT w, count(*) AS cnt FROM e GROUP BY w
        |        ORDER BY cnt DESC, w LIMIT 50),
        |probe AS (SELECT t2.w, t2.cnt, j,
        |            (CAST(('0x' || substr(md5(t2.w), 1, 8)) AS BIGINT)
        |             + j * CAST(('0x' || substr(md5(t2.w), 9, 8)) AS BIGINT))
        |            % 16 AS pos
        |          FROM top t2 CROSS JOIN (SELECT unnest(range(0, 4)) AS j))
        |SELECT p.w, p.cnt, min(c.cell) AS est, min(c.cell) - p.cnt AS over
        |FROM probe p JOIN cells c ON p.j = c.j AND p.pos = c.pos
        |GROUP BY p.w, p.cnt ORDER BY p.cnt DESC, p.w""".stripMargin)),

    Q("q_source_kl",  // corpus-drift analytics: per-source unigram KL
      // divergence from the whole-corpus distribution — the quantitative
      // "how different is this domain" number behind mixture decisions
      // (the measurement side of DSIR's importance weighting). One
      // corpus explode into (source, word) counts; every join after that
      // is on vocabulary-sized frames, the corpus never moves again.
      (s, dir) => {
        val toks = Tables.table(s, dir, "documents")
          .select(col("source"),
            explode(TextOps.tokenizeFiltered(col("text"), Stop, Nil)).as("w"))
        val sw = toks.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
          .localCheckpoint()  // feeds all three frames below
        val srcTot = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
        val corp = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
        val tot = corp.agg(sum(col("c_w")).as("n"))
        sw.join(srcTot, "source").join(corp, "w").crossJoin(tot)
          .withColumn("term", (col("c_sw") / col("n_s"))
            * log((col("c_sw") / col("n_s")) / (col("c_w") / col("n"))))
          .groupBy(col("source"), col("n_s"))
          .agg(round(sum(col("term")), 6).as("kl"))
          .select(col("source"), col("n_s").as("n_tokens"), col("kl"))
          .orderBy("source")
      },
      Some("""WITH e AS (SELECT source, unnest(list_filter(
        |        regexp_extract_all(lower(text), '\b\w\w+\b'),
        |        x -> x NOT IN ('the', 'a'))) AS w FROM documents),
        |sw AS (SELECT source, w, count(*) AS c_sw FROM e GROUP BY source, w),
        |st AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY source),
        |cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY w),
        |n AS (SELECT sum(c_w) AS n FROM cw)
        |SELECT sw.source, CAST(max(st.n_s) AS BIGINT) AS n_tokens,
        |       round(sum((CAST(c_sw AS DOUBLE) / st.n_s)
        |         * ln((CAST(c_sw AS DOUBLE) / st.n_s) / (CAST(c_w AS DOUBLE) / n.n))), 6)
        |         AS kl
        |FROM sw JOIN st USING (source) JOIN cw USING (w) CROSS JOIN n
        |GROUP BY sw.source ORDER BY source""".stripMargin)),

    Q("q_script_mix",  // character-class composition per doc (the script-
      // mixture screen run before lang-ID: a doc that is 40% digits or
      // 30% punctuation is table dumps/markup, not prose). Pure map-side
      // regexp arithmetic over the scan — zero shuffles past the sort.
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
        val n = length(col("text"))
        val letters = n - length(regexp_replace(col("text"), "[A-Za-z]", ""))
        val digits = n - length(regexp_replace(col("text"), "[0-9]", ""))
        val spaces = n - length(regexp_replace(col("text"), "[ \\t\\n]", ""))
        d.select(col("doc_id"), n.as("n_chars"),
            round(letters / n.cast("double"), 6).as("f_letter"),
            round(digits / n.cast("double"), 6).as("f_digit"),
            round(spaces / n.cast("double"), 6).as("f_space"),
            round((n - letters - digits - spaces) / n.cast("double"), 6).as("f_other"))
          .filter(col("n_chars") > 0)
          .orderBy("doc_id")
      },
      Some("""WITH m AS (SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        |  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS l,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS d,
        |  length(text) - length(regexp_replace(text, '[ \t\n]', '', 'g')) AS s
        |FROM documents)
        |SELECT doc_id, n_chars,
        |  round(CAST(l AS DOUBLE) / n_chars, 6) AS f_letter,
        |  round(CAST(d AS DOUBLE) / n_chars, 6) AS f_digit,
        |  round(CAST(s AS DOUBLE) / n_chars, 6) AS f_space,
        |  round(CAST(n_chars - l - d - s AS DOUBLE) / n_chars, 6) AS f_other
        |FROM m WHERE n_chars > 0 ORDER BY doc_id""".stripMargin)),

    Q("q_zipf_slope",  // corpus Zipf exponent: least-squares slope of
      // ln(freq) on ln(rank) over the top-1000 vocabulary — the one-
      // number sanity check that a corpus looks like natural language
      // (≈ −1) rather than logs or tables. The vocabulary aggregation is
      // the only corpus-sized step; the regression runs on 1000 rows
      // (TakeOrdered top-k, then a single bounded 1000-row window).
      (s, dir) => {
        val counts = docsTokens(s, dir)
          .select(explode(col("toks")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(1000)
        val ranked = counts.withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("w"))))
        val xy = ranked.select(log(col("r")).as("x"), log(col("cnt")).as("y"))
        xy.agg(count(lit(1)).as("n_words"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
          .select(col("n_words"),
            round((col("n_words") * col("sxy") - col("sx") * col("sy"))
              / (col("n_words") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
            round((col("sy") - ((col("n_words") * col("sxy") - col("sx") * col("sy"))
              / (col("n_words") * col("sxx") - col("sx") * col("sx"))) * col("sx"))
              / col("n_words"), 6).as("intercept"))
      },
      Some(s"""WITH t AS ($SqlToks),
        |c AS (SELECT w, count(*) AS cnt FROM
        |        (SELECT unnest(toks) AS w FROM t) GROUP BY w
        |      ORDER BY cnt DESC, w LIMIT 1000),
        |r AS (SELECT ln(row_number() OVER (ORDER BY cnt DESC, w)) AS x,
        |             ln(cnt) AS y FROM c),
        |a AS (SELECT count(*) AS n_words, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx FROM r)
        |SELECT n_words,
        |  round((n_words * sxy - sx * sy) / (n_words * sxx - sx * sx), 6) + 0.0
        |    AS slope,
        |  round((sy - ((n_words * sxy - sx * sy) / (n_words * sxx - sx * sx)) * sx)
        |    / n_words, 6) + 0.0 AS intercept
        |FROM a""".stripMargin)),

    Q("q_lexical_diversity",  // per-doc lexical-diversity metrics: token
      // count, type count, type-token ratio, and Shannon entropy of the
      // in-doc word distribution — the richness screen next to the
      // q_repetition redundancy signals. One explode into (doc, word)
      // counts; the entropy normalizer is a per-doc window on that
      // already-aggregated frame, so the corpus shuffles once.
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        docsTokens(s, dir)
          .select(col("doc_id"), explode(col("toks")).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
          .withColumn("n", sum(col("cnt")).over(w))
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n_toks"), count(lit(1)).as("n_types"),
            round(count(lit(1)) / max(col("n")).cast("double"), 6).as("ttr"),
            round(-sum((col("cnt") / col("n").cast("double"))
              * log(col("cnt") / col("n").cast("double"))), 6).as("entropy"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |c AS (SELECT doc_id, w, count(*) AS cnt FROM
        |        (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY doc_id, w),
        |x AS (SELECT doc_id, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM c)
        |SELECT doc_id, max(n) AS n_toks, count(*) AS n_types,
        |       round(CAST(count(*) AS DOUBLE) / max(n), 6) AS ttr,
        |       round(-sum((CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n)), 6)
        |         AS entropy
        |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_cooccur_pmi",  // word co-occurrence PMI (Church & Hanks 1990):
      // within-doc DISTINCT co-occurrence counts → pmi =
      // ln(c_ab·N / (df_a·df_b)), top-100 by rounded pmi with a
      // lexicographic tie-break (rounding BEFORE ordering keeps the
      // LIMIT boundary engine-independent). Scale: co-occurrence is
      // vocabulary-bounded, not corpus-bounded — real corpora cap to a
      // top-V vocab first, and the per-doc self-join then emits ≤ V²/2
      // rows per doc that collapse map-side into the ≤ V²/2-row global
      // frame every later join runs on.
      (s, dir) => {
        val e = docsTokens(s, dir)
          .select(col("doc_id"), explode(array_distinct(col("toks"))).as("w"))
          .localCheckpoint()  // feeds pairs, dfs, and N
        val n = e.select(col("doc_id")).distinct().agg(count(lit(1)).as("n"))
        val dfreq = e.groupBy(col("w")).agg(count(lit(1)).as("df"))
        val pairs = e.as("a")
          .join(e.as("b"),
            col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
          .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
          .agg(count(lit(1)).as("c_ab"))
        pairs
          .join(dfreq.select(col("w").as("w1"), col("df").as("df1")), "w1")
          .join(dfreq.select(col("w").as("w2"), col("df").as("df2")), "w2")
          .crossJoin(n)
          .select(col("w1"), col("w2"), col("c_ab"),
            round(log((col("c_ab") * col("n")).cast("double")
              / (col("df1") * col("df2"))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(100)
      },
      Some(s"""WITH t AS ($SqlToks),
        |e AS (SELECT doc_id, unnest(list_distinct(toks)) AS w FROM t),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM e),
        |dfreq AS (SELECT w, count(*) AS df FROM e GROUP BY w),
        |p AS (SELECT a.w AS w1, b.w AS w2, count(*) AS c_ab
        |      FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.w < b.w
        |      GROUP BY a.w, b.w)
        |SELECT w1, w2, c_ab,
        |       round(ln(CAST(c_ab * n.n AS DOUBLE) / (d1.df * d2.df)), 6) + 0.0 AS pmi
        |FROM p JOIN dfreq d1 ON p.w1 = d1.w JOIN dfreq d2 ON p.w2 = d2.w
        |CROSS JOIN n
        |ORDER BY pmi DESC, w1, w2 LIMIT 100""".stripMargin)),

    Q("q_embed_norm_stats",  // embedding-table hygiene: per-label L2-norm
      // distribution (count/min/max/mean) — the "are these vectors even
      // normalized" check run before any cosine pipeline. Norms via the
      // sequential-IEEE DotProduct codegen kernel after the mandatory
      // float→double cast; one map-side pass plus a 20-row aggregate.
      (s, dir) => {
        val nrm = Similarity.l2norm(KMeansOps.asDouble(col("embedding")))
        Tables.table(s, dir, "embeddings")
          .select(col("label"), nrm.as("nrm"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(min(col("nrm")), 6).as("min_norm"),
            round(max(col("nrm")), 6).as("max_norm"),
            round(avg(col("nrm")), 6).as("avg_norm"))
          .orderBy("label")
      },
      Some("""WITH x AS (SELECT label,
        |        sqrt(list_sum(list_transform(embedding,
        |          v -> CAST(v AS DOUBLE) * v))) AS nrm
        |      FROM embeddings)
        |SELECT label, count(*) AS n,
        |       round(min(nrm), 6) AS min_norm,
        |       round(max(nrm), 6) AS max_norm,
        |       round(avg(nrm), 6) AS avg_norm
        |FROM x GROUP BY label ORDER BY label""".stripMargin)),

    Q("q_stream_session",  // fourth ORACLED streaming row — CUSTOM STATE
      // with EVENT-TIME TIMEOUT: the flatMapGroupsWithState gap
      // sessionizer over a parquet file source into an exactly-once
      // append sink. The emitted set is closed-form on static input:
      // a session closed by its successor event (any non-final session
      // of a user — the whole corpus arrives in one batch) is emitted
      // in the data batch; a user's FINAL session is emitted only if
      // its timeout (end + gap) fell strictly before the final
      // watermark (max event time − 10 s, advanced by AvailableNow's
      // trailing no-data batch). The oracle re-derives exactly that
      // union — so timeout semantics of custom keyed state are what is
      // being hash-checked, not just session arithmetic.
      (s, dir) => {
        import s.implicits._
        val out = Scratch.dir("stream-session-out")
        val cp = Scratch.dir("stream-session-cp")
        val src = new java.io.File(s"$dir/events.parquet")
        val streamDir =
          if (src.isDirectory) src.toString
          else {
            val d = new java.io.File(Scratch.dir("stream-session-src"))
            java.nio.file.Files.copy(src.toPath,
              new java.io.File(d, "events.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            d.toString
          }
        val schema = s.read.parquet(streamDir).schema
        val stream = s.readStream.schema(schema).parquet(streamDir)
          .select(col("user_id"),
            col("ts").cast(org.apache.spark.sql.types.TimestampType).as("ts"))
          .as[graft.streaming.StreamOps.SEv]
        graft.streaming.StreamOps
          .sessionizeStream(stream, gapMs = 1800L * 1000, watermarkDelay = "10 seconds")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.read.parquet(out)
          .select(col("user_id"),
            expr("start_ms div 1000").as("start_s"),
            expr("end_ms div 1000").as("end_s"),
            col("n_events"))
          .orderBy("user_id", "start_s")
      },
      Some("""WITH g AS (SELECT user_id, epoch_ms(ts) AS tm,
        |        lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |      FROM events),
        |f AS (SELECT user_id, tm,
        |        CASE WHEN prev IS NULL OR tm - prev > 1800000 THEN 1 ELSE 0 END AS nw
        |      FROM g),
        |sid AS (SELECT user_id, tm,
        |          sum(nw) OVER (PARTITION BY user_id ORDER BY tm
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |        FROM f),
        |ses AS (SELECT user_id, s, count(*) AS n_events,
        |          min(tm) AS start_ms, max(tm) AS end_ms
        |        FROM sid GROUP BY user_id, s),
        |mx AS (SELECT user_id, max(s) AS last_s FROM ses GROUP BY user_id),
        |wm AS (SELECT max(epoch_ms(ts)) - 10000 AS w FROM events)
        |SELECT ses.user_id,
        |  CAST(start_ms // 1000 AS BIGINT) AS start_s,
        |  CAST(end_ms // 1000 AS BIGINT) AS end_s, n_events
        |FROM ses JOIN mx USING (user_id) CROSS JOIN wm
        |WHERE ses.s < mx.last_s OR ses.end_ms + 1800000 < wm.w
        |ORDER BY user_id, start_s""".stripMargin)),

    Q("q_stream_join",  // fifth ORACLED streaming row — STREAM-STREAM
      // interval join with double-sided watermarks: signup events joined
      // to error events of the same user within the preceding hour,
      // parquet file source on BOTH sides, exactly-once append sink.
      // Inner stream-stream joins emit a match in the batch where both
      // sides have arrived and watermark eviction only runs AFTER a
      // batch; static input arrives in ONE batch, so the emitted set is
      // exactly the batch join — the oracle is the plain SQL interval
      // join, and what the hash compare asserts is that bounded join
      // state drops nothing it shouldn't.
      (s, dir) => {
        val out = Scratch.dir("stream-join-out")
        val cp = Scratch.dir("stream-join-cp")
        val src = new java.io.File(s"$dir/events.parquet")
        val streamDir =
          if (src.isDirectory) src.toString
          else {
            val d = new java.io.File(Scratch.dir("stream-join-src"))
            java.nio.file.Files.copy(src.toPath,
              new java.io.File(d, "events.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            d.toString
          }
        val schema = s.read.parquet(streamDir).schema
        def side(tpe: String, p: String) =
          s.readStream.schema(schema).parquet(streamDir)
            .filter(col("event_type") === tpe)
            .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_uid"),
              col("ts").cast(org.apache.spark.sql.types.TimestampType).as(s"${p}_ts"))
        graft.streaming.StreamOps.streamIntervalJoin(
            side("error", "l"), side("signup", "r"),
            "l_uid", "r_uid", "l_ts", "r_ts", lagSeconds = 3600)
          .select(col("l_id").as("error_id"), col("r_id").as("signup_id"),
            col("l_uid").as("user_id"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.read.parquet(out).orderBy("error_id", "signup_id")
      },
      Some("""SELECT e.event_id AS error_id, s.event_id AS signup_id,
        |       e.user_id AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON s.user_id = e.user_id
        |  AND epoch_ns(e.ts) - epoch_ns(s.ts) BETWEEN 0 AND 3600000000000
        |ORDER BY error_id, signup_id""".stripMargin)),

    Q("q_bm25",  // Okapi BM25 retrieval scoring (Robertson & Walker,
      // SIGIR'94; k1=1.2, b=0.75) for a fixed 3-term query — the
      // classic-IR ranker next to the tf-idf/cosine family. One corpus
      // explode into per-doc term counts; df/avglen are k-row side
      // aggregates that broadcast. Top-50 by rounded score (rounded
      // BEFORE ordering, doc_id tie-break — engine-independent LIMIT).
      (s, dir) => {
        val qTerms = Seq("join", "hash", "filter")
        val base = docsTokens(s, dir)
        val lens = base.select(col("doc_id"), size(col("toks")).as("len"))
        val stats = lens.agg(avg(col("len")).as("avglen"),
          count(lit(1)).as("n"))
        val tf = base
          .select(col("doc_id"), explode(col("toks")).as("w"))
          .filter(col("w").isin(qTerms: _*))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        tf.join(broadcast(dfreq), "w")
          .join(lens, "doc_id").crossJoin(broadcast(stats))
          .withColumn("idf",
            log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
          .withColumn("s", col("idf") * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("len") / col("avglen"))))
          .groupBy(col("doc_id")).agg(round(sum(col("s")), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(50)
      },
      Some(s"""WITH t AS ($SqlToks),
        |lens AS (SELECT doc_id, CAST(len(toks) AS INT) AS len FROM t),
        |a AS (SELECT avg(len) AS avglen, count(*) AS n FROM lens),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM
        |         (SELECT doc_id, unnest(toks) AS w FROM t)
        |       WHERE w IN ('join', 'hash', 'filter') GROUP BY doc_id, w),
        |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |sc AS (SELECT tf.doc_id,
        |         ln((a.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |           * (tf.tf * 2.2)
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * l.len / a.avglen)) AS s
        |       FROM tf JOIN dfreq d USING (w) JOIN lens l USING (doc_id)
        |       CROSS JOIN a)
        |SELECT doc_id, round(sum(s), 6) AS score FROM sc
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)),

    Q("q_rrf_fusion",  // reciprocal-rank fusion (Cormack et al.,
      // SIGIR'09: Σ 1/(60+rank)) of two independent text rankers —
      // BM25 and normalized-tf-idf query cosine — for the same 3-term
      // query. The two rank lists are k-row frames (per-ranker top-100);
      // fusion is a tiny outer join, absent ranks contribute nothing.
      // Rounded-before-ordered top-20 with doc_id tie-break.
      (s, dir) => {
        val qTerms = Seq("join", "hash", "filter")
        val base = docsTokens(s, dir)
        val lens = base.select(col("doc_id"), size(col("toks")).as("len"))
        val stats = lens.agg(avg(col("len")).as("avglen"), count(lit(1)).as("n"))
        val tf = base
          .select(col("doc_id"), explode(col("toks")).as("w"))
          .filter(col("w").isin(qTerms: _*))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        val bm25 = tf.join(broadcast(dfreq), "w")
          .join(lens, "doc_id").crossJoin(broadcast(stats))
          .withColumn("s",
            log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
              * (col("tf") * lit(2.2))
              / (col("tf") + lit(1.2) *
                (lit(0.25) + lit(0.75) * col("len") / col("avglen"))))
          .groupBy(col("doc_id")).agg(round(sum(col("s")), 6).as("score"))
        // ranker 2: plain query-overlap tf/len weight (a cosine-lite
        // lexical scorer deliberately DIFFERENT from bm25)
        val lex = tf.join(lens, "doc_id")
          .groupBy(col("doc_id"))
          .agg(round(sum(col("tf") / col("len").cast("double")), 6).as("score"))
        def ranks(df: DataFrame) = df
          .orderBy(col("score").desc, col("doc_id")).limit(100)
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))))
          .select(col("doc_id"), col("r"))
        ranks(bm25).withColumnRenamed("r", "r1")
          .join(ranks(lex).withColumnRenamed("r", "r2"), Seq("doc_id"), "full_outer")
          .withColumn("rrf", round(
            coalesce(lit(1.0) / (lit(60) + col("r1")), lit(0.0))
              + coalesce(lit(1.0) / (lit(60) + col("r2")), lit(0.0)), 6))
          .select(col("doc_id"), col("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH t AS ($SqlToks),
        |lens AS (SELECT doc_id, CAST(len(toks) AS INT) AS len FROM t),
        |a AS (SELECT avg(len) AS avglen, count(*) AS n FROM lens),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM
        |         (SELECT doc_id, unnest(toks) AS w FROM t)
        |       WHERE w IN ('join', 'hash', 'filter') GROUP BY doc_id, w),
        |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |bm AS (SELECT doc_id, round(sum(
        |         ln((a.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |           * (tf.tf * 2.2)
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * l.len / a.avglen))), 6) AS score
        |       FROM tf JOIN dfreq d USING (w) JOIN lens l USING (doc_id)
        |       CROSS JOIN a GROUP BY doc_id),
        |lx AS (SELECT tf.doc_id,
        |         round(sum(CAST(tf.tf AS DOUBLE) / l.len), 6) AS score
        |       FROM tf JOIN lens l USING (doc_id) GROUP BY tf.doc_id),
        |r1 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        |       FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT 100)),
        |r2 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        |       FROM (SELECT * FROM lx ORDER BY score DESC, doc_id LIMIT 100))
        |SELECT COALESCE(r1.doc_id, r2.doc_id) AS doc_id,
        |  round(COALESCE(1.0 / (60 + r1.r), 0) + COALESCE(1.0 / (60 + r2.r), 0), 6)
        |    AS rrf
        |FROM r1 FULL JOIN r2 ON r1.doc_id = r2.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin)),

    Q("q_dp_counts",  // differential-privacy-style noisy release: per-
      // source doc counts + seeded Laplace noise (inverse-CDF transform
      // of a KEYED-HASH uniform — the q_stratified_sample device, so the
      // "randomness" is a pure function of the key and both engines
      // reproduce the release bit-for-bit; b = 1/ε = 2). The noisy
      // count, the exact count, and the noise are all value-oracled —
      // what the gate checks is the exact noise arithmetic an auditable
      // DP release needs.
      (s, dir) => {
        val u = (conv(substring(md5(concat(col("source"), lit("|dp1"))), 1, 8), 16, 10)
          .cast("long") + lit(0.5)) / lit(4294967296.0) - lit(0.5)
        val b = lit(2.0)
        Tables.table(s, dir, "documents")
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .withColumn("u", u)
          .withColumn("noise",
            round(-b * signum(col("u")) * log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
          .select(col("source"), col("n_docs"), col("noise"),
            round(col("n_docs") + col("noise"), 6).as("noisy"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |u AS (SELECT source, n_docs,
        |        (CAST(('0x' || substr(md5(source || '|dp1'), 1, 8)) AS BIGINT) + 0.5)
        |          / 4294967296.0 - 0.5 AS u
        |      FROM c)
        |SELECT source, n_docs,
        |  round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 6) + 0.0 AS noise,
        |  round(n_docs + round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 6), 6) + 0.0
        |    AS noisy
        |FROM u ORDER BY source""".stripMargin)),

    Q("q_epoch_mix",  // fractional-EPOCH dataset mixing — the way real
      // pretraining recipes are written ("wiki ×2.5 epochs, web ×0.3";
      // GPT-3 Table 2.2 / LLaMA Table 1): floor(e) full deterministic
      // copies per doc plus one extra copy for the keyed-hash-sampled
      // e−floor(e) fraction (the 1/256-quantized q_stratified_sample
      // device — engine-portable, no RNG state). Replication is an
      // explode over a per-row sequence and the fraction test is a
      // map-side predicate: no shuffle at any corpus size beyond the
      // output sort.
      (s, dir) => {
        val sn = expr("CAST(substring(source, 4) AS INT)")
        val epochs = when(sn < 5, lit(2.5)).when(sn < 10, lit(1.0)).otherwise(lit(0.3))
        val d = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("__full", floor(epochs).cast("int"))
          .withColumn("__thr", format_string("%02x",
            floor((epochs - floor(epochs)) * 256).cast("int")))
        val fullCopies = d.filter(col("__full") >= 1)
          .select(col("doc_id"), col("source"),
            explode(sequence(lit(1), col("__full"))).as("copy"))
        val extra = d.filter(
            substring(md5(concat_ws("_", lit("epoch"), col("doc_id").cast("string"))),
              1, 2) < col("__thr"))
          .select(col("doc_id"), col("source"), (col("__full") + 1).as("copy"))
        fullCopies.unionByName(extra).orderBy("source", "doc_id", "copy")
      },
      Some("""WITH d AS (SELECT doc_id, source,
        |        CAST(substr(source, 4, 10) AS INT) AS sn FROM documents),
        |e AS (SELECT doc_id, source,
        |        CASE WHEN sn < 5 THEN 2.5 WHEN sn < 10 THEN 1.0 ELSE 0.3 END AS ep
        |      FROM d),
        |p AS (SELECT doc_id, source, CAST(floor(ep) AS INT) AS fl,
        |        printf('%02x', CAST(floor((ep - floor(ep)) * 256) AS INT)) AS thr
        |      FROM e),
        |fullc AS (SELECT doc_id, source, CAST(i AS INT) AS copy
        |          FROM p, LATERAL unnest(range(1, fl + 1)) AS u(i) WHERE fl >= 1),
        |extra AS (SELECT doc_id, source, fl + 1 AS copy FROM p
        |          WHERE substr(md5('epoch_' || CAST(doc_id AS VARCHAR)), 1, 2) < thr)
        |SELECT doc_id, source, copy FROM fullc
        |UNION ALL SELECT doc_id, source, CAST(copy AS INT) FROM extra
        |ORDER BY source, doc_id, copy""".stripMargin)),

    Q("q_split_leakage_safe",  // leakage-safe train/val/test split: the
      // split key is the duplicate-cluster representative, so all copies
      // of a document land in the SAME split — the train-test
      // contamination path that per-doc random splits open and
      // exact-match decontamination misses. Cluster provenance here is
      // exact content groups (min-id rep per md5(text) group — cheap,
      // fully deterministic); [[Dedup.splitByCluster]] accepts any
      // cluster labeling incl. the CC output (DedupSpec covers the
      // near-dup-cluster case). Corpus side is one broadcast join + a
      // map-side md5 bucket: no corpus shuffle at any scale.
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        val clusters = docs.select(col("doc_id").as("id"), col("text"))
          .withColumn("rep", min(col("id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
          .select("id", "rep")
        Dedup.splitByCluster(docs.select(col("doc_id")), "doc_id", clusters,
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "r7")
          .select(col("doc_id"), col("split"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY md5(text)) AS rep
        |      FROM documents),
        |h AS (SELECT doc_id,
        |        substring(md5('r7' || '_' || CAST(rep AS VARCHAR)), 1, 4) AS hx
        |      FROM g)
        |SELECT doc_id, CASE WHEN hx < 'cccc' THEN 'train'
        |                    WHEN hx < 'e666' THEN 'val'
        |                    ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin)),

    Q("q_mixture",  // domain-mixture report: per-source token totals and
      // corpus fraction — the numbers a mixture/temperature-sampling
      // plan starts from; one partial-agg groupBy + a 1-row broadcast
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
          .select(col("source"),
            size(TextOps.tokenizeFiltered(col("text"), Stop, Nil)).as("n"))
        val tot = d.agg(sum(col("n")).as("tot"))
        d.groupBy("source").agg(sum(col("n")).as("toks"))
          .crossJoin(broadcast(tot))
          .select(col("source"), col("toks"),
            round(col("toks") / col("tot"), 6).as("frac"))
          .orderBy("source")
      },
      Some(s"""WITH t AS ($SqlToks),
        |d AS (SELECT d.source, len(t.toks) AS n
        |      FROM t JOIN documents d USING (doc_id)),
        |g AS (SELECT source, CAST(sum(n) AS BIGINT) AS toks FROM d GROUP BY source)
        |SELECT source, toks,
        |  round(toks / (SELECT CAST(sum(n) AS DOUBLE) FROM d), 6) AS frac
        |FROM g ORDER BY source""".stripMargin)),

    Q("q_temperature_mix",  // Gopher/PaLM-style temperature mixture
      // resampling: per-source token shares flattened toward uniform
      // with T=2 (q_s ∝ p_s^(1/2)); the most over-target source keeps
      // everything, the rest downsample by keyed hash. Rate table =
      // one tiny groupBy broadcast back; keep/drop is map-side — no
      // corpus shuffle, no driver collect, reproducible on any engine.
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextOps.tokenizeFiltered(col("text"), Stop, Nil))
              .cast("double").as("w"))
        IdOps.temperatureSample(d, "doc_id", "source", "w",
            temperature = 2.0, salt = "mix")
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |d AS (SELECT t.doc_id, dd.source, len(t.toks) AS n
        |      FROM t JOIN documents dd ON dd.doc_id = t.doc_id),
        |g AS (SELECT source, CAST(sum(n) AS DOUBLE) AS ns FROM d GROUP BY source),
        |z AS (SELECT sum(ns) AS ntot, sum(pow(ns, 0.5)) AS zz FROM g),
        |r AS (SELECT source, pow(ns, -0.5) * ntot / zz AS qp FROM g, z),
        |r2 AS (SELECT source, qp / (SELECT max(qp) FROM r) AS rate FROM r),
        |thr AS (SELECT source, CASE WHEN rate >= 1.0 - 1e-9 THEN 'zz'
        |          ELSE printf('%02x', CAST(floor(rate * 256 + 1e-9) AS INT)) END AS th
        |        FROM r2)
        |SELECT dd.doc_id, dd.source FROM documents dd JOIN thr USING (source)
        |WHERE substring(md5('mix' || '_' || CAST(dd.doc_id AS VARCHAR)), 1, 2) < th
        |ORDER BY doc_id""".stripMargin)),

    Q("q_llm_pipeline",  // the WHOLE training-data curation funnel in one
      // composed plan, value-oracled end-to-end: PII scrub → tokenize →
      // quality floor → exact dedup (min-id per fingerprint) →
      // benchmark decontamination (%7 eval split) → stratified source
      // rebalance (even 50%, odd 100%) → 128-token sequence packing via
      // the at-scale offset form. Every stage is the already-oracled
      // operator; this query proves they COMPOSE — the "switch your
      // pipeline to this library" demonstration
      (s, dir) => {
        val toks = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokenizeFiltered(
              TextOps.redactPii(col("text")), Stop, Nil).as("toks"))
          .localCheckpoint()
        val quality = toks.filter(TextStats.qualityScore(col("toks"), Stop) >= 0.5)
        val deduped = Dedup.dropDupsByKey(
          quality.withColumn("fp", TextStats.contentFingerprint(col("toks"))),
          "doc_id", "fp")
        val grams = deduped
          .withColumn("g5", Dedup.tokenShingles(col("toks"), 5))
          .localCheckpoint()
        val bench = toks.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), Dedup.tokenShingles(col("toks"), 5).as("g5"))
        val corp = grams.filter(col("doc_id") % 7 =!= 0)
        val clean = Dedup.decontaminate(
          corp.drop("g5"), "doc_id",
          Dedup.contaminationHits(corp, "doc_id", "g5", bench, "g5"))
        val sampled = IdOps.stratifiedSampleByHash(
          clean, "doc_id", "source",
          rates = (0 until 20).map(i =>
            s"src$i" -> (if (i % 2 == 0) 0.5 else 1.0)).toMap,
          salt = "e2e")
        TextOps.packSequencesAtScale(
            sampled.select(col("doc_id"), col("source"), size(col("toks")).as("n_toks")),
            "doc_id", "n_toks", budget = 128)
          .select(col("doc_id"), col("source"), col("n_toks"),
            col("tok_offset"), col("seq_first"), col("seq_last"))
          .orderBy("doc_id")
      },
      Some(s"""WITH s0 AS (SELECT doc_id, source,
        |  regexp_replace(regexp_replace(text,
        |    '${TextOps.EmailRe}', '<PII>', 'g'),
        |    '${TextOps.PhoneRe}', '<PII>', 'g') AS text FROM documents),
        |t AS (SELECT doc_id, source,
        |  list_filter(regexp_extract_all(lower(text), '\\b\\w\\w+\\b'),
        |    x -> x NOT IN ('the', 'a')) AS toks FROM s0),
        |q AS (SELECT * FROM t WHERE $SqlQuality >= 0.5),
        |f AS (SELECT *, md5(array_to_string(toks, ' ')) AS fp FROM q),
        |d AS (SELECT doc_id, source, toks FROM f
        |      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
        |g AS (SELECT doc_id, source, toks, CASE WHEN len(toks) < 5 THEN []
        |        ELSE list_transform(range(1, len(toks) - 3),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |               || toks[i+3] || ' ' || toks[i+4]) END AS g5
        |      FROM d),
        |bg AS (SELECT DISTINCT unnest(CASE WHEN len(toks) < 5 THEN []
        |         ELSE list_transform(range(1, len(toks) - 3),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |                || toks[i+3] || ' ' || toks[i+4]) END) AS gg
        |       FROM t WHERE doc_id % 7 = 0),
        |cg AS (SELECT DISTINCT doc_id, gr FROM
        |        (SELECT doc_id, unnest(g5) AS gr FROM g WHERE doc_id % 7 <> 0)),
        |bad AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg ON cg.gr = bg.gg),
        |clean AS (SELECT doc_id, source, toks FROM g
        |          WHERE doc_id % 7 <> 0
        |            AND doc_id NOT IN (SELECT doc_id FROM bad)),
        |samp AS (SELECT doc_id, source, len(toks) AS n_toks FROM clean
        |         WHERE substr(md5('e2e_' || CAST(doc_id AS VARCHAR)), 1, 2) <
        |           CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
        |                THEN '80' ELSE 'zz' END),
        |o AS (SELECT doc_id, source, n_toks,
        |        COALESCE(sum(n_toks) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
        |      FROM samp)
        |SELECT doc_id, source, CAST(n_toks AS INT) AS n_toks,
        |  CAST(tok_offset AS BIGINT) AS tok_offset,
        |  CAST(tok_offset // 128 AS BIGINT) AS seq_first,
        |  CAST(CASE WHEN n_toks = 0 THEN tok_offset // 128
        |       ELSE (tok_offset + n_toks - 1) // 128 END AS BIGINT) AS seq_last
        |FROM o ORDER BY doc_id""".stripMargin)),

    Q("q_top_per_source",  // per-domain cap: the 10 best-quality docs per
      // source (window partitioned BY SOURCE — many bounded partitions,
      // no global ordering; ties broken by doc_id for determinism)
      (s, dir) => {
        val scored = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextStats.qualityScore(
              TextOps.tokenizeFiltered(col("text"), Stop, Nil), Stop).as("q"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("q").desc, col("doc_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(col("doc_id"), col("source"), round(col("q"), 6).as("q"), col("rk"))
          .orderBy("source", "rk")
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
        |  list_filter(regexp_extract_all(lower(text), '\\b\\w\\w+\\b'),
        |    x -> x NOT IN ('the', 'a')) AS toks FROM documents),
        |sc AS (SELECT doc_id, source, $SqlQuality AS q FROM t),
        |rk AS (SELECT doc_id, source, q,
        |         CAST(row_number() OVER
        |           (PARTITION BY source ORDER BY q DESC, doc_id) AS INT) AS rk
        |       FROM sc)
        |SELECT doc_id, source, round(q, 6) AS q, rk FROM rk
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),

    Q("q_winnow",  // MOSS winnowing fingerprints: min-hash of each 4-wide
      // window over 3-shingle hashes — substring-robust dedup keys at
      // ~1/4 shingle density; md5 base hash makes it value-oracled.
      // Witness capped at the 500-doc gate corpus (md5 is the oracle
      // twin — the xxhash64 portable=false form is the scale path)
      (s, dir) => Dedup.winnowFingerprints(
          docsTokens(s, dir).filter(col("doc_id") < 500),
          "doc_id", "toks", k = 3, w = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "fp"),
      Some(s"""WITH t0 AS ($SqlToks),
        |t AS (SELECT * FROM t0 WHERE doc_id < 500),
        |s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh
        |      FROM t),
        |h AS (SELECT doc_id, list_transform(sh,
        |        x -> CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)) AS hs
        |      FROM s WHERE len(sh) >= 1),
        |f AS (SELECT doc_id, CASE WHEN len(hs) < 4 THEN [list_min(hs)]
        |        ELSE list_distinct(list_transform(range(1, len(hs) - 2),
        |          i -> list_min(list_slice(hs, i, i + 3)))) END AS fps
        |      FROM h)
        |SELECT DISTINCT doc_id, unnest(fps) AS fp FROM f
        |ORDER BY doc_id, fp""".stripMargin)),

    Q("q_winnow_pairs",  // winnowing USED for dedup, composed end-to-end:
      // doc pairs sharing ≥ 3 winnow fingerprints = substring-level
      // near-dup candidates (MOSS's actual decision rule — shared token
      // runs ≥ w+k−1 guarantee a shared fingerprint, so long cloned
      // passages force multiple shared fps). Same md5 witness cap as
      // q_winnow; the fingerprint join is the ~1/w-density analogue of
      // the shingle join, so the at-scale form buckets/caps identically
      // (fps are min-hashes — hot fps behave like hot shingles).
      (s, dir) => {
        val fps = Dedup.winnowFingerprints(
            docsTokens(s, dir).filter(col("doc_id") < 500),
            "doc_id", "toks", k = 3, w = 4)
          .localCheckpoint()
        fps.as("a").join(fps.as("b"),
            col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 3)
          .orderBy("id1", "id2")
      },
      Some(s"""WITH t0 AS ($SqlToks),
        |t AS (SELECT * FROM t0 WHERE doc_id < 500),
        |s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh
        |      FROM t),
        |h AS (SELECT doc_id, list_transform(sh,
        |        x -> CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)) AS hs
        |      FROM s WHERE len(sh) >= 1),
        |f AS (SELECT doc_id, CASE WHEN len(hs) < 4 THEN [list_min(hs)]
        |        ELSE list_distinct(list_transform(range(1, len(hs) - 2),
        |          i -> list_min(list_slice(hs, i, i + 3)))) END AS fps
        |      FROM h),
        |e AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM f)
        |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
        |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY id1, id2""".stripMargin)),

    Q("q_novelty",  // per-doc n-gram novelty: fraction of a doc's distinct
      // 3-grams appearing in NO other doc — the rarity/memorization
      // signal corpus curation ranks on; one gram-docfreq groupBy +
      // one per-doc avg, both partial-agg friendly
      (s, dir) => {
        val g = Dedup.shingleHashesViaArrays(docsTokens(s, dir), "doc_id", "toks", k = 3)
        val dfreq = g.groupBy(col("h")).agg(count(lit(1)).as("df"))
        g.join(dfreq, Seq("h"))
          .groupBy(col("id"))
          .agg(round(avg(when(col("df") === 1, 1.0).otherwise(0.0)), 6).as("novelty"),
            count(lit(1)).cast("int").as("n_grams"))
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN []
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |      FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS w FROM s),
        |d AS (SELECT w, count(*) AS df FROM e GROUP BY w)
        |SELECT e.doc_id,
        |  round(avg(CAST(CASE WHEN d.df = 1 THEN 1 ELSE 0 END AS DOUBLE)), 6) AS novelty,
        |  CAST(count(*) AS INT) AS n_grams
        |FROM e JOIN d USING (w)
        |GROUP BY e.doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_pii_scrub",  // PII redaction: deterministic synthetic emails/phones
      // appended per doc (the corpus has none), then scrubbed — redacted
      // text value-oracled byte-for-byte via md5 (Java regex and RE2
      // agree on the character-class-only patterns)
      (s, dir) => {
        val aug = concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com or call 555-123-4567"))
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            TextOps.piiCount(aug).cast("int").as("n_pii"),
            md5(TextOps.redactPii(aug)).as("fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH a AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |       || '@example.com or call 555-123-4567' AS t FROM documents),
        |r AS (SELECT doc_id, t,
        |        regexp_replace(t, '${TextOps.EmailRe}', '<PII>', 'g') AS t1 FROM a)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '${TextOps.EmailRe}'))
        |     + len(regexp_extract_all(t1, '${TextOps.PhoneRe}')) AS INT) AS n_pii,
        |  md5(regexp_replace(t1, '${TextOps.PhoneRe}', '<PII>', 'g')) AS fp
        |FROM r ORDER BY doc_id""".stripMargin)),

    Q("q_quantize_int8",  // symmetric per-vector int8 embedding codes:
      // trunc (not round) makes double→int identical in both engines,
      // so the codes get a full value-level oracle
      (s, dir) => {
        val z = Tables.table(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.quantizeInt8(KMeansOps.asDouble(col("embedding"))).as("z"))
          .localCheckpoint()
        z.select(col("vec_id"), round(col("z.scale"), 6).as("scale"),
            posexplode(col("z.q")).as(Seq("pos", "qv")))
          .orderBy("vec_id", "pos")
      },
      Some("""WITH v AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM v),
        |q AS (SELECT vec_id, round(mx / 127.0, 6) + 0.0 AS scale,
        |        CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
        |             ELSE list_transform(v, x -> CAST(trunc(x * 127.0 / mx) AS INT)) END AS qs
        |      FROM m)
        |SELECT vec_id, scale, CAST(unnest(range(0, len(qs))) AS INT) AS pos,
        |       unnest(qs) AS qv
        |FROM q ORDER BY vec_id, pos""".stripMargin)),

    Q("q_stratified_sample",  // deterministic corpus rebalancing: per-source
      // rates via the md5 keyed-hash permutation (q_sample_k's cross-engine
      // trick applied to rate sampling) — even sources 25%, odd 50%
      (s, dir) => IdOps.stratifiedSampleByHash(
          Tables.table(s, dir, "documents"), "doc_id", "source",
          rates = (0 until 20).map(i => s"src$i" -> (if (i % 2 == 0) 0.25 else 0.5)).toMap,
          salt = "strat7")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM documents
        |WHERE substr(md5('strat7_' || CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN '40' ELSE '80' END
        |ORDER BY doc_id""".stripMargin)),

    Q("q_minhash_pairs",  // MinHash+LSH candidates — Spark murmur3/xxhash64 not in DuckDB → rows-only
      (s, dir) => {
        // 3-shingles, not unigrams: the synthetic corpus shares one small
        // vocabulary, so unigram MinHash buckets nearly every pair.
        // Explode + partial-agg min is the measured winner here: a fused
        // tokenShingles→xxhash64→MinHashSigs per-doc form is signature-
        // identical (DedupSpec parity test) but ~2× slower — interpreted
        // per-window slice/concat costs more than the map-side-combined
        // shuffle it avoids.
        val sigs = Dedup.minhashFromHashes(
          Dedup.shingleHashesViaArrays(docsTokens(s, dir), "doc_id", "toks", k = 3),
          numHashes = 128, seed = 42L)
        Dedup.lshCandidates(sigs, bands = 32).orderBy("id1", "id2")
      },
      None),

    Q("q_char_minhash_pairs",  // char-5-gram MinHash, fully fused: rolling-hash
      (s, dir) => {               // Expression → MinHashSigs Expression → LSH.
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id").as("id"), col("text"))
        // locally the whole corpus can be one parquet row group — spread the
        // (chars·numHashes)-heavy expression across cores ONLY then; at real
        // scale the scan has thousands of splits and a repartition here would
        // shuffle the corpus' widest column for nothing
        val spread =
          if (docs.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
            docs.repartition(col("id"))
          else docs
        val sigs = spread
          .select(col("id"),                          // rows-only (engine hashes)
            Dedup.minhashSigsCol(
              graft.functions.CharShingleHashes.char_shingle_hashes(
                lower(col("text")), 5), numHashes = 128, seed = 42L).as("sig"))
          .filter(col("sig").isNotNull)
        Dedup.lshCandidates(sigs, bands = 32).orderBy("id1", "id2")
      },
      None),

    Q("q_char_minhash_md5",  // char-5-gram MinHash+LSH, value-level oracled:
      // the q_minhash_lsh_md5 portable-SQL trick (md5 base hash, decimal
      // string band keys) applied to CHARACTER shingles — DuckDB reproduces
      // the sig→band→bucket-join candidate set exactly. Witness capped at
      // 500 docs; q_char_minhash_pairs (fused rolling-hash Expressions) is
      // the scale twin, recall-tied in InvariantSweepSpec.
      (s, dir) => {
        val txt = lower(col("text"))
        val docs = Tables.table(s, dir, "documents")
          .filter(col("doc_id") < 500)
          .select(col("doc_id"),
            when(length(txt) < 5, array().cast("array<string>"))
              .otherwise(transform(
                sequence(lit(1), greatest(length(txt) - 4, lit(1))),
                i => txt.substr(i, lit(5)))).as("sh"))
        Dedup.minhashPairsPortable(docs, "doc_id", "sh",
            numHashes = 16, bands = 4, seed = 42L)
          .orderBy("id1", "id2")
      },
      Some {
        val ps = Dedup.hashParams(16, 42L).zipWithIndex
          .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
        s"""WITH d AS (SELECT doc_id, lower(text) AS txt FROM documents
        |           WHERE doc_id < 500),
        |s AS (SELECT doc_id, CASE WHEN length(txt) < 5 THEN []
        |        ELSE list_transform(range(1, length(txt) - 3),
        |          i -> substr(txt, i, 5)) END AS sh
        |      FROM d),
        |x AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(unnest(sh)), 1, 8)) AS BIGINT) AS x
        |      FROM s),
        |pr(j, a, b) AS (VALUES $ps),
        |sig AS (SELECT doc_id, j, min((a * (x % 2147483647) + b) % 2147483647) AS h
        |        FROM x, pr GROUP BY doc_id, j),
        |band AS (SELECT doc_id, j // 4 AS band,
        |           string_agg(CAST(h AS VARCHAR), '_' ORDER BY j) AS bh
        |         FROM sig GROUP BY doc_id, j // 4),
        |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |         FROM band a JOIN band b
        |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
        |SELECT id1, id2 FROM cand ORDER BY id1, id2""".stripMargin
      }),

    Q("q_simhash_pairs",  // SimHash near-dups (Hamming ≤ 3) — rows-only
      // (engine xxhash64 base hash); the value-level oracle for the same
      // sig→chunk→pair pipeline is q_simhash_md5 below
      (s, dir) => Dedup.simhashPairs(
          Dedup.simhash64(docsTokens(s, dir), "doc_id", "toks"), maxDist = 3)
        .orderBy("id1", "id2"),
      None),

    Q("q_simhash_md5",  // the WHOLE SimHash pipeline value-level oracled:
      // md5-derived 32-bit half-hashes + per-bit ±cnt majority vote +
      // 16-bit-chunk blocking + bit_count(xor) distance are all portable
      // SQL, so DuckDB reproduces signatures AND the pair set bit-for-bit.
      // Witness capped at 500 docs (the full sf≤0.01 gate corpus) like the
      // LSH witness: md5 costs ~10× the engine hash BY DESIGN and witness
      // value doesn't grow with corpus size — q_simhash_pairs is the scale
      // twin (recall-tied in InvariantSweepSpec).
      (s, dir) => Dedup.simhashPairsPortable(
          Dedup.simhashPortable(
            docsTokens(s, dir).filter(col("doc_id") < 500), "doc_id", "toks"),
          maxDist = 3)
        .orderBy("id1", "id2"),
      Some {
        val lo = (0 until 32).map(i =>
          s"sum(CASE WHEN (hlo >> $i) & 1 = 1 THEN cnt ELSE -cnt END) AS l$i").mkString(", ")
        val hi = (0 until 32).map(i =>
          s"sum(CASE WHEN (hhi >> $i) & 1 = 1 THEN cnt ELSE -cnt END) AS u$i").mkString(", ")
        val wlo = (0 until 32).map(i => s"(CASE WHEN l$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
        val whi = (0 until 32).map(i => s"(CASE WHEN u$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
        s"""WITH t0 AS ($SqlToks),
        |t AS (SELECT * FROM t0 WHERE doc_id < 500),
        |c AS (SELECT doc_id, w, count(*) AS cnt
        |      FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY doc_id, w),
        |h AS (SELECT doc_id, cnt,
        |        CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS hlo,
        |        CAST(('0x' || substr(md5(w), 9, 8)) AS BIGINT) AS hhi FROM c),
        |v AS (SELECT doc_id, $lo, $hi FROM h GROUP BY doc_id),
        |s AS (SELECT doc_id, $wlo AS sim_lo, $whi AS sim_hi FROM v),
        |ch AS (SELECT doc_id, sim_lo, sim_hi, 0 AS chunk, sim_lo & 65535 AS ch FROM s
        |  UNION ALL SELECT doc_id, sim_lo, sim_hi, 1, (sim_lo >> 16) & 65535 FROM s
        |  UNION ALL SELECT doc_id, sim_lo, sim_hi, 2, sim_hi & 65535 FROM s
        |  UNION ALL SELECT doc_id, sim_lo, sim_hi, 3, (sim_hi >> 16) & 65535 FROM s),
        |p AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
        |        a.sim_lo AS alo, a.sim_hi AS ahi, b.sim_lo AS blo, b.sim_hi AS bhi
        |      FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.ch = b.ch
        |                          AND a.doc_id < b.doc_id)
        |SELECT id1, id2,
        |       CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS INT) AS hamming
        |FROM p WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
        |ORDER BY id1, id2""".stripMargin
      }),

    // ---- M7: similarity search over embeddings (beyond-reference)
    Q("q_cosine_topk",  // brute-force cosine top-5, queries = every 50th vector
      (s, dir) => {
        val emb = Tables.table(s, dir, "embeddings")
        Similarity.bruteTopK(
            emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding", k = 5)
          // 4dp, not 6: engines sum dims in different orders (~1e-15 apart)
          // and at 10k+ values a round-6 boundary hit becomes likely
          .withColumn("cos", round(col("cos"), 4))
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |d AS (SELECT a.vec_id AS query_id, b.vec_id AS vec_id, sum(a.x * b.x) AS dp
        |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
        |      WHERE a.vec_id % 50 = 0 GROUP BY 1, 2),
        |c AS (SELECT d.query_id, d.vec_id, d.dp / (na.nrm * nb.nrm) AS cos
        |      FROM d JOIN n na ON na.vec_id = d.query_id
        |             JOIN n nb ON nb.vec_id = d.vec_id),
        |r AS (SELECT query_id, vec_id, cos,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        |      FROM c)
        |SELECT query_id, CAST(rnk AS INT) AS rank, vec_id,
        |       round(cos, 4) + 0.0 AS cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q("q_cosine_pairs",  // embedding pairs cosine ≥ 0.4 — exact distributed
      (s, dir) => Similarity.cosinePairsBlocked(  // kernel, no driver collect
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("id1", "id2"),
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |d AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.x * b.x) AS dp
        |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
        |c AS (SELECT id1, id2, dp / (na.nrm * nb.nrm) AS cos
        |      FROM d JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2)
        |SELECT id1, id2, round(cos, 6) AS cos FROM c
        |WHERE cos >= 0.4 ORDER BY id1, id2""".stripMargin)),

    Q("q_cosine_pairs_lsh",  // near-dup pairs ≥ 0.9 via hyperplane LSH + exact
      (s, dir) => {           // verify; corpus = embeddings ∪ perturbed copies
        Similarity.cosinePairsLsh(perturbedEmb(s, dir), "vec_id", "v", 0.9)
          .withColumn("cos", round(col("cos"), 6))
          .orderBy("id1", "id2")
      },
      // oracle is EXACT all-pairs SQL — at cos≈0.999 the 8×16 LSH miss
      // probability is ~1e-19 per pair, so full recall is certain and the
      // hash must match. The perturbed copies (dim-dependent exact-double
      // scale factors) are what puts near-dup pairs in the synthetic data.
      Some("""WITH ex0 AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |ex AS (SELECT vec_id, x, i FROM ex0
        |       UNION ALL
        |       SELECT vec_id + 1000000,
        |              x * (CAST(0.98 AS DOUBLE)
        |                   + CAST(0.01 AS DOUBLE) * CAST(i % 3 AS DOUBLE)), i
        |       FROM ex0),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
        |d AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.x * b.x) AS dp
        |      FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
        |c AS (SELECT id1, id2, dp / (na.nrm * nb.nrm) AS cos
        |      FROM d JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2)
        |SELECT id1, id2, round(cos, 6) AS cos FROM c
        |WHERE cos >= 0.9 ORDER BY id1, id2""".stripMargin)),

    Q("q_ann_ivf",  // IVF ANN top-5 with a deterministic routing table (the
      (s, dir) => {  // vec_id<8 centroids) — the full IVF mechanics, oracled
        val emb = Tables.table(s, dir, "embeddings")
        val pts = embDouble(s, dir)
        Similarity.ivfTopK(
            emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
            k = 5, cells = 8, nprobe = 3,
            centroids = Some(fixedCentroids(pts)))
          // 4dp like q_cosine_topk: engines sum dims in different orders
          .withColumn("cos", round(col("cos"), 4))
          .orderBy("query_id", "rank")
      },
      Some("""WITH pts AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |cents AS (SELECT vec_id AS cid, CAST(unnest(embedding) AS DOUBLE) AS c,
        |          unnest(range(0, len(embedding))) AS i FROM embeddings WHERE vec_id < 8),
        |ad AS (SELECT p.vec_id, c.cid, sqrt(sum((p.x - c.c) * (p.x - c.c))) AS dist
        |       FROM pts p JOIN cents c ON p.i = c.i GROUP BY 1, 2),
        |cell AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |probe AS (SELECT vec_id AS query_id, cid AS cell FROM ad WHERE vec_id % 50 = 0
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= 3),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pts GROUP BY 1),
        |d AS (SELECT q.query_id, v.vec_id, sum(qp.x * vp.x) AS dp
        |      FROM probe q
        |      JOIN cell v ON v.cell = q.cell AND v.vec_id <> q.query_id
        |      JOIN pts qp ON qp.vec_id = q.query_id
        |      JOIN pts vp ON vp.vec_id = v.vec_id AND vp.i = qp.i
        |      GROUP BY 1, 2),
        |c2 AS (SELECT query_id, d.vec_id, dp / (nq.nrm * nv.nrm) AS cos
        |       FROM d JOIN n nq ON nq.vec_id = query_id JOIN n nv ON nv.vec_id = d.vec_id),
        |r AS (SELECT query_id, vec_id, cos,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        |      FROM c2)
        |SELECT query_id, CAST(rnk AS INT) AS rank, vec_id,
        |       round(cos, 4) + 0.0 AS cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q("q_semantic_dedup",  // SemDeDup (arXiv:2303.09540) gated end-to-end:
      // nearest-centroid cells → within-cell cosine pairs ≥ 0.9 →
      // connected components → (id, rep) labels. The planted perturbed
      // twins (≈0.999 cosine, see perturbedEmb) are the near-dups; the
      // deterministic vec_id<32 routing table keeps both engines' cell
      // assignment identical. Clustering prunes the pair space from
      // O(n²) to Σ|cell|² — the whole reason SemDeDup works at web
      // scale — and CC shuffles only the near-dup edges.
      (s, dir) => {
        val pts = perturbedEmb(s, dir)
        // 32 cells, not 8: SemDeDup wants k ≈ √n — more cells cuts the
        // within-cell pair space quadratically AND lifts the cell-join's
        // parallelism ceiling (one task per cell key)
        val cents = pts.filter(col("vec_id") < 32)
          .select(col("vec_id").as("cid"), col("v").as("cvec"))
        Similarity.semanticDedup(pts, "vec_id", "v", cents, 0.9).orderBy("id")
      },
      Some("""WITH RECURSIVE ex0 AS (SELECT vec_id,
        |        CAST(unnest(embedding) AS DOUBLE) AS x,
        |        unnest(range(0, len(embedding))) AS i FROM embeddings),
        |ex AS (SELECT vec_id, x, i FROM ex0
        |       UNION ALL
        |       SELECT vec_id + 1000000,
        |              x * (CAST(0.98 AS DOUBLE)
        |                   + CAST(0.01 AS DOUBLE) * CAST(i % 3 AS DOUBLE)), i
        |       FROM ex0),
        |cents AS (SELECT vec_id AS cid, x AS c, i FROM ex WHERE vec_id < 32),
        |ad AS (SELECT p.vec_id, c.cid, sqrt(sum((p.x - c.c) * (p.x - c.c))) AS dist
        |       FROM ex p JOIN cents c ON p.i = c.i GROUP BY 1, 2),
        |cell AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
        |pr AS (SELECT ca.vec_id AS id1, cb.vec_id AS id2
        |       FROM cell ca JOIN cell cb
        |         ON cb.cell = ca.cell AND ca.vec_id < cb.vec_id),
        |d AS (SELECT pr.id1, pr.id2, sum(a.x * b.x) AS dp
        |      FROM pr JOIN ex a ON a.vec_id = pr.id1
        |              JOIN ex b ON b.vec_id = pr.id2 AND b.i = a.i
        |      GROUP BY 1, 2),
        |p AS (SELECT id1, id2 FROM d
        |      JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2
        |      WHERE dp / (na.nrm * nb.nrm) >= 0.9),
        |ed AS (SELECT id1 AS a, id2 AS b FROM p UNION ALL SELECT id2, id1 FROM p),
        |nn AS (SELECT DISTINCT a AS id FROM ed),
        |rr AS (SELECT id, id AS reach FROM nn
        |       UNION
        |       SELECT rr.id, ed.b AS reach FROM rr JOIN ed ON ed.a = rr.reach)
        |SELECT id, min(reach) AS rep FROM rr GROUP BY id ORDER BY id""".stripMargin)),

    // ---- M8: text analysis + multimodal plumbing (beyond-reference)
    Q("q_lang_id",
      (s, dir) => {
        val toks = TextOps.tokenize(col("text"))
        val scores = TextStats.LangMarkers.map { case (lang, ms) =>
          size(filter(toks, t => t.isin(ms: _*))).as(s"s_$lang")
        }
        Tables.table(s, dir, "documents")
          .select(col("doc_id") +: scores :+ TextStats.langId(toks).as("lang_pred"): _*)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
        |        regexp_extract_all(lower(text), '\b\w\w+\b') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('the','and','is','of','to','in'))) AS s_en,
        |  len(list_filter(toks, x -> x IN ('le','la','les','et','de','un'))) AS s_fr,
        |  len(list_filter(toks, x -> x IN ('el','los','las','es','de','un'))) AS s_es,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS s_de
        |  FROM t)
        |SELECT doc_id, CAST(s_en AS INT) AS s_en, CAST(s_fr AS INT) AS s_fr,
        |  CAST(s_es AS INT) AS s_es, CAST(s_de AS INT) AS s_de,
        |  CASE WHEN greatest(s_en, s_fr, s_es, s_de) <= 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_fr, s_es, s_de) THEN 'en'
        |       WHEN s_fr = greatest(s_en, s_fr, s_es, s_de) THEN 'fr'
        |       WHEN s_es = greatest(s_en, s_fr, s_es, s_de) THEN 'es'
        |       WHEN s_de = greatest(s_en, s_fr, s_es, s_de) THEN 'de'
        |       ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin)),

    Q("q_quality",
      (s, dir) => {
        val toks = TextOps.tokenize(col("text"))
        Tables.table(s, dir, "documents").select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          round(TextStats.distinctRatio(toks), 6).as("distinct_ratio"),
          round(TextStats.stopwordRatio(toks, Stop), 6).as("stopword_ratio"),
          round(TextStats.meanTokenLen(toks), 6).as("mean_len"),
          round(TextStats.qualityScore(toks, Stop), 6).as("score"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
        |        regexp_extract_all(lower(text), '\\b\\w\\w+\\b') AS toks FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tokens,
        |  CASE WHEN len(toks) = 0 THEN 0.0
        |       ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END AS dr,
        |  CASE WHEN len(toks) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
        |            / len(toks) END AS sr,
        |  CASE WHEN len(toks) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |            / len(toks) END AS ml,
        |  $SqlQuality AS q
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  round(dr, 6) AS distinct_ratio, round(sr, 6) AS stopword_ratio,
        |  round(ml, 6) AS mean_len, round(q, 6) AS score
        |FROM m ORDER BY doc_id""".stripMargin)),

    Q("q_lm_score",  // CCNet-style perplexity-filter signal
      // (arXiv:1911.00359): per-doc unigram cross-entropy against the
      // corpus's own unigram LM — filter both tails. One explode + one
      // token-keyed join vs the vocab freq table; total joins in as a
      // 1-row broadcast; empty docs emit no row on either engine.
      (s, dir) => TextStats.lmScore(docsTokens(s, dir), "doc_id", "toks")
        .withColumn("xent", round(col("xent"), 6))
        .orderBy("doc_id"),
      Some(s"""WITH t AS ($SqlToks),
        |e AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |f AS (SELECT w, count(*) AS cnt FROM e GROUP BY w),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM f)
        |SELECT doc_id, round(-avg(ln(CAST(cnt AS DOUBLE) / total)), 6) AS xent
        |FROM e JOIN f USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_lm_score_map",  // same CCNet signal, zero-shuffle form: the LM
      // rides as ONE broadcast map row and each doc scores itself with a
      // per-row fold — no explode, no token-keyed shuffle, no per-doc
      // exchange; the corpus never leaves its input partitions. Same
      // distribution as q_lm_score, so the oracle is the same SQL —
      // the value equality of the two plans IS the demonstration.
      (s, dir) => {
        val docs = docsTokens(s, dir)
        TextStats.lmScoreBroadcast(docs, "doc_id", "toks",
            TextStats.unigramLogProbs(docs, "toks"), "w", "logp")
          .withColumn("xent", round(col("xent"), 6))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |e AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |f AS (SELECT w, count(*) AS cnt FROM e GROUP BY w),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM f)
        |SELECT doc_id, round(-avg(ln(CAST(cnt AS DOUBLE) / total)), 6) AS xent
        |FROM e JOIN f USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_ccnet_buckets",  // CCNet head/middle/tail perplexity terciles
      // (arXiv:1911.00359 §4.4 — the slices the released corpora ship
      // in): per source, ntile(3) over the rounded q_lm_score signal
      // (ties by doc_id — rounded-before-ranked, engine-independent
      // boundary). The window sorts the (id, source, xent) triple
      // table, never the corpus text; slices materialize by joining the
      // bucket column back on id.
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))
        val scored = TextStats.lmScore(docs, "doc_id", "toks")
          .join(docs.select("doc_id", "source"), "doc_id")
        TextStats.ccnetBuckets(scored, "doc_id", "source", "xent")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
        |        list_filter(regexp_extract_all(lower(text), '\\b\\w\\w+\\b'),
        |          x -> x NOT IN ('the', 'a')) AS toks FROM documents),
        |e AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |f AS (SELECT w, count(*) AS cnt FROM e GROUP BY w),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM f),
        |sc AS (SELECT doc_id, round(-avg(ln(CAST(cnt AS DOUBLE) / total)), 6) AS xent
        |       FROM e JOIN f USING (w) CROSS JOIN tot GROUP BY doc_id),
        |b AS (SELECT sc.doc_id, t.source, sc.xent,
        |        ntile(3) OVER (PARTITION BY t.source
        |                       ORDER BY sc.xent, sc.doc_id) AS nt
        |      FROM sc JOIN t ON t.doc_id = sc.doc_id)
        |SELECT doc_id, source, xent,
        |       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |               ELSE 'tail' END AS bucket
        |FROM b ORDER BY doc_id""".stripMargin)),

    Q("q_dsir_weights",  // DSIR-style domain-targeting importance weights
      // (arXiv:2302.03169), add-1-smoothed unigram LMs: mean per-token
      // log ratio of the src0 target distribution over the corpus
      // distribution — resample on high dsir_logw to shift the mixture
      // toward the target domain. Single conditional-agg pass builds
      // both count columns; same token-keyed join shape as q_lm_score.
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))
        TextStats.dsirWeights(docs, "doc_id", "toks", col("source") === "src0")
          .withColumn("dsir_logw", round(col("dsir_logw"), 6))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
        |        list_filter(regexp_extract_all(lower(text), '\\b\\w\\w+\\b'),
        |          x -> x NOT IN ('the', 'a')) AS toks FROM documents),
        |e AS (SELECT doc_id, source = 'src0' AS tgt, unnest(toks) AS w FROM t),
        |f AS (SELECT w, count(*) AS c_all,
        |        sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt FROM e GROUP BY w),
        |tot AS (SELECT CAST(sum(c_all) AS DOUBLE) AS n_all,
        |        CAST(sum(c_tgt) AS DOUBLE) AS n_tgt,
        |        CAST(count(*) AS DOUBLE) AS vocab FROM f)
        |SELECT doc_id, 0.0 + round(avg(ln((c_tgt + 1.0) / (n_tgt + vocab))
        |                       - ln((c_all + 1.0) / (n_all + vocab))), 6) AS dsir_logw
        |FROM e JOIN f USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_repetition",  // Gopher/C4-style repetition signals: top-word share +
      (s, dir) => {    // duplicate-bigram fraction
        val toks = TextOps.tokenize(col("text"))
        Tables.table(s, dir, "documents").select(
          col("doc_id"),
          round(TextStats.topTokenFraction(toks), 6).as("top_tok_frac"),
          round(TextStats.dupBigramFraction(toks), 6).as("dup_bigram_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
        |        regexp_extract_all(lower(text), '\b\w\w+\b') AS toks FROM documents)
        |SELECT doc_id,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0
        |    ELSE CAST(list_max(list_transform(list_distinct(toks),
        |      t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / len(toks) END,
        |    6) AS top_tok_frac,
        |  round(CASE WHEN len(toks) < 2 THEN 0.0
        |    ELSE 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
        |      / (len(toks) - 1) END, 6) AS dup_bigram_frac
        |FROM t ORDER BY doc_id""".stripMargin)),

    Q("q_gopher_rep",  // the FULL Gopher repetition-rule table (Rae et
      // al. arXiv:2112.11446 Table A1) beyond q_repetition's two
      // signals: char-weighted top-{2,3,4}-gram domination (count ×
      // gram chars / token chars, ties → smallest gram) and
      // dup-{5,10}-gram coverage (chars under ANY ≥2×-occurring
      // n-gram, counted ONCE via the SpanCoverMask sweep — overlapping
      // windows don't double-count). ZERO shuffles — per-row array
      // arithmetic, O(g²) bounded by doc length, never corpus size.
      (s, dir) => TextStats.gopherRepetition(
          Tables.table(s, dir, "documents")
            .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks")),
          "doc_id", "toks")
        .orderBy("doc_id"),
      Some {
        // flat chained CTEs — correlated subqueries + nested lambdas
        // break the DuckDB binder, column-level lambdas don't
        val ns = Seq(2, 3, 4, 5, 10)
        def gCol(n: Int) =
          s"""CASE WHEN nt < $n THEN []::VARCHAR[]
             | ELSE list_transform(range(1, nt - ${n - 2}), i ->
             |        array_to_string(toks[i:i+${n - 1}], ' ')) END AS g$n"""
            .stripMargin
        def cCol(n: Int) =
          s"list_transform(g$n, x -> len(list_filter(g$n, y -> y = x))) AS c$n"
        def topCols(n: Int) = (
          s"CASE WHEN len(c$n) = 0 THEN 0 ELSE list_max(c$n) END AS m$n",
          s"""list_min(list_transform(
             |  list_filter(range(1, len(g$n) + 1), s -> c$n[s] = m$n),
             |  s -> g$n[s])) AS w$n""".stripMargin)
        def dCol(n: Int) =
          s"list_filter(range(1, len(g$n) + 1), s -> c$n[s] >= 2) AS d$n"
        def covCol(n: Int) =
          s"""COALESCE(list_sum(list_transform(range(1, nt + 1), i ->
             |  CASE WHEN len(list_filter(d$n, s -> i >= s AND i < s + $n)) > 0
             |       THEN length(toks[i]) ELSE 0 END)), 0) AS cov$n""".stripMargin
        def topFrac(n: Int) =
          s"""round(CASE WHEN nt < $n OR total = 0 THEN 0.0
             |  ELSE m$n * (length(w$n) - ${n - 1}) / CAST(total AS DOUBLE)
             |  END, 6) AS top${n}_frac""".stripMargin
        def dupFrac(n: Int) =
          s"""round(CASE WHEN nt < $n OR total = 0 THEN 0.0
             |  ELSE cov$n / CAST(total AS DOUBLE) END, 6) AS dup${n}_frac"""
            .stripMargin
        s"""WITH t AS (SELECT doc_id,
           |        regexp_extract_all(lower(text), '\\b\\w\\w+\\b') AS toks
           |      FROM documents),
           |base AS (SELECT doc_id, toks, len(toks) AS nt,
           |  COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS total
           |  FROM t),
           |gr AS (SELECT *, ${ns.map(gCol).mkString(",\n")} FROM base),
           |cn AS (SELECT *, ${ns.map(cCol).mkString(",\n")} FROM gr),
           |mx AS (SELECT *, ${Seq(2, 3, 4).map(n => topCols(n)._1).mkString(",\n")} FROM cn),
           |tw AS (SELECT *, ${Seq(2, 3, 4).map(n => topCols(n)._2).mkString(",\n")} FROM mx),
           |dd AS (SELECT *, ${Seq(5, 10).map(dCol).mkString(",\n")} FROM tw),
           |cov AS (SELECT *, ${Seq(5, 10).map(covCol).mkString(",\n")} FROM dd)
           |SELECT doc_id,
           |  ${Seq(2, 3, 4).map(topFrac).mkString(",\n")},
           |  ${Seq(5, 10).map(dupFrac).mkString(",\n")}
           |FROM cov ORDER BY doc_id""".stripMargin
      }),

    Q("q_token_stats",
      (s, dir) => Tables.table(s, dir, "documents").select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          TextStats.wsTokenCount(col("text")).as("ws_tokens"),
          size(TextOps.tokenize(col("text"))).as("re_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '\b\w\w+\b')) AS INT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q_bpe_tokens",  // BPE-ish LLM-token counting (the GPT-2 pre-tokenizer
      // segmentation rule reduced to its regex core: letter runs / digit
      // runs / other-symbol runs) — the cheap upper-anchor every token-
      // budgeted data recipe starts from, next to the ws/word counts of
      // q_token_stats. Map-side regexp count, no shuffle beyond the scan.
      (s, dir) => Tables.table(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("__len"),
          TextStats.bpeishTokenCount(col("text")).as("bpe_tokens"))
        .select(col("doc_id"), col("bpe_tokens"),
          round(when(col("bpe_tokens") === 0, lit(0.0))
            .otherwise(col("__len") / col("bpe_tokens").cast("double")), 4)
            .as("chars_per_token"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS INT)
        |    AS bpe_tokens,
        |  round(CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+')) = 0
        |    THEN 0.0 ELSE length(text)
        |      / CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS DOUBLE)
        |    END, 4) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q_fingerprint",
      (s, dir) => docsTokens(s, dir)
        .select(col("doc_id"), TextStats.contentFingerprint(col("toks")).as("fp"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS ($SqlToks)
        |SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp
        |FROM t ORDER BY doc_id""".stripMargin)),

    Q("q_multimodal_meta",  // binary payload + typed metadata plumbing
      (s, dir) => Multimodal.fromText(
          Tables.table(s, dir, "documents"), "doc_id", "text", "source")
        .select(col("media_id"), col("modality"),
          col("meta.byte_len").as("byte_len"), col("meta.sha256").as("sha256"),
          col("meta.source").as("source"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, 'text' AS modality,
        |  CAST(length(text) AS BIGINT) AS byte_len, sha256(text) AS sha256, source
        |FROM documents ORDER BY media_id""".stripMargin)),

    Q("q_frame_sample",  // video-frame sampling plumbing: counts oracled
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.fromText(Tables.table(s, dir, "documents"), "doc_id", "text", "source"),
          frameBytes = 32, stride = 3)
        .groupBy(col("media_id"), col("n_frames"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
        |  CAST(ceil(length(text) / 32.0) AS INT) AS n_frames,
        |  CAST(ceil(ceil(length(text) / 32.0) / 3.0) AS BIGINT) AS n_kept
        |FROM documents ORDER BY media_id""".stripMargin)),

    Q("q_multimodal_features",  // REAL ImageIO decode of synthetic PNGs —
      // gradient construction gives the channel means closed forms the
      // oracle can compute from doc_id alone (lossless PNG roundtrip)
      (s, dir) => Multimodal.decodeImage(
          Multimodal.syntheticPng(Tables.table(s, dir, "documents"), "doc_id"))
        .select(col("media_id"), col("decoded"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, TRUE AS decoded,
        |  CAST(doc_id % 13 + 1 AS INT) AS width,
        |  CAST(doc_id % 11 + 1 AS INT) AS height,
        |  round((doc_id % 200) + (doc_id % 13) / 2.0, 6) AS mean_r,
        |  round((doc_id * 7 % 200) + (doc_id % 11) / 2.0, 6) AS mean_g,
        |  round(CAST(doc_id * 13 % 200 AS DOUBLE), 6) AS mean_b
        |FROM documents ORDER BY media_id""".stripMargin)),

    Q("q_image_phash",  // perceptual image hash over REAL ImageIO-decoded
      // pixels: integer Rec.601 luminance (299r+587g+114b), bit = above
      // the grid mean with the comparison cross-multiplied to stay
      // integral — so the hash is exact arithmetic and the oracle
      // rebuilds it bit-for-bit from the gradient's closed form without
      // decoding anything. Group by (width, height, ahash) = cross-
      // format image dedup key (brightness-invariance spec'd).
      (s, dir) => Multimodal.imageAHash(
          Multimodal.syntheticPng(Tables.table(s, dir, "documents"), "doc_id"))
        .orderBy("media_id"),
      Some("""WITH p AS (SELECT doc_id AS media_id,
        |  CAST(doc_id % 13 + 1 AS INT) AS w, CAST(doc_id % 11 + 1 AS INT) AS h,
        |  doc_id % 200 AS br, doc_id * 7 % 200 AS bg, doc_id * 13 % 200 AS bb
        |  FROM documents),
        |t AS (SELECT *, CAST(w AS BIGINT) * h AS n,
        |  CAST(w AS BIGINT) * h * (299*br + 587*bg + 114*bb)
        |    + 299 * h * (CAST(w - 1 AS BIGINT) * w // 2)
        |    + 587 * w * (CAST(h - 1 AS BIGINT) * h // 2) AS total
        |  FROM p)
        |SELECT media_id, TRUE AS decoded, w AS width, h AS height,
        |  array_to_string(list_transform(range(0, n), i ->
        |    CASE WHEN n * (299*(br + i % w) + 587*(bg + i // w) + 114*bb) > total
        |      THEN '1' ELSE '0' END), '') AS ahash
        |FROM t ORDER BY media_id""".stripMargin)),

    Q("q_image_dedup",  // perceptual image near-dup clustering — the
      // composition q_image_phash was missing (VERDICT r9 #3): aHash →
      // 4-band pigeonhole blocking within (w, h) → exact per-position
      // Hamming ≤ 3 → connected components, (id, rep). On the gradient
      // corpus brightness offsets cancel (aHash invariance), so every
      // same-(w,h) image pairs at hamming 0 — the identical-image flood
      // the scaladoc names as THE hot bucket; the pigeonhole spec
      // exercises hamming 1..3 on planted flips. Oracle rebuilds hash,
      // bands, distance and CC closed-form from doc_id alone.
      (s, dir) => Multimodal.imageDedup(
          Multimodal.imageAHash(
            Multimodal.syntheticPng(Tables.table(s, dir, "documents"), "doc_id")))
        .orderBy("id"),
      Some("""WITH RECURSIVE p AS (SELECT doc_id AS id,
        |  CAST(doc_id % 13 + 1 AS INT) AS w, CAST(doc_id % 11 + 1 AS INT) AS h,
        |  doc_id % 200 AS br, doc_id * 7 % 200 AS bg, doc_id * 13 % 200 AS bb
        |  FROM documents),
        |t AS (SELECT *, CAST(w AS BIGINT) * h AS n,
        |  CAST(w AS BIGINT) * h * (299*br + 587*bg + 114*bb)
        |    + 299 * h * (CAST(w - 1 AS BIGINT) * w // 2)
        |    + 587 * w * (CAST(h - 1 AS BIGINT) * h // 2) AS total
        |  FROM p),
        |hs AS (SELECT id, w, h, array_to_string(list_transform(range(0, n), i ->
        |    CASE WHEN n * (299*(br + i % w) + 587*(bg + i // w) + 114*bb) > total
        |      THEN '1' ELSE '0' END), '') AS ahash FROM t),
        |bd AS (SELECT id, w, h, ahash, bb.band,
        |    substr(ahash, CAST((bb.band * len(ahash)) // 4 + 1 AS INT),
        |      CAST(((bb.band + 1) * len(ahash)) // 4
        |        - (bb.band * len(ahash)) // 4 AS INT)) AS bs
        |  FROM hs CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bb),
        |cand AS (SELECT DISTINCT x.id AS id1, y.id AS id2,
        |    x.ahash AS ha, y.ahash AS hb
        |  FROM bd x JOIN bd y ON x.w = y.w AND x.h = y.h
        |    AND x.band = y.band AND x.bs = y.bs AND x.id < y.id),
        |pr AS (SELECT id1, id2 FROM cand
        |  WHERE len(list_filter(range(1, len(ha) + 1), i -> ha[i] <> hb[i])) <= 3),
        |ed AS (SELECT id1 AS a, id2 AS b2 FROM pr UNION ALL SELECT id2, id1 FROM pr),
        |nn AS (SELECT DISTINCT a AS id FROM ed),
        |rr AS (SELECT id, id AS reach FROM nn
        |       UNION
        |       SELECT rr.id, ed.b2 AS reach FROM rr JOIN ed ON ed.a = rr.reach)
        |SELECT id, min(reach) AS rep FROM rr GROUP BY id ORDER BY id""".stripMargin)),

    Q("q_audio_features",  // REAL javax.sound decode of synthetic WAVs —
      // alternating ±A 16-bit PCM gives n_samples and RMS closed forms
      // the oracle computes from doc_id alone (lossless WAV roundtrip)
      (s, dir) => Multimodal.decodeAudio(
          Multimodal.syntheticWav(Tables.table(s, dir, "documents"), "doc_id"))
        .select(col("media_id"), col("decoded"), col("sample_rate"),
          col("channels"), col("n_samples"),
          round(col("duration_ms"), 6).as("duration_ms"),
          round(col("rms"), 6).as("rms"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, TRUE AS decoded,
        |  8000 AS sample_rate, 1 AS channels,
        |  CAST((doc_id % 5 + 1) * 800 AS BIGINT) AS n_samples,
        |  round((doc_id % 5 + 1) * 100.0, 6) AS duration_ms,
        |  round(CAST((doc_id % 1000 + 1) * 16 AS DOUBLE), 6) AS rms
        |FROM documents ORDER BY media_id""".stripMargin)),

    Q("q_chunks",  // sliding-window context chunking: 32-token windows,
      (s, dir) => docsTokens(s, dir)  // 8-token overlap, last partial kept
        .select(col("doc_id"),
          explode(TextOps.chunkTokens(col("toks"), size = 32, overlap = 8)).as("c"))
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          size(col("c.toks")).as("n_toks"),
          concat_ws(" ", col("c.toks")).as("chunk"))
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH t AS ($SqlToks),
        |c AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        |e AS (SELECT doc_id, toks, n, unnest(range(0, (n - 1) // 24 + 1)) AS i FROM c)
        |SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |  CAST(least(32, n - i * 24) AS INT) AS n_toks,
        |  array_to_string(list_slice(toks, i * 24 + 1, least(i * 24 + 32, n)), ' ') AS chunk
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin)),

    Q("q_pack",  // GPT-style sequence packing: global token offsets → the
      // 256-token sequence span each doc lands in. At-scale form: range
      // repartition + per-partition running sums, no single-partition
      // WindowExec (PlanAuditSpec asserts; parity TextOpsSpec-tested)
      (s, dir) => {
        val d = docsTokens(s, dir).select(col("doc_id"), size(col("toks")).as("n_toks"))
        TextOps.packSequencesAtScale(d, "doc_id", "n_toks", budget = 256)
          .select(col("doc_id"), col("n_toks"), col("tok_offset"),
            col("seq_first"), col("seq_last"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |d AS (SELECT doc_id, len(toks) AS n_toks FROM t),
        |o AS (SELECT doc_id, n_toks,
        |        COALESCE(sum(n_toks) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
        |      FROM d)
        |SELECT doc_id, CAST(n_toks AS INT) AS n_toks,
        |  CAST(tok_offset AS BIGINT) AS tok_offset,
        |  CAST(tok_offset // 256 AS BIGINT) AS seq_first,
        |  CAST(CASE WHEN n_toks = 0 THEN tok_offset // 256
        |       ELSE (tok_offset + n_toks - 1) // 256 END AS BIGINT) AS seq_last
        |FROM o ORDER BY doc_id""".stripMargin)),

    Q("q_vocab_params",  // sklearn min_df/max_df/max_features vocabulary selection
      (s, dir) => {
        val base = docsTokens(s, dir)
        Tfidf.selectVocab(
            Tfidf.docFreqWithCounts(base, "doc_id", "toks"),
            n = base.count(), minDf = 2.0, maxDf = 0.8, maxFeatures = 20)
          .orderBy("word")
      },
      Some(s"""WITH t AS ($SqlToks),
        |f AS (SELECT word, count(DISTINCT doc_id) AS df, count(*) AS cnt
        |      FROM (SELECT doc_id, unnest(toks) AS word FROM t) GROUP BY word),
        |n AS (SELECT count(*) AS n FROM t),
        |kept AS (SELECT word, df, cnt FROM f, n WHERE df >= 2 AND df <= 0.8 * n
        |         QUALIFY row_number() OVER (ORDER BY cnt DESC, word) <= 20)
        |SELECT word, df, cnt FROM kept ORDER BY word""".stripMargin)),

    // ---- extended relational surface: skew salting, cube, lag, set ops, HLL
    Q("q_salted_agg",  // two-phase salted aggregation == direct aggregation
      (s, dir) => SkewOps.saltedAgg(
          Tables.table(s, dir, "lineitem"), Seq("l_returnflag"),
          Seq(SkewOps.AggSpec("sum", "l_quantity", "sum_qty"),
            SkewOps.AggSpec("count", "", "cnt"),
            SkewOps.AggSpec("min", "l_extendedprice", "min_price"),
            SkewOps.AggSpec("max", "l_extendedprice", "max_price")))
        .withColumn("sum_qty", round(col("sum_qty"), 2))
        .withColumn("min_price", round(col("min_price"), 2))
        .withColumn("max_price", round(col("max_price"), 2))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS cnt, round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q_salted_join",  // skew-safe fact-to-fact join: salted left, replicated
      (s, dir) => SkewOps.saltedJoin(  // right — row set identical to plain join
          Tables.table(s, dir, "lineitem"),
          Tables.table(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"), salt = 8)
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q_skew_join_aqe",  // adaptive complement of q_salted_join: plain SMJ,
      (s, dir) => SkewOps.aqeSkewJoin(  // hot keys left to AQE's runtime split
          Tables.table(s, dir, "lineitem"),  // (skew-split plan-audited in
          Tables.table(s, dir, "orders")     // SkewOpsSpec on a skewed fixture)
            .withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q_cube",
      (s, dir) => Tables.table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Q("q_window_lag",  // lead/lag: per-user inter-event gap in seconds
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
          .filter(col("prev_ns").isNotNull)
          .select(col("user_id"), col("event_id"),
            expr("(ts_ns - prev_ns) div 1000000000").as("gap_s"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
        |  CAST((epoch_ns(ts) - epoch_ns(prev)) // 1000000000 AS BIGINT) AS gap_s
        |FROM (SELECT user_id, event_id, ts,
        |        lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM events)
        |WHERE prev IS NOT NULL ORDER BY user_id, event_id""".stripMargin)),

    Q("q_intersect",  // custkeys appearing in both halves of the order book
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
        o.filter(col("o_totalprice") >= 250000).select(col("o_custkey"))
          .intersect(o.filter(col("o_totalprice") < 250000).select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice >= 250000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 250000
        |ORDER BY o_custkey""".stripMargin)),

    Q("q_except",  // custkeys with only-large orders
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
        o.filter(col("o_totalprice") >= 250000).select(col("o_custkey"))
          .except(o.filter(col("o_totalprice") < 250000).select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice >= 250000
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 250000
        |ORDER BY o_custkey""".stripMargin)),

    Q("q_distinct_parts",  // the exact half of the distinct-count pair — oracled
      (s, dir) => Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q_approx_distinct",  // HLL++ sketch half — engine-specific values →
      (s, dir) => Tables.table(s, dir, "lineitem")  // rows-only; error band
        .groupBy(col("l_returnflag"))               // proven vs q_distinct_parts
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag"),                   // in InvariantSweepSpec (3 SFs)
      None),

    Q("q_approx_percentiles",  // t-digest-style sketch quantiles — engine-
      (s, dir) => Tables.table(s, dir, "lineitem")  // specific values → rows-
        .groupBy(col("l_returnflag"))               // only; rank-error band
        .agg(                                       // proven in InvariantSweepSpec
          round(expr("approx_percentile(l_extendedprice, 0.5, 1000)"), 4).as("p50_approx"),
          round(expr("approx_percentile(l_extendedprice, 0.95, 1000)"), 4).as("p95_approx"))
        .orderBy("l_returnflag"),
      None),

    // ---- event-sequence operators: sessionize, as-of join, range join, pivot
    Q("q_sessionize",  // 30-min-gap sessions per user
      (s, dir) => EventOps.sessionize(
          Tables.events(s, dir), "user_id", "ts_ns", gapNs = 1800L * 1000000000L)
        .select(col("user_id"), col("session_id"), col("n_events"),
          expr("start_ns div 1000000000").as("start_s"),
          expr("end_ns div 1000000000").as("end_s"))
        .orderBy("user_id", "session_id"),
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts) AS tsn,
        |        lag(epoch_ns(ts), 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |      FROM events),
        |f AS (SELECT user_id, tsn,
        |        CASE WHEN prev IS NULL OR tsn - prev > 1800000000000 THEN 1 ELSE 0 END AS nw
        |      FROM g),
        |sid AS (SELECT user_id, tsn,
        |          sum(nw) OVER (PARTITION BY user_id ORDER BY tsn
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |        FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |  CAST(min(tsn) // 1000000000 AS BIGINT) AS start_s,
        |  CAST(max(tsn) // 1000000000 AS BIGINT) AS end_s
        |FROM sid GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)),

    Q("q_session_window",  // Spark's native session_window (gap sessions as a
      (s, dir) => Tables.events(s, dir)  // first-class grouping key)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_timestamp(col("w.start")).as("start_s"),
          unix_timestamp(col("w.end")).as("end_s"), col("n_events"))
        .orderBy("user_id", "start_s"),
      // session_window end = last event + gap; windows merge iff the gap
      // to the previous event is < 30 min (break at >=, hence the >= in
      // the oracle's new-session flag)
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts) AS tsn,
        |        lag(epoch_ns(ts), 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |      FROM events),
        |f AS (SELECT user_id, tsn,
        |        CASE WHEN prev IS NULL OR tsn - prev >= 1800000000000 THEN 1 ELSE 0 END AS nw
        |      FROM g),
        |sid AS (SELECT user_id, tsn,
        |          sum(nw) OVER (PARTITION BY user_id ORDER BY tsn
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |        FROM f)
        |SELECT user_id,
        |  CAST(min(tsn) // 1000000000 AS BIGINT) AS start_s,
        |  CAST(max(tsn) // 1000000000 + 1800 AS BIGINT) AS end_s,
        |  count(*) AS n_events
        |FROM sid GROUP BY user_id, sess ORDER BY user_id, start_s""".stripMargin)),

    Q("q_asof_join",  // each click's most recent preceding purchase, per user
      (s, dir) => {
        val ev = Tables.events(s, dir)
        EventOps.asofJoin(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"),
            Seq("user_id"), "ts_ns", "ts_ns", "event_id", "purchase_id")
          .select(col("event_id"), col("user_id"), col("purchase_id"))
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id, p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin)),

    Q("q_range_join",  // signups by same user within the hour before each error
      (s, dir) => {
        val ev = Tables.events(s, dir)
        EventOps.rangeCount(
            ev.filter(col("event_type") === "error"),
            ev.filter(col("event_type") === "signup"),
            Seq("user_id"), "ts_ns", "ts_ns", windowNs = 3600L * 1000000000L,
            leftId = "event_id", outCol = "n_signups")
          .select(col("event_id"), col("user_id"), col("n_signups"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, count(s.event_id) AS n_signups
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON s.user_id = e.user_id
        |  AND epoch_ns(e.ts) - epoch_ns(s.ts) BETWEEN 1 AND 3600000000000
        |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin)),

    Q("q_pivot",  // event-type counts pivoted to columns per user
      (s, dir) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val p = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
          .orderBy("user_id")
      },
      Some("""PIVOT events ON event_type
        |  IN ('click', 'view', 'purchase', 'signup', 'error')
        |  USING count(*) GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("q_unpivot",  // melt: wide per-user event-type counts back to long form
      (s, dir) => {
        val types = Seq("click", "view", "purchase")
        val p = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        val wide = types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
        wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
          .orderBy("user_id", "event_type")
      },
      Some("""WITH w AS (SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id, event_type, CAST(n AS BIGINT) AS n
        |FROM w UNPIVOT (n FOR event_type IN (click, view, purchase))
        |ORDER BY user_id, event_type""".stripMargin)),

    Q("q_window_ntile",  // ranking-family windows: ntile + percent_rank + cume_dist
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)),

    Q("q_regex",  // regex scalar surface: extract, replace, match predicate
      (s, dir) => Tables.table(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("devowel"),
          col("p_brand").rlike("#[0-9]+$").cast("int").as("numbered"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel,
        |  CAST(regexp_matches(p_brand, '#[0-9]+$') AS INT) AS numbered
        |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("q_date_arith",  // temporal arithmetic: trunc, add_months, datediff, dow
      (s, dir) => Tables.table(s, dir, "orders")
        .select(col("o_orderkey"),
          // dates travel as ISO strings: date-typed outputs hash as
          // different physical types across engines
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
          datediff(to_date(lit("1998-12-31")), col("o_orderdate")).as("days_to_eoy"),
          dayofweek(col("o_orderdate")).as("dow"))
        .orderBy("o_orderkey"),
      // DuckDB dayofweek: 0=Sunday; Spark: 1=Sunday → +1 aligns
      Some("""SELECT o_orderkey,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  CAST(date_diff('day', o_orderdate, DATE '1998-12-31') AS INT) AS days_to_eoy,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q_curation",  // full curation funnel: quality → exact dedup → near-dup drop
      (s, dir) => graft.pipeline.Curation.curate(
          Tables.table(s, dir, "documents"), "doc_id", "text",
          graft.pipeline.Curation.Config())
        .orderBy("doc_id"),
      Some(s"""WITH raw AS (SELECT doc_id,
        |        regexp_extract_all(lower(text), '\\b\\w\\w+\\b') AS toks FROM documents),
        |ann AS (SELECT doc_id,
        |        list_filter(toks, x -> x NOT IN ('the', 'a')) AS ftoks,
        |        $SqlQuality AS quality
        |        FROM raw),
        |kept AS (SELECT doc_id, ftoks,
        |           md5(array_to_string(list_sort(list_distinct(ftoks)), ' ')) AS fp
        |         FROM ann WHERE quality >= 0.6),
        |ex AS (SELECT doc_id, ftoks FROM kept
        |       QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ftoks) < 3 THEN []
        |         ELSE list_transform(range(1, len(ftoks) - 1),
        |           i -> ftoks[i] || ' ' || ftoks[i+1] || ' ' || ftoks[i+2]) END) AS s
        |       FROM ex),
        |e AS (SELECT doc_id, unnest(s) AS w, len(s) AS sz FROM sh),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
        |             max(a.sz) AS s1, max(b.sz) AS s2
        |      FROM e a JOIN e b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |drops AS (SELECT DISTINCT id2 FROM p
        |          WHERE CAST(inter AS DOUBLE) / (s1 + s2 - inter) >= 0.5)
        |SELECT doc_id FROM ex WHERE doc_id NOT IN (SELECT id2 FROM drops)
        |ORDER BY doc_id""".stripMargin)),

    Q("q_curation_v3",  // composed funnel of this round's new operators,
      // value-oracled END-TO-END: normalize → exact-dedup on the
      // NORMALIZED hash (catches re-punctuated copies) → per-source
      // length winsor band → bigram-LM cross-entropy scored on the
      // surviving corpus. Shuffle ledger: one hash-keyed dedup join,
      // one broadcast bounds join, then the bigram model/score joins —
      // normalization and the band screen themselves are map-side.
      (s, dir) => {
        val norm = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            TextOps.normalizeText(col("text")).as("norm"))
          .filter(col("norm") =!= "")
          .withColumn("h", md5(col("norm")))
        val canon = norm.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
        val deduped = norm.join(canon, Seq("h", "doc_id"))
        val bounds = deduped.groupBy(col("source")).agg(
          percentile(col("n_chars"), lit(0.05)).as("lo"),
          percentile(col("n_chars"), lit(0.95)).as("hi"))
        val kept = deduped.join(broadcast(bounds), "source")
          .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
        val toks = kept.select(col("doc_id"), col("source"),
          TextOps.tokenizeFiltered(col("norm"), Stop, Nil).as("toks"))
        TextStats.bigramLmScore(toks, "doc_id", "toks")
          .join(toks.select(col("doc_id"), col("source")), "doc_id")
          .withColumn("xent", round(col("xent"), 6))
          .select(col("doc_id"), col("source"), col("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH nz AS (SELECT doc_id, source, n_chars,
        |        trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        |      FROM documents),
        |nf AS (SELECT *, md5(norm) AS h FROM nz WHERE norm <> ''),
        |canon AS (SELECT h, min(doc_id) AS doc_id FROM nf GROUP BY h),
        |dd AS (SELECT nf.* FROM nf JOIN canon
        |       ON canon.h = nf.h AND canon.doc_id = nf.doc_id),
        |b AS (SELECT source, quantile_cont(n_chars, 0.05) AS lo,
        |        quantile_cont(n_chars, 0.95) AS hi FROM dd GROUP BY source),
        |kp AS (SELECT dd.* FROM dd JOIN b USING (source)
        |       WHERE n_chars >= lo AND n_chars <= hi),
        |t AS (SELECT doc_id, source,
        |        list_filter(regexp_extract_all(norm, '\b\w\w+\b'),
        |          x -> x NOT IN ('the', 'a')) AS toks FROM kp),
        |bg AS (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |       FROM (SELECT doc_id, toks, unnest(range(0, len(toks)-1)) AS i
        |             FROM t WHERE len(toks) >= 2)),
        |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |cc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1),
        |vo AS (SELECT count(DISTINCT w) AS v
        |       FROM (SELECT unnest(toks) AS w FROM t)),
        |pp AS (SELECT w1, w2, ln((c12 + 0.5) / (c1 + 0.5 * vo.v)) AS logp
        |       FROM bc JOIN cc USING (w1) CROSS JOIN vo),
        |sc AS (SELECT doc_id, -avg(logp) AS xent
        |       FROM bg JOIN pp USING (w1, w2) GROUP BY 1)
        |SELECT sc.doc_id, t.source, round(sc.xent, 6) AS xent
        |FROM sc JOIN t USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("q_curation_v4",  // composed funnel of THIS round's operators,
      // value-oracled END-TO-END: URL canonicalization → per-(domain,
      // canonical-URL) keep-first dedup → Mahalanobis embedding-outlier
      // screen at the χ²₂ 99% bound (9.21; corpus-level basis, docs
      // without an embedding pass through) → Kneser–Ney bigram
      // cross-entropy scored on the SURVIVING corpus. Shuffle ledger:
      // one canonical-key dedup shuffle, two k-row-scalar basis
      // collects + a map-side score, then the KN model/score joins —
      // canonicalization and the screen itself never shuffle the corpus.
      (s, dir) => {
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("http://")),
          when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
          col("source"), lit(".Example.COM"),
          when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")),
          lit("/Docs/"), (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&b="), (col("doc_id") % 7).cast("string"),
          lit("&a=1"),
          when(col("doc_id") % 4 === 0, lit("&fbclid=XYZ")).otherwise(lit("")),
          when(col("doc_id") % 6 === 0, lit("#Sec2")).otherwise(lit("")))
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("text"), url.as("url"))
          .withColumn("domain", ops.TextOps.urlHost(col("url")))
          .withColumn("canon", ops.TextOps.canonicalizeUrl(col("url")))
        val keep1 = docs.groupBy(col("domain"), col("canon"))
          .agg(min("doc_id").as("doc_id"))
        val dd = docs.join(keep1, Seq("domain", "canon", "doc_id"))
        val scores = Similarity.mahalanobisScore(
            Tables.table(s, dir, "embeddings"), "vec_id", "embedding", p = 2)
          .withColumnRenamed("vec_id", "doc_id")
        val screened = dd.join(scores, Seq("doc_id"), "left")
          .filter(col("score").isNull || col("score") <= 9.21)
        val toks = screened.select(col("doc_id"), col("domain"),
          TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))
        TextStats.knBigramLmScore(toks, "doc_id", "toks")
          .join(toks.select(col("doc_id"), col("domain")), "doc_id")
          .withColumn("xent_kn", round(col("xent_kn"), 6))
          .select(col("doc_id"), col("domain"), col("xent_kn"))
          .orderBy("doc_id")
      },
      Some("""WITH uu AS MATERIALIZED (SELECT doc_id, text,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |  source || '.Example.COM' ||
        |  (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END) ||
        |  '/Docs/' || CAST(doc_id % 40 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |  '?utm_source=feed&b=' || CAST(doc_id % 7 AS VARCHAR) || '&a=1' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '&fbclid=XYZ' ELSE '' END) ||
        |  (CASE WHEN doc_id % 6 = 0 THEN '#Sec2' ELSE '' END) AS url
        |  FROM documents),
        |unf AS (SELECT doc_id, text,
        |        regexp_replace(trim(url), '#.*', '') AS nfu FROM uu),
        |upp AS (SELECT doc_id, text,
        |  regexp_replace(regexp_replace(lower(regexp_extract(nfu,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
        |    ':(80|443)$', ''), '^www\.', '') AS host,
        |  regexp_extract(nfu,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS p0,
        |  regexp_extract(nfu, '\?([^#]*)', 1) AS q0 FROM unf),
        |ukq AS (SELECT *, array_to_string(list_sort(list_filter(
        |         string_split(q0, '&'), p -> p <> '' AND NOT
        |         regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))),
        |         '&') AS kept FROM upp),
        |ucc AS MATERIALIZED (SELECT doc_id, text, host AS domain,
        |  'http://' || host ||
        |  (CASE WHEN p0 = '' THEN '/'
        |        ELSE regexp_replace(p0, '(.)/$', '\1') END) ||
        |  (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS canon
        |FROM ukq),
        |k1 AS MATERIALIZED (SELECT domain, canon, min(doc_id) AS doc_id
        |      FROM ucc GROUP BY 1, 2),
        |surv1 AS MATERIALIZED (SELECT ucc.doc_id, ucc.text, ucc.domain
        |      FROM ucc JOIN k1 ON k1.domain = ucc.domain
        |      AND k1.canon = ucc.canon AND k1.doc_id = ucc.doc_id),
        |e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
        |m0 AS MATERIALIZED (SELECT i, avg(x) AS mu FROM e GROUP BY i),
        |cx AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
        |       FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |cov AS MATERIALIZED (SELECT cx.i, cx.j, round(cx.sxy / n.n - ma.mu * mb.mu, 6) AS c
        |        FROM cx CROSS JOIN n
        |        JOIN m0 ma ON ma.i = cx.i JOIN m0 mb ON mb.i = cx.j),
        |dimd AS MATERIALIZED (SELECT count(*) AS d FROM m0),
        |v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(d) AS r FROM m0 CROSS JOIN dimd),
        |v1 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v0.r) AS r
        |       FROM cov JOIN v0 ON v0.i = cov.j GROUP BY 1),
        |v2 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v1.r) AS r
        |       FROM cov JOIN v1 ON v1.i = cov.j GROUP BY 1),
        |v3 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v2.r) AS r
        |       FROM cov JOIN v2 ON v2.i = cov.j GROUP BY 1),
        |nr1 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM v3),
        |sg1 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM v3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u1 AS MATERIALIZED (SELECT v3.i, round(sg1.sg * v3.r / nr1.nr, 9) AS u
        |       FROM v3 CROSS JOIN nr1 CROSS JOIN sg1),
        |l1 AS MATERIALIZED (SELECT round(sum(a.u * cov.c * b.u), 9) AS lam
        |       FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j),
        |cov2 AS MATERIALIZED (SELECT cov.i, cov.j, cov.c - l1.lam * a.u * b.u AS c
        |         FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j
        |         CROSS JOIN l1),
        |pw1 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * v0.r) AS r
        |       FROM cov2 JOIN v0 ON v0.i = cov2.j GROUP BY 1),
        |pw2 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * pw1.r) AS r
        |       FROM cov2 JOIN pw1 ON pw1.i = cov2.j GROUP BY 1),
        |pw3 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * pw2.r) AS r
        |       FROM cov2 JOIN pw2 ON pw2.i = cov2.j GROUP BY 1),
        |nr2 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM pw3),
        |sg2 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM pw3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u2 AS MATERIALIZED (SELECT pw3.i, round(sg2.sg * pw3.r / nr2.nr, 9) AS u
        |       FROM pw3 CROSS JOIN nr2 CROSS JOIN sg2),
        |l2 AS MATERIALIZED (SELECT round(sum(a.u * cov2.c * b.u), 9) AS lam
        |       FROM cov2 JOIN u2 a ON a.i = cov2.i JOIN u2 b ON b.i = cov2.j),
        |mr AS MATERIALIZED (SELECT i, round(mu, 9) AS mu FROM m0),
        |sh1 AS MATERIALIZED (SELECT sum(mr.mu * u1.u) AS c FROM mr JOIN u1 ON u1.i = mr.i),
        |sh2 AS MATERIALIZED (SELECT sum(mr.mu * u2.u) AS c FROM mr JOIN u2 ON u2.i = mr.i),
        |pj1 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u1.u) AS dp
        |       FROM e JOIN u1 ON u1.i = e.i GROUP BY 1),
        |pj2 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u2.u) AS dp
        |       FROM e JOIN u2 ON u2.i = e.i GROUP BY 1),
        |pcx AS MATERIALIZED (SELECT pj1.vec_id, round(pj1.dp - sh1.c, 6) AS pc1,
        |              round(pj2.dp - sh2.c, 6) AS pc2
        |       FROM pj1 JOIN pj2 USING (vec_id) CROSS JOIN sh1 CROSS JOIN sh2),
        |ms AS MATERIALIZED (SELECT vec_id AS doc_id,
        |       round(pc1 * pc1 / l1.lam + pc2 * pc2 / l2.lam, 6) + 0.0 AS score
        |       FROM pcx CROSS JOIN l1 CROSS JOIN l2),
        |surv2 AS MATERIALIZED (SELECT surv1.doc_id, surv1.domain, surv1.text
        |       FROM surv1 LEFT JOIN ms USING (doc_id)
        |       WHERE ms.score IS NULL OR ms.score <= 9.21),
        |t2 AS MATERIALIZED (SELECT doc_id, domain,
        |        list_filter(regexp_extract_all(lower(text), '\b\w\w+\b'),
        |          x -> x NOT IN ('the', 'a')) AS toks FROM surv2),
        |bg AS MATERIALIZED (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |      FROM (SELECT doc_id, toks, unnest(range(0, len(toks)-1)) AS i
        |            FROM t2 WHERE len(toks) >= 2)),
        |bc AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |ctx AS MATERIALIZED (SELECT w1, sum(c12) AS c1, count(*) AS n1f
        |      FROM bc GROUP BY 1),
        |cnt AS MATERIALIZED (SELECT w2, count(*) AS n1b FROM bc GROUP BY 1),
        |ntt AS MATERIALIZED (SELECT count(*) AS nbt FROM bc),
        |ppn AS (SELECT w1, w2,
        |        ln(greatest(c12 - 0.75, 0) / c1 +
        |           0.75 * n1f / c1 * (n1b / CAST(nbt AS DOUBLE))) AS logp
        |      FROM bc JOIN ctx USING (w1) JOIN cnt USING (w2) CROSS JOIN ntt),
        |sc AS (SELECT doc_id, -avg(logp) AS x
        |       FROM bg JOIN ppn USING (w1, w2) GROUP BY 1)
        |SELECT sc.doc_id, t2.domain, round(sc.x, 6) AS xent_kn
        |FROM sc JOIN t2 USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("q_datasheet",  // per-source corpus datasheet ("Datasheets for
      // Datasets", Gebru et al. CACM 2021): doc/char/token volumes,
      // exact-dup doc count (corpus-wide md5 groups), mean quality
      // score, language spread — the one-table release audit. One
      // hash-keyed dup join + one source-keyed aggregation; token and
      // quality columns are map-side expressions.
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        val d = docs.select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"), md5(col("text")).as("h"),
          TextOps.tokenizeFiltered(col("text"), Stop, Nil).as("toks"))
        val dup = d.groupBy(col("h")).agg(count(lit(1)).as("c"))
        d.join(dup, "h")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars_total"),
            sum(size(col("toks")).cast("long")).as("tok_total"),
            sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
            round(avg(TextStats.qualityScore(col("toks"), Stop)), 6).as("mean_quality"),
            count_distinct(col("lang")).as("n_langs"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, lang, n_chars, md5(text) AS h,
        |        list_filter(regexp_extract_all(lower(text), '\\b\\w\\w+\\b'),
        |          x -> x NOT IN ('the', 'a')) AS toks
        |      FROM documents),
        |c AS (SELECT h, count(*) AS c FROM d GROUP BY h)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |  CAST(sum(len(toks)) AS BIGINT) AS tok_total,
        |  CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  round(avg($SqlQuality), 6) AS mean_quality,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM d JOIN c USING (h) GROUP BY source ORDER BY source""".stripMargin)),

    Q("q_curation_emb",  // cross-modal curation: quality filter, then drop docs
      (s, dir) => {       // whose EMBEDDING has a lower-id near-dup (cos ≥ 0.4)
        val toks = TextOps.tokenize(col("text"))
        val qual = Tables.table(s, dir, "documents")
          .select(col("doc_id"), TextStats.qualityScore(toks, Stop).as("q"))
          .filter(col("q") >= 0.6)
        val emb = Tables.table(s, dir, "embeddings")
          .join(qual.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
        val pairs = Similarity.cosinePairsBlocked(emb, "vec_id", "embedding", 0.4)
        qual.select(col("doc_id"))
          .join(pairs.select(col("id2").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
        |        regexp_extract_all(lower(text), '\\b\\w\\w+\\b') AS toks FROM documents),
        |q AS (SELECT doc_id FROM t WHERE $SqlQuality >= 0.6),
        |e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i
        |      FROM embeddings WHERE vec_id IN (SELECT doc_id FROM q)),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |d AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.x * b.x) AS dp
        |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
        |drops AS (SELECT DISTINCT id2
        |          FROM d JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2
        |          WHERE dp / (na.nrm * nb.nrm) >= 0.4)
        |SELECT doc_id FROM q WHERE doc_id NOT IN (SELECT id2 FROM drops)
        |ORDER BY doc_id""".stripMargin)),

    Q("q_csv_roundtrip",  // line-format sink/source: csv write + schema-full
      (s, dir) => {        // read-back must be the identity
        val out = Scratch.dir("graftcsv")
        val d = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
        graft.sources.Sinks.writeLines(d, s"$out/docs", "csv")
        s.read.option("header", "true").schema(d.schema).csv(s"$out/docs")
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, lang, n_chars, source FROM documents ORDER BY doc_id")),

    Q("q_avro_roundtrip",  // S2/S4 in the GATED surface: Avro+Snappy container
      // sink → container scan must be the identity, value-oracled against
      // the source table (DuckDB never reads the Avro file — the oracle is
      // the identity contract, exactly like q_csv_roundtrip). The IO path
      // is the hand-rolled avro-mapred bridge (ref sink config
      // JobExtractTransform.java:67-68; no spark-avro jar in env).
      (s, dir) => {
        val out = Scratch.dir("graftavro")
        val d = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
        graft.sources.AvroIO.writeAvro(d, s"$out/docs", "doc")
        graft.sources.AvroIO.readAvro(s, s"$out/docs", d.schema).orderBy("doc_id")
      },
      Some("SELECT doc_id, lang, n_chars, source FROM documents ORDER BY doc_id")),

    Q("q_orc_roundtrip",  // columnar sink/source #3: ORC (zlib default) via
      // Spark's built-in vectorized ORC reader — the other lake format a
      // migrating user brings; identity-contract oracle like
      // q_csv_roundtrip/q_avro_roundtrip (DuckDB never reads the ORC
      // file). Predicate pushdown / column pruning on ORC scans come
      // free from the same DataSource V2 path as parquet.
      (s, dir) => {
        val out = Scratch.dir("graftorc")
        val d = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
        d.write.mode("overwrite").orc(s"$out/docs")
        s.read.orc(s"$out/docs").orderBy("doc_id")
      },
      Some("SELECT doc_id, lang, n_chars, source FROM documents ORDER BY doc_id")),

    Q("q_partitioned_scan",  // Hive-style partition pruning end-to-end:
      // write documents partitionBy(source), read back with a source
      // filter — the filter must become a PartitionFilter (whole
      // directories skipped at planning, zero data rows read from the
      // other 19 sources), not a post-scan predicate. The 100 TB
      // analogue is date/source-partitioned lakes where pruning is the
      // difference between scanning 1/20th and all of it.
      // Value-oracled via the identity contract on the source table.
      (s, dir) => {
        val out = Scratch.dir("graftpart")
        Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
          .write.mode("overwrite").partitionBy("source").parquet(s"$out/docs")
        s.read.parquet(s"$out/docs")
          .filter(col("source") === "src0")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE source = 'src0'
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("q_corpus_stats",  // dataset-card profile per source shard
      (s, dir) => {
        val toks = TextOps.tokenize(col("text"))
        Tables.table(s, dir, "documents")
          .select(col("source"), col("lang"), col("n_chars"), size(toks).as("nt"),
            TextStats.qualityScore(toks, Stop).as("q"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("nt")).as("total_tokens"),
            round(avg(col("n_chars")), 4).as("avg_chars"),
            round(avg(col("q")), 6).as("avg_quality"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source, lang, n_chars,
        |        regexp_extract_all(lower(text), '\\b\\w\\w+\\b') AS toks FROM documents),
        |m AS (SELECT source, lang, n_chars, len(toks) AS nt, $SqlQuality AS q FROM d)
        |SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  round(avg(n_chars), 4) AS avg_chars, round(avg(q), 6) AS avg_quality
        |FROM m GROUP BY source ORDER BY source""".stripMargin)),

    Q("q_grouping_sets",  // SQL front-end: explicit GROUPING SETS
      (s, dir) => {
        Tables.table(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
          FROM lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    Q("q_mode",  // deterministic per-group mode (most frequent value,
      // smallest wins ties): count + argmax window — the portable form
      // of a MODE() aggregate (engine-native modes differ on ties)
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag").orderBy(col("n").desc, col("l_quantity"))
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
            col("n").as("mode_n"))
          .orderBy("l_returnflag")
      },
      Some("""WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
        |      FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_quantity, n, row_number() OVER
        |        (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity) AS rk
        |      FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_n
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin)),

    Q("q_corr_subquery",  // SQL front-end, TPC-H Q17 shape: correlated
      // SCALAR subquery (per-part average) in the WHERE — Catalyst
      // rewrites it to an aggregate + join, no per-row re-execution;
      // the demonstration is that the rewrite engine handles it, the
      // plan stays shuffle-join-shaped
      (s, dir) => {
        // temp-view names are query-unique: Verify runs queries
        // concurrently, and a shared name would race in the catalog
        Tables.table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q17")
        Tables.table(s, dir, "part").createOrReplaceTempView("part_q17")
        s.sql("""SELECT p_brand, round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
          FROM lineitem_q17 JOIN part_q17 ON p_partkey = l_partkey
          WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
                              FROM lineitem_q17 l2 WHERE l2.l_partkey = p_partkey)
          GROUP BY p_brand ORDER BY p_brand""")
      },
      Some("""SELECT p_brand, round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    Q("q_exists_agg",  // SQL front-end, TPC-H Q4 shape: correlated EXISTS
      // feeding an aggregate — planned as a left-semi hash join, the
      // orders side aggregates after the probe (no subquery re-execution)
      (s, dir) => {
        Tables.table(s, dir, "orders").createOrReplaceTempView("orders_q4")
        Tables.table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q4")
        s.sql("""SELECT o_orderpriority, count(*) AS order_count
          FROM orders_q4
          WHERE EXISTS (SELECT 1 FROM lineitem_q4
                        WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("q_range_frame",  // time-based RANGE window frame (not ROWS): per
      // event, rolling sum/count of same-user event values in the
      // preceding hour inclusive — tie-safe by definition (every row
      // whose key falls in [cur-3600, cur] joins the frame regardless
      // of physical order)
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("tss")
          .rangeBetween(-3600L, org.apache.spark.sql.expressions.Window.currentRow)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("ts_ns div 1000000000").as("tss"), col("value"))
          .withColumn("sum_1h", round(sum("value").over(w), 6))
          .withColumn("n_1h", count(lit(1)).over(w))
          .select(col("event_id"), col("user_id"), col("sum_1h"), col("n_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
        |  round(sum(value) OVER w, 6) AS sum_1h,
        |  count(*) OVER w AS n_1h
        |FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS tss, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tss
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),

    Q("q_string_funcs",  // scalar string surface: case, substr, concat, length, edit distance
      (s, dir) => Tables.table(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 8).as("name8"),
          concat_ws("/", col("p_brand"), col("p_type")).as("bt"),
          length(col("p_name")).as("name_len"),
          levenshtein(col("p_brand"), col("p_type")).as("edit_dist"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 8) AS name8,
        |  concat_ws('/', p_brand, p_type) AS bt,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  CAST(levenshtein(p_brand, p_type) AS INT) AS edit_dist
        |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("q_date_parts",  // temporal scalar surface over order dates
      (s, dir) => Tables.table(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(quarter(o_orderdate) AS INT) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q_json_roundtrip",  // C1/S1: serialize to JSON lines, parse back schema-fully
      (s, dir) => {
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, lang STRING, n_chars BIGINT")
        Tables.table(s, dir, "documents")
          .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("line"))
          .select(from_json(col("line"), schema).as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
            col("r.n_chars").as("n_chars"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id")),

    Q("q_percentiles",  // exact interpolated quantiles per group
      (s, dir) => Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q_bigram_lm",  // add-k bigram LM cross-entropy — the word-order-aware
      // rung above q_lm_score's unigram CCNet signal: shuffled/stitched
      // text keeps its unigram perplexity but not its bigram one. Bigram
      // stream derived MAP-SIDE (two slices zipped, no positional
      // self-join); model = one partial-agg'd groupBy on the bigram key;
      // scoring = one bigram-keyed join; V broadcasts as 1 row.
      (s, dir) => TextStats.bigramLmScore(docsTokens(s, dir), "doc_id", "toks")
        .withColumn("xent", round(col("xent"), 6))
        .orderBy("doc_id"),
      Some(s"""WITH t AS ($SqlToks),
        |b AS (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |      FROM (SELECT doc_id, toks, unnest(range(0, len(toks)-1)) AS i
        |            FROM t WHERE len(toks) >= 2)),
        |bc AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        |cc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1),
        |vo AS (SELECT count(DISTINCT w) AS v
        |       FROM (SELECT unnest(toks) AS w FROM t)),
        |p AS (SELECT w1, w2, ln((c12 + 0.5) / (c1 + 0.5 * vo.v)) AS logp
        |      FROM bc JOIN cc USING (w1) CROSS JOIN vo)
        |SELECT doc_id, round(-avg(logp), 6) AS xent
        |FROM b JOIN p USING (w1, w2) GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_kn_bigram_lm",  // interpolated KNESER–NEY bigram cross-entropy
      // (Kneser & Ney 1995; Chen & Goodman 1999) — the standard n-gram
      // smoothing next to q_bigram_lm's add-k: absolute discount D=0.75
      // with continuation probability N1+(·w2)/N1+(··), so words that
      // only ever follow one context ("Francisco") stop being overrated.
      // The N1+ tables are by-products of the same bigram-count
      // aggregate — no extra corpus pass; same shuffle shape as add-k.
      (s, dir) => TextStats.knBigramLmScore(docsTokens(s, dir), "doc_id", "toks")
        .withColumn("xent_kn", round(col("xent_kn"), 6))
        .orderBy("doc_id"),
      Some(s"""WITH t AS ($SqlToks),
        |b AS MATERIALIZED (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |      FROM (SELECT doc_id, toks, unnest(range(0, len(toks)-1)) AS i
        |            FROM t WHERE len(toks) >= 2)),
        |bc AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        |cc AS MATERIALIZED (SELECT w1, sum(c12) AS c1, count(*) AS n1f
        |      FROM bc GROUP BY 1),
        |ct AS MATERIALIZED (SELECT w2, count(*) AS n1b FROM bc GROUP BY 1),
        |nt AS MATERIALIZED (SELECT count(*) AS nbt FROM bc),
        |p AS (SELECT w1, w2,
        |        ln(greatest(c12 - 0.75, 0) / c1 +
        |           0.75 * n1f / c1 * (n1b / CAST(nbt AS DOUBLE))) AS logp
        |      FROM bc JOIN cc USING (w1) JOIN ct USING (w2) CROSS JOIN nt)
        |SELECT doc_id, round(-avg(logp), 6) AS xent_kn
        |FROM b JOIN p USING (w1, w2) GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_hashing_tf",  // feature hashing (Weinberger et al. ICML'09 /
      // MLlib HashingTF): term counts bucketed by md5 into a fixed
      // m=32-dim space — no vocabulary table, no fit pass, no word-keyed
      // shuffle; the vectorizer that survives an unbounded vocabulary.
      // One doc-keyed partial-agg'd shuffle; md5 buckets = the portable
      // device, xxhash64 = the production path (hashingTf(portable=false)).
      (s, dir) => Tfidf.hashingTf(docsTokens(s, dir), "doc_id", "toks", m = 32)
        .orderBy("doc_id", "bucket"),
      Some(s"""WITH t AS ($SqlToks),
        |e AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |h AS (SELECT doc_id,
        |        CAST((CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 32) AS INT) AS bucket
        |      FROM e)
        |SELECT doc_id, bucket, count(*) AS tf
        |FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin)),

    Q("q_knn_graph",  // exact cosine 5-NN graph over every embedding —
      // the substrate for graph-based curation and the exact baseline
      // that grades q_ann_ivf. Pair gen = blocked block-pair tasks
      // (cosinePairsBlocked, no collect/broadcast of the corpus), then
      // each undirected pair mirrors into both directions and a
      // per-source top-k window ranks on ROUNDED cosine (ties by
      // neighbor id) so the rank boundary is engine-independent.
      (s, dir) => Similarity.knnGraph(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding", k = 5)
        .orderBy("src", "rank"),
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |d AS (SELECT a.vec_id AS src, b.vec_id AS dst, sum(a.x * b.x) AS dp
        |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id GROUP BY 1, 2),
        |c AS (SELECT src, dst, round(dp / (na.nrm * nb.nrm), 4) + 0.0 AS cos
        |      FROM d JOIN n na ON na.vec_id = src JOIN n nb ON nb.vec_id = dst),
        |r AS (SELECT src, dst, cos,
        |        row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
        |      FROM c)
        |SELECT src, CAST(rnk AS INT) AS rank, dst, cos
        |FROM r WHERE rnk <= 5 ORDER BY src, rank""".stripMargin)),

    Q("q_knn_approx",  // cell-routed APPROXIMATE kNN self-join — the
      // scale path that frees the graph substrate from q_knn_graph's
      // Θ(n²) kernel: map-side routing to the 5 nearest of the 8
      // deterministic cells (vec_id<8 — the q_ann_ivf routing table),
      // ONE shuffle on the cell key for SYMMETRIC candidates (either
      // side probing the other's home cell qualifies the pair), exact
      // dot verify, per-source top-5 on rounded cosine. No n·C window
      // shuffle: the probe list is a C-struct sort against driver
      // literals. nprobe=5/8 + symmetry ⇒ 0.95 recall (see sweep).
      (s, dir) => Similarity.knnSelfJoin(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          fixedCentroidArr(s, dir), k = 5, nprobe = 5)
        .orderBy("qid", "rank"),
      Some("""WITH pts AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |cents AS (SELECT vec_id AS cid, CAST(unnest(embedding) AS DOUBLE) AS c,
        |          unnest(range(0, len(embedding))) AS i FROM embeddings WHERE vec_id < 8),
        |ad AS MATERIALIZED (SELECT p.vec_id, c.cid, sqrt(sum((p.x - c.c) * (p.x - c.c))) AS dist
        |       FROM pts p JOIN cents c ON p.i = c.i GROUP BY 1, 2),
        |home AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |probe AS (SELECT vec_id AS qid, cid AS cell FROM ad
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= 5),
        |n AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pts GROUP BY 1),
        |m AS (SELECT q.qid AS a, h.vec_id AS b FROM probe q
        |      JOIN home h ON h.cell = q.cell AND h.vec_id <> q.qid),
        |cand AS (SELECT a AS qid, b AS nbr FROM m UNION SELECT b, a FROM m),
        |d AS (SELECT cand.qid, cand.nbr, sum(a.x * b.x) AS dp
        |      FROM cand JOIN pts a ON a.vec_id = cand.qid
        |                JOIN pts b ON b.vec_id = cand.nbr AND b.i = a.i
        |      GROUP BY 1, 2),
        |c2 AS (SELECT qid, nbr, round(dp / (nq.nrm * nv.nrm), 4) + 0.0 AS cos
        |       FROM d JOIN n nq ON nq.vec_id = qid JOIN n nv ON nv.vec_id = nbr),
        |r AS (SELECT qid, nbr, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rnk
        |      FROM c2)
        |SELECT qid, CAST(rnk AS INT) AS rank, nbr, cos
        |FROM r WHERE rnk <= 5 ORDER BY qid, rank""".stripMargin)),

    Q("q_knn_approx_recall",  // per-vector |approx top-5 ∩ exact top-5|
      // — the recall grade of q_knn_approx against q_knn_graph, on the
      // same rounded-cosine/id-tie ranking both sides use. The sweep
      // spec asserts mean n_common/k ≥ 0.9 at all 3 SFs and writes
      // out/knn_recall_sweep.json as the per-round evidence.
      (s, dir) => Similarity.knnSelfRecall(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          fixedCentroidArr(s, dir), k = 5, nprobe = 5)
        .orderBy("qid"),
      Some("""WITH pts AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |cents AS (SELECT vec_id AS cid, CAST(unnest(embedding) AS DOUBLE) AS c,
        |          unnest(range(0, len(embedding))) AS i FROM embeddings WHERE vec_id < 8),
        |ad AS MATERIALIZED (SELECT p.vec_id, c.cid, sqrt(sum((p.x - c.c) * (p.x - c.c))) AS dist
        |       FROM pts p JOIN cents c ON p.i = c.i GROUP BY 1, 2),
        |home AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |probe AS (SELECT vec_id AS qid, cid AS cell FROM ad
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= 5),
        |n AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pts GROUP BY 1),
        |m AS (SELECT q.qid AS a, h.vec_id AS b FROM probe q
        |      JOIN home h ON h.cell = q.cell AND h.vec_id <> q.qid),
        |cand AS (SELECT a AS qid, b AS nbr FROM m UNION SELECT b, a FROM m),
        |d AS (SELECT cand.qid, cand.nbr, sum(a.x * b.x) AS dp
        |      FROM cand JOIN pts a ON a.vec_id = cand.qid
        |                JOIN pts b ON b.vec_id = cand.nbr AND b.i = a.i
        |      GROUP BY 1, 2),
        |c2 AS (SELECT qid, nbr, round(dp / (nq.nrm * nv.nrm), 4) AS cos
        |       FROM d JOIN n nq ON nq.vec_id = qid JOIN n nv ON nv.vec_id = nbr),
        |ra AS MATERIALIZED (SELECT qid, nbr FROM (SELECT qid, nbr,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rnk
        |      FROM c2) WHERE rnk <= 5),
        |dx AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS nbr, sum(a.x * b.x) AS dp
        |      FROM pts a JOIN pts b ON a.i = b.i AND a.vec_id <> b.vec_id GROUP BY 1, 2),
        |cx AS (SELECT qid, nbr, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM dx JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nbr),
        |rx AS MATERIALIZED (SELECT qid, nbr FROM (SELECT qid, nbr,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rnk
        |      FROM cx) WHERE rnk <= 5),
        |jn AS (SELECT ra.qid, count(*) AS n_common
        |       FROM ra JOIN rx ON rx.qid = ra.qid AND rx.nbr = ra.nbr GROUP BY 1)
        |SELECT e.vec_id AS qid, CAST(COALESCE(jn.n_common, 0) AS BIGINT) AS n_common
        |FROM embeddings e LEFT JOIN jn ON jn.qid = e.vec_id
        |ORDER BY qid""".stripMargin)),

    Q("q_embed_cov",  // population covariance matrix of the embedding
      // table as (i, j, cov) — the PCA/whitening/Mahalanobis input. Each
      // row expands map-side to ONE d²+d array (outer products ++ the
      // vector); a single posexplode+groupBy(idx) folds the corpus into
      // d²+d cells with map-side partial agg, so the exchange carries
      // partitions×(d²+d) rows no matter the corpus size; the d-row mean
      // table broadcast-joins back twice to center the raw moments.
      (s, dir) => Similarity.embedCovariance(
          Tables.table(s, dir, "embeddings"), "embedding")
        .orderBy("i", "j"),
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS (SELECT count(*) AS n FROM embeddings),
        |m AS (SELECT i, avg(x) AS mu FROM e GROUP BY i),
        |c AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
        |      FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2)
        |SELECT CAST(c.i AS INT) AS i, CAST(c.j AS INT) AS j,
        |       round(c.sxy / n.n - ma.mu * mb.mu, 6) + 0.0 AS cov
        |FROM c CROSS JOIN n JOIN m ma ON ma.i = c.i JOIN m mb ON mb.i = c.j
        |ORDER BY i, j""".stripMargin)),

    Q("q_pca_project",  // PCA projection onto the dominant covariance
      // eigenvector — whitening/drift rotation: 3 UN-normalized
      // power-method steps from (1,…,1)/√d on the ROUNDED q_embed_cov
      // matrix (fixed iters + no per-step normalization = closed-form
      // polynomial of the matrix, so DuckDB unrolls the same 3 steps;
      // topEigen is the converged production twin), one normalize +
      // first-nonzero-positive orientation, then ONE map-side codegen
      // dot against the broadcast axis; centering is the constant μ·u.
      (s, dir) => Similarity.pcaProject(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS (SELECT count(*) AS n FROM embeddings),
        |m0 AS (SELECT i, avg(x) AS mu FROM e GROUP BY i),
        |cx AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
        |       FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |cov AS (SELECT cx.i, cx.j, round(cx.sxy / n.n - ma.mu * mb.mu, 6) AS cov
        |        FROM cx CROSS JOIN n
        |        JOIN m0 ma ON ma.i = cx.i JOIN m0 mb ON mb.i = cx.j),
        |dd AS (SELECT count(*) AS d FROM m0),
        |v0 AS (SELECT i, 1.0 / sqrt(d) AS r FROM m0 CROSS JOIN dd),
        |v1 AS (SELECT cov.i, sum(cov.cov * v0.r) AS r
        |       FROM cov JOIN v0 ON v0.i = cov.j GROUP BY 1),
        |v2 AS (SELECT cov.i, sum(cov.cov * v1.r) AS r
        |       FROM cov JOIN v1 ON v1.i = cov.j GROUP BY 1),
        |v3 AS (SELECT cov.i, sum(cov.cov * v2.r) AS r
        |       FROM cov JOIN v2 ON v2.i = cov.j GROUP BY 1),
        |nr AS (SELECT sqrt(sum(r * r)) AS nr FROM v3),
        |sg AS (SELECT CASE WHEN (SELECT r FROM v3 WHERE r <> 0
        |                         ORDER BY i LIMIT 1) < 0
        |              THEN -1.0 ELSE 1.0 END AS sg),
        |u AS (SELECT v3.i, sg.sg * v3.r / nr.nr AS u
        |      FROM v3 CROSS JOIN nr CROSS JOIN sg),
        |mr AS (SELECT i, round(mu, 9) AS mu FROM m0),
        |sh AS (SELECT sum(mr.mu * u.u) AS c FROM mr JOIN u USING (i)),
        |pj AS (SELECT e.vec_id, sum(e.x * u.u) AS dp
        |       FROM e JOIN u ON u.i = e.i GROUP BY 1)
        |SELECT vec_id, round(dp - sh.c, 6) + 0.0 AS proj
        |FROM pj CROSS JOIN sh ORDER BY vec_id""".stripMargin)),

    Q("q_pca_top2",  // top-2 PCA via HOTELLING DEFLATION — the
      // multi-component basis whitening actually needs: u1 as in
      // q_pca_project but ROUNDED to 9 dp, λ1 = round(u1ᵀMu1, 9)
      // (Rayleigh), deflate M2 = M − λ1·u1u1ᵀ (exact arithmetic on
      // engine-identical doubles — the pinning device), 3 more
      // unrolled steps on M2 → u2, then TWO map-side codegen dots.
      (s, dir) => Similarity.pcaProjectTop(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding", p = 2)
        .orderBy("vec_id"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
        |m0 AS MATERIALIZED (SELECT i, avg(x) AS mu FROM e GROUP BY i),
        |cx AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
        |       FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |cov AS MATERIALIZED (SELECT cx.i, cx.j, round(cx.sxy / n.n - ma.mu * mb.mu, 6) AS c
        |        FROM cx CROSS JOIN n
        |        JOIN m0 ma ON ma.i = cx.i JOIN m0 mb ON mb.i = cx.j),
        |dd AS MATERIALIZED (SELECT count(*) AS d FROM m0),
        |v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(d) AS r FROM m0 CROSS JOIN dd),
        |v1 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v0.r) AS r
        |       FROM cov JOIN v0 ON v0.i = cov.j GROUP BY 1),
        |v2 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v1.r) AS r
        |       FROM cov JOIN v1 ON v1.i = cov.j GROUP BY 1),
        |v3 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v2.r) AS r
        |       FROM cov JOIN v2 ON v2.i = cov.j GROUP BY 1),
        |nr1 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM v3),
        |sg1 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM v3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u1 AS MATERIALIZED (SELECT v3.i, round(sg1.sg * v3.r / nr1.nr, 9) AS u
        |       FROM v3 CROSS JOIN nr1 CROSS JOIN sg1),
        |l1 AS MATERIALIZED (SELECT round(sum(a.u * cov.c * b.u), 9) AS lam
        |       FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j),
        |cov2 AS MATERIALIZED (SELECT cov.i, cov.j, cov.c - l1.lam * a.u * b.u AS c
        |         FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j
        |         CROSS JOIN l1),
        |w1 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * v0.r) AS r
        |       FROM cov2 JOIN v0 ON v0.i = cov2.j GROUP BY 1),
        |w2 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * w1.r) AS r
        |       FROM cov2 JOIN w1 ON w1.i = cov2.j GROUP BY 1),
        |w3 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * w2.r) AS r
        |       FROM cov2 JOIN w2 ON w2.i = cov2.j GROUP BY 1),
        |nr2 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM w3),
        |sg2 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM w3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u2 AS MATERIALIZED (SELECT w3.i, round(sg2.sg * w3.r / nr2.nr, 9) AS u
        |       FROM w3 CROSS JOIN nr2 CROSS JOIN sg2),
        |mr AS MATERIALIZED (SELECT i, round(mu, 9) AS mu FROM m0),
        |sh1 AS MATERIALIZED (SELECT sum(mr.mu * u1.u) AS c FROM mr JOIN u1 ON u1.i = mr.i),
        |sh2 AS MATERIALIZED (SELECT sum(mr.mu * u2.u) AS c FROM mr JOIN u2 ON u2.i = mr.i),
        |p1 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u1.u) AS dp
        |       FROM e JOIN u1 ON u1.i = e.i GROUP BY 1),
        |p2 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u2.u) AS dp
        |       FROM e JOIN u2 ON u2.i = e.i GROUP BY 1)
        |SELECT p1.vec_id, round(p1.dp - sh1.c, 6) + 0.0 AS pc1,
        |       round(p2.dp - sh2.c, 6) + 0.0 AS pc2
        |FROM p1 JOIN p2 USING (vec_id) CROSS JOIN sh1 CROSS JOIN sh2
        |ORDER BY vec_id""".stripMargin)),

    Q("q_mahalanobis",  // Mahalanobis outlier screen in the top-2
      // eigenbasis: score = pc1²/λ1 + pc2²/λ2 on ROUNDED projections
      // and 9-dp Rayleigh eigenvalues — exact arithmetic on
      // engine-identical doubles, so the only cross-engine tolerance
      // is the two pc rounds. High score = far from the data cloud
      // along its own principal axes (embedding-quality outliers).
      (s, dir) => Similarity.mahalanobisScore(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding", p = 2)
        .orderBy("vec_id"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
        |m0 AS MATERIALIZED (SELECT i, avg(x) AS mu FROM e GROUP BY i),
        |cx AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
        |       FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |cov AS MATERIALIZED (SELECT cx.i, cx.j, round(cx.sxy / n.n - ma.mu * mb.mu, 6) AS c
        |        FROM cx CROSS JOIN n
        |        JOIN m0 ma ON ma.i = cx.i JOIN m0 mb ON mb.i = cx.j),
        |dd AS MATERIALIZED (SELECT count(*) AS d FROM m0),
        |v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(d) AS r FROM m0 CROSS JOIN dd),
        |v1 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v0.r) AS r
        |       FROM cov JOIN v0 ON v0.i = cov.j GROUP BY 1),
        |v2 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v1.r) AS r
        |       FROM cov JOIN v1 ON v1.i = cov.j GROUP BY 1),
        |v3 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v2.r) AS r
        |       FROM cov JOIN v2 ON v2.i = cov.j GROUP BY 1),
        |nr1 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM v3),
        |sg1 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM v3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u1 AS MATERIALIZED (SELECT v3.i, round(sg1.sg * v3.r / nr1.nr, 9) AS u
        |       FROM v3 CROSS JOIN nr1 CROSS JOIN sg1),
        |l1 AS MATERIALIZED (SELECT round(sum(a.u * cov.c * b.u), 9) AS lam
        |       FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j),
        |cov2 AS MATERIALIZED (SELECT cov.i, cov.j, cov.c - l1.lam * a.u * b.u AS c
        |         FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j
        |         CROSS JOIN l1),
        |w1 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * v0.r) AS r
        |       FROM cov2 JOIN v0 ON v0.i = cov2.j GROUP BY 1),
        |w2 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * w1.r) AS r
        |       FROM cov2 JOIN w1 ON w1.i = cov2.j GROUP BY 1),
        |w3 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * w2.r) AS r
        |       FROM cov2 JOIN w2 ON w2.i = cov2.j GROUP BY 1),
        |nr2 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM w3),
        |sg2 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM w3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u2 AS MATERIALIZED (SELECT w3.i, round(sg2.sg * w3.r / nr2.nr, 9) AS u
        |       FROM w3 CROSS JOIN nr2 CROSS JOIN sg2),
        |l2 AS MATERIALIZED (SELECT round(sum(a.u * cov2.c * b.u), 9) AS lam
        |       FROM cov2 JOIN u2 a ON a.i = cov2.i JOIN u2 b ON b.i = cov2.j),
        |mr AS MATERIALIZED (SELECT i, round(mu, 9) AS mu FROM m0),
        |sh1 AS MATERIALIZED (SELECT sum(mr.mu * u1.u) AS c FROM mr JOIN u1 ON u1.i = mr.i),
        |sh2 AS MATERIALIZED (SELECT sum(mr.mu * u2.u) AS c FROM mr JOIN u2 ON u2.i = mr.i),
        |p1 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u1.u) AS dp
        |       FROM e JOIN u1 ON u1.i = e.i GROUP BY 1),
        |p2 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u2.u) AS dp
        |       FROM e JOIN u2 ON u2.i = e.i GROUP BY 1),
        |pc AS MATERIALIZED (SELECT p1.vec_id, round(p1.dp - sh1.c, 6) AS pc1,
        |              round(p2.dp - sh2.c, 6) AS pc2
        |       FROM p1 JOIN p2 USING (vec_id) CROSS JOIN sh1 CROSS JOIN sh2)
        |SELECT vec_id,
        |       round(pc1 * pc1 / l1.lam + pc2 * pc2 / l2.lam, 6) + 0.0 AS score
        |FROM pc CROSS JOIN l1 CROSS JOIN l2 ORDER BY vec_id""".stripMargin)),

    Q("q_whiten",  // PCA whitening in the top-2 eigenbasis: w_c =
      // pc_c/√λ_c — decorrelated unit-variance coordinates (the
      // Mahalanobis score is exactly Σ w_c²). ROUNDED pc over the
      // 9-dp Rayleigh λ, so the division runs on engine-identical
      // doubles; two map-side codegen dots, zero shuffle.
      (s, dir) => Similarity.whiten(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding", p = 2)
        .orderBy("vec_id"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
        |m0 AS MATERIALIZED (SELECT i, avg(x) AS mu FROM e GROUP BY i),
        |cx AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
        |       FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |cov AS MATERIALIZED (SELECT cx.i, cx.j, round(cx.sxy / n.n - ma.mu * mb.mu, 6) AS c
        |        FROM cx CROSS JOIN n
        |        JOIN m0 ma ON ma.i = cx.i JOIN m0 mb ON mb.i = cx.j),
        |dd AS MATERIALIZED (SELECT count(*) AS d FROM m0),
        |v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(d) AS r FROM m0 CROSS JOIN dd),
        |v1 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v0.r) AS r
        |       FROM cov JOIN v0 ON v0.i = cov.j GROUP BY 1),
        |v2 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v1.r) AS r
        |       FROM cov JOIN v1 ON v1.i = cov.j GROUP BY 1),
        |v3 AS MATERIALIZED (SELECT cov.i, sum(cov.c * v2.r) AS r
        |       FROM cov JOIN v2 ON v2.i = cov.j GROUP BY 1),
        |nr1 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM v3),
        |sg1 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM v3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u1 AS MATERIALIZED (SELECT v3.i, round(sg1.sg * v3.r / nr1.nr, 9) AS u
        |       FROM v3 CROSS JOIN nr1 CROSS JOIN sg1),
        |l1 AS MATERIALIZED (SELECT round(sum(a.u * cov.c * b.u), 9) AS lam
        |       FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j),
        |cov2 AS MATERIALIZED (SELECT cov.i, cov.j, cov.c - l1.lam * a.u * b.u AS c
        |         FROM cov JOIN u1 a ON a.i = cov.i JOIN u1 b ON b.i = cov.j
        |         CROSS JOIN l1),
        |w1 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * v0.r) AS r
        |       FROM cov2 JOIN v0 ON v0.i = cov2.j GROUP BY 1),
        |w2 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * w1.r) AS r
        |       FROM cov2 JOIN w1 ON w1.i = cov2.j GROUP BY 1),
        |w3 AS MATERIALIZED (SELECT cov2.i, sum(cov2.c * w2.r) AS r
        |       FROM cov2 JOIN w2 ON w2.i = cov2.j GROUP BY 1),
        |nr2 AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS nr FROM w3),
        |sg2 AS MATERIALIZED (SELECT CASE WHEN (SELECT r FROM w3 WHERE r <> 0
        |                          ORDER BY i LIMIT 1) < 0
        |               THEN -1.0 ELSE 1.0 END AS sg),
        |u2 AS MATERIALIZED (SELECT w3.i, round(sg2.sg * w3.r / nr2.nr, 9) AS u
        |       FROM w3 CROSS JOIN nr2 CROSS JOIN sg2),
        |l2 AS MATERIALIZED (SELECT round(sum(a.u * cov2.c * b.u), 9) AS lam
        |       FROM cov2 JOIN u2 a ON a.i = cov2.i JOIN u2 b ON b.i = cov2.j),
        |mr AS MATERIALIZED (SELECT i, round(mu, 9) AS mu FROM m0),
        |sh1 AS MATERIALIZED (SELECT sum(mr.mu * u1.u) AS c FROM mr JOIN u1 ON u1.i = mr.i),
        |sh2 AS MATERIALIZED (SELECT sum(mr.mu * u2.u) AS c FROM mr JOIN u2 ON u2.i = mr.i),
        |p1 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u1.u) AS dp
        |       FROM e JOIN u1 ON u1.i = e.i GROUP BY 1),
        |p2 AS MATERIALIZED (SELECT e.vec_id, sum(e.x * u2.u) AS dp
        |       FROM e JOIN u2 ON u2.i = e.i GROUP BY 1),
        |pc AS MATERIALIZED (SELECT p1.vec_id, round(p1.dp - sh1.c, 6) AS pc1,
        |              round(p2.dp - sh2.c, 6) AS pc2
        |       FROM p1 JOIN p2 USING (vec_id) CROSS JOIN sh1 CROSS JOIN sh2)
        |SELECT vec_id, round(pc1 / sqrt(l1.lam), 6) + 0.0 AS w1,
        |       round(pc2 / sqrt(l2.lam), 6) + 0.0 AS w2
        |FROM pc CROSS JOIN l1 CROSS JOIN l2 ORDER BY vec_id""".stripMargin)),

    Q("q_jl_project",  // Johnson–Lindenstrauss ±1 random projection to
      // k=16 dims (Achlioptas JCSS 2003): y_j = Σ x_i·s(j,i)/√k with
      // md5-keyed signs so the matrix rebuilds bit-for-bit in DuckDB —
      // the data-independent dimensionality reducer in front of
      // ANN/clustering at production d. ONE map-side pass of 16 fused
      // codegen dots against driver-literal sign rows, zero shuffle.
      (s, dir) => Similarity.jlProject(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding", k = 16)
        .orderBy("vec_id", "j"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |        CAST(unnest(range(0, len(embedding))) AS INT) AS i
        |      FROM embeddings),
        |dims AS MATERIALIZED (SELECT DISTINCT i FROM e),
        |s AS MATERIALIZED (SELECT j.j, dims.i,
        |        CASE WHEN substr(md5('jl:' || j.j || ':' || dims.i), 1, 1)
        |             IN ('0','2','4','6','8','a','c','e')
        |        THEN 1.0 ELSE -1.0 END AS s
        |      FROM (SELECT unnest(range(0, 16)) AS j) j CROSS JOIN dims),
        |p AS (SELECT e.vec_id, s.j, sum(e.x * s.s) / sqrt(16.0) AS y0
        |      FROM e JOIN s ON s.i = e.i GROUP BY 1, 2)
        |SELECT vec_id, CAST(j AS INT) AS j, round(y0, 6) + 0.0 AS y
        |FROM p ORDER BY vec_id, j""".stripMargin)),

    Q("q_trunc_recall",  // truncated-dimension retrieval recall — the
      // matryoshka-style eval pricing "how many dims can the ANN tier
      // drop": per probe (vec_id%50=0), |top-5 ∩ top-5| between the
      // full 64-dim and first-16-dim rounded-cosine rankings (id
      // ties). Probes broadcast; only the top-k windows shuffle.
      (s, dir) => Similarity.truncRecall(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          dTrunc = 16, k = 5, probeEvery = 50)
        .orderBy("qid"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |        CAST(unnest(range(0, len(embedding))) AS INT) AS i
        |      FROM embeddings),
        |q AS MATERIALIZED (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0),
        |nf AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |df_ AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dp
        |       FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
        |       WHERE a.vec_id % 50 = 0 GROUP BY 1, 2),
        |cf AS MATERIALIZED (SELECT qid, cid, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM df_ JOIN nf na ON na.vec_id = qid
        |       JOIN nf nb ON nb.vec_id = cid
        |       WHERE na.nrm > 0 AND nb.nrm > 0),
        |tf_ AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid, row_number()
        |         OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        |       FROM cf) WHERE rnk <= 5),
        |et AS MATERIALIZED (SELECT vec_id, x, i FROM e WHERE i < 16),
        |nt AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM et GROUP BY 1),
        |dt AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dp
        |       FROM et a JOIN et b ON a.i = b.i AND a.vec_id <> b.vec_id
        |       WHERE a.vec_id % 50 = 0 GROUP BY 1, 2),
        |ct AS MATERIALIZED (SELECT qid, cid, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM dt JOIN nt na ON na.vec_id = qid
        |       JOIN nt nb ON nb.vec_id = cid
        |       WHERE na.nrm > 0 AND nb.nrm > 0),
        |tt AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid, row_number()
        |         OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        |       FROM ct) WHERE rnk <= 5),
        |jn AS (SELECT tf_.qid, count(*) AS n_common
        |       FROM tf_ JOIN tt ON tf_.qid = tt.qid AND tf_.cid = tt.cid
        |       GROUP BY 1)
        |SELECT q.vec_id AS qid,
        |       CAST(COALESCE(jn.n_common, 0) AS BIGINT) AS n_common
        |FROM q LEFT JOIN jn ON jn.qid = q.vec_id ORDER BY qid""".stripMargin)),

    Q("q_jl_recall",  // JL-space retrieval recall — the quantitative
      // payoff of q_jl_project, graded exactly like q_trunc_recall:
      // per probe, |top-5 ∩ top-5| between the full 64-dim and the
      // 16-dim JL sign-projection rounded-cosine rankings. Priced
      // against q_trunc_recall at the same dimension budget, this is
      // the data-independent-projection-vs-naive-truncation decision.
      (s, dir) => Similarity.jlRecall(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          kDims = 16, k = 5, probeEvery = 50)
        .orderBy("qid"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |        CAST(unnest(range(0, len(embedding))) AS INT) AS i
        |      FROM embeddings),
        |dims AS MATERIALIZED (SELECT DISTINCT i FROM e),
        |s AS MATERIALIZED (SELECT j.j, dims.i,
        |        CASE WHEN substr(md5('jl:' || j.j || ':' || dims.i), 1, 1)
        |             IN ('0','2','4','6','8','a','c','e')
        |        THEN 1.0 ELSE -1.0 END AS s
        |      FROM (SELECT unnest(range(0, 16)) AS j) j CROSS JOIN dims),
        |jv AS MATERIALIZED (SELECT e.vec_id, s.j,
        |        round(sum(e.x * s.s) / sqrt(16.0), 6) + 0.0 AS y
        |      FROM e JOIN s ON s.i = e.i GROUP BY 1, 2),
        |q AS MATERIALIZED (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0),
        |nf AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |df_ AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dp
        |       FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
        |       WHERE a.vec_id % 50 = 0 GROUP BY 1, 2),
        |cf AS MATERIALIZED (SELECT qid, cid, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM df_ JOIN nf na ON na.vec_id = qid
        |       JOIN nf nb ON nb.vec_id = cid
        |       WHERE na.nrm > 0 AND nb.nrm > 0),
        |tf_ AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid, row_number()
        |         OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        |       FROM cf) WHERE rnk <= 5),
        |nj AS MATERIALIZED (SELECT vec_id, sqrt(sum(y * y)) AS nrm FROM jv GROUP BY 1),
        |dj AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.y * b.y) AS dp
        |       FROM jv a JOIN jv b ON a.j = b.j AND a.vec_id <> b.vec_id
        |       WHERE a.vec_id % 50 = 0 GROUP BY 1, 2),
        |cj AS MATERIALIZED (SELECT qid, cid, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM dj JOIN nj na ON na.vec_id = qid
        |       JOIN nj nb ON nb.vec_id = cid
        |       WHERE na.nrm > 0 AND nb.nrm > 0),
        |tj AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid, row_number()
        |         OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        |       FROM cj) WHERE rnk <= 5),
        |jn AS (SELECT tf_.qid, count(*) AS n_common
        |       FROM tf_ JOIN tj ON tf_.qid = tj.qid AND tf_.cid = tj.cid
        |       GROUP BY 1)
        |SELECT q.vec_id AS qid,
        |       CAST(COALESCE(jn.n_common, 0) AS BIGINT) AS n_common
        |FROM q LEFT JOIN jn ON jn.qid = q.vec_id ORDER BY qid""".stripMargin)),

    Q("q_embed_density",  // per-vector neighborhood density at cosine
      // ≥ 0.5 — the embedding-quality screen (dense regions = redundancy
      // candidates, n_nbr=0 = outliers/noise; SemDeDup's density
      // cousin). Pair gen = blocked block-pair tasks (no collect); the
      // count/max fold and the left join back run on the EDGE set only,
      // so the corpus vectors move exactly once. Isolated vectors
      // report (0, −1.0) — an equality filter, not a null check.
      (s, dir) => Similarity.embedDensity(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          minCos = 0.5)
        .orderBy("id"),
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |d AS (SELECT a.vec_id AS src, b.vec_id AS dst, sum(a.x * b.x) AS dp
        |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id GROUP BY 1, 2),
        |c AS (SELECT src, dst, round(dp / (na.nrm * nb.nrm), 4) + 0.0 AS cos
        |      FROM d JOIN n na ON na.vec_id = src JOIN n nb ON nb.vec_id = dst),
        |k AS (SELECT src AS id, count(*) AS n_nbr, max(cos) AS max_cos
        |      FROM c WHERE cos >= 0.5 GROUP BY 1)
        |SELECT vec_id AS id, COALESCE(k.n_nbr, 0) AS n_nbr,
        |       COALESCE(k.max_cos, -1.0) AS max_cos
        |FROM embeddings LEFT JOIN k ON k.id = embeddings.vec_id
        |ORDER BY id""".stripMargin)),

    Q("q_normalize_text",  // canonical normalization before hashing
      // (C4/CCNet order of operations): lowercase, collapse non-alnum
      // runs to one space, trim — then md5 over the NORMALIZED form,
      // which catches re-punctuated/re-encoded copies byte-level
      // hashing misses. Pure map-side projection, zero shuffle.
      (s, dir) => Tables.table(s, dir, "documents")
        .select(col("doc_id"), TextOps.normalizeText(col("text")).as("norm"))
        .withColumn("norm_md5", md5(col("norm")))
        .orderBy("doc_id"),
      Some("""WITH nz AS (SELECT doc_id,
        |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, norm, md5(norm) AS norm_md5 FROM nz ORDER BY doc_id""".stripMargin)),

    Q("q_url_canon",  // URL canonicalization — the dedup key
      // normalizeText doesn't cover: scheme unified, host lowercased
      // with :80/:443 + "www." stripped, fragment dropped, one
      // trailing path slash stripped (path case preserved), tracking
      // params (utm_*/fbclid/gclid/msclkid/ref) removed and the rest
      // SORTED. The documents table has no URL column, so a messy URL
      // is synthesized deterministically per doc (both engines build
      // the identical fixture); the OPERATOR under test is the pure
      // map-side canonicalizer. Zero shuffle.
      (s, dir) => {
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("http://")),
          when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
          col("source"), lit(".Example.COM"),
          when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")),
          lit("/Docs/"), (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&b="), (col("doc_id") % 7).cast("string"),
          lit("&a=1"),
          when(col("doc_id") % 4 === 0, lit("&fbclid=XYZ")).otherwise(lit("")),
          when(col("doc_id") % 6 === 0, lit("#Sec2")).otherwise(lit("")))
        Tables.table(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .withColumn("domain", ops.TextOps.urlHost(col("url")))
          .withColumn("apex", ops.TextOps.urlApex(col("url")))
          .withColumn("canon", ops.TextOps.canonicalizeUrl(col("url")))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |  source || '.Example.COM' ||
        |  (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END) ||
        |  '/Docs/' || CAST(doc_id % 40 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |  '?utm_source=feed&b=' || CAST(doc_id % 7 AS VARCHAR) || '&a=1' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '&fbclid=XYZ' ELSE '' END) ||
        |  (CASE WHEN doc_id % 6 = 0 THEN '#Sec2' ELSE '' END) AS url
        |  FROM documents),
        |nf AS (SELECT doc_id, url, regexp_replace(trim(url), '#.*', '') AS nf
        |       FROM u),
        |pp AS (SELECT doc_id, url,
        |  regexp_replace(regexp_replace(lower(regexp_extract(nf,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
        |    ':(80|443)$', ''), '^www\.', '') AS host,
        |  regexp_extract(nf,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS p0,
        |  regexp_extract(nf, '\?([^#]*)', 1) AS q0 FROM nf),
        |kq AS (SELECT *, array_to_string(list_sort(list_filter(
        |         string_split(q0, '&'), p -> p <> '' AND NOT
        |         regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))),
        |         '&') AS kept FROM pp)
        |SELECT doc_id, url, host AS domain,
        |  regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS apex,
        |  'http://' || host ||
        |  (CASE WHEN p0 = '' THEN '/'
        |        ELSE regexp_replace(p0, '(.)/$', '\1') END) ||
        |  (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS canon
        |FROM kq ORDER BY doc_id""".stripMargin)),

    Q("q_domain_dedup",  // per-domain URL dedup over the canonical key
      // — keep-first (min doc_id) per (domain, canon), with the dup
      // count the crawl-frontier report wants. ONE shuffle on the
      // canonical key itself (domain is a prefix of it), so a hot
      // domain never concentrates on one reducer unless its CANONICAL
      // URLs do — the scale-honest partitioning for per-domain dedup.
      (s, dir) => {
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("http://")),
          when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
          col("source"), lit(".Example.COM"),
          when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")),
          lit("/Docs/"), (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&b="), (col("doc_id") % 7).cast("string"),
          lit("&a=1"),
          when(col("doc_id") % 4 === 0, lit("&fbclid=XYZ")).otherwise(lit("")),
          when(col("doc_id") % 6 === 0, lit("#Sec2")).otherwise(lit("")))
        Tables.table(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .withColumn("domain", ops.TextOps.urlHost(col("url")))
          .withColumn("canon", ops.TextOps.canonicalizeUrl(col("url")))
          .groupBy("domain", "canon")
          .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_dups"))
          .orderBy("domain", "canon")
      },
      Some("""WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |  source || '.Example.COM' ||
        |  (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END) ||
        |  '/Docs/' || CAST(doc_id % 40 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |  '?utm_source=feed&b=' || CAST(doc_id % 7 AS VARCHAR) || '&a=1' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '&fbclid=XYZ' ELSE '' END) ||
        |  (CASE WHEN doc_id % 6 = 0 THEN '#Sec2' ELSE '' END) AS url
        |  FROM documents),
        |nf AS (SELECT doc_id, regexp_replace(trim(url), '#.*', '') AS nf FROM u),
        |pp AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(lower(regexp_extract(nf,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
        |    ':(80|443)$', ''), '^www\.', '') AS host,
        |  regexp_extract(nf,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS p0,
        |  regexp_extract(nf, '\?([^#]*)', 1) AS q0 FROM nf),
        |kq AS (SELECT *, array_to_string(list_sort(list_filter(
        |         string_split(q0, '&'), p -> p <> '' AND NOT
        |         regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))),
        |         '&') AS kept FROM pp),
        |cc AS (SELECT doc_id, host AS domain,
        |  'http://' || host ||
        |  (CASE WHEN p0 = '' THEN '/'
        |        ELSE regexp_replace(p0, '(.)/$', '\1') END) ||
        |  (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS canon
        |FROM kq)
        |SELECT domain, canon, min(doc_id) AS keeper,
        |       count(*) AS n_dups
        |FROM cc GROUP BY domain, canon ORDER BY domain, canon""".stripMargin)),

    Q("q_span_corrupt",  // deterministic T5 span corruption (Raffel et
      // al. JMLR 2020 §3.1.4): aligned 3-token windows masked by the
      // keyed hash md5(salt_doc_win) mod 64 < 22 (≈34%), masked windows
      // replaced by ordinal <extra_id_K> sentinels in inputs and emitted
      // after their sentinel in targets. ONE map-side projection — no
      // explode, no shuffle, no RNG state; same salt ⇒ bit-identical
      // corruption on any engine or re-run (auditable multi-epoch data).
      (s, dir) => {
        val d = docsTokens(s, dir)
        d.select(col("doc_id"),
            TextOps.spanCorrupt(col("doc_id"), col("toks")).as("sc"))
          .select(col("doc_id"), col("sc.inputs").as("inputs"),
            col("sc.targets").as("targets"), col("sc.n_masked").as("n_masked"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS ($SqlToks),
        |base AS (SELECT doc_id, toks, len(toks) AS n,
        |           CAST(ceil(len(toks) / 3.0) AS INT) AS nw FROM t),
        |mk AS (SELECT doc_id, toks, n,
        |         list_filter(range(0, nw), w ->
        |           CAST(('0x' || substr(md5('sc1_' || doc_id || '_' || w), 1, 8)) AS BIGINT) % 64 < 22) AS mw
        |       FROM base),
        |o AS (SELECT doc_id,
        |  flatten(list_transform(range(0, n), i ->
        |    CASE WHEN NOT (CAST(('0x' || substr(md5('sc1_' || doc_id || '_' || (i // 3)), 1, 8)) AS BIGINT) % 64 < 22)
        |           THEN [toks[CAST(i + 1 AS INT)]]
        |         WHEN i % 3 = 0
        |           THEN ['<extra_id_' || (list_position(mw, i // 3) - 1) || '>']
        |         ELSE []::VARCHAR[] END)) AS inp,
        |  flatten(list_transform(mw, w ->
        |    list_concat(['<extra_id_' || (list_position(mw, w) - 1) || '>'],
        |      toks[CAST(w * 3 + 1 AS INT):CAST(w * 3 + least(3, n - w * 3) AS INT)]))) AS tgt,
        |  len(mw) AS n_masked
        |  FROM mk)
        |SELECT doc_id, COALESCE(array_to_string(inp, ' '), '') AS inputs,
        |       COALESCE(array_to_string(tgt, ' '), '') AS targets,
        |       CAST(n_masked AS INT) AS n_masked
        |FROM o ORDER BY doc_id""".stripMargin)),

    Q("q_pq_codes",  // product-quantization encode (Jégou et al. TPAMI
      // 2011), the IVF-PQ compression layer: d=64 splits into m=4
      // subspaces, each subvector coded as its nearest codebook slice
      // (codebook = the deterministic vec_id<8 sample, the fixedCentroids
      // device). ONE map-side projection — 4 fused codegen argmins per
      // row, zero shuffle, zero join; err is the subspace residual.
      (s, dir) => {
        val pts = embDouble(s, dir)
        val codebook = pts.filter(col("vec_id") < 8)
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        Similarity.pqCodes(pts, "vec_id", "v", m = 4, codebook)
          .withColumn("err", round(col("err"), 6))
          .orderBy("vec_id", "sub")
      },
      Some("""WITH pts AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |              unnest(range(0, len(embedding))) AS i FROM embeddings),
        |d AS (SELECT p.vec_id, p.i // 16 AS sub, c.cid,
        |        sum((p.x - c.c) * (p.x - c.c)) AS d2
        |      FROM pts p JOIN (SELECT vec_id AS cid, i, x AS c FROM pts
        |                       WHERE vec_id < 8) c ON p.i = c.i
        |      GROUP BY 1, 2, 3),
        |a AS (SELECT vec_id, sub, cid, d2,
        |        row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
        |      FROM d)
        |SELECT vec_id, CAST(sub AS INT) AS sub, cid AS code,
        |       round(sqrt(d2), 6) AS err
        |FROM a WHERE rn = 1 ORDER BY vec_id, sub""".stripMargin)),

    Q("q_pq_adc",  // asymmetric-distance (ADC) top-k search over the PQ
      // codes (Jégou et al. TPAMI 2011 §IV) — the query-time half of
      // IVF-PQ: each query carries one flattened m×k LUT of squared
      // subspace distances to every codebook slice, and a corpus
      // vector's approximate distance is m table lookups over its
      // codes — the corpus floats are never touched at query time.
      // Corpus side = ONE map-side projection (m fused codegen argmins,
      // zero shuffle); queries ride as a broadcast row each; only the
      // per-query top-5 window moves. Ranked on ROUNDED adist, ties by
      // id. Codebook = sorted vec_id<8 sample, queries = vec_id<4.
      (s, dir) => {
        val pts = embDouble(s, dir)
        val codebook = pts.filter(col("vec_id") < 8).orderBy("vec_id")
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        Similarity.pqAdcTopK(pts, "vec_id", "v", m = 4, codebook,
            pts.filter(col("vec_id") < 4), "vec_id", "v", k = 5)
          .orderBy("qid", "rank")
      },
      Some("""WITH pts AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |              unnest(range(0, len(embedding))) AS i FROM embeddings),
        |cb AS (SELECT vec_id AS cid, i, x AS c FROM pts WHERE vec_id < 8),
        |d AS (SELECT p.vec_id, p.i // 16 AS sub, c.cid,
        |        sum((p.x - c.c) * (p.x - c.c)) AS d2
        |      FROM pts p JOIN cb c ON p.i = c.i GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id, sub, cid FROM
        |          (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |                       ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS qid, q.i // 16 AS sub, c.cid,
        |          sum((q.x - c.c) * (q.x - c.c)) AS d2
        |        FROM pts q JOIN cb c ON q.i = c.i
        |        WHERE q.vec_id < 4 GROUP BY 1, 2, 3),
        |ad AS (SELECT lut.qid, codes.vec_id AS id,
        |         round(sqrt(sum(lut.d2)), 6) AS adist
        |       FROM codes JOIN lut ON lut.sub = codes.sub AND lut.cid = codes.cid
        |       GROUP BY 1, 2),
        |r AS (SELECT qid, id, adist,
        |        row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rn
        |      FROM ad)
        |SELECT qid, CAST(rn AS INT) AS rank, id, adist
        |FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin)),

    Q("q_ivfpq",  // FULL IVF-PQ routed search (Jégou et al. TPAMI 2011
      // §IV-A "IVFADC"): coarse cells (vec_id<8 centroids) + PQ codes
      // of the RESIDUAL v−c(cell) (codebook = residuals of vec_id
      // 8..15, positional ids) + per-probed-cell ADC LUTs; queries
      // (vec_id<4) probe nprobe=3 of 8 cells, so unprobed cells are
      // never scanned — the recall/cost dial billion-scale ANN ships
      // with. Corpus = one map-side projection of fused argmins;
      // queries broadcast with their LUTs; only the top-5 window moves.
      (s, dir) => {
        val pts = embDouble(s, dir)
        val first16 = pts.filter(col("vec_id") < 16).orderBy("vec_id")
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        val coarse = first16.filter(_._1 < 8)
        def d2(a: Array[Double], b: Array[Double]): Double = {
          var s0 = 0.0; var i = 0
          while (i < a.length) { val t = a(i) - b(i); s0 += t * t; i += 1 }
          s0
        }
        val codebook = first16.filter(_._1 >= 8).map { case (id, v) =>
          val (_, c) = coarse.minBy { case (cid, cv) => (d2(v, cv), cid) }
          (id - 8) -> v.indices.map(i => v(i) - c(i)).toArray
        }
        Similarity.ivfPqTopK(pts, "vec_id", "v", coarse, m = 4, codebook,
            pts.filter(col("vec_id") < 4), "vec_id", "v", k = 5, nprobe = 3)
          .orderBy("qid", "rank")
      },
      Some("""WITH pts AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |              unnest(range(0, len(embedding))) AS i FROM embeddings),
        |co AS (SELECT vec_id AS cid, i, x AS c FROM pts WHERE vec_id < 8),
        |asg AS (SELECT p.vec_id, c.cid, sum((p.x - c.c) * (p.x - c.c)) AS d2
        |        FROM pts p JOIN co c ON p.i = c.i GROUP BY 1, 2),
        |cell AS (SELECT vec_id, cid AS cell FROM
        |         (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                      ORDER BY d2, cid) AS rn FROM asg) WHERE rn = 1),
        |res AS (SELECT p.vec_id, p.i, p.x - co.c AS r
        |        FROM pts p JOIN cell ON cell.vec_id = p.vec_id
        |        JOIN co ON co.cid = cell.cell AND co.i = p.i),
        |cb AS (SELECT vec_id - 8 AS cid, i, r AS c FROM res
        |       WHERE vec_id BETWEEN 8 AND 15),
        |cd AS (SELECT r.vec_id, r.i // 16 AS sub, cb.cid,
        |         sum((r.r - cb.c) * (r.r - cb.c)) AS d2
        |       FROM res r JOIN cb ON cb.i = r.i GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id, sub, cid FROM
        |          (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |                       ORDER BY d2, cid) AS rn FROM cd) WHERE rn = 1),
        |routed AS (SELECT vec_id AS qid, cid AS cell FROM
        |           (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                        ORDER BY d2, cid) AS rn
        |            FROM asg WHERE vec_id < 4) WHERE rn <= 3),
        |qres AS (SELECT q.vec_id AS qid, routed.cell, q.i, q.x - co.c AS qr
        |         FROM pts q JOIN routed ON routed.qid = q.vec_id
        |         JOIN co ON co.cid = routed.cell AND co.i = q.i),
        |lut AS (SELECT qres.qid, qres.cell, qres.i // 16 AS sub, cb.cid,
        |          sum((qres.qr - cb.c) * (qres.qr - cb.c)) AS d2
        |        FROM qres JOIN cb ON cb.i = qres.i GROUP BY 1, 2, 3, 4),
        |ad AS (SELECT lut.qid, cell.vec_id AS id,
        |         round(sqrt(sum(lut.d2)), 6) AS adist
        |       FROM cell JOIN codes ON codes.vec_id = cell.vec_id
        |       JOIN lut ON lut.cell = cell.cell AND lut.sub = codes.sub
        |                AND lut.cid = codes.cid
        |       GROUP BY 1, 2),
        |r AS (SELECT qid, id, adist,
        |        row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rn
        |      FROM ad)
        |SELECT qid, CAST(rn AS INT) AS rank, id, adist
        |FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin)),

    Q("q_pagerank",  // fixed-iteration PageRank (Page et al. 1999) over
      // the exact cosine 5-NN graph — similarity centrality: which
      // embeddings sit in the densest neighborhoods. 3 FIXED iterations
      // make the result a closed-form function of the graph (DuckDB
      // unrolls the same 3 steps); per iteration = one edges⋈ranks join
      // + one partial-agg'd groupBy(dst) — the Pregel shape, O(edges)
      // shuffle, dangling mass a 1-row broadcast (zero on this graph,
      // same arithmetic either way).
      (s, dir) => {
        val edges = Similarity.knnGraph(
            Tables.table(s, dir, "embeddings"), "vec_id", "embedding", k = 5)
          .select(col("src"), col("dst"))
        GraphOps.pageRank(edges, "src", "dst", iters = 3)
          .withColumn("rank", round(col("rank"), 12))
          .orderBy("id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |nr AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |dp AS (SELECT a.vec_id AS src, b.vec_id AS dst, sum(a.x * b.x) AS dp
        |       FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id GROUP BY 1, 2),
        |cs AS (SELECT src, dst, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM dp JOIN nr na ON na.vec_id = src JOIN nr nb ON nb.vec_id = dst),
        |rk AS (SELECT src, dst,
        |         row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
        |       FROM cs),
        |g AS (SELECT src, dst FROM rk WHERE rnk <= 5),
        |nodes AS (SELECT DISTINCT src AS id FROM g UNION SELECT DISTINCT dst FROM g),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src AS id, count(*) AS od FROM g GROUP BY 1),
        |r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT g.dst AS id, sum(r0.r / od.od) AS c
        |       FROM g JOIN r0 ON r0.id = g.src JOIN od ON od.id = g.src GROUP BY 1),
        |r1 AS (SELECT nodes.id, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c1.c, 0.0) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.id = nodes.id),
        |c2 AS (SELECT g.dst AS id, sum(r1.r / od.od) AS c
        |       FROM g JOIN r1 ON r1.id = g.src JOIN od ON od.id = g.src GROUP BY 1),
        |r2 AS (SELECT nodes.id, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c2.c, 0.0) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.id = nodes.id),
        |c3 AS (SELECT g.dst AS id, sum(r2.r / od.od) AS c
        |       FROM g JOIN r2 ON r2.id = g.src JOIN od ON od.id = g.src GROUP BY 1),
        |r3 AS (SELECT nodes.id, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c3.c, 0.0) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.id = nodes.id)
        |SELECT id, round(r, 12) AS rank FROM r3 ORDER BY id""".stripMargin)),

    Q("q_label_prop",  // fixed-iteration label propagation (Zhu &
      // Ghahramani 2002) over the cosine 5-NN graph: labels are kept
      // only for the vec_id%5==0 seed fifth, then 2 synchronous
      // majority-vote rounds spread them (ties by smallest label,
      // seeds immutable) — the semi-supervised path from sparse human
      // labels to corpus-wide ones. Per round: one edges⋈labels join +
      // one partial-agg'd groupBy + a label-bounded argmax window.
      // Unreached nodes report -1.
      (s, dir) => {
        val emb = Tables.table(s, dir, "embeddings")
        val edges = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
          .select(col("src"), col("dst"))
        GraphOps.labelPropagate(edges, "src", "dst",
            emb.filter(col("vec_id") % 5 === 0), "vec_id", "label", iters = 2)
          .select(col("id"), coalesce(col("label"), lit(-1)).as("label"))
          .orderBy("id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, len(embedding))) AS i FROM embeddings),
        |nr AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |dp AS (SELECT a.vec_id AS src, b.vec_id AS dst, sum(a.x * b.x) AS dp
        |       FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id GROUP BY 1, 2),
        |cs AS (SELECT src, dst, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM dp JOIN nr na ON na.vec_id = src JOIN nr nb ON nb.vec_id = dst),
        |rk AS (SELECT src, dst,
        |         row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
        |       FROM cs),
        |g AS (SELECT src, dst FROM rk WHERE rnk <= 5),
        |nodes AS (SELECT DISTINCT src AS id FROM g UNION SELECT DISTINCT dst FROM g),
        |l0 AS (SELECT n.id, s.label FROM nodes n
        |       LEFT JOIN (SELECT vec_id AS id, label FROM embeddings
        |                  WHERE vec_id % 5 = 0) s USING (id)),
        |v1 AS (SELECT g.src AS id, l.label AS nl, count(*) AS cnt
        |       FROM g JOIN l0 l ON l.id = g.dst WHERE l.label IS NOT NULL GROUP BY 1, 2),
        |b1 AS (SELECT id, nl FROM (SELECT id, nl,
        |         row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nl) AS rn
        |       FROM v1) WHERE rn = 1),
        |l1 AS (SELECT l0.id, COALESCE(l0.label, b1.nl) AS label
        |       FROM l0 LEFT JOIN b1 USING (id)),
        |v2 AS (SELECT g.src AS id, l.label AS nl, count(*) AS cnt
        |       FROM g JOIN l1 l ON l.id = g.dst WHERE l.label IS NOT NULL GROUP BY 1, 2),
        |b2 AS (SELECT id, nl FROM (SELECT id, nl,
        |         row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nl) AS rn
        |       FROM v2) WHERE rn = 1),
        |l2 AS (SELECT l1.id, COALESCE(l1.label, b2.nl) AS label
        |       FROM l1 LEFT JOIN b2 USING (id))
        |SELECT id, CAST(COALESCE(label, -1) AS INT) AS label
        |FROM l2 ORDER BY id""".stripMargin)),

    Q("q_textrank",  // TextRank keyword scoring (Mihalcea & Tarau,
      // EMNLP 2004 §3.1): PageRank over the undirected word adjacency
      // graph — distinct corpus word bigrams mirrored both ways,
      // unweighted. High rank = words central to the corpus's phrase
      // structure, the graph-based counterpart of tf-idf keywording.
      // Edges derive map-side (zip toks with its tail) + one distinct;
      // pageRankKeyed runs straight on word keys — no word→id table.
      // 3 fixed iterations; undirected ⇒ no dangling mass.
      (s, dir) => GraphOps.textRank(docsTokens(s, dir), "toks", iters = 3)
        .withColumn("rank", round(col("rank"), 12))
        .orderBy("word"),
      Some(s"""WITH t AS ($SqlToks),
        |e0 AS (SELECT unnest(list_transform(range(1, len(toks)), i ->
        |         {'a': toks[i], 'b': toks[i+1]})) AS p FROM t),
        |bg AS (SELECT DISTINCT p.a AS a, p.b AS b FROM e0 WHERE p.a <> p.b),
        |g AS (SELECT a AS src, b AS dst FROM bg
        |      UNION SELECT b AS src, a AS dst FROM bg),
        |nodes AS (SELECT DISTINCT src AS id FROM g),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src AS id, count(*) AS od FROM g GROUP BY 1),
        |r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT g.dst AS id, sum(r0.r / od.od) AS c
        |       FROM g JOIN r0 ON r0.id = g.src JOIN od ON od.id = g.src GROUP BY 1),
        |r1 AS (SELECT nodes.id, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c1.c, 0.0) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.id = nodes.id),
        |c2 AS (SELECT g.dst AS id, sum(r1.r / od.od) AS c
        |       FROM g JOIN r1 ON r1.id = g.src JOIN od ON od.id = g.src GROUP BY 1),
        |r2 AS (SELECT nodes.id, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c2.c, 0.0) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.id = nodes.id),
        |c3 AS (SELECT g.dst AS id, sum(r2.r / od.od) AS c
        |       FROM g JOIN r2 ON r2.id = g.src JOIN od ON od.id = g.src GROUP BY 1),
        |r3 AS (SELECT nodes.id, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c3.c, 0.0) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.id = nodes.id)
        |SELECT id AS word, round(r, 12) AS rank
        |FROM r3 ORDER BY word""".stripMargin)),

    Q("q_length_winsor",  // per-source length winsorization screen:
      // docs outside their source's exact interpolated [p05, p95]
      // n_chars band (truncated pages / concatenation blobs live in the
      // tails; per-source bands spare naturally-long sources). Bounds =
      // one #sources-row groupBy, broadcast back; screen is map-side.
      // At true corpus scale percentile_approx replaces the exact agg.
      (s, dir) => TextStats.lengthOutliers(
          Tables.table(s, dir, "documents"), "doc_id", "source", "n_chars",
          pLo = 0.05, pHi = 0.95)
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT source, quantile_cont(n_chars, 0.05) AS lo,
        |         quantile_cont(n_chars, 0.95) AS hi
        |       FROM documents GROUP BY source)
        |SELECT doc_id, source, n_chars,
        |       CASE WHEN n_chars < lo THEN 'short' ELSE 'long' END AS tail
        |FROM documents JOIN b USING (source)
        |WHERE n_chars < lo OR n_chars > hi ORDER BY doc_id""".stripMargin))
  )

  /** embeddings with float vectors cast to double (IEEE parity with the oracle). */
  private def embDouble(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), KMeansOps.asDouble(col("embedding")).as("v"))

  /** embeddings ∪ a perturbed copy of each (vec_id + 1e6, dims scaled by
    * exact-double factors 0.98/0.99/1.00 cycling by dim index). The
    * synthetic embeddings have no high-cosine pairs (max ≈ 0.6), so this
    * plants exactly one ≈0.999-cosine partner per vector — the near-dup
    * regime LSH is built for — with arithmetic both engines reproduce
    * bit-exactly. */
  private def perturbedEmb(s: SparkSession, dir: String): DataFrame = {
    val base = embDouble(s, dir)
    base.unionByName(base.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("v"),
        (x, i) => x * (lit(0.98) + lit(0.01) * (i % 3).cast("double"))).as("v")))
  }

  /** Deterministic k=8 "initial centroids": the vectors with vec_id < 8 —
    * SQL-expressible on both sides (the seeded-random init is exercised by
    * the lloyd() loop + scalatest, not the oracle). */
  private def fixedCentroids(pts: DataFrame): DataFrame =
    pts.filter(col("vec_id") < 8).select(col("vec_id").as("cid"), col("v").as("cvec"))

  /** Same deterministic routing table as a sorted driver array — the
    * knnSelfJoin/knnSelfRecall cell-table form (8 × d doubles). */
  private def fixedCentroidArr(s: SparkSession, dir: String): Array[(Long, Array[Double])] =
    embDouble(s, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long"), col("v"))
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

  /** Shared oracle CTE: exploded Euclidean distances + per-point argmin rank.
    * (lazy: referenced from `all`, which is declared above — a strict val
    * here would still be null during `all`'s initialization.) */
  private lazy val SqlKmeansAssign =
    """WITH pts AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |             unnest(range(0, len(embedding))) AS i FROM embeddings),
      |cents AS (SELECT vec_id AS cid, CAST(unnest(embedding) AS DOUBLE) AS c,
      |          unnest(range(0, len(embedding))) AS i FROM embeddings WHERE vec_id < 8),
      |d AS (SELECT p.vec_id, c.cid, sqrt(sum((p.x - c.c) * (p.x - c.c))) AS dist
      |      FROM pts p JOIN cents c ON p.i = c.i GROUP BY p.vec_id, c.cid),
      |a AS (SELECT vec_id, cid, dist,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d)""".stripMargin

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
