package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.multimodal.Multimodal
import graft.sources.Sinks

import graft.SparkEntry.Q
import graft.QShared._

/** Query registry — LM scoring + kNN graph/approx + covariance/PCA/whitening/JL retrieval evals.
  * Split out of SparkEntry (VERDICT r9 #6); see SparkEntry for the
  * driver contract that concatenates the registries.
  */
private[graft] object QEmbed {
  import Dictionaries.{Stopwords => Stop}

  def qs: Seq[Q] = Seq(

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
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM ve),
        |d AS (SELECT a.vec_id AS src, b.vec_id AS dst, list_inner_product(a.v, b.v) AS dp
        |      FROM ve a JOIN ve b ON a.vec_id <> b.vec_id),
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
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |n AS MATERIALIZED (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM ve),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.vec_id AS cid,
        |         list_distance(e.v, c.v) AS dist
        |       FROM ve e JOIN n z ON z.vec_id = e.vec_id AND z.nrm > 0
        |       CROSS JOIN (SELECT vec_id, v FROM ve WHERE vec_id < 8) c),
        |home AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |probe AS (SELECT vec_id AS qid, cid AS cell FROM ad
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= 5),
        |m AS (SELECT q.qid AS a, h.vec_id AS b FROM probe q
        |      JOIN home h ON h.cell = q.cell AND h.vec_id <> q.qid),
        |cand AS (SELECT a AS qid, b AS nbr FROM m UNION SELECT b, a FROM m),
        |d AS (SELECT cand.qid, cand.nbr, list_inner_product(a.v, b.v) AS dp
        |      FROM cand JOIN ve a ON a.vec_id = cand.qid
        |                JOIN ve b ON b.vec_id = cand.nbr),
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
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |n AS MATERIALIZED (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM ve),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.vec_id AS cid,
        |         list_distance(e.v, c.v) AS dist
        |       FROM ve e JOIN n z ON z.vec_id = e.vec_id AND z.nrm > 0
        |       CROSS JOIN (SELECT vec_id, v FROM ve WHERE vec_id < 8) c),
        |home AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |probe AS (SELECT vec_id AS qid, cid AS cell FROM ad
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= 5),
        |m AS (SELECT q.qid AS a, h.vec_id AS b FROM probe q
        |      JOIN home h ON h.cell = q.cell AND h.vec_id <> q.qid),
        |cand AS (SELECT a AS qid, b AS nbr FROM m UNION SELECT b, a FROM m),
        |d AS (SELECT cand.qid, cand.nbr, list_inner_product(a.v, b.v) AS dp
        |      FROM cand JOIN ve a ON a.vec_id = cand.qid
        |                JOIN ve b ON b.vec_id = cand.nbr),
        |c2 AS (SELECT qid, nbr, round(dp / (nq.nrm * nv.nrm), 4) AS cos
        |       FROM d JOIN n nq ON nq.vec_id = qid JOIN n nv ON nv.vec_id = nbr),
        |ra AS MATERIALIZED (SELECT qid, nbr FROM (SELECT qid, nbr,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rnk
        |      FROM c2) WHERE rnk <= 5),
        |dx AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS nbr,
        |        list_inner_product(a.v, b.v) AS dp
        |      FROM ve a JOIN ve b ON a.vec_id <> b.vec_id),
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

    Q("q_knn_ndcg",  // NDCG@5 of the cell-routed approximate ranking
      // against exact-cosine graded relevance — the graded complement
      // of q_knn_approx_recall: recall counts set overlap, NDCG also
      // charges order inversions and quality substitutions. Gain =
      // (true cos + 1)/2, discount log2(rank+1), DCG/IDCG rounded 6
      // before the ratio. Both substrates are the shared DfMemo
      // kernels — the eval itself is two k-row folds and a join.
      (s, dir) => Similarity.knnNdcg(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          fixedCentroidArr(s, dir), k = 5, nprobe = 5)
        .orderBy("qid"),
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |n AS MATERIALIZED (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM ve),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.vec_id AS cid,
        |         list_distance(e.v, c.v) AS dist
        |       FROM ve e JOIN n z ON z.vec_id = e.vec_id AND z.nrm > 0
        |       CROSS JOIN (SELECT vec_id, v FROM ve WHERE vec_id < 8) c),
        |home AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |probe AS (SELECT vec_id AS qid, cid AS cell FROM ad
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= 5),
        |m AS (SELECT q.qid AS a, h.vec_id AS b FROM probe q
        |      JOIN home h ON h.cell = q.cell AND h.vec_id <> q.qid),
        |cand AS (SELECT a AS qid, b AS nbr FROM m UNION SELECT b, a FROM m),
        |d AS (SELECT cand.qid, cand.nbr, list_inner_product(a.v, b.v) AS dp
        |      FROM cand JOIN ve a ON a.vec_id = cand.qid
        |                JOIN ve b ON b.vec_id = cand.nbr),
        |c2 AS (SELECT qid, nbr, round(dp / (nq.nrm * nv.nrm), 4) AS cos
        |       FROM d JOIN n nq ON nq.vec_id = qid JOIN n nv ON nv.vec_id = nbr),
        |ra AS MATERIALIZED (SELECT qid, cos, rnk FROM (SELECT qid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rnk
        |      FROM c2) WHERE rnk <= 5),
        |dx AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS nbr,
        |        list_inner_product(a.v, b.v) AS dp
        |      FROM ve a JOIN ve b ON a.vec_id <> b.vec_id),
        |cx AS (SELECT qid, nbr, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM dx JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nbr),
        |rx AS MATERIALIZED (SELECT qid, cos, rnk FROM (SELECT qid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rnk
        |      FROM cx) WHERE rnk <= 5),
        |da AS (SELECT qid, round(sum(((cos + 1.0) / 2.0)
        |         / log2(rnk + 1.0)), 6) AS dcg FROM ra GROUP BY 1),
        |di AS (SELECT qid, round(sum(((cos + 1.0) / 2.0)
        |         / log2(rnk + 1.0)), 6) AS idcg FROM rx GROUP BY 1)
        |SELECT di.qid, COALESCE(da.dcg, 0.0) AS dcg, di.idcg,
        |  CASE WHEN di.idcg > 0
        |    THEN round(COALESCE(da.dcg, 0.0) / di.idcg, 6) END AS ndcg
        |FROM di LEFT JOIN da USING (qid) ORDER BY qid""".stripMargin)),

    Q("q_hard_negatives",  // contrastive-training hard-negative mining
      // (ANCE/DPR prep): per anchor, top-5 most-similar vectors with a
      // DIFFERENT label — semantically close, label-wise wrong, the
      // negatives that carry gradient. Same symmetric cell routing as
      // q_knn_approx; labels ride through the routing projection (zero
      // extra joins), the label filter runs BEFORE ranking.
      (s, dir) => Similarity.hardNegatives(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding", "label",
          fixedCentroidArr(s, dir), k = 5, nprobe = 5)
        .orderBy("qid", "rank"),
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |n AS MATERIALIZED (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM ve),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.vec_id AS cid,
        |         list_distance(e.v, c.v) AS dist
        |       FROM ve e JOIN n z ON z.vec_id = e.vec_id AND z.nrm > 0
        |       CROSS JOIN (SELECT vec_id, v FROM ve WHERE vec_id < 8) c),
        |home AS (SELECT vec_id, cid AS cell FROM ad
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |probe AS (SELECT vec_id AS qid, cid AS cell FROM ad
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) <= 5),
        |m AS (SELECT q.qid AS a, h.vec_id AS b FROM probe q
        |      JOIN home h ON h.cell = q.cell AND h.vec_id <> q.qid),
        |cand AS (SELECT a AS qid, b AS nbr FROM m UNION SELECT b, a FROM m),
        |neg AS (SELECT cand.qid, cand.nbr, la.label AS qlab, lb.label AS nlab
        |        FROM cand JOIN embeddings la ON la.vec_id = cand.qid
        |                  JOIN embeddings lb ON lb.vec_id = cand.nbr
        |        WHERE la.label <> lb.label),
        |d AS (SELECT neg.qid, neg.nbr, neg.qlab, neg.nlab,
        |        list_inner_product(a.v, b.v) AS dp
        |      FROM neg JOIN ve a ON a.vec_id = neg.qid
        |               JOIN ve b ON b.vec_id = neg.nbr),
        |c2 AS (SELECT qid, nbr, qlab, nlab, round(dp / (nq.nrm * nv.nrm), 4) + 0.0 AS cos
        |       FROM d JOIN n nq ON nq.vec_id = qid JOIN n nv ON nv.vec_id = nbr),
        |r AS (SELECT qid, qlab, nbr, nlab, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rnk
        |      FROM c2)
        |SELECT qid, qlab, CAST(rnk AS INT) AS rank, nbr, nlab, cos
        |FROM r WHERE rnk <= 5 ORDER BY qid, rank""".stripMargin)),

    Q("q_sign_bits",  // binary (1-bit/dim) sign quantization — the
      // cheapest retrieval tier (d=64 → two 32-bit words; 128× at
      // production d): bit i of word w = 1 iff dim 32w+i is strictly
      // positive. 32-bit words keep every value positive in a signed
      // BIGINT lane so DuckDB rebuilds them with shift sums bit-for-bit
      // (the simhashPortable device). One map-side projection of fused
      // bit-OR expressions, zero shuffle. Gated in LONG form (id, w,
      // word) — value hashes can't compare array cells.
      (s, dir) => Similarity.signBits(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), posexplode(col("sigs")).as(Seq("w", "word")))
        .orderBy("vec_id", "w"),
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |        CAST(unnest(range(0, len(embedding))) AS INT) AS i FROM embeddings)
        |SELECT vec_id, CAST(i // 32 AS INT) AS w,
        |       CAST(sum(CASE WHEN x > 0
        |         THEN (CAST(1 AS BIGINT) << (i % 32)) ELSE 0 END) AS BIGINT) AS word
        |FROM e GROUP BY 1, 2 ORDER BY vec_id, w""".stripMargin)),

    Q("q_binary_recall",  // retrieval recall of the sign-bit tier: per
      // probe (vec_id%50=0), |top-5 by Hamming ∩ top-5 by exact rounded
      // cosine|. Both rankings window ONE probe×corpus frame
      // partitioned once by qid (one exchange, two sort orders);
      // Hamming ties by id, and the d/2 expected random-pair distance
      // makes this the matryoshka-style eval for the 1-bit tier.
      (s, dir) => Similarity.binaryRecall(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, probeEvery = 50)
        .orderBy("qid"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |        CAST(unnest(range(0, len(embedding))) AS INT) AS i FROM embeddings),
        |n AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
        |w AS MATERIALIZED (SELECT vec_id, i // 32 AS w,
        |        CAST(sum(CASE WHEN x > 0
        |          THEN (CAST(1 AS BIGINT) << (i % 32)) ELSE 0 END) AS BIGINT) AS word
        |      FROM e GROUP BY 1, 2),
        |hb AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS cid,
        |        CAST(sum(bit_count(xor(a.word, b.word))) AS INT) AS ham
        |      FROM w a JOIN w b ON a.w = b.w AND b.vec_id <> a.vec_id
        |      WHERE a.vec_id % 50 = 0 GROUP BY 1, 2),
        |rb_ AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid,
        |        row_number() OVER (PARTITION BY qid ORDER BY ham, cid) AS r
        |      FROM hb) WHERE r <= 5),
        |dfx AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dp
        |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
        |      WHERE a.vec_id % 50 = 0 GROUP BY 1, 2),
        |cfx AS (SELECT qid, cid, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |       FROM dfx JOIN n na ON na.vec_id = qid
        |       JOIN n nb ON nb.vec_id = cid
        |       WHERE na.nrm > 0 AND nb.nrm > 0),
        |re_ AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS r
        |      FROM cfx) WHERE r <= 5),
        |jn AS (SELECT rb_.qid, count(*) AS n_common
        |       FROM rb_ JOIN re_ ON re_.qid = rb_.qid AND re_.cid = rb_.cid
        |       GROUP BY 1)
        |SELECT q.vec_id AS qid, CAST(COALESCE(jn.n_common, 0) AS BIGINT) AS n_common
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0) q
        |LEFT JOIN jn ON jn.qid = q.vec_id ORDER BY qid""".stripMargin)),

    Q("q_proto_prune",  // prototypicality data pruning (Sorscher et al.
      // NeurIPS 2022, arXiv:2206.14486): proto = cosine to the assigned
      // nearest-Euclid centroid, keep the HARDEST ⌈30%⌉ per cell (the
      // abundant-data regime that beats power-law scaling in the
      // paper). Scoring is one map-side projection of C fused
      // (dist, cid, proto) structs against driver-literal centroids —
      // the cellMatches routing device, zero shuffle; the only
      // exchange is the per-cell rank window. Quota is exact-rational
      // integer arithmetic and rank is (rounded proto, id), so the
      // keep boundary value-oracles.
      (s, dir) => Similarity.protoPrune(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          fixedCentroidArr(s, dir), keepNum = 3, keepDen = 10)
        .orderBy("vec_id"),
      Some(s"""$SqlKmeansAssign,
        |asg AS (SELECT vec_id, cid AS cell FROM a WHERE rn = 1),
        |nv AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pts GROUP BY 1),
        |cnm AS (SELECT cid, sqrt(sum(c * c)) AS nrm FROM cents GROUP BY 1),
        |dp AS (SELECT p.vec_id, g.cell, sum(p.x * c.c) AS dp
        |       FROM pts p JOIN asg g USING (vec_id)
        |       JOIN cents c ON c.cid = g.cell AND c.i = p.i
        |       GROUP BY 1, 2),
        |pr AS (SELECT dp.vec_id, dp.cell,
        |         CASE WHEN nv.nrm > 0
        |           THEN round(dp / (nv.nrm * cnm.nrm), 4) + 0.0 END AS proto
        |       FROM dp JOIN nv USING (vec_id) JOIN cnm ON cnm.cid = dp.cell),
        |rk AS (SELECT vec_id, cell, proto,
        |         CAST(row_number() OVER (
        |           PARTITION BY cell ORDER BY proto ASC NULLS LAST, vec_id) AS INT) AS rank,
        |         count(*) OVER (PARTITION BY cell) AS n_c
        |       FROM pr)
        |SELECT vec_id, cell, proto, rank, rank <= (n_c * 3 + 9) // 10 AS kept
        |FROM rk ORDER BY vec_id""".stripMargin)),

    Q("q_cell_load",  // per-cell routing load of the kNN candidate
      // kernel at the gated (C=8, nprobe=5) config — the skew report
      // that prices the approximate join BEFORE a 100 TB run: n_cand
      // = n_probe·n_home − n_home is exactly the Σ|cell|·|probes(c)|
      // cost term, share ≫ 1/C marks the hot bucket (raise C /
      // pre-split). Same raw-euclid routing as knnSelfJoin so the
      // report describes the join that actually runs; one map-side
      // routing projection + one C-row groupBy.
      (s, dir) => Similarity.cellLoad(
          Tables.table(s, dir, "embeddings"), "embedding",
          fixedCentroidArr(s, dir), nprobe = 5)
        .orderBy("cell"),
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM ve),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.vec_id AS cid,
        |         list_distance(e.v, c.v) AS dist
        |       FROM ve e JOIN n z ON z.vec_id = e.vec_id AND z.nrm > 0
        |       CROSS JOIN (SELECT vec_id, v FROM ve WHERE vec_id < 8) c),
        |pr AS (SELECT vec_id, cid,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |       FROM ad),
        |s AS (SELECT cid AS cell,
        |        CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_home,
        |        CAST(count(*) AS BIGINT) AS n_probe
        |      FROM pr WHERE rn <= 5 GROUP BY 1),
        |t AS (SELECT c.vec_id AS cell,
        |        coalesce(n_home, 0) AS n_home, coalesce(n_probe, 0) AS n_probe,
        |        coalesce(n_probe * n_home - n_home, 0) AS n_cand
        |      FROM (SELECT vec_id FROM ve WHERE vec_id < 8) c
        |      LEFT JOIN s ON s.cell = c.vec_id)
        |SELECT cell, n_home, n_probe, CAST(n_cand AS BIGINT) AS n_cand,
        |  CASE WHEN sum(n_cand) OVER () = 0 THEN 0.0
        |    ELSE round(CAST(n_cand AS DOUBLE)
        |               / CAST(sum(n_cand) OVER () AS DOUBLE), 6) END AS share
        |FROM t ORDER BY cell""".stripMargin)),

    Q("q_silhouette",  // simplified silhouette (Hruschka et al. 2004;
      // Vendramin et al. 2010 validation) per vector against the fixed
      // cell table — the O(n·C) cluster-quality grade checked before
      // trusting any cell-routed operator (kNN router, SemDeDup,
      // proto-prune); full Rousseeuw silhouette is the n² pass this
      // engine refuses. s = (b−a)/max(a,b), a = assigned-centroid
      // dist, b = nearest-other dist, distances rounded to 9 dp
      // BEFORE ranking/arithmetic so both engines run on identical
      // doubles. One map-side projection of C fused (dist, cid)
      // structs, zero shuffle.
      (s, dir) => Similarity.silhouette(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          fixedCentroidArr(s, dir))
        .orderBy("vec_id"),
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.vec_id AS cid,
        |         round(list_distance(e.v, c.v), 9) AS dist
        |       FROM ve e
        |       CROSS JOIN (SELECT vec_id, v FROM ve WHERE vec_id < 8) c),
        |r AS (SELECT vec_id, cid, dist,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |      FROM ad),
        |ab AS (SELECT a.vec_id, a.cid AS cell, a.dist AS da, b.dist AS db
        |       FROM r a JOIN r b ON b.vec_id = a.vec_id AND b.rn = 2
        |       WHERE a.rn = 1)
        |SELECT vec_id, cell,
        |  round(CASE WHEN greatest(da, db) = 0 THEN 0.0
        |        ELSE (db - da) / greatest(da, db) END, 6) + 0.0 AS sil
        |FROM ab ORDER BY vec_id""".stripMargin)),

    Q("q_davies_bouldin",  // Davies–Bouldin index per cell (Davies &
      // Bouldin TPAMI 1979) — silhouette's complement: grades each
      // CELL by its worst separation-to-scatter ratio R_ij =
      // (σi+σj)/‖ci−cj‖, db_i = max_{j≠i} R_ij (lower = better). One
      // zero-shuffle assignment projection + ONE narrow groupBy(cell)
      // + a C-row collect; the C×C max runs on the driver
      // (k-row-scalar family). σ rounds to 6 dp out of the avg and
      // assignment dists to 9 dp, so the driver arithmetic runs on
      // engine-identical doubles.
      (s, dir) => Similarity.daviesBouldin(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          fixedCentroidArr(s, dir))
        .orderBy("cell"),
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |cents AS MATERIALIZED (SELECT vec_id AS cid, v FROM ve WHERE vec_id < 8),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.cid,
        |         round(list_distance(e.v, c.v), 9) AS dist
        |       FROM ve e CROSS JOIN cents c),
        |asg AS (SELECT vec_id, cid AS cell, dist FROM ad
        |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |sig AS (SELECT cell, count(*) AS n, round(avg(dist), 6) AS sigma
        |        FROM asg GROUP BY 1),
        |allc AS (SELECT cid AS cell, coalesce(n, 0) AS n,
        |           coalesce(sigma, 0.0) AS sigma
        |         FROM cents LEFT JOIN sig ON sig.cell = cents.cid),
        |m AS (SELECT a.cid AS i, b.cid AS j,
        |        round(list_distance(a.v, b.v), 9) AS m
        |      FROM cents a JOIN cents b ON a.cid <> b.cid),
        |r AS (SELECT m.i AS cell, max((si.sigma + sj.sigma) / m.m) AS worst
        |      FROM m JOIN allc si ON si.cell = m.i
        |             JOIN allc sj ON sj.cell = m.j
        |      GROUP BY 1)
        |SELECT allc.cell, CAST(allc.n AS BIGINT) AS n, allc.sigma,
        |       round(r.worst, 6) AS db
        |FROM allc JOIN r USING (cell) ORDER BY cell""".stripMargin)),

    Q("q_calinski",  // Calinski–Harabasz variance-ratio index (1974) —
      // the third cluster-quality leg next to q_silhouette (per-point)
      // and q_davies_bouldin (per-cell): one corpus-level grade
      // CH = (B/(k−1))/(W/(n−k)) of the fixed cell table, scatter
      // measured against assigned-member MEANS (not the routing
      // centroids). Zero-shuffle assignment; two narrow dim-mean
      // exchanges (k-row-scalar collects); W in one map-side pass vs
      // driver-literal cell means. 9-dp pins on distances/means/terms,
      // 6-dp output.
      (s, dir) => Similarity.calinskiHarabasz(
          Tables.table(s, dir, "embeddings"), "vec_id", "embedding",
          fixedCentroidArr(s, dir)),
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |cents AS MATERIALIZED (SELECT vec_id AS cid, v FROM ve WHERE vec_id < 8),
        |ad AS MATERIALIZED (SELECT e.vec_id, c.cid,
        |         round(list_distance(e.v, c.v), 9) AS dist
        |       FROM ve e CROSS JOIN cents c),
        |asg AS MATERIALIZED (SELECT a.vec_id, a.cid AS cell, e.v
        |      FROM (SELECT vec_id, cid FROM ad
        |            QUALIFY row_number() OVER (PARTITION BY vec_id
        |                                       ORDER BY dist, cid) = 1) a
        |      JOIN ve e USING (vec_id)),
        |ex AS MATERIALIZED (SELECT cell, unnest(v) AS x,
        |        unnest(range(0, len(v))) AS i FROM asg),
        |cm AS MATERIALIZED (SELECT cell, i, round(avg(x), 9) AS mu,
        |        count(*) AS cnt FROM ex GROUP BY 1, 2),
        |gm AS MATERIALIZED (SELECT i, round(avg(x), 9) AS mu
        |      FROM ex GROUP BY 1),
        |cma AS MATERIALIZED (SELECT cell, list(mu ORDER BY i) AS muv,
        |        max(cnt) AS n_c FROM cm GROUP BY 1),
        |wp AS (SELECT round(list_sum(list_transform(range(1, len(a.v) + 1),
        |         ix -> (a.v[ix] - c.muv[ix]) * (a.v[ix] - c.muv[ix]))), 9) AS sq
        |       FROM asg a JOIN cma c USING (cell)),
        |wt AS (SELECT sum(sq) AS w, count(*) AS n FROM wp),
        |bt AS (SELECT round(c.n_c * list_sum(list_transform(
        |           range(1, len(c.muv) + 1),
        |           ix -> (c.muv[ix] - g.muv[ix]) * (c.muv[ix] - g.muv[ix]))), 9)
        |         AS term
        |       FROM cma c CROSS JOIN
        |         (SELECT list(mu ORDER BY i) AS muv FROM gm) g),
        |bb AS (SELECT sum(term) AS b, count(*) AS k FROM bt)
        |SELECT CAST(bb.k AS INT) AS k, CAST(wt.n AS BIGINT) AS n,
        |  round(bb.b, 6) AS b, round(wt.w, 6) AS w,
        |  round((bb.b / (bb.k - 1)) / (wt.w / (wt.n - bb.k)), 6) AS ch
        |FROM bb CROSS JOIN wt""".stripMargin)),

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
      Some("""WITH ve AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM ve),
        |d AS (SELECT a.vec_id AS src, b.vec_id AS dst, list_inner_product(a.v, b.v) AS dp
        |      FROM ve a JOIN ve b ON a.vec_id <> b.vec_id),
        |c AS (SELECT src, dst, round(dp / (na.nrm * nb.nrm), 4) + 0.0 AS cos
        |      FROM d JOIN n na ON na.vec_id = src JOIN n nb ON nb.vec_id = dst),
        |k AS (SELECT src AS id, count(*) AS n_nbr, max(cos) AS max_cos
        |      FROM c WHERE cos >= 0.5 GROUP BY 1)
        |SELECT vec_id AS id, COALESCE(k.n_nbr, 0) AS n_nbr,
        |       COALESCE(k.max_cos, -1.0) AS max_cos
        |FROM embeddings LEFT JOIN k ON k.id = embeddings.vec_id
        |ORDER BY id""".stripMargin))
  )
}
