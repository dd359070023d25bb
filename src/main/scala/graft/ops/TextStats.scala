package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions over the token array — deterministic rule
  * systems (oracle-able), not learned models.
  */
object TextStats {

  /** Marker-word tables for the n-gram/stopword language-ID heuristic.
    * ASCII-token languages only; real deployments broadcast much larger
    * marker tables — the plan shape is identical.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to", "in"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un"),
    "es" -> Seq("el", "los", "las", "es", "de", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  private def markerHits(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isin(markers: _*)))

  /** Predicted language = argmax of marker-word hits; "und"
    * (undetermined) when no marker matches. Ties break by the
    * declaration order of [[LangMarkers]] (greatest-first scan).
    */
  def langId(tokens: Column): Column = langIdMarkers(tokens, LangMarkers)

  /** [[langId]] with a caller-supplied marker map — the BOOTSTRAP
    * labeler of the trained language-ID family (`q_lang_clf`): CCNet/
    * RefinedWeb-style pipelines seed their char-ngram classifier with
    * labels from exactly this kind of high-precision/low-recall
    * heuristic, then let the trained model cover the marker-free
    * majority. Semantics identical to [[langId]] (argmax marker hits,
    * ties by declaration order, "und" on zero hits).
    */
  def langIdMarkers(
      tokens: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scores = markers.map { case (lang, ms) => lang -> markerHits(tokens, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** CJK-aware language ID — the whitespace-free-script fallback in
    * front of [[langId]] (VERDICT r14 missing #2): the marker-word
    * heuristic consumes ASCII tokens, so a CJK document scored "und"
    * no matter how unambiguous its script. Sub-script PRESENCE is the
    * decisive signal at this tier — kana appears only in Japanese,
    * hangul only in Korean, so any occurrence dominates (the rule
    * every script-based router uses before an n-gram model): kana →
    * ja, else hangul → ko, else han → zh, else the ASCII marker scan.
    * Presence is tested with `rlike` — an early-exit scan with zero
    * allocation, not a full stripped-copy rewrite (review r15) —
    * zero shuffle.
    *
    * `minCjkFraction` (ADVICE r15): presence-only routing flips an
    * otherwise-English document to ja/ko/zh on ONE stray kana/han
    * glyph (a quoted name, a pasted hashtag). When > 0, the CJK
    * branch fires only if at least that fraction of the document's
    * non-space characters is CJK — the [[graft.ops.TextOps.cjkRuns]]
    * fraction threshold real pipelines apply before trusting the
    * tail. The fraction costs one extra regexp strip per row (still
    * map-side, zero shuffle). Default 0.0 keeps presence-only
    * routing (existing callers and oracles unchanged).
    */
  def langIdMixed(text: Column, minCjkFraction: Double = 0.0): Column = {
    val gate =
      if (minCjkFraction <= 0.0) lit(true)
      else {
        val nonSpace = length(regexp_replace(text, "\\s+", ""))
        val cjk = length(regexp_replace(
          text, "[^" + TextOps.CjkClass + "]+", ""))
        nonSpace > 0 && cjk.cast("double") / nonSpace.cast("double") >=
          lit(minCjkFraction)
      }
    when(gate && text.rlike("[\u3040-\u30ff]"), lit("ja"))
      .when(gate && text.rlike("[\uac00-\ud7af]"), lit("ko"))
      .when(gate && text.rlike("[\u4e00-\u9fff]"), lit("zh"))
      .otherwise(langId(TextOps.tokenize(text)))
  }

  /** Type-token ratio: distinct / total tokens (0 for empty docs). */
  def distinctRatio(tokens: Column): Column =
    when(size(tokens) === 0, 0.0)
      .otherwise(size(array_distinct(tokens)) / size(tokens).cast("double"))

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(tokens: Column, stopwords: Seq[String]): Column =
    when(size(tokens) === 0, 0.0)
      .otherwise(size(filter(tokens, t => t.isin(stopwords: _*))) / size(tokens).cast("double"))

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(tokens: Column): Column =
    when(size(tokens) === 0, 0.0)
      .otherwise(
        aggregate(transform(tokens, t => length(t).cast("long")), lit(0L), _ + _)
          / size(tokens).cast("double"))

  /** Composite quality score in [0,1]: rewards lexical diversity,
    * penalizes stopword stuffing, saturating credit for word length —
    * the standard shape of heuristic quality filters for LLM corpora.
    *
    * Mathematically `0.4·distinct_ratio + 0.3·(1−stopword_ratio) +
    * 0.3·min(mean_len/10, 1)`, but computed as ONE division of exact
    * integers: `(40·nd + 30·(n−ns) + 3·min(sl, 10n)) / (100n)`. A
    * float-composed version produces exact decimal-boundary rationals
    * (denominators 2^a·5^b) where Spark's BigDecimal rounding and the
    * oracle's scale-multiply rounding disagree by 1 ulp — the
    * single-division form is bit-identical across engines at any
    * rounding scale. Empty docs score 0.3 (the middle term's floor).
    */
  def qualityScore(tokens: Column, stopwords: Seq[String]): Column = {
    val n = size(tokens).cast("long")
    val nd = size(array_distinct(tokens)).cast("long")
    val ns = size(filter(tokens, t => t.isin(stopwords: _*))).cast("long")
    val sl = aggregate(transform(tokens, t => length(t).cast("long")), lit(0L), _ + _)
    when(n === 0, lit(0.3))
      .otherwise(
        (lit(40L) * nd + lit(30L) * (n - ns) + lit(3L) * least(sl, n * 10L))
          / (lit(100.0) * n))
  }

  /** Fraction of tokens taken by the single most frequent token
    * (0 for empty docs) — the Gopher-style "top word share" repetition
    * signal: boilerplate and keyword-stuffed docs score high. Computed
    * as one integer division (see [[qualityScore]]'s rounding law).
    */
  def topTokenFraction(tokens: Column): Column = {
    val counts = transform(array_distinct(tokens),
      t => size(filter(tokens, x => x === t)).cast("long"))
    when(size(tokens) === 0, 0.0)
      .otherwise(array_max(counts) / size(tokens).cast("double"))
  }

  /** Duplicate-bigram fraction: 1 − distinct/total over adjacent token
    * pairs (0 for docs with < 2 tokens) — the C4/Gopher repeated-n-gram
    * signal; looping or templated text scores high.
    */
  def dupBigramFraction(tokens: Column): Column = {
    val n = size(tokens)
    val bigrams = Dedup.tokenShingles(tokens, 2)
    when(n < 2, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(bigrams)) / size(bigrams).cast("double"))
  }

  /** The full Gopher repetition-rule table (Rae et al., "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", arXiv:2112.11446, Table A1) — the per-document
    * char-weighted repetition screens beyond [[topTokenFraction]] /
    * [[dupBigramFraction]]'s count-weighted pair:
    *  - `top{n}_frac` (n ∈ topNs): fraction of document characters in
    *    the MOST frequent word n-gram = count × chars(top gram) /
    *    total token chars (ties → lexicographically smallest gram);
    *  - `dup{n}_frac` (n ∈ dupNs): fraction of characters covered by
    *    ANY n-gram occurring ≥2× in the doc, each character counted
    *    ONCE (coverage via the [[graft.functions.SpanCoverMask]]
    *    sweep — overlapping duplicate windows don't double-count).
    * Character accounting is over TOKEN characters (separators
    * excluded) on both sides of the oracle. Docs with < n tokens (or
    * zero chars) score 0 for that column.
    *
    * Scale: ZERO shuffles — every column is per-row array arithmetic,
    * embarrassingly parallel; per-doc cost is O(g²) in gram count
    * (within-doc occurrence counting), bounded by document length,
    * never corpus size — the same envelope as
    * [[graft.ops.Dedup.scrubRepeatedSpans]].
    * Output: (idCol, top{n}_frac…, dup{n}_frac…), rounded.
    */
  def gopherRepetition(
      docs: DataFrame, idCol: String, toksCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 10),
      scale: Int = 6): DataFrame = {
    // ONE fused codegen pass per row ([[graft.functions.GopherRep]]):
    // gram counts from a per-row hash map — O(Σ_n g·n) — instead of
    // the r16 higher-order-function cascade (interpreted lambda
    // dispatch per element, O(d·g) counting + O(g²) duplicate scan
    // per (row, n), two localCheckpoint barriers just to stop
    // Catalyst re-inlining the gram subtrees into inner lambdas).
    // Measured at sf0.1: 5.2 s warm → see OPTIMIZATION_r17.md; output
    // bit-identical (same DuckDB oracle, same closed-form spec).
    val stats = graft.functions.GopherRep.gopher_rep(col(toksCol), topNs, dupNs)
    val cols =
      (topNs.map(n => s"top${n}_frac") ++ dupNs.map(n => s"dup${n}_frac"))
        .map(f => round(col("__gr").getField(f), scale).as(f))
    docs.select(col(idCol), stats.as("__gr"))
      .select(col(idCol) +: cols: _*)
  }

  /** Trained-classifier-style quality score: a logistic model over the
    * heuristic feature set (lexical diversity, stopword density, word
    * length, bigram repetition, top-token domination) with FIXED
    * public weights — the plan shape of a fastText/logreg quality
    * classifier (CCNet, GPT-3's WebText scorer) with the learned
    * coefficients replaced by published-in-source constants, so the
    * score is deterministic math and value-oracles cross-engine. In a
    * real deployment only [[QualityClfWeights]] changes; the Spark
    * plan — pure codegen column expressions, zero shuffles, zero UDFs
    * — is identical.
    *
    * z = b₀ + w_d·distinct_ratio + w_s·(1 − stopword_ratio)
    *       + w_l·min(mean_len/10, 1) − w_r·dup_bigram_frac
    *       − w_t·top_token_frac ;  score = σ(z) ∈ (0, 1).
    * Monotone: ↑diversity/↑word-length raise it, ↑repetition/
    * ↑stopword-stuffing/↑top-token-share lower it (PropertySpec).
    */
  val QualityClfWeights: (Double, Double, Double, Double, Double, Double) =
    (-1.5, 2.0, 1.0, 1.5, 2.0, 1.0)  // b0, w_d, w_s, w_l, w_r, w_t

  def qualityLogit(tokens: Column, stopwords: Seq[String]): Column = {
    val (b0, wd, ws, wl, wr, wt) = QualityClfWeights
    val z = lit(b0) +
      lit(wd) * distinctRatio(tokens) +
      (lit(1.0) - stopwordRatio(tokens, stopwords)) * lit(ws) +
      lit(wl) * least(meanTokenLen(tokens) / lit(10.0), lit(1.0)) -
      lit(wr) * dupBigramFraction(tokens) -
      lit(wt) * topTokenFraction(tokens)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Whitespace token count — `size(split)` on the raw text (counts
    * empty string as 1 token on empty text, like split semantics in
    * both engines; callers guard if needed).
    */
  def wsTokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish token count: the GPT-2 pre-tokenizer's segmentation rule
    * simplified to its cross-engine regex core — maximal runs of
    * letters, runs of digits, or runs of other non-space characters
    * each count as one unit (real BPE then merges inside those units,
    * so this is the standard cheap upper-anchor for "how many LLM
    * tokens is this corpus"). Pure regexp_extract_all count: the
    * pattern uses only literal character classes, identical semantics
    * in java.util.regex and RE2, so the count value-oracles.
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))

  /** Ordered-content fingerprint: md5 over the exact token sequence
    * (vs Dedup.wordSetFingerprint which is set-based).
    */
  def contentFingerprint(tokens: Column): Column = md5(concat_ws(" ", tokens))

  /** Per-document CHARACTER Shannon entropy — the cheapest
    * gibberish/compressibility signal in the quality-filter toolbox
    * (low entropy = repeated-character padding, base64-ish blobs sit
    * HIGH — both tails are filter targets; natural English plateaus
    * ≈ 4.1 bits ≈ 2.85 nats): H = ln L − (Σ_ch c·ln c)/L in nats,
    * computed in the one-pass rearrangement so no per-char division
    * ever happens. Empty documents report (0, 0.0) rather than
    * dropping out.
    *
    * Scale: one explode to the char stream, but the groupBy
    * (doc, char) partial-aggregates map-side to ≤ |alphabet| rows per
    * doc per partition BEFORE the exchange — shuffle volume is
    * docs × alphabet, not corpus characters; the second groupBy(doc)
    * is a fold of those ≤ |alphabet| rows. Chars are Java code UNITS
    * (= code points = DuckDB characters for the BMP; supplementary-
    * plane text would split surrogate pairs where an oracle counts
    * one char — the corpus is ASCII, noted for completeness).
    * Output: (idCol, len, entropy) with entropy in nats, rounded 6.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
    val ent = counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("len"),
        sum(col("c") * log(col("c"))).as("clogc"))
      .select(col(idCol), col("len"),
        round(log(col("len")) - col("clogc") / col("len"), 6).as("entropy"))
    docs.select(col(idCol)).join(ent, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("len"), lit(0L)).as("len"),
        (coalesce(col("entropy"), lit(0.0)) + lit(0.0)).as("entropy"))
  }

  /** Threshold-free ROC-AUC of a continuous score against a boolean
    * label — the standard grade for every soft signal this engine
    * ships (quality logits, LM perplexities, language-ID marker rates)
    * before anyone picks a cutoff: AUC = P(score⁺ > score⁻) + ½·ties,
    * computed as the tie-averaged Mann–Whitney rank-sum. The whole
    * statistic stays in INTEGER arithmetic until one final division —
    * grouping by score value, with `cum` = items strictly below the
    * group, each group contributes n_pos·(2·cum + n_tot + 1) half-
    * ranks, and AUC = (Σ − P(P+1)) / (2·P·N) — so the value oracles
    * exactly, no float-sum noise anywhere.
    *
    * Scale: one groupBy(score) with map-side partial aggregation
    * (shuffle = distinct score values, not rows), then a global
    * cumulative window over those DISTINCT scores — fine for the
    * rational-valued scores this suite emits (cardinality ≪ corpus);
    * a continuous-score corpus at 100 TB would bucket scores first or
    * use the two-pass partition-offset device ([[graft.ops.IdOps]]).
    * Output: one row (n_pos, n_neg, auc rounded 6); auc NULL when a
    * class is empty (undefined, not 0).
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("nt"),
        sum(when(col("y"), 1L).otherwise(0L)).as("np"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum(col("nt")).over(w), lit(0L)))
      .agg(
        sum(col("np") * (lit(2) * col("cum") + col("nt") + lit(1))).as("s2"),
        sum(col("np")).as("p"),
        sum(col("nt") - col("np")).as("n"))
      .select(col("p").as("n_pos"), col("n").as("n_neg"),
        when(col("p") > 0 && col("n") > 0,
          round((col("s2") - col("p") * (col("p") + 1))
            / (lit(2.0) * col("p") * col("n")), 6))
          .as("auc"))
  }

  /** Unigram-LM cross-entropy per document — the CCNet-style
    * "perplexity filter" signal (Wenzek et al., "CCNet: Extracting
    * high quality monolingual datasets from web crawl data",
    * arXiv:1911.00359) with the corpus itself as the LM: per doc,
    * −mean ln p(w) where p(w) = corpus count(w) / total tokens.
    * Low = stereotypical fluent text, high = rare-token soup; both
    * tails are usually filtered. Documents with zero tokens emit no
    * row (no distribution to score against).
    *
    * Scale: one explode + a token-keyed join of occurrences against
    * the vocabulary frequency table (shuffle on the token key — hot
    * stopword keys are classic AQE-skew-split territory), partial
    * aggs on both sides, and the grand total joins in as a 1-row
    * broadcast. Nothing is collected to the driver.
    * Output: (idCol, xent).
    */
  def lmScore(docs: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(col(toksCol)).as("w"))
    val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum("cnt").as("total"))
    tok.join(freq, "w").crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg((-avg(log(col("cnt").cast("double") / col("total")))).as("xent"))
  }

  /** Zero-shuffle twin of [[lmScore]]: the vocabulary LM rides to every
    * task as ONE broadcast row holding a map<token, ln p(token)> —
    * scoring becomes a per-row fold over the doc's own tokens. No
    * explode, no token-keyed shuffle, no per-doc aggregation exchange:
    * the corpus never leaves its input partitions. This is the serving
    * shape at 100 TB whenever the model is bounded (vocab ≪ corpus),
    * and because the scorer is a pure stateless column expression it
    * runs unchanged on a stream (the streaming scorer
    * [[graft.streaming.StreamOps.lmScoreBatch]] uses the relation
    * form of the same model — [[unigramLogProbs9]]).
    *
    * `model` rows are (token, ln p); it must cover every scoreable
    * token (e.g. built from the same corpus) — [[lmScore]] likewise has
    * no out-of-vocabulary path. Tokens absent from the model null the
    * doc's score rather than silently skewing it. Empty-token docs emit
    * no row (parity with [[lmScore]]).
    */
  def lmScoreBroadcast(
      docs: DataFrame, idCol: String, toksCol: String,
      model: DataFrame, wCol: String, logpCol: String): DataFrame = {
    val m = model.agg(
      map_from_entries(collect_list(struct(col(wCol), col(logpCol)))).as("__lm"))
    docs.filter(size(col(toksCol)) > 0)
      .crossJoin(broadcast(m))
      .select(col(idCol),
        (-aggregate(col(toksCol), lit(0.0d),
          (acc, w) => acc + element_at(col("__lm"), w))
          / size(col(toksCol)).cast("double")).as("xent"))
  }

  /** CCNet head/middle/tail perplexity buckets (Wenzek et al.,
    * arXiv:1911.00359 §4.4 — the paper's released corpora ship in
    * exactly these three slices): per language-or-source group, split
    * documents into equal-count terciles of the [[lmScore]] signal —
    * "head" = lowest cross-entropy (most fluent), "tail" = highest.
    * Downstream recipes train on head(+middle) or use the buckets as
    * curriculum stages. Bucketing uses ntile(3) over (rounded xent,
    * id) — rounding before ranking plus the id tie-break makes the
    * bucket boundary engine-independent (both engines place the same
    * rows in the same terciles).
    *
    * Scale: the scored table is (id, group, xent) — three narrow
    * columns, not the corpus text — and ntile is one window sort
    * partitioned by the GROUP key (≈ corpus/|groups| rows per
    * partition; languages/sources are balanced by construction —
    * skewed grouping keys would use range-partitioned percent_rank
    * instead). The documents themselves don't move; join the bucket
    * column back by id when materializing slices.
    * Output: (idCol, byCol, xent, bucket).
    */
  def ccnetBuckets(
      scored: DataFrame, idCol: String, byCol: String, xentCol: String,
      scale: Int = 6): DataFrame = {
    // the output contract names the score column "xent" — an id/group
    // key with that same name would make the contract ambiguous
    require(idCol != "xent" && byCol != "xent",
      "idCol/byCol must not be named \"xent\" (reserved for the score output)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol)).orderBy(col("__graft_xent"), col(idCol))
    scored
      .select(col(idCol), col(byCol),
        round(col(xentCol), scale).as("__graft_xent"))
      .withColumn("bucket",
        element_at(lit(Array("head", "middle", "tail")), ntile(3).over(w)))
      .select(col(idCol), col(byCol), col("__graft_xent").as("xent"), col("bucket"))
  }

  /** The corpus's own unigram LM as (w, logp) — the model side of
    * [[lmScoreBroadcast]] when scoring a corpus against itself, i.e.
    * exactly [[lmScore]]'s distribution.
    */
  def unigramLogProbs(docs: DataFrame, toksCol: String): DataFrame = {
    val freq = docs.select(explode(col(toksCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    freq.crossJoin(broadcast(freq.agg(sum("cnt").as("total"))))
      .select(col("w"), log(col("cnt").cast("double") / col("total")).as("logp"))
  }

  /** [[unigramLogProbs]] in the engine's 1e-9 fixed-point convention:
    * (w, logp9 = round(ln p · 1e9) as long). This is the RELATION form
    * of the model — the shape [[graft.streaming.StreamOps.lmScoreBatch]]
    * broadcast-joins per micro-batch (VERDICT r15 #1: a model relation
    * keeps plan size and driver memory independent of vocabulary,
    * where a collected map literal grows with the corpus under Heaps'
    * law). Fixed-point longs make downstream per-doc sums exact and
    * order-independent, so stream and batch scores are bit-identical
    * and the DuckDB oracle can replay them integer-for-integer.
    */
  def unigramLogProbs9(docs: DataFrame, toksCol: String): DataFrame =
    unigramLogProbs(docs, toksCol)
      .select(col("w"),
        round(col("logp") * lit(1e9), 0).cast("long").as("logp9"))

  /** Per-group length winsorization screen — flag documents outside
    * the [pLo, pHi] EXACT interpolated percentile band of `valCol`
    * within their `byCol` group (truncated pages and concatenation
    * blobs both correlate with length tails; per-source bands avoid
    * penalizing naturally-long sources). Returns the flagged rows
    * (idCol, byCol, valCol, tail∈{short,long}).
    *
    * Scale: the bounds table is one groupBy over the group key (rows =
    * #groups — tiny), broadcast back; the screen itself is a map-side
    * comparison. Exact `percentile` sorts per group inside the agg
    * buffer — fine while per-group cardinality fits an executor; at
    * true 100 TB swap in `percentile_approx`, which is partial-agg
    * mergeable at fixed memory (the only line that changes).
    */
  def lengthOutliers(
      docs: DataFrame, idCol: String, byCol: String, valCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    val bounds = docs.groupBy(col(byCol)).agg(
      percentile(col(valCol), lit(pLo)).as("__lo"),
      percentile(col(valCol), lit(pHi)).as("__hi"))
    docs.join(broadcast(bounds), byCol)
      .filter(col(valCol) < col("__lo") || col(valCol) > col("__hi"))
      .select(col(idCol), col(byCol), col(valCol),
        when(col(valCol) < col("__lo"), lit("short")).otherwise(lit("long")).as("tail"))
  }

  /** Add-k-smoothed BIGRAM LM cross-entropy — the next rung above
    * [[lmScore]]'s unigram CCNet signal: per doc, −mean ln p(w₂|w₁)
    * over its adjacent token pairs, with the conditional estimated
    * from the corpus's own bigram counts,
    * p(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V), V = vocabulary size.
    * A bigram model penalizes shuffled/boilerplate-stitched text that
    * unigram perplexity scores as fluent (same word multiset, broken
    * word order). Docs with fewer than two tokens emit no row.
    *
    * Scale: the bigram stream is derived MAP-SIDE per row (two array
    * slices zipped — no self-join, no positional explode+rejoin); the
    * model table is one partial-agg'd groupBy on the (w₁,w₂) key,
    * bounded by corpus bigram diversity ≪ corpus size; scoring is one
    * join of the stream against the model on the bigram key (hot
    * bigrams = AQE-skew territory, same as [[lmScore]]); V joins in
    * as a 1-row broadcast. Self-trained ⇒ every scored bigram hits
    * the model — no OOV path.
    * Output: (idCol, xent).
    */
  def bigramLmScore(
      docs: DataFrame, idCol: String, toksCol: String, k: Double = 0.5): DataFrame = {
    val n = size(col(toksCol))
    val big = docs.filter(n >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col(toksCol), lit(1), n - 1), slice(col(toksCol), lit(2), n - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgCnt = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctxCnt = bgCnt.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(col(toksCol)).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val model = bgCnt.join(ctxCnt, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        log((col("c12") + lit(k)) / (col("c1") + lit(k) * col("v"))).as("logp"))
    big.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol)).agg((-avg(col("logp"))).as("xent"))
  }

  /** Interpolated KNESER–NEY bigram cross-entropy (Kneser & Ney,
    * ICASSP 1995; Chen & Goodman, Computer Speech & Language 1999 —
    * the standard n-gram smoothing that add-k approximates):
    *
    *   p(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)
    *
    * with absolute discount D (default 0.75). The continuation
    * probability N₁₊(·w₂)/N₁₊(··) scores how many DISTINCT contexts a
    * word follows — "Francisco" is frequent but only ever follows
    * "San", so its continuation mass is tiny where add-k would
    * overrate it. Self-trained ⇒ every scored bigram has c ≥ 1, but
    * the interpolation term still shapes every probability. Docs with
    * fewer than two tokens emit no row.
    *
    * Scale: identical shuffle shape to [[bigramLmScore]] — map-side
    * bigram stream, model = groupBys bounded by bigram-type diversity
    * (the N₁₊ tables are BY-PRODUCTS of the same bgCnt aggregate, no
    * extra corpus pass), the type total broadcasts as 1 row, scoring
    * is one bigram-keyed join. Output: (idCol, xent_kn).
    */
  def knBigramLmScore(
      docs: DataFrame, idCol: String, toksCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val n = size(col(toksCol))
    val big = docs.filter(n >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col(toksCol), lit(1), n - 1), slice(col(toksCol), lit(2), n - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgCnt = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // N1+(w1·) = distinct continuations of w1; c(w1·) = total mass
    val ctxCnt = bgCnt.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val contCnt = bgCnt.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = bgCnt.agg(count(lit(1)).as("nbt"))
    val model = bgCnt.join(ctxCnt, "w1").join(contCnt, "w2")
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"),
        log(greatest(col("c12") - lit(discount), lit(0.0)) / col("c1") +
          lit(discount) * col("n1f") / col("c1") *
          (col("n1b") / col("nbt"))).as("logp"))
    big.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol)).agg((-avg(col("logp"))).as("xent_kn"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169),
    * simplified to add-1-smoothed unigram LMs: per doc, the mean log
    * importance ratio ln(p_target(w) / p_corpus(w)) of its tokens,
    * where the target distribution is estimated from the rows
    * matching `isTarget` (e.g. a trusted domain) and the proposal
    * from the whole corpus. Resample/filter on high `dsir_logw` to
    * shift the corpus toward the target domain. Laplace smoothing
    * over the joint vocabulary keeps unseen-in-target tokens finite.
    *
    * Same shuffle shape as [[lmScore]]: explode, one token-keyed
    * join against a (corpus, target) count table built in a single
    * conditional aggregation pass, totals broadcast as one row.
    * Output: (idCol, dsir_logw).
    */
  def dsirWeights(
      docs: DataFrame, idCol: String, toksCol: String, isTarget: Column): DataFrame = {
    val tok = docs.select(col(idCol), isTarget.as("__t"), explode(col(toksCol)).as("w"))
    val freq = tok.groupBy(col("w")).agg(
      count(lit(1)).as("c_all"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("c_tgt"))
    val tot = freq.agg(sum("c_all").as("n_all"), sum("c_tgt").as("n_tgt"),
      count(lit(1)).as("vocab"))
    tok.join(freq, "w").crossJoin(broadcast(tot))
      .withColumn("lr",
        log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + col("vocab")))
          - log((col("c_all") + lit(1.0)) / (col("n_all") + col("vocab"))))
      .groupBy(col(idCol))
      .agg(avg(col("lr")).as("dsir_logw"))
  }

  /** Bernoulli-presence Naive Bayes, trained and applied in ONE plan —
    * the learned sibling of the fixed-weight logistic filter
    * (`qualityLogit`): given boolean labels, learn per-token log-odds
    * `ln((c1+1)/(n1+2)) − ln((c0+1)/(n0+2))` (Laplace-smoothed
    * presence counts) and score each document as the class prior plus
    * the sum of its distinct tokens' log-odds — the standard shape of
    * fastText-style quality classifiers distilled to their linear
    * core. Output: (idCol, labelCol, nb_logit).
    *
    * Scale: the model is a (token, log-odds) relation built by one
    * explode + groupBy pass, bounded to `maxVocab` rows by
    * count-based feature selection (see [[nbLogOdds9]]) and
    * broadcast-joined back on the token key; class totals and the
    * prior travel as 1-row broadcasts. Nothing is collected, so corpus
    * and vocabulary can grow independently of executor memory. Token
    * log-odds are fixed-point-quantized to 1e-9 and summed as EXACT
    * integers, so the per-doc logit is a pure function of the model —
    * independent of summation order across engines and partitionings.
    * (The softer 9-dp-double-sum form of the SURVEY §7.6 rounding law
    * landed exactly on a 6-dp rounding half-boundary at sf0.1 and
    * flipped between engines; integer accumulation closes the class.)
    */
  /** The learned NB model as a (w, lo9) relation — per-token log-odds
    * in 1e-9 fixed point (see [[nbTrainScore]]). Exported so batch
    * scoring, the streaming twin and any external consumer all apply
    * the IDENTICAL integer model.
    *
    * `maxVocab` bounds the model (VERDICT r14 #3): features are the
    * top-N tokens by document-presence count (ties broken by token,
    * so the selection is a deterministic function of the corpus),
    * picked via orderBy+limit — TakeOrdered, the reservoir shape:
    * per-partition top-N plus an N-row merge, never a vocabulary-wide
    * single-partition window. Under Heaps' law an uncapped crawl
    * vocabulary grows without bound; the cap makes the model — and
    * therefore every downstream broadcast or driver artifact — a
    * CONSTANT size at any corpus scale, the standard
    * feature-selection step of fastText-style quality classifiers.
    */
  def nbLogOdds9(
      docs: DataFrame, idCol: String, toksCol: String, labelCol: String,
      maxVocab: Int = 1 << 16): DataFrame = {
    val feats = docs.select(col(idCol), col(labelCol).as("__y"),
      explode(array_distinct(col(toksCol))).as("w"))
    val cnt = feats.groupBy(col("w")).agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("__y"), 0L).otherwise(1L)).as("c0"))
      .orderBy((col("c1") + col("c0")).desc, col("w")).limit(maxVocab)
    val nn = docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n1"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n0"))
    cnt.crossJoin(broadcast(nn)).select(col("w"),
      round((log((col("c1") + lit(1.0)) / (col("n1") + lit(2.0)))
        - log((col("c0") + lit(1.0)) / (col("n0") + lit(2.0)))) * lit(1e9), 0)
        .cast("long").as("lo9"))
  }

  /** The NB class prior ln((n1+1)/(n0+1)) in 1e-9 fixed point, as a
    * 1-row frame (broadcast by consumers). */
  def nbPrior9(docs: DataFrame, labelCol: String): DataFrame =
    docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n1"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n0"))
      .select(
        round(log((col("n1") + lit(1.0)) / (col("n0") + lit(1.0))) * lit(1e9), 0)
          .cast("long").as("prior9"))

  def nbTrainScore(
      docs: DataFrame, idCol: String, toksCol: String, labelCol: String,
      maxVocab: Int = 1 << 16): DataFrame = {
    val feats = docs.select(col(idCol),
      explode(array_distinct(col(toksCol))).as("w"))
    val model = nbLogOdds9(docs, idCol, toksCol, labelCol, maxVocab)
    val prior = nbPrior9(docs, labelCol)
    // the capped model is ≤ maxVocab rows by construction — broadcast
    // the token join instead of shuffling the exploded corpus
    val slo = feats.join(broadcast(model), Seq("w"))
      .groupBy(col(idCol)).agg(sum("lo9").as("slo9"))
    docs.select(col(idCol), col(labelCol))
      .join(slo, Seq(idCol), "left").na.fill(0L, Seq("slo9"))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col(labelCol),
        ((col("prior9") + col("slo9")) / lit(1e9)).as("nb_logit"))
  }

  /** Multiclass multinomial Naive Bayes — the TRAINED language-ID
    * model (VERDICT r16 missing #2): real pipelines (CCNet,
    * RefinedWeb) route by a trained char-ngram classifier because
    * marker words cannot separate es/pt, ru/uk, ms/id — the
    * sub-word orthography ("nh"/"lh" vs "ñ"-free "n",
    * article/suffix boundary grams) can. This generalizes
    * [[nbLogOdds9]]'s two-class log-odds to per-class log-LIKELIHOODS
    * `ln((c_wc+1)/(n_c+V))` (Laplace-smoothed multinomial over
    * feature OCCURRENCES — occurrence counts, not presence, are the
    * standard for short char-gram evidence), in the house 1e-9 fixed
    * point so scores accumulate as exact integers on any engine.
    *
    * Returns (model, priors): model = (cls, w, lp9) DENSE over
    * classes × selected vocabulary — absent (cls, gram) pairs carry
    * their smoothed floor ln(1/(n_c+V)), the zero-count arm the
    * scorer needs; priors = (cls, prior9) from Laplace-smoothed
    * document counts ln((d_c+1)/(N+K)).
    *
    * Scale: the vocabulary is capped to the top `maxVocab` grams by
    * total count (ties by gram — a deterministic function of the
    * corpus) via TakeOrdered; the model is K·V rows — CONSTANT in
    * corpus size, broadcastable at any scale; training is one
    * explode + two groupBy passes, everything partial-aggregated;
    * nothing is collected.
    */
  def nbMulticlassModel9(
      labeled: DataFrame, featsCol: String, classCol: String,
      maxVocab: Int = 512): (DataFrame, DataFrame) = {
    val occ = labeled.select(col(classCol).as("cls"), explode(col(featsCol)).as("w"))
    val vocab = occ.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(maxVocab)
      .select(col("w"))
    val occV = occ.join(broadcast(vocab), Seq("w"))
    val cnt = occV.groupBy(col("cls"), col("w")).agg(count(lit(1)).as("c"))
    val nC = occV.groupBy(col("cls")).agg(count(lit(1)).as("n_c"))
    val v1 = vocab.agg(count(lit(1)).as("v"))
    val model = nC.crossJoin(broadcast(vocab))
      .join(cnt, Seq("cls", "w"), "left").na.fill(0L, Seq("c"))
      .crossJoin(broadcast(v1))
      .select(col("cls"), col("w"),
        round(log((col("c") + lit(1.0)) / (col("n_c") + col("v"))) * lit(1e9), 0)
          .cast("long").as("lp9"))
    val dC = labeled.groupBy(col(classCol).as("cls")).agg(count(lit(1)).as("d_c"))
    val kn = dC.agg(count(lit(1)).as("k"), sum("d_c").as("n"))
    val priors = dC.crossJoin(broadcast(kn))
      .select(col("cls"),
        round(log((col("d_c") + lit(1.0)) / (col("n") + col("k"))) * lit(1e9), 0)
          .cast("long").as("prior9"))
    (model, priors)
  }

  /** Apply a [[nbMulticlassModel9]] model: per document, per-class
    * score = prior9 + Σ over feature OCCURRENCES of lp9 (exact
    * integer — order-independent across engines and partitionings),
    * prediction = argmax class, ties broken by class name ascending.
    * Output: (idCol, lang_pred, logit) with logit the winning score
    * in nats rounded 6 dp.
    *
    * Scale: model and priors broadcast (K·V and K rows); one shuffle
    * on (id, cls) for the partial-agged score sum, one on id for the
    * argmax — computed as min(struct(−score, cls)), the single-agg
    * argmax (no corpus-wide window). Grams outside the capped
    * vocabulary contribute nothing on ANY engine (the inner model
    * join drops them) — feature selection, not score noise. Documents
    * with zero vocabulary grams fall back to the prior-only argmax.
    */
  def nbClassifyMulticlass(
      docs: DataFrame, idCol: String, featsCol: String,
      model: DataFrame, priors: DataFrame): DataFrame = {
    val (wide, cps) = nbModelWide(model, priors)
    nbClassifyMulticlassWide(docs, idCol, featsCol, wide, cps)
  }

  /** The long-form (cls, w, lp9) model pivoted to ONE row per gram
    * with a dense per-class lp9 column, plus the ordered
    * (class, prior9) list — r18: the classify kernel previously ran
    * the K-way form (occ ⋈ model → groupBy(id, cls) → crossJoin
    * priors → left join → groupBy(id)): TWO shuffles and a K-fold row
    * blow-up per call, ×4 micro-batches in the stream twin. The
    * pivoted form needs ONE groupBy(id). The priors collect is the
    * k-row-scalar family (one row per class, by contract) and runs
    * once per pivot, not per document.
    */
  def nbModelWide(
      model: DataFrame, priors: DataFrame): (DataFrame, Seq[(String, Long)]) = {
    val cps = priors.select(col("cls"), col("prior9")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val aggs = cps.zipWithIndex.map { case ((c, _), i) =>
      sum(when(col("cls") === c, col("lp9"))).as(s"lp$i")
    }
    (model.groupBy(col("w")).agg(aggs.head, aggs.tail: _*), cps)
  }

  /** [[nbClassifyMulticlass]] over a pre-pivoted model — callers that
    * classify repeatedly (the foreachBatch stream twin) pivot once and
    * pass the materialized wide frame. Bit-identical to the K-way
    * form: per-class score = prior9 + Σ lp9 over occurrences as exact
    * longs (absent (w, cls) cells are null → sum skips them, exactly
    * the rows the long-form inner join never produced), argmax =
    * min(struct(−t9, cls)) with the same class-name tie-break via
    * array_min over the same structs.
    */
  def nbClassifyMulticlassWide(
      docs: DataFrame, idCol: String, featsCol: String,
      wide: DataFrame, cps: Seq[(String, Long)]): DataFrame = {
    val occ = docs.select(col(idCol), explode(col(featsCol)).as("w"))
    val aggs = cps.indices.map(i => sum(col(s"lp$i")).as(s"s$i"))
    val sc = occ.join(broadcast(wide), Seq("w"))
      .groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val cand = array(cps.zipWithIndex.map { case ((c, p), i) =>
      struct((-(lit(p) + coalesce(col(s"s$i"), lit(0L)))).as("nt9"),
        lit(c).as("cls"))
    }: _*)
    docs.select(col(idCol)).join(sc, Seq(idCol), "left")
      .select(col(idCol), array_min(cand).as("b"))
      .select(col(idCol), col("b.cls").as("lang_pred"),
        round((-col("b.nt9")) / lit(1e9), 6).as("logit"))
  }

  /** Platt scaling (Platt 1999, "Probabilistic Outputs for Support
    * Vector Machines…"): fit the 2-parameter logistic
    * `P(y=1|s) = 1/(1+exp(−(a·s+b)))` over (score, label) rows by
    * Newton iterations on the regularized cross-entropy — Platt's
    * targets `t₊ = (N₊+1)/(N₊+2)`, `t₋ = 1/(N₋+2)` keep the fit away
    * from 0/1 saturation. This is the calibration layer that turns a
    * classifier margin (the NB logit) into a PROBABILITY the curation
    * funnels can threshold meaningfully.
    *
    * The fit is a driver-convergence loop of the K-Means family: per
    * iteration ONE 1-row aggregation computes the five sufficient
    * statistics (∇ and Hessian entries), the 2×2 Newton solve runs on
    * the driver, and the iteration count is FIXED so the result is a
    * closed-form function of the scores that a SQL oracle replays
    * round-for-round. Cross-engine exactness is the house fixed-point
    * law: p is 9-dp-rounded the moment produced (exp is libm, not
    * correctly rounded), every per-row term is quantized to 1e-9 and
    * summed as exact longs, and (a, b) re-round to 9 dp after each
    * Newton step — both engines then iterate on bitwise-identical
    * doubles. Once the step fixes to 9 dp the update is idempotent,
    * so extra rounds are harmless.
    *
    * Scale: the score frame is lazily checkpointed once (the scores
    * feed `iters`+1 jobs — without the cut the whole upstream
    * training plan would re-run per iteration); each iteration
    * shuffles 5 longs. Returns (a, b).
    */
  def plattFit(
      scored: DataFrame, scoreCol: String, labelCol: String,
      iters: Int = 8): (Double, Double) = {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sc = scored.select(col(scoreCol).as("s"), col(labelCol).as("y"))
      .localCheckpoint(eager = false)
    val nr = sc.agg(
      sum(when(col("y"), 1L).otherwise(0L)),
      sum(when(col("y"), 0L).otherwise(1L))).head()
    val (np, nn) = (nr.getLong(0), nr.getLong(1))
    val tp = (np + 1.0) / (np + 2.0)
    val tn = 1.0 / (nn + 2.0)
    var a = 0.0
    var b = r9(math.log((np + 1.0) / (nn + 1.0)))
    var it = 0
    while (it < iters) {
      val p = round(lit(1.0) / (lit(1.0)
        + exp(-(lit(a) * col("s") + lit(b)))), 9)
      val t = when(col("y"), lit(tp)).otherwise(lit(tn))
      val w = round(p * (lit(1.0) - p), 9)
      def q9(c: Column) = sum(round(c * lit(1e9), 0).cast("long"))
      val g = sc.agg(
        q9(col("s") * (p - t)), q9(p - t),
        q9(col("s") * col("s") * w), q9(col("s") * w), q9(w)).head()
      val (ga, gb) = (g.getLong(0) / 1e9, g.getLong(1) / 1e9)
      val (haa, hab, hbb) =
        (g.getLong(2) / 1e9, g.getLong(3) / 1e9, g.getLong(4) / 1e9)
      val det = haa * hbb - hab * hab
      // singular Hessian = every 9-dp-rounded p saturated to 0/1
      // (perfectly-separated scores drive |a·s+b| past the sigmoid's
      // double range) — fail fast instead of silently returning
      // (NaN, NaN) and poisoning every downstream probability.
      // NaN != 0.0 is TRUE in IEEE, so a NaN det (non-finite scores)
      // would sail through an equality-only guard — test finiteness
      // of det and both gradients explicitly (ADVICE r15).
      require(det != 0.0 && !det.isNaN && !ga.isNaN && !gb.isNaN,
        s"plattFit: singular or non-finite Hessian at iteration $it " +
          "— scores are perfectly separated at 9-dp precision or " +
          "contain NaN/Inf; calibrate on a softer, finite score")
      a = r9(a - (hbb * ga - hab * gb) / det)
      b = r9(b - (haa * gb - hab * ga) / det)
      it += 1
    }
    // the score frame fed its last job — release the checkpoint at the
    // source (the CC-loop device): (a, b) are plain doubles, nothing
    // downstream references sc, and without this the pinned copy lives
    // for the session in library/spec callers
    org.apache.spark.sql.GraftSqlBridge.checkpointRdd(sc)
      .foreach(_.unpersist(blocking = false))
    (a, b)
  }

  /** C4 line-level cleaning (Raffel et al. 2020, arXiv:1910.10683
    * §2.2 — the rule set every web-scale corpus pipeline starts from):
    * a line of a newline-delimited text survives iff it ends in a
    * terminal punctuation mark (`.`/`!`/`?`/`"`), has at least
    * `minWords` space-separated words, and does not mention
    * "javascript" in any capitalization (boilerplate cookie/JS
    * warnings — real pages write "JavaScript"). Pure map-side column
    * expression — the zero-shuffle first pass at any scale.
    */
  def c4KeptLines(text: Column, minWords: Int = 5): Column =
    filter(split(text, "\n"), l =>
      l.rlike("[.!?\"]$") && size(split(l, " ")) >= minWords &&
        !lower(l).contains("javascript"))

  /** C4 document-level guards over the original text and the
    * [[c4KeptLines]]-cleaned text: drop documents containing a curly
    * brace (code), the "lorem ipsum" placeholder in any capitalization
    * (the standard form is "Lorem Ipsum"), or fewer than
    * `minSentences` sentences (terminal punctuation marks) after line
    * cleaning. Returns the keep/drop boolean.
    */
  def c4KeepDoc(text: Column, keptText: Column, minSentences: Int = 3): Column =
    !text.contains("{") && !lower(text).contains("lorem ipsum") &&
      size(regexp_extract_all(keptText, lit("[.!?]"), lit(0))) >= minSentences
}
