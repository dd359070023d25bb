package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text tokenization + dictionary filtering operators.
  *
  * Re-expresses the reference's stage-1 text handling
  * (reference: extract_transform/MapperExtractTransform.java:74-84):
  * lowercase → regex tokenize with sklearn's default token_pattern
  * `(?u)\b\w\w+\b` → drop stopwords → keep only dictionary words,
  * preserving duplicates and order.
  *
  * Everything here is pure Catalyst column expressions (codegen'd,
  * no UDFs). Dictionaries are inlined as literal arrays when small;
  * [[filterByDictDf]] gives the broadcast-join scale path for
  * dictionaries too large to ship as literals.
  */
object TextOps {

  /** sklearn's default `token_pattern`, byte-for-byte
    * (reference: MapperExtractTransform.java:75): tokens are runs of
    * ≥2 word chars. `(?u)` only toggles unicode case handling in
    * java.util.regex; `\w` stays ASCII in both Spark and the DuckDB
    * oracle (RE2), so parity holds.
    */
  val TokenPattern = "(?u)\\b\\w\\w+\\b"

  /** Same pattern without the `(?u)` flag — RE2 (DuckDB) rejects the
    * flag but has identical `\b\w\w+\b` semantics for ASCII text.
    */
  val TokenPatternRe2 = "\\b\\w\\w+\\b"

  /** Lowercase + regex tokenize (reference: MapperExtractTransform.java:74-75). */
  def tokenize(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  /** Drop tokens present in `stopwords` (reference: MapperExtractTransform.java:81,
    * first predicate). Preserves duplicates + order, unlike array_except.
    */
  def removeStopwords(tokens: Column, stopwords: Seq[String]): Column =
    filter(tokens, t => !t.isin(stopwords: _*))

  /** Keep only tokens present in `dict` (reference: MapperExtractTransform.java:81,
    * second predicate — the adjective dictionary). Preserves duplicates + order.
    */
  def keepDictionary(tokens: Column, dict: Seq[String]): Column =
    filter(tokens, t => t.isin(dict: _*))

  /** Full stage-1 token pipeline: tokenize → stopword-filter → dictionary-filter
    * (reference: MapperExtractTransform.java:74-84). Pass `dict = Nil` to skip
    * the dictionary restriction.
    */
  def tokenizeFiltered(text: Column, stopwords: Seq[String], dict: Seq[String]): Column = {
    val noStop = removeStopwords(tokenize(text), stopwords)
    if (dict.isEmpty) noStop else keepDictionary(noStop, dict)
  }

  /** Scale path for big dictionaries: explode tokens, semi-join against
    * the dictionary table, re-assemble in original order. Equivalent to
    * [[keepDictionary]] but the dictionary is a table, not a literal
    * list. Dictionaries at or under `maxBroadcast` rows are broadcast
    * (hash lookup, no shuffle of the exploded tokens); larger ones go
    * through a shuffle left-semi join — force-broadcasting a
    * billion-row dictionary would OOM every executor. The size probe is
    * a `limit(maxBroadcast+1).count()`, which stops scanning at the
    * threshold.
    *
    * @param dictDf single-column DataFrame of dictionary words ("word")
    * @param maxBroadcast largest dictionary row count to broadcast
    */
  def filterByDictDf(
      docs: DataFrame, idCol: String, tokensCol: String, dictDf: DataFrame,
      maxBroadcast: Long = 1000000L): DataFrame = {
    val dict = dictDf.withColumnRenamed(dictDf.columns.head, "token")
    val small = dict.limit((maxBroadcast + 1).min(Int.MaxValue).toInt).count() <= maxBroadcast
    val exploded = docs
      .select(col(idCol), posexplode(col(tokensCol)).as(Seq("pos", "token")))
    val kept = exploded.join(
      if (small) broadcast(dict) else dict,
      Seq("token"), "left_semi")
    val reassembled = kept
      .groupBy(idCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("token")))),
        s => s.getField("token")).as(tokensCol))
    docs.drop(tokensCol).join(reassembled, Seq(idCol), "left")
      .withColumn(tokensCol, coalesce(col(tokensCol), array()))
  }

  /** Email/phone patterns for [[redactPii]] — deliberately built from
    * explicit character classes and bounded quantifiers only (no \b,
    * no lookaround), the regex subset on which Java regex (Spark) and
    * RE2 (DuckDB, Go tooling) agree token-for-token, so redacted
    * output is cross-engine byte-identical (value-level oracle
    * q_pii_scrub).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"

  /** PII redaction — the map-side scrub pass every training corpus
    * goes through before anything else sees it: replace emails and
    * phone numbers with `token`. Pure `regexp_replace` column
    * expression (codegen'd, no shuffle, no UDF); extend by chaining
    * more conservative patterns the same way.
    */
  def redactPii(text: Column, token: String = "<PII>"): Column =
    regexp_replace(regexp_replace(text, EmailRe, token), PhoneRe, token)

  /** Count of substitutions [[redactPii]] performs: emails on the raw
    * text, then phones on the EMAIL-REDACTED text — sequential, exactly
    * like the replacement itself, so a phone-shaped substring inside an
    * email local part (e.g. `555-123-4567@x.co`) counts once, not
    * twice. `token` must match the one passed to [[redactPii]] (the
    * replacement text participates in the second pattern's input).
    */
  def piiCount(text: Column, token: String = "<PII>"): Column =
    regexp_count(text, lit(EmailRe)) +
      regexp_count(regexp_replace(text, EmailRe, token), lit(PhoneRe))

  /** Canonical text normalization — the pre-dedup cleanup pass
    * (C4/CCNet both normalize before hashing): lowercase, collapse
    * every run of non-alphanumeric characters (typographic quotes,
    * dashes, whitespace variants included) to one space, trim.
    * Exact-dup hashing over the NORMALIZED form catches re-encoded/
    * re-punctuated copies that byte-level md5 misses. Pure codegen
    * column expression — zero shuffle, stream-safe.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Deterministic T5-style span corruption (Raffel et al., JMLR 2020
    * §3.1.4 — the masked-span denoising objective): token positions
    * are blocked into aligned windows of `span`; window w of document
    * `id` is masked iff the keyed hash md5(salt_id_w) mod 64 falls
    * below `rate64` (the stratified-sample device — a pure function
    * of (salt, id, w), no RNG state, identical in any engine). The
    * inputs sequence replaces each masked window with its ordinal
    * sentinel `<extra_id_K>`; the targets sequence is each sentinel
    * followed by the tokens it hid. Returns (inputs, targets,
    * n_masked) struct column.
    *
    * Scale: ONE map-side projection — no explode, no shuffle, no
    * per-doc window function; the corpus never leaves its input
    * partitions, and re-running with the same salt reproduces the
    * corruption bit-for-bit (the property that makes checkpointed
    * multi-epoch training data auditable).
    */
  def spanCorrupt(
      id: Column, toks: Column, span: Int = 3, rate64: Int = 22,
      salt: String = "sc1"): Column = {
    val n = size(toks)
    val nWins = ((n + span - 1) / span).cast("int")
    def hashed(w: Column): Column =
      conv(substring(md5(concat_ws("_", lit(salt), id.cast("string"),
        w.cast("string"))), 1, 8), 16, 10).cast("long") % 64 < rate64
    val wins = when(n > 0, sequence(lit(0), nWins - 1)).otherwise(array().cast("array<int>"))
    val maskedW = filter(wins, w => hashed(w))
    def sentinel(k: Column): Column =
      concat(lit("<extra_id_"), (k - 1).cast("string"), lit(">"))
    val inputs = flatten(transform(sequence(lit(0), n - 1),
      i => {
        val w = (i / span).cast("int")
        when(not(hashed(w)), array(element_at(toks, i + 1)))
          .when(i % span === 0, array(sentinel(array_position(maskedW, w))))
          .otherwise(array().cast("array<string>"))
      }))
    val targets = flatten(transform(maskedW,
      w => concat(array(sentinel(array_position(maskedW, w))),
        slice(toks, w * span + 1, least(lit(span), n - w * span)))))
    when(n > 0, struct(
        array_join(inputs, " ").as("inputs"),
        array_join(targets, " ").as("targets"),
        size(maskedW).as("n_masked")))
      .otherwise(struct(lit("").as("inputs"), lit("").as("targets"),
        lit(0).as("n_masked")))
  }

  /** Sliding-window document chunking for context-length-bounded
    * training: windows of `size` tokens starting every
    * `size - overlap` tokens; the final window may be shorter but is
    * never empty. Pure column expression — (chunk_id, chunk tokens)
    * pairs per doc; explode downstream. Docs with no tokens produce
    * zero chunks.
    */
  def chunkTokens(tokens: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    // chunk starts: 1, 1+stride, ... while start <= n (last partial kept).
    // For n=0 the count formula yields 1 and the trailing filter drops
    // the empty window — a `sequence(0, -1)` guard would instead produce
    // a DESCENDING [0,-1] (Spark auto-steps) and two bogus chunks.
    val nChunks =
      ((org.apache.spark.sql.functions.size(tokens) - lit(1)) / lit(stride)).cast("int") + 1
    filter(
      transform(sequence(lit(0), nChunks - 1),
        i => struct(i.as("chunk_id"), slice(tokens, i * stride + 1, lit(size)).as("toks"))),
      c => org.apache.spark.sql.functions.size(c.getField("toks")) > 0)
  }

  /** GPT-style sequence packing: concatenate all docs in `orderCol`
    * order and cut fixed `budget`-token sequences — each doc gets its
    * global token offset (exclusive running sum) and the sequence ids
    * its span covers. One global-window pass — the oracle-parity form;
    * [[packSequencesAtScale]] is the same contract without the
    * single-partition stage. Output columns added: `tok_offset`,
    * `seq_first`, `seq_last`.
    */
  def packSequences(
      docs: DataFrame, orderCol: String, nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .withColumn("tok_offset", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      // integer division: double division of large offsets loses ulps
      .withColumn("seq_first", expr(s"tok_offset div $budget"))
      .withColumn("seq_last",
        when(col(nTokensCol) === 0, col("seq_first"))
          .otherwise(expr(s"(tok_offset + $nTokensCol - 1) div $budget")))
  }

  /** [[packSequences]] without the single-partition window: range
    * repartition on `orderCol`, per-partition token totals → cumulative
    * offsets (a partition-count-row driver reduction, cheap at any
    * scale), then a local running sum per partition — the same
    * construction as IdOps.sequentialIdsAtScale. Identical output
    * (parity-tested).
    */
  def packSequencesAtScale(
      docs: DataFrame, orderCol: String, nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val spark = docs.sparkSession
    val sorted = docs
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .persist()
    val counts = sorted
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum(col(nTokensCol).cast("long")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = (0 until nParts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val nIdx = sorted.schema.fieldIndex(nTokensCol)
    val outSchema = org.apache.spark.sql.types.StructType(sorted.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("tok_offset",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seq_first",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seq_last",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bOffsets.value(pid)
      it.map { r =>
        val n = r.get(nIdx) match {
          case i: Int => i.toLong
          case l: Long => l
          case other => other.asInstanceOf[Number].longValue()
        }
        val off = running
        running += n
        val first = off / budget
        val last = if (n == 0) first else (off + n - 1) / budget
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(off, first, last))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Host of a URL, canonicalized for dedup keying: lowercased, default
    * ports (:80/:443) and a leading "www." stripped. Empty string when
    * the input has no scheme://host shape. Pure map-side regex — the
    * per-DOMAIN partitioning key a crawl pipeline shards on.
    */
  def urlHost(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*", "")
    val host = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    regexp_replace(regexp_replace(host, ":(80|443)$", ""), "^www\\.", "")
  }

  /** Apex-domain heuristic: the last two dot-labels of [[urlHost]]
    * ("a.b.example.com" -> "example.com"). NOT public-suffix-list
    * aware — "example.co.uk" yields "co.uk"; ship a PSL side-input
    * dict (the [[tokenizeFiltered]] dict device) where that matters.
    */
  def urlApex(u: Column): Column =
    regexp_extract(urlHost(u), "([^.]+\\.[^.]+)$", 1)

  /** Common two-label public suffixes (curated subset of the Mozilla
    * Public Suffix List — the ccTLD second-level registries under
    * which "last two labels" is a REGISTRY, not a registrant). Used by
    * [[urlApexPsl]]; swap in the full PSL as a side-input list where
    * completeness matters (wildcard/exception PSL rules are out of
    * scope for this subset).
    */
  val PublicSuffixes2Ld: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "ad.jp", "ed.jp", "gr.jp", "lg.jp", "com.au", "net.au", "org.au",
    "edu.au", "gov.au", "asn.au", "id.au", "com.br", "net.br", "org.br",
    "gov.br", "edu.br", "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "ind.in", "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "com.cn",
    "net.cn", "org.cn", "gov.cn", "edu.cn", "com.mx", "org.mx", "net.mx",
    "gob.mx", "edu.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "org.za", "net.za", "co.kr", "or.kr", "com.my", "com.id",
    "co.id", "com.ph", "com.vn", "com.eg", "com.sa", "com.pk", "com.ng",
    "co.th", "in.th", "co.il", "org.il", "com.ua", "com.pl", "net.pl",
    "org.pl", "com.ru", "com.co", "com.pe", "com.ve", "co.ve", "com.ec",
    "com.uy", "com.do", "com.gt", "com.py", "com.bo", "com.ni", "com.sv",
    "com.hn", "com.pa")

  /** PSL-aware registrable-domain apex — the [[urlApex]] caveat closed
    * for the common ccTLD registries: when the last two host labels
    * are themselves a public suffix ("co.uk"), the registrable domain
    * is the last THREE labels ("example.co.uk"), else the last two. A
    * bare-suffix host ("co.uk") has no registrant label and falls back
    * to itself. Pure map-side regex + literal `isin` probe over the
    * driver-held suffix list — zero shuffle, zero joins; at full-PSL
    * size the list rides as one broadcast set through the
    * [[filterByDictDf]] device instead.
    */
  def urlApexPsl(u: Column,
      suffixes: Seq[String] = PublicSuffixes2Ld): Column = {
    val host = urlHost(u)
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(suffixes: _*) && length(last3) > length(last2), last3)
      .otherwise(last2)
  }

  /** URL canonicalization for near-dup URL keying — the standard crawl
    * pipeline normalization [[normalizeText]] does not cover: scheme
    * unified to http, host lowercased with default ports and "www."
    * stripped, fragment dropped, ONE trailing path slash stripped
    * (path case PRESERVED — paths are case-sensitive), tracking query
    * params removed (utm_*, fbclid, gclid, msclkid, ref) and the rest
    * SORTED so param order never splits a dup group. Pure map-side
    * regex/array expressions, zero shuffle.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*", "")
    val host = regexp_replace(regexp_replace(
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      ":(80|443)$", ""), "^www\\.", "")
    val path0 = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "(.)/$", "$1"))
    val q0 = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(q0, "&"), p =>
      !(p === "" || p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid|ref)=")))), "&")
    concat(lit("http://"), host, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Word stream for [[bpeLearn]]: the q_bpe_tokens pre-tokenizer core
    * (GPT-2's segmentation rule reduced to letter runs / digit runs /
    * other-symbol runs), one row per word OCCURRENCE — BPE counts are
    * frequency-weighted, so duplicates must survive.
    */
  def bpeWords(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0))

  /** Initial BPE symbol sequence of one word: every character is its
    * own symbol, rendered as a TWO-space-delimited, two-space-padded
    * string ("ab" -> "␣␣a␣␣b␣␣"). The double delimiter is what makes a
    * merge a plain left-to-right `replace`: the pattern "␣X␣␣Y␣" takes
    * one space from each boundary, so ADJACENT disjoint occurrences
    * ("x y x y") don't swallow each other's delimiter, and a pattern
    * can never match inside a longer symbol ("x ya" vs pair (x,y)).
    * Both Spark's and DuckDB's `replace` scan left-to-right
    * non-overlapping — exactly the classic BPE merge pass (newly
    * formed symbols don't re-trigger within the same pass).
    */
  def bpeInitSeq(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "))

  /** BPE merge learning (Sennrich, Haddow & Birch 2016, "Neural
    * Machine Translation of Rare Words with Subword Units" — the
    * byte-pair-encoding vocab induction every GPT-style tokenizer is
    * trained with). Each round: count adjacent symbol pairs over all
    * word occurrences, pick the most frequent (ties: lexicographically
    * smallest pair — an engine-independent boundary), merge it
    * corpus-wide, repeat. Returns (iter, l, r, cnt) — the learned
    * merge table in order.
    *
    * Scale: one shuffle per round (the pair-count groupBy with
    * map-side partial aggregation); the winning pair is a 1-row
    * driver collect (the k-row-scalar family — kmeans centroids,
    * IDF table), and the merge itself is a map-side literal `replace`.
    * That is exactly how distributed BPE trainers work: counts are
    * distributed, the vocab lives on the driver. Lineage grows one
    * narrow `replace` per round — checkpoint every ~50 rounds when
    * learning real 30k-merge vocabs (same remedy as
    * [[graft.ops.KMeansOps]] iteration).
    */
  def bpeLearn(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    require(iters >= 1)
    val spark = docs.sparkSession
    // every round's pair-count action re-derives the word stream from
    // the scan; cache the explode once (round i still recomputes its
    // i cheap map-side replaces on top of the cached stream — the
    // scan + regex explode is the expensive part)
    val base = docs
      .select(explode(bpeWords(col(textCol))).as("w"))
      .select(bpeInitSeq(col("w")).as("seq"))
      .persist()
    var cur = base
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var it = 1
    var exhausted = false
    try while (it <= iters && !exhausted) {
      val syms = cur.select(split(trim(col("seq")), "  ").as("s"))
        .filter(size(col("s")) >= 2) // sequence(1,0) would DESCEND
      val pairs = syms.select(explode(transform(
        sequence(lit(1), size(col("s")) - 1),
        i => struct(element_at(col("s"), i).as("l"),
          element_at(col("s"), i + lit(1)).as("r")))).as("p"))
      val top = pairs.groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((it, l, r, cnt))
        cur = cur.select(
          replace(col("seq"), lit(s" $l  $r "), lit(s" $l$r ")).as("seq"))
        it += 1
      }
    }
    // finally, not straight-line: a mid-loop failure (executor OOM, job
    // cancel) must not leave the corpus-scale word stream pinned in a
    // session shared with ~190 other queries (r11 review finding)
    finally base.unpersist(blocking = false)
    import spark.implicits._
    learned.result().toDF("iter", "l", "r", "cnt")
      .select(col("iter").cast("int"), col("l"), col("r"), col("cnt"))
  }

  /** BPE ENCODING under a learned merge table — the apply half of the
    * Sennrich loop (what the tokenizer does to the corpus at training
    * time, millions of times more often than learning runs). Re-learns
    * `iters` merges on `docs` (a k-row driver table), then tokenizes
    * every document: per doc, the char-symbol count before any merge
    * (`n_chars` — what a byte-level tokenizer would emit) and the
    * symbol count after the merges (`n_bpe`), i.e. the compression the
    * vocab buys. Zero-word docs report (0, 0).
    *
    * Scale: learning is [[bpeLearn]] (one shuffle + 1-row collect per
    * round); encoding is ONE map-side chain of literal `replace`s in
    * merge-rank order over the exploded word stream — merges ride as
    * driver literals, the corpus never joins anything — then one
    * groupBy(doc) count shuffle and a doc-table left join to restore
    * wordless docs. At a real 30k-merge vocab the replace chain
    * becomes a scalar loop in one codegen'd expression or a
    * mapPartitions trie pass; the plan shape (broadcast vocab,
    * map-side encode, no corpus self-join) is already the production
    * one.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                iters: Int): DataFrame = {
    val merges = bpeLearn(docs, textCol, iters)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2)))
    var seqd = docs
      .select(col(idCol), explode(bpeWords(col(textCol))).as("w"))
      .select(col(idCol), length(col("w")).as("wlen"),
        bpeInitSeq(col("w")).as("seq"))
    for ((l, r) <- merges)
      seqd = seqd.withColumn("seq",
        replace(col("seq"), lit(s" $l  $r "), lit(s" $l$r ")))
    val counts = seqd
      .select(col(idCol), col("wlen"),
        size(split(trim(col("seq")), "  ")).as("ntok"))
      .groupBy(idCol)
      .agg(sum("wlen").as("__nc"), sum("ntok").as("__nb"))
    docs.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nc"), lit(0L)).as("n_chars"),
        coalesce(col("__nb"), lit(0L)).as("n_bpe"))
  }
}
