package graft.ops

import org.apache.spark.sql.Column
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
  def langId(tokens: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerHits(tokens, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
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

  /** Whitespace token count — `size(split)` on the raw text (counts
    * empty string as 1 token on empty text, like split semantics in
    * both engines; callers guard if needed).
    */
  def wsTokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** Ordered-content fingerprint: md5 over the exact token sequence
    * (vs Dedup.wordSetFingerprint which is set-based).
    */
  def contentFingerprint(tokens: Column): Column = md5(concat_ws(" ", tokens))
}
