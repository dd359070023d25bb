package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) tokenizer training and encoding — Kudo
  * 2018 ("Subword Regularization", arXiv:1804.10959) via Viterbi-EM
  * (VERDICT r16 next #3): the tokenizer family behind T5/LLaMA-style
  * vocabularies. BPE (TextOps.bpeLearn) grows a vocabulary bottom-up
  * by greedy merges; the unigram LM goes the other way — seed a LARGE
  * candidate vocabulary from substring counts, fit piece
  * probabilities by EM over the corpus, and serve with Viterbi
  * (max-probability) segmentation.
  *
  * House exactness (the plattFit fixed-round device): a FIXED number
  * of EM rounds, every log-probability quantized to 1e-9 fixed point
  * the moment produced, every count an exact long — so each round is
  * a closed-form function of the corpus that a generated SQL oracle
  * replays round-for-round, and segmentation scores are exact
  * integers with a deterministic tie-break (highest score, then
  * SHORTEST final piece — spelled identically in both engines).
  * The E-step is hard (Viterbi) rather than full forward-backward:
  * the standard "Viterbi EM" simplification, and the one whose
  * per-round state is a pure argmax — no float marginals to drift
  * cross-engine. The vocabulary is FIXED after seeding (single chars
  * always kept so every word stays segmentable; Laplace smoothing
  * keeps zero-count pieces finite) — real SentencePiece prunes
  * between rounds, but pruning is just a WHERE on the same counts
  * and would make the oracle's round chain conditional.
  *
  * Scale: everything runs at DISTINCT-WORD granularity — the frame
  * every stage touches is (word, freq), vocabulary-sized under
  * Heaps' law, NOT corpus-sized; the corpus is touched once to count
  * word frequencies (one shuffle) and never again. The DP fold per
  * word is O(len·MaxPieceLen) interpreted-HOF work over at most
  * |vocab| rows per round — constant in corpus size. Encoding a
  * corpus at serving time is the same per-distinct-word DP
  * broadcast-joined back onto the token stream.
  */
object Unigram {

  /** Longest candidate piece. 4 covers the classic char-ngram range;
    * the DP and the generated oracle are parameterized by it. */
  val MaxPieceLen = 4

  /** Distinct-word frame (word, freq) from a text column, with the
    * SentencePiece word-boundary marker prefixed (ASCII '_' standing
    * in for U+2581 so the fixture survives every normalization layer
    * and the DuckDB oracle byte-for-byte): pieces that START a word
    * ("_ca") are distinct from word-internal ones ("ca") — the
    * distinction that lets the LM learn prefixes vs suffixes.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokenize(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("freq"))
      .select(concat(lit("_"), col("t")).as("word"), col("freq"))

  /** Seed piece counts: every substring of length 1..[[MaxPieceLen]]
    * of every word, occurrence-weighted by word frequency — Kudo's
    * "all substrings" seeding restricted to the piece-length cap.
    * One explode + groupBy over the distinct-word frame.
    */
  def seedCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(flatten(
      transform(sequence(lit(1), length(col("word"))), i =>
        transform(
          sequence(lit(1), least(lit(MaxPieceLen), length(col("word")) - i + 1)),
          j => col("word").substr(i, j))))).as("piece"))
      .groupBy(col("piece")).agg(sum("freq").as("cnt"))

  /** Fixed vocabulary: ALL single characters (every word must stay
    * segmentable — the coverage guarantee real SentencePiece enforces
    * the same way) plus the top `maxMulti` multi-char substrings by
    * seed count, ties by piece — a deterministic function of the
    * corpus (the nbLogOdds9 cap device; TakeOrdered, never a global
    * sort).
    */
  def vocab(seed: DataFrame, maxMulti: Int): DataFrame =
    seed.filter(length(col("piece")) === 1)
      .unionByName(seed.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(maxMulti))

  /** Initial model from raw seed counts: lp9 = round(ln(cnt/total)·1e9)
    * over the selected vocabulary. */
  def initModel(voc: DataFrame): DataFrame = {
    val tot = voc.agg(sum("cnt").as("tot"))
    voc.crossJoin(broadcast(tot)).select(col("piece"),
      round(log(col("cnt").cast("double") / col("tot")) * lit(1e9), 0)
        .cast("long").as("lp9"))
  }

  /** Viterbi segmentation of each word under `model` (piece, lp9):
    * returns (word, freq, pieces, score9) where pieces is the
    * max-score segmentation (ties: shortest piece at each DP step)
    * and score9 its exact fixed-point log-probability.
    *
    * Shape: candidate arms (end position i, length j, lp9) come from
    * one explode + broadcast model join; the DP itself is a LINEAR
    * fold over word positions (the hilbertValueN lesson — state as a
    * growing array, expression size linear in word length), and the
    * backtrack a second bounded fold. Both run per DISTINCT word.
    */
  def viterbiSegment(words: DataFrame, model: DataFrame): DataFrame = {
    val pos = words.select(col("word"), col("freq"),
      explode(flatten(transform(sequence(lit(1), length(col("word"))), i =>
        transform(sequence(lit(1), least(lit(MaxPieceLen), i)), j =>
          struct(i.as("i"), j.as("j"),
            col("word").substr(i - j + 1, j).as("piece")))))).as("c"))
      .select(col("word"), col("freq"), col("c.i").as("i"),
        col("c.j").as("j"), col("c.piece").as("piece"))
    val cands = pos.join(broadcast(model.select(col("piece"), col("lp9"))),
        Seq("piece"))
      .groupBy(col("word"), col("freq"))
      .agg(collect_list(struct(col("i"), col("j"), col("lp9"))).as("cs"))
    // forward DP: dp(0) = 0; dp(i) = max over arms (i, j) of
    // dp(i−j) + lp9, ties to the SMALLEST j — max of struct(s, −j),
    // the argmax-with-tie-break the oracle spells as first-arm-wins.
    // Single-char pieces are always in the vocabulary, so position i
    // always has at least the j=1 arm: the fold is total.
    val dp = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(lit(0L).as("s"), lit(0).as("j"))),
      (acc: Column, i: Column) => {
        val best = array_max(transform(
          filter(col("cs"), c => c.getField("i") === i),
          c => struct(
            (element_at(acc, (i - c.getField("j") + 1))
              .getField("s") + c.getField("lp9")).as("s"),
            (-c.getField("j")).as("nj"))))
        concat(acc, array(struct(best.getField("s").as("s"),
          (-best.getField("nj")).as("j"))))
      })
    // backtrack: walk pos -> pos − j, PREPENDING pieces so the result
    // reads in word order; at most len(word) steps, fold stays linear
    val withDp = cands.withColumn("dp", dp)
    val seg = aggregate(
      sequence(lit(1), length(col("word"))),
      struct(length(col("word")).as("pos"),
        array().cast("array<string>").as("ps")),
      (st: Column, _: Column) => {
        val p = st.getField("pos")
        val j = element_at(col("dp"), p + 1).getField("j")
        when(p > 0, struct((p - j).as("pos"),
          concat(array(col("word").substr(p - j + 1, j)),
            st.getField("ps")).as("ps")))
          .otherwise(st)
      })
    withDp.select(col("word"), col("freq"),
      seg.getField("ps").as("pieces"),
      element_at(col("dp"), length(col("word")) + 1).getField("s").as("score9"))
  }

  /** M-step: piece counts from the hard segmentations (freq-weighted
    * exact longs), Laplace-smoothed log-probabilities over the FIXED
    * vocabulary — zero-count pieces keep a finite floor, so the round
    * chain is total and the oracle needs no conditional pruning.
    * Returns (piece, cnt, lp9).
    */
  def reestimate(seg: DataFrame, voc: DataFrame): DataFrame = {
    val cnt = seg.select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum("freq").as("c"))
    val tv = cnt.agg(sum("c").as("tot"))
    val vn = voc.agg(count(lit(1)).as("v"))
    voc.select(col("piece")).join(cnt, Seq("piece"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tv)).crossJoin(broadcast(vn))
      .select(col("piece"), col("c").as("cnt"),
        round(log((col("c") + lit(1.0)) / (col("tot") + col("v"))) * lit(1e9), 0)
          .cast("long").as("lp9"))
  }

  /** Full Viterbi-EM training: seed → fixed `rounds` of segment +
    * re-estimate → final (piece, cnt, lp9), cnt from the last E-step.
    * The distinct-word frame and the per-round model are tiny
    * (vocabulary-sized) — localCheckpoint cuts keep each round's plan
    * from re-deriving every previous round (the K-Means loop shape).
    *
    * Run-scoped DfMemo (r17 optimization round, the bpeLearn/
    * lang_model device): q_unigram_learn and q_unigram_encode both
    * consume the identical trained model, and without the memo each
    * re-ran the full 2-round EM (~2.3 s each at sf0.1). The memo key
    * carries every parameter; in-memory fixtures (spec inputs) have no
    * backing files and bypass the memo, so tests always train fresh.
    * Billed as `substrate:unigram_model` outside any query's window.
    */
  def train(words: DataFrame, rounds: Int, maxMulti: Int): DataFrame =
    DfMemo.cached(words, s"unigramTrain:$rounds:$maxMulti") {
      require(rounds >= 1)
      val w = words.localCheckpoint(eager = false)
      val voc = vocab(seedCounts(w), maxMulti).localCheckpoint(eager = false)
      var model = initModel(voc)
      var out: DataFrame = null
      for (_ <- 1 to rounds) {
        out = reestimate(viterbiSegment(w, model), voc)
        model = out.select(col("piece"), col("lp9"))
          .localCheckpoint(eager = false)
      }
      out
    }
}
