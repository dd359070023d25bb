package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, IdOps, TextOps, TextStats}
import graft.Dictionaries.{Stopwords => Stop}

/** Specs for the r14 corpus-hygiene surface: C4 line/doc filters,
  * Luhn/IPv4 PII validation, trained Naive Bayes, Efraimidis–Spirakis
  * weighted sampling, triangle counting.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("c4KeptLines/c4KeepDoc: each rule fires on a constructed page") {
    val page = Seq(
      "This line has five words here.",   // kept
      "Too short line.",                  // dropped: < 5 words
      "No terminal punctuation on this line at all", // dropped: no punct
      "Please enable JavaScript to view this content.", // dropped: case-insensitive
      "Another perfectly fine sentence with enough words!", // kept
      "A third good sentence keeps the document alive?"     // kept
    ).mkString("\n")
    val df = Seq((1L, page)).toDF("id", "text")
      .select(col("id"), TextStats.c4KeptLines(col("text")).as("kept"),
        col("text"))
    val kept = df.select("kept").as[Seq[String]].head()
    assert(kept.size == 3 && kept.head.startsWith("This line"))
    // 3 sentences survive -> keep; strip one -> < 3 sentences -> drop
    val keep = df.select(TextStats.c4KeepDoc(col("text"),
      array_join(col("kept"), "\n"))).as[Boolean].head()
    assert(keep)
    val two = kept.take(2).mkString("\n")
    val drop = Seq((1L, page)).toDF("id", "text")
      .select(TextStats.c4KeepDoc(col("text"), lit(two))).as[Boolean].head()
    assert(!drop)
    // doc-level hard guards
    for (bad <- Seq("lorem ipsum dolor sit amet etc.",
        "Lorem Ipsum in its standard capitalization.",
        "function() { return; }")) {
      val t = page + "\n" + bad
      val d = Seq((1L, t)).toDF("id", "text")
        .select(TextStats.c4KeepDoc(col("text"),
          array_join(TextStats.c4KeptLines(col("text")), "\n")))
        .as[Boolean].head()
      assert(!d, s"doc guard must fire on: $bad")
    }
  }

  test("luhnOk: parity with Spark's builtin luhn_check over fixtures and fuzz") {
    // classic vectors: 4532015112830366 valid, flip last digit -> invalid,
    // 79927398713 the textbook Luhn example
    // non-digit / empty inputs must give FALSE, not null (ADVICE r14:
    // the per-char int cast nulls on a letter and would otherwise
    // propagate three-valued logic to raw-string callers)
    val fixed = Seq("4532015112830366", "4532015112830367", "79927398713",
      "0000000000000000", "1234567812345670",
      "4532a15112830366", "4532-0151-1283-0366", "", " 79927398713", "x")
    val fuzz = (0 until 500).map(i => ((i.toLong * 7919 + 12345) * 104729)
      .toString.reverse.padTo(16, '0').reverse.mkString)
    val df = (fixed ++ fuzz).toDF("s")
      .select(col("s"), TextOps.luhnOk(col("s")).as("mine"),
        call_function("luhn_check", col("s")).as("builtin"))
    assert(df.filter(col("mine") =!= col("builtin")).count() == 0)
    assert(df.filter(col("mine").isNull).count() == 0,
      "luhnOk must be two-valued on every input")
    val m = df.filter(col("s").isin(fixed: _*))
      .select("s", "mine").as[(String, Boolean)].collect().toMap
    assert(m("4532015112830366") && !m("4532015112830367") && m("79927398713"))
    assert(!m("4532a15112830366") && !m("4532-0151-1283-0366") &&
      !m("") && !m(" 79927398713") && !m("x"))
  }

  test("ibanOk: ISO 7064 mod-97 vectors; two-valued on any input; candidates are shape-gated") {
    val rows = Seq(
      "GB82WEST12345698765432" -> true,   // textbook ISO example
      "DE89370400440532013000" -> true,   // canonical DE example
      "GB82WEST12345698765433" -> false,  // last digit flipped
      "GB83WEST12345698765432" -> false,  // check digits corrupted
      "gb82west12345678987654" -> false,  // lowercase: shape-gated out
      "GB82WEST1234" -> false,            // too short for the envelope
      "not an iban at all" -> false,
      "" -> false)
    val got = rows.map(_._1).toDF("s")
      .select(col("s"), TextOps.ibanOk(col("s")).as("ok"))
      .as[(String, Boolean)].collect().toMap
    // two-valued on every input: the non-nullable typed collect above
    // would have thrown on a null
    rows.foreach { case (s, exp) => assert(got(s) == exp, s) }
    // candidates: shape only, embedded in text; the checksum filter
    // then keeps exactly the valid one
    val t = "pay GB82WEST12345698765432 not GB82WEST12345698765433 nor de89370400440532013000"
    val cands = Seq(t).toDF("t")
      .select(TextOps.ibanCandidates(col("t"))).as[Seq[String]].head()
    assert(cands == Seq("GB82WEST12345698765432", "GB82WEST12345698765433"))
    val valid = Seq(t).toDF("t")
      .select(filter(TextOps.ibanCandidates(col("t")), TextOps.ibanOk _))
      .as[Seq[String]].head()
    assert(valid == Seq("GB82WEST12345698765432"))
  }

  test("ipv4Valid: octet range enforced; candidates keep shape only") {
    val rows = Seq("10.0.0.1" -> true, "255.255.255.255" -> true,
      "256.1.1.1" -> false, "1.299.3.4" -> false, "0.0.0.0" -> true)
    val got = rows.map(_._1).toDF("ip")
      .select(col("ip"), TextOps.ipv4Valid(col("ip")).as("ok"))
      .as[(String, Boolean)].collect().toMap
    rows.foreach { case (ip, exp) => assert(got(ip) == exp, ip) }
    val cands = Seq("x 1.2.3.4 y 300.300.300.300 z 1.2.3 w").toDF("t")
      .select(TextOps.ipv4Candidates(col("t"))).as[Seq[String]].head()
    assert(cands == Seq("1.2.3.4", "300.300.300.300")) // shape only; 1.2.3 not
  }

  test("redactAll: folds every validated match out of the text") {
    val t = "pay 4532015112830366 or 4532015112830367 at 10.0.0.1"
    val out = Seq(t).toDF("t")
      .select(TextOps.redactAll(col("t"),
        filter(TextOps.cardCandidates(col("t")), TextOps.luhnOk _),
        "<CARD>")).as[String].head()
    assert(out == "pay <CARD> or 4532015112830367 at 10.0.0.1")
    val none = Seq("no digits here").toDF("t")
      .select(TextOps.redactAll(col("t"), TextOps.cardCandidates(col("t")),
        "<CARD>")).as[String].head()
    assert(none == "no digits here")
    // anchoring: the valid card occurs INSIDE a longer (Luhn-invalid)
    // 18-digit order id — the embedded occurrence must survive
    val embedded = "pay 4532015112830366 ref 845320151128303662"
    val out2 = Seq(embedded).toDF("t")
      .select(TextOps.redactAll(col("t"),
        filter(TextOps.cardCandidates(col("t")), TextOps.luhnOk _),
        "<CARD>")).as[String].head()
    assert(out2 == "pay <CARD> ref 845320151128303662", out2)
    // same for IPs: redacting 1.2.3.4 must not eat into 11.2.3.45
    val ips = "x 1.2.3.4 y 11.2.3.45"
    val out3 = Seq(ips).toDF("t")
      .select(TextOps.redactAll(col("t"),
        filter(TextOps.ipv4Candidates(col("t")),
          ip => ip === "1.2.3.4"), "<IP>")).as[String].head()
    assert(out3 == "x <IP> y 11.2.3.45", out3)
  }

  test("nbTrainScore: hand-computed log-odds on a 4-doc fixture") {
    // pos docs contain "good", neg docs contain "bad"; "meh" is in one of each
    val docs = Seq(
      (1L, Seq("good", "meh"), true), (2L, Seq("good"), true),
      (3L, Seq("bad", "meh"), false), (4L, Seq("bad"), false)
    ).toDF("id", "toks", "y")
    val got = TextStats.nbTrainScore(docs, "id", "toks", "y")
      .as[(Long, Boolean, Double)].collect().map(t => t._1 -> t._3).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val loGood = r9(math.log(3.0 / 4.0) - math.log(1.0 / 4.0)) // c1=2,c0=0,n=2,2
    val loBad = r9(math.log(1.0 / 4.0) - math.log(3.0 / 4.0))
    val loMeh = r9(math.log(2.0 / 4.0) - math.log(2.0 / 4.0)) // 0
    val prior = r9(math.log(3.0 / 3.0)) // 0
    assert(math.abs(got(1L) - (prior + loGood + loMeh)) < 1e-9)
    assert(math.abs(got(4L) - (prior + loBad)) < 1e-9)
    assert(got(1L) > 0 && got(3L) < 0)
    // docs with no features score exactly the prior
    val empty = Seq((1L, Seq.empty[String], true), (2L, Seq("x"), false))
      .toDF("id", "toks", "y")
    val e = TextStats.nbTrainScore(empty, "id", "toks", "y")
      .as[(Long, Boolean, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(math.abs(e(1L) - r9(math.log(2.0 / 2.0))) < 1e-9)
  }

  test("plattFit: recovers a known logistic, orientation positive, calibration lowers log-loss; bins are honest") {
    // 1. ground-truth recovery: y ~ Bernoulli(sigmoid(2s + 1)) on a
    //    fixed seed — the fitted (a, b) must land near the truth
    val rnd = new scala.util.Random(42)
    val synth = (1 to 4000).map { _ =>
      val s = rnd.nextDouble() * 6 - 3
      val pTrue = 1.0 / (1.0 + math.exp(-(2.0 * s + 1.0)))
      (s, rnd.nextDouble() < pTrue)
    }.toDF("s", "y")
    val (a, b) = TextStats.plattFit(synth, "s", "y")
    assert(math.abs(a - 2.0) < 0.3 && math.abs(b - 1.0) < 0.3, s"($a, $b)")
    // 2. on the real NB logits: a > 0 (orientation preserved) and the
    //    calibrated probabilities beat the raw sigmoid(logit) on
    //    log-loss — the whole point of the calibration layer
    val lab = Tables.table(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
      .withColumn("y", TextStats.qualityScore(col("toks"), Stop) >= 0.62)
    val scored = TextStats.nbTrainScore(lab, "doc_id", "toks", "y", maxVocab = 20)
      .select(col("nb_logit").as("s"), col("y")).localCheckpoint(eager = false)
    val (ca, cb) = TextStats.plattFit(scored, "s", "y")
    assert(ca > 0, s"orientation must be preserved, got a=$ca")
    def logLoss(aa: Double, bb: Double): Double = {
      val rows = scored.as[(Double, Boolean)].collect()
      rows.map { case (s, y) =>
        val p = math.min(1 - 1e-12, math.max(1e-12,
          1.0 / (1.0 + math.exp(-(aa * s + bb)))))
        if (y) -math.log(p) else -math.log(1 - p)
      }.sum / rows.length
    }
    assert(logLoss(ca, cb) < logLoss(1.0, 0.0),
      "calibrated log-loss must beat the raw sigmoid of the logit")
    // 3. reliability bins from the gated query shape: counts cover the
    //    corpus, mean_p and frac_pos are probabilities, and the exact
    //    fixed-point mean is consistent with its bin's bounds
    val pCol = round(lit(1.0) / (lit(1.0)
      + exp(-(lit(ca) * col("s") + lit(cb)))), 9)
    val bins = scored.select(col("y"), pCol.as("p"))
      .groupBy(least(floor(col("p") * 10).cast("int"), lit(9)).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("npos"),
        sum(round(col("p") * lit(1e9), 0).cast("long")).as("sp9"))
      .select(col("bin"), col("n"),
        (col("sp9") / lit(1e9) / col("n")).as("mean_p"),
        (col("npos") / col("n").cast("double")).as("frac_pos"))
      .as[(Int, Long, Double, Double)].collect()
    assert(bins.map(_._2).sum == scored.count())
    bins.foreach { case (bin, _, mp, fp) =>
      assert(mp >= bin / 10.0 - 1e-9 && mp <= math.min(1.0, (bin + 1) / 10.0) + 1e-9,
        s"bin $bin mean_p $mp outside its bounds")
      assert(fp >= 0.0 && fp <= 1.0)
    }
  }

  test("weightedSampleK: k=n returns all; inclusion tracks weight") {
    val df = (1L to 40L).map(i => (i, if (i == 1L) 1000L else 1L))
      .toDF("id", "w")
    assert(IdOps.weightedSampleK(df, "id", "w", k = 40).count() == 40)
    // row 1 carries ~96% of the total weight: across 50 salts it must
    // win first place most of the time (binomial p~0.96, 50 trials —
    // <40 wins has probability ~1e-9), and a uniform-weight control
    // must not show that dominance.
    val wins = (0 until 50).count { s =>
      IdOps.weightedSampleK(df, "id", "w", k = 1, salt = s"t$s")
        .select("id").as[Long].head() == 1L
    }
    assert(wins >= 40, s"heavy row won only $wins/50")
    val uni = (1L to 40L).map(i => (i, 1L)).toDF("id", "w")
    val uwins = (0 until 50).count { s =>
      IdOps.weightedSampleK(uni, "id", "w", k = 1, salt = s"t$s")
        .select("id").as[Long].head() == 1L
    }
    assert(uwins <= 10, s"uniform control won $uwins/50 — not uniform")
  }

  test("nbLogOdds9 maxVocab: model bounded, selection by presence count with deterministic ties") {
    // 5 docs; presence counts: hi=5, mid=3, lo1=lo2=1 (tie on count,
    // broken by token order), so top-3 = {hi, mid, lo1}
    val docs = Seq(
      (1L, Seq("hi", "mid", "lo1"), true), (2L, Seq("hi", "mid"), true),
      (3L, Seq("hi", "mid"), false), (4L, Seq("hi", "lo2"), false),
      (5L, Seq("hi"), true)
    ).toDF("id", "toks", "y")
    val capped = TextStats.nbLogOdds9(docs, "id", "toks", "y", maxVocab = 3)
      .select("w").as[String].collect().toSet
    assert(capped == Set("hi", "mid", "lo1"), capped.toString)
    // the cap is a hard bound at every setting
    for (n <- 1 to 4)
      assert(TextStats.nbLogOdds9(docs, "id", "toks", "y", maxVocab = n)
        .count() <= n)
    // capped scoring drops only the excluded tokens' contributions:
    // doc 4 keeps hi (in-vocab), loses lo2 -> equals the score of a
    // doc with toks=[hi] under the SAME capped model
    val scored = TextStats.nbTrainScore(docs, "id", "toks", "y", maxVocab = 3)
      .as[(Long, Boolean, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(scored(4L) == scored(5L),
      "out-of-vocab token must contribute exactly nothing")
  }

  test("nbScoreBatch: streamed scores are bit-identical to the batch scorer; model stays a relation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    val rows = Seq(
      (1L, Seq("good", "meh"), true), (2L, Seq("good"), true),
      (3L, Seq("bad", "meh"), false), (4L, Seq("bad"), false),
      (5L, Seq("unseen", "tokens"), true))
    // train on docs 1-4 only; doc 5 is pure out-of-vocabulary traffic.
    // The model rides as the (w, lo9) RELATION + 1-row prior frame
    // (ADVICE r14) — nothing collected, broadcast-joined per batch.
    val train = rows.take(4).toDF("id", "toks", "y")
    val model = TextStats.nbLogOdds9(train, "id", "toks", "y")
    val prior = TextStats.nbPrior9(train, "y")
    val mem = MemoryStream[(Long, Seq[String])]
    val sink = new java.io.File(graft.Scratch.dir("nb-corpus-sink"), "out").toString
    val q = mem.toDF().toDF("id", "toks").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.nbScoreBatch(b, "id", "toks", model, prior)
          .write.mode("append").parquet(sink)
      }
      .start()
    try {
      mem.addData(rows.map(r => (r._1, r._2)): _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(sink)
        .as[(Long, Double)].collect().toMap
      // the batch scorer trained on the same 4 docs must agree EXACTLY
      // (both are integer-sum/1e9 of the identical fixed-point model)
      val batch4 = TextStats.nbTrainScore(train, "id", "toks", "y")
        .as[(Long, Boolean, Double)].collect().map(t => t._1 -> t._3).toMap
      rows.take(4).foreach(r =>
        assert(streamed(r._1) == batch4(r._1), s"doc ${r._1}"))
      // out-of-vocabulary doc scores exactly the prior
      val prior9 = prior.collect()(0).getLong(0)
      assert(streamed(5L) == prior9 / 1e9)
    } finally q.stop()
  }

  test("Privacy: calibration formulas, composition, and Laplace moments") {
    import graft.ops.Privacy
    assert(Privacy.laplaceScale(0.25) == 4.0)
    assert(Privacy.laplaceScale(0.5, sensitivity = 3.0) == 6.0)
    val sig = Privacy.gaussianSigma(0.5, 1e-5, 1.0)
    assert(math.abs(sig - math.sqrt(2 * math.log(1.25 / 1e-5)) / 0.5) < 1e-12)
    intercept[IllegalArgumentException](Privacy.gaussianSigma(2.0, 1e-5))

    val many = Seq.fill(100)(Privacy.Release(0.05))
    val basic = Privacy.composeBasic(many)
    val adv = Privacy.composeAdvanced(many, 1e-6)
    assert(math.abs(basic.epsilon - 5.0) < 1e-12)
    // the whole point of advanced composition: sqrt(k) beats k at scale
    assert(adv.epsilon < basic.epsilon, s"adv=${adv.epsilon} basic=${basic.epsilon}")
    assert(math.abs(adv.epsilon - (0.05 * math.sqrt(200 * math.log(1e6))
      + 5.0 * (math.exp(0.05) - 1))) < 1e-12)
    assert(adv.delta == 1e-6)
    // ...and at k=2 it's honestly worse
    val two = Seq.fill(2)(Privacy.Release(0.25))
    assert(Privacy.composeAdvanced(two, 1e-6).epsilon >
      Privacy.composeBasic(two).epsilon)

    // seeded Laplace(b=1): deterministic moment check over 20k keys —
    // mean ~ 0, variance ~ 2b^2 (exact inverse-CDF sampling)
    val n = 20000
    val noise = spark.range(n)
      .select(Privacy.laplaceNoise(col("id"), b = 1.0, salt = "mspec").as("x"))
      .agg(avg("x").as("m"), avg(col("x") * col("x")).as("m2"))
      .as[(Double, Double)].head()
    assert(math.abs(noise._1) < 0.05, s"mean ${noise._1}")
    assert(math.abs(noise._2 - 2.0) < 0.2, s"E[x^2] ${noise._2}")

    // Moro inverse-normal CDF: quantile fixtures to the documented 3e-9
    // accuracy, odd symmetry, and N(0, sigma^2) moments for the
    // Gaussian mechanism
    val fixtures = Seq(0.5 -> 0.0, 0.975 -> 1.9599639845, 0.025 -> -1.9599639845,
      0.9999 -> 3.7190164855, 0.0001 -> -3.7190164855, 0.84134474 -> 0.99999899)
    val got = fixtures.map(_._1).toDF("u")
      .select(col("u"), Privacy.invNorm(col("u")).as("z"))
      .as[(Double, Double)].collect().toMap
    fixtures.foreach { case (u, z) =>
      assert(math.abs(got(u) - z) < 1e-6, s"invNorm($u) = ${got(u)}, want $z") }
    val gm = spark.range(n)
      .select(Privacy.gaussianNoise(col("id"), sigma = 3.0, salt = "gspec").as("x"))
      .agg(avg("x").as("m"), avg(col("x") * col("x")).as("m2"))
      .as[(Double, Double)].head()
    assert(math.abs(gm._1) < 0.1, s"gaussian mean ${gm._1}")
    assert(math.abs(gm._2 - 9.0) < 0.5, s"gaussian E[x^2] ${gm._2}")
  }

  test("kcorePeel: clique survives, pendant chain peels, cascade works") {
    // K4 on 1-4 plus chain 4-5-6: at k=2, nodes 5,6 peel (degree 1
    // after inducing), K4 survives with internal degree 3.
    val e = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      ++ Seq((4L, 5L), (5L, 6L))).toDF("s", "d")
    val core2 = GraphOps.kcorePeel(e, "s", "d", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(core2.keySet == Set(1L, 2L, 3L, 4L))
    assert(core2(1L) == 3L && core2(4L) == 3L) // chain edge gone from 4
    // cascade: a path 1-2-3-4 has an empty 2-core — the endpoints peel
    // and the re-applied >= k filter then drops the stranded middle
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    assert(GraphOps.kcorePeel(path, "s", "d", k = 2, iters = 1).count() == 0)
    // k=4 empties K4 (max degree 3)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    assert(GraphOps.kcorePeel(k4, "s", "d", k = 4, iters = 1).count() == 0)
    assert(GraphOps.kcorePeel(k4, "s", "d", k = 3, iters = 3).count() == 4)
  }

  test("triangleStats: closed form on K4-minus-an-edge") {
    // nodes 1-4, edges: full K4 without (3,4). Triangles: (1,2,3), (1,2,4).
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (2L, 1L) /* duplicate reversed edge must dedup */).toDF("s", "d")
    val m = GraphOps.triangleStats(e, "s", "d")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m(1L) == ((3L, 2L, BigDecimal(2.0 * 2 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(m(2L)._1 == 3L && m(2L)._2 == 2L)
    assert(m(3L) == ((2L, 1L, 1.0)) && m(4L) == ((2L, 1L, 1.0)))
    // a node with degree 1 has lcc 0, not NaN
    val line = Seq((1L, 2L)).toDF("s", "d")
    val l = GraphOps.triangleStats(line, "s", "d")
      .as[(Long, Long, Long, Double)].collect()
    assert(l.forall(t => t._3 == 0L && t._4 == 0.0))
  }
}
