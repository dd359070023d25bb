package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val region = Tables.table(spark, TestSpark.Sf, "region")

  test("columnar + line sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toString
    Sinks.writeColumnar(region, s"$dir/p", "parquet")
    Sinks.writeColumnar(region, s"$dir/o", "orc")
    Sinks.writeLines(region, s"$dir/c", "csv")
    Sinks.writeLines(region, s"$dir/j", "json")
    val want = region.collect().map(_.toSeq).toSet
    assert(spark.read.parquet(s"$dir/p").collect().map(_.toSeq).toSet == want)
    assert(spark.read.orc(s"$dir/o").collect().map(_.toSeq).toSet == want)
    assert(spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/c").collect().map(_.toSeq).toSet == want)
    assert(spark.read.json(s"$dir/j").select($"r_regionkey", $"r_name")
      .collect().map(_.toSeq).toSet == want)
  }

  test("zOrderValue: exact Morton interleaving on closed-form fixtures") {
    // 2 cols, 2 bits: z(x, y) interleaves x at even, y at odd positions
    val got = Seq((0L, 0L), (3L, 1L), (1L, 3L), (2L, 2L), (3L, 3L))
      .toDF("x", "y")
      .select($"x", $"y", Sinks.zOrderValue(Seq($"x", $"y"), bits = 2).as("z"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // z = x0 + 2*y0 + 4*x1 + 8*y1
    assert(got((0L, 0L)) == 0L)
    assert(got((3L, 1L)) == (1 + 2 + 4 + 0))
    assert(got((1L, 3L)) == (1 + 2 + 0 + 8))
    assert(got((2L, 2L)) == (0 + 0 + 4 + 8))
    assert(got((3L, 3L)) == 15L)
  }

  test("zOrderLayout: range exchange + local sort in the plan; z-files skip a box query a hash layout cannot") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // a 64x64 grid of points, both coordinates uniform
    val grid = spark.range(4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val laid = Sinks.zOrderLayout(grid, Seq("x", "y"), files = 16, bits = 6)
    // plan audit: ONE range exchange on the z value + a partition-local
    // (non-global) sort — a global sort would be a second exchange
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(400))
    assert("""Sort \[__z#\d+L ASC NULLS FIRST\], false""".r
      .findFirstIn(plan).isDefined, "partition-local sort expected")
    Sinks.writeZOrdered(grid, s"$dir/z", Seq("x", "y"), files = 16, bits = 6)
    // control: same data, hash-partitioned into the same file count
    grid.repartition(16).write.parquet(s"$dir/h")
    // the file-skipping measurement a parquet reader performs: a file
    // can be SKIPPED for the box predicate iff its per-file min/max
    // box misses the query box — count survivors under both layouts
    def filesTouched(path: String): (Long, Long) = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
      val total = boxes.count()
      val touched = boxes.filter(!($"x1" < 8 || $"x0" > 23 || $"y1" < 8 || $"y0" > 23))
        .count()
      (touched, total)
    }
    val (zt, ztot) = filesTouched(s"$dir/z")
    val (ht, htot) = filesTouched(s"$dir/h")
    assert(ztot == 16 && htot == 16, s"expected 16 files, got z=$ztot h=$htot")
    // hash layout: every file spans the whole grid -> nothing skips.
    // z-order: the 16x16 box at (8..23)^2 is a compact z-range -> most
    // files skip. Require at least half skipped AND strictly better.
    assert(ht == 16, s"hash layout should touch all files, touched $ht")
    assert(zt <= 8 && zt < ht, s"z layout touched $zt of $ztot files")
    // layout preserves the data exactly
    assert(spark.read.parquet(s"$dir/z").count() == 4096)
  }

  test("hilbertValue: bijection over the full grid; consecutive indices are unit Manhattan steps (the locality property Morton lacks)") {
    val bits = 5
    val n = 1 << bits
    val grid = spark.range(n.toLong * n)
      .select(($"id" % n).as("x"), ($"id" / n).cast("long").as("y"))
    val got = grid
      .select($"x", $"y", Sinks.hilbertValue($"x", $"y", bits).as("h"))
      .as[(Long, Long, Long)].collect()
    // bijection: every index in [0, 4^bits) appears exactly once
    assert(got.map(_._3).sorted.toSeq == (0L until n.toLong * n))
    // adjacency: walking the curve in index order moves exactly one
    // unit step per increment — Morton violates this at every
    // quadrant boundary, Hilbert never does
    val walk = got.sortBy(_._3)
    walk.zip(walk.tail).foreach { case ((x1, y1, h1), (x2, y2, _)) =>
      val step = math.abs(x2 - x1) + math.abs(y2 - y1)
      assert(step == 1, s"jump of $step after index $h1 at ($x1,$y1)->($x2,$y2)")
    }
    // the Morton CONTROL: same grid, same walk — count the quadrant
    // jumps to show the property is not vacuous
    val mWalk = grid
      .select($"x", $"y", Sinks.zOrderValue(Seq($"x", $"y"), bits).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val mJumps = mWalk.zip(mWalk.tail)
      .count { case ((x1, y1, _), (x2, y2, _)) =>
        math.abs(x2 - x1) + math.abs(y2 - y1) > 1 }
    assert(mJumps > 0, "Morton should jump at quadrant boundaries")
    // bits bound is enforced
    intercept[IllegalArgumentException](Sinks.hilbertValue($"x", $"y", 33))
  }

  test("hilbertLayout: file skipping on the same box query, at least as strong as the Morton layout") {
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
    val grid = spark.range(4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    Sinks.writeColumnar(
      Sinks.hilbertLayout(grid, "x", "y", files = 16, bits = 6), s"$dir/h")
    def filesTouched(path: String): (Long, Long) = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
      (boxes.filter(!($"x1" < 8 || $"x0" > 23 || $"y1" < 8 || $"y0" > 23)).count(),
        boxes.count())
    }
    val (ht, htot) = filesTouched(s"$dir/h")
    assert(htot == 16, s"expected 16 files, got $htot")
    // the same 16x16 box query the zOrder spec uses: Hilbert's tighter
    // locality must skip at least half the files too
    assert(ht <= 8, s"hilbert layout touched $ht of $htot files")
    assert(spark.read.parquet(s"$dir/h").count() == 4096)
  }

  test("hilbertValueN: Skilling 3-D index — bijection, unit-step adjacency, reference vectors; 63-bit bound enforced") {
    val bits = 3
    val n = 1 << bits
    val grid = spark.range(n.toLong * n * n)
      .select(($"id" % n).as("x"), (($"id" / n) % n).cast("long").as("y"),
        ($"id" / (n * n)).cast("long").as("z"))
    val got = grid
      .select($"x", $"y", $"z",
        Sinks.hilbertValueN(Seq($"x", $"y", $"z"), bits).as("h"))
      .as[(Long, Long, Long, Long)].collect()
    // bijection over [0, 8^bits)
    assert(got.map(_._4).sorted.toSeq == (0L until n.toLong * n * n))
    // adjacency: every index increment is one unit Manhattan step in 3-D
    val walk = got.sortBy(_._4)
    walk.zip(walk.tail).foreach { case ((x1, y1, z1, h1), (x2, y2, z2, _)) =>
      val step = math.abs(x2 - x1) + math.abs(y2 - y1) + math.abs(z2 - z1)
      assert(step == 1, s"jump of $step after index $h1")
    }
    // Morton control on the same 3-D grid: quadrant jumps exist
    val mWalk = grid
      .select($"x", $"y", $"z",
        Sinks.zOrderValue(Seq($"x", $"y", $"z"), bits).as("m"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    val mJumps = mWalk.zip(mWalk.tail).count { case ((x1, y1, z1, _), (x2, y2, z2, _)) =>
      math.abs(x2 - x1) + math.abs(y2 - y1) + math.abs(z2 - z1) > 1 }
    assert(mJumps > 0, "Morton should jump at octant boundaries")
    // closed-form reference vectors (hand-checked Skilling walk, b=3 n=3)
    val byPoint = got.map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(byPoint((0L, 0L, 0L)) == 0L)
    assert(byPoint((1L, 2L, 3L)) == 48L)
    assert(byPoint((7L, 7L, 7L)) == 365L)
    assert(byPoint((5L, 0L, 6L)) == 431L)
    intercept[IllegalArgumentException](
      Sinks.hilbertValueN(Seq($"x", $"y", $"z"), 22))
    intercept[IllegalArgumentException](Sinks.hilbertValueN(Seq($"x"), 8))
  }

  test("hilbertValueN layout: 3-D box-query file skipping at least as strong as 3-D Morton") {
    val dir = java.nio.file.Files.createTempDirectory("hilbert3").toString
    val grid = spark.range(16 * 16 * 16)
      .select(($"id" % 16).as("x"), (($"id" / 16) % 16).cast("long").as("y"),
        ($"id" / 256).cast("long").as("z"))
    def layoutOn(key: org.apache.spark.sql.Column, path: String): Unit =
      Sinks.writeColumnar(
        grid.withColumn("__k", key).repartitionByRange(16, $"__k")
          .sortWithinPartitions("__k").drop("__k"), path)
    layoutOn(Sinks.hilbertValueN(Seq($"x", $"y", $"z"), 4), s"$dir/h")
    layoutOn(Sinks.zOrderValue(Seq($"x", $"y", $"z"), 4), s"$dir/m")
    def filesTouched(path: String): (Long, Long) = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"),
          min($"z").as("z0"), max($"z").as("z1"))
      (boxes.filter(!($"x1" < 2 || $"x0" > 5 || $"y1" < 2 || $"y0" > 5 ||
        $"z1" < 2 || $"z0" > 5)).count(), boxes.count())
    }
    val (ht, htot) = filesTouched(s"$dir/h")
    val (mt, mtot) = filesTouched(s"$dir/m")
    assert(htot == 16 && mtot == 16)
    assert(ht <= mt, s"hilbert touched $ht files, morton $mt — locality regressed")
    assert(ht <= 8, s"hilbert layout touched $ht of $htot files")
    assert(spark.read.parquet(s"$dir/h").count() == 4096)
  }

  test("quantileBucket: skew-robust encode — balanced buckets, monotone, in-domain; quantile z-layout preserves data") {
    // heavily skewed column: 7/8 of mass in [0, 100), a long tail to 1e9
    val skew = spark.range(4096).select($"id",
      when($"id" % 8 =!= 0, ($"id" % 100).cast("double"))
        .otherwise(($"id" * $"id" % 1000000000L).cast("double")).as("v"),
      ($"id" % 64).cast("double").as("u"))
    val b = Sinks.quantileBucket(skew, "v", bits = 4)
    val got = skew.select($"v", b.as("bucket")).as[(Double, Long)].collect()
    // in-domain: every bucket inside [0, 2^4)
    assert(got.forall(t => t._2 >= 0 && t._2 < 16))
    // monotone: sort by value -> bucket never decreases
    val sorted = got.sortBy(_._1)
    assert(sorted.zip(sorted.tail).forall { case ((_, b1), (_, b2)) => b1 <= b2 })
    // balance: raw values would cram 7/8 of rows into the first sliver
    // of the range; quantile buckets keep the LARGEST bucket within a
    // small multiple of the ideal 1/16 share (ties can merge buckets)
    val counts = got.groupBy(_._2).map(_._2.length)
    assert(counts.max <= 4096 / 16 * 3,
      s"largest bucket ${counts.max} of 4096 — not balanced")
    // end-to-end: the quantile z-layout is a pure re-layout
    val laid = Sinks.zOrderLayoutQuantile(skew, Seq("v", "u"), files = 8, bits = 4)
    assert(laid.count() == 4096 && laid.columns.toSeq == skew.columns.toSeq)
  }

  test("compact: consecutive-bin small-file merge preserves hilbert order, min/max tightness, and the data") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val grid = spark.range(4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    Sinks.writeColumnar(
      Sinks.hilbertLayout(grid, "x", "y", files = 16, bits = 6), dir)
    val before = spark.read.parquet(dir)
      .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq
    val sizes = new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("part-")).map(_.length)
    // target ~4 source files per bin
    val stats = Sinks.compact(spark, dir, targetBytes = sizes.max * 4)
    assert(stats.filesBefore == 16)
    assert(stats.filesAfter < stats.filesBefore,
      s"expected fewer files, got $stats")
    assert(stats.binsRewritten >= 1)
    // data survives exactly
    val after = spark.read.parquet(dir)
      .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq
    assert(after == before)
    // order: per-file hilbert ranges are DISJOINT and follow name
    // order (consecutive-range unions — min/max stays tight), and
    // rows inside each file are still h-sorted
    val partFiles = new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("part-")).map(_.toString).sorted
    val ranges = partFiles.map { f =>
      val hs = spark.read.parquet(f).coalesce(1)
        .select(Sinks.hilbertValue($"x", $"y", 6)).as[Long].collect()
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
        s"rows inside $f lost their hilbert sort")
      (hs.min, hs.max)
    }
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi < lo2, "file ranges overlap after compaction")
    }
    // tightness in practice: the 16x16 box query still skips most files
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"x").as("x0"), max($"x").as("x1"),
        min($"y").as("y0"), max($"y").as("y1"))
    val touched = boxes
      .filter(!($"x1" < 8 || $"x0" > 23 || $"y1" < 8 || $"y0" > 23)).count()
    assert(touched <= (stats.filesAfter + 1) / 2,
      s"box query touched $touched of ${stats.filesAfter} compacted files")
    // repeated passes converge: recompression can shrink merged files
    // enough that another consecutive pair fits the target, so run to
    // the fixpoint and assert it arrives (and the data still survives)
    var last = stats
    var passes = 0
    while (last.binsRewritten > 0 && passes < 5) {
      last = Sinks.compact(spark, dir, targetBytes = sizes.max * 4)
      passes += 1
    }
    assert(last.binsRewritten == 0, s"compaction did not converge: $last")
    val converged = spark.read.parquet(dir)
      .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq
    assert(converged == before)
  }

  test("snapshot protocol: crash injected between every pair of FS ops — reader sees exactly old or new") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val base = java.nio.file.Files.createTempDirectory("snapcrash").toString
    val golden = s"$base/golden"
    val grid = spark.range(1024)
      .select(($"id" % 32).as("x"), ($"id" / 32).cast("long").as("y"))
    assert(Sinks.writeLayoutSnapshot(
      Sinks.hilbertLayout(grid, "x", "y", files = 8, bits = 5), golden) == 1L)
    val fs = new Path(golden)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = Sinks.readTable(spark, golden)
      .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq
    val nBefore = Sinks.manifestFiles(fs, new Path(golden), 1L).size
    val targetBytes = new java.io.File(golden).listFiles
      .filter(_.getName.startsWith("part-")).map(_.length).max * 4
    // inject a crash before FS op k, for every k, until a pass runs
    // through uninjected; after EVERY outcome the reader must see
    // exactly the old or the new snapshot — same rows, a committed
    // manifest, every listed file present
    var k = 0
    var sawSuccess = false
    var sawCrash = false
    while (!sawSuccess && k < 100) {
      val dir = s"$base/run$k"
      FileUtil.copy(fs, new Path(golden), fs, new Path(dir), false,
        spark.sparkContext.hadoopConfiguration)
      var count = 0
      Sinks.fsOpHook = _ => {
        count += 1
        if (count > k) throw new RuntimeException("injected crash")
      }
      val crashed =
        try { Sinks.compact(spark, dir, targetBytes); false }
        catch {
          case e: RuntimeException if e.getMessage == "injected crash" => true
        }
      Sinks.fsOpHook = _ => ()
      sawCrash ||= crashed
      val got = Sinks.readTable(spark, dir)
        .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq
      assert(got == before, s"crash point $k: reader saw wrong rows")
      val v = Sinks.latestManifest(fs, new Path(dir)).get
      assert(v == 1L || v == 2L, s"crash point $k: manifest version $v")
      val listed = Sinks.manifestFiles(fs, new Path(dir), v)
      listed.foreach(n => assert(fs.exists(new Path(s"$dir/$n")),
        s"crash point $k: manifest-v$v lists missing file $n"))
      if (v == 2L)
        assert(listed.size < nBefore,
          s"crash point $k: committed snapshot did not shrink")
      if (!crashed) {
        // the uninjected pass must have actually compacted, committed
        // v2, and GC'd the dead sources
        assert(Sinks.latestManifest(fs, new Path(dir)).get == 2L)
        assert(listed.size < nBefore)
        sawSuccess = true
      }
      k += 1
    }
    assert(sawSuccess, "never reached an uninjected full pass")
    assert(sawCrash, "injection never fired — hook not wired")
    assert(k > 3, s"too few FS ops hooked ($k) for a meaningful sweep")
    // repeated passes on the committed table converge (no new bins ->
    // no new manifest version)
    val dirLast = s"$base/run${k - 1}"
    val again = Sinks.compact(spark, dirLast, targetBytes)
    assert(again.binsRewritten == 0 || Sinks.compact(
      spark, dirLast, targetBytes).binsRewritten == 0)
    val gotLast = Sinks.readTable(spark, dirLast)
      .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq
    assert(gotLast == before)
    // time travel: v1 (pre-compaction) stays readable — compaction
    // committed v2 without deleting v1's files
    val lastPath = new Path(dirLast)
    val v1rows = Sinks.readTableAsOf(spark, dirLast, 1L)
      .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq
    assert(v1rows == before, "snapshot v1 no longer readable")
    val v1files = Sinks.manifestFiles(fs, lastPath, 1L)
    // retention GC: expire everything but the latest (the convergence
    // re-compact above may have committed a v3) — the old manifests
    // and their now-dead merged sources go, the live snapshot survives
    val vsBefore = Sinks.snapshotVersions(fs, lastPath)
    assert(vsBefore.size >= 2)
    val (mDel, fDel) = Sinks.expireSnapshots(spark, dirLast, keep = 1)
    assert(mDel == vsBefore.size - 1 && fDel > 0,
      s"expire deleted ($mDel, $fDel) of $vsBefore")
    assert(Sinks.snapshotVersions(fs, lastPath) == Seq(vsBefore.last))
    val liveFiles = Sinks.manifestFiles(fs, lastPath, vsBefore.last)
    v1files.filterNot(liveFiles.contains)
      .foreach(n => assert(!fs.exists(new Path(s"$dirLast/$n")),
        s"dead file $n survived expiry"))
    assert(Sinks.readTable(spark, dirLast)
      .select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq == before)
    intercept[IllegalArgumentException] {
      Sinks.readTableAsOf(spark, dirLast, 1L)
    }
    // optimistic concurrency: a committer holding a stale expected
    // version loses loudly instead of clobbering the newer snapshot
    intercept[IllegalArgumentException] {
      Sinks.commit(fs, lastPath, vsBefore.last - 1, liveFiles)
    }
  }

  test("compactPartitioned: per-leaf compaction of a hive-partitioned table") {
    val dir = java.nio.file.Files.createTempDirectory("compactpart").toString + "/t"
    val df = spark.range(4096)
      .select(($"id" % 4).as("p"), $"id".as("v"))
      .repartition(8)
    Sinks.writePartitioned(df, dir, Seq("p"))
    val before = spark.read.parquet(dir)
      .select($"p", $"v").as[(Long, Long)].collect().sorted.toSeq
    val leafFiles = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .map(d => d.listFiles.count(_.getName.startsWith("part-")))
    assert(leafFiles.forall(_ > 1), "fixture should have small files per leaf")
    val stats = Sinks.compactPartitioned(spark, dir, targetBytes = 512L * 1024)
    assert(stats.filesBefore == leafFiles.sum)
    assert(stats.filesAfter < stats.filesBefore, s"no compaction: $stats")
    assert(stats.binsRewritten >= 4, "every leaf should have merged")
    val after = spark.read.parquet(dir)
      .select($"p", $"v").as[(Long, Long)].collect().sorted.toSeq
    assert(after == before)
  }

  test("manifest stats pruning: readTableWhere equals full-read+filter, skips files, survives compaction, stays conservative") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("snapstats").toString + "/t"
    val df = spark.range(4096)
      .select($"id".as("k"), ($"id" % 7).cast("double").as("w"),
        concat(lit("s"), format_string("%05d", $"id")).as("tag"))
      .repartitionByRange(16, $"k").sortWithinPartitions("k")
    assert(Sinks.writeLayoutSnapshot(df, dir,
      statsCols = Seq("k", "w", "tag")) == 1L)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // every file carries ranges for all three kinds (L, D, S)
    val entries = Sinks.manifestEntries(fs, new Path(dir), 1L)
    assert(entries.forall(e => e.stats.keySet == Set("k", "w", "tag")))
    assert(entries.head.stats("k").kind == 'L')
    assert(entries.head.stats("w").kind == 'D')
    assert(entries.head.stats("tag").kind == 'S')
    def checkPrune(preds: Map[String, (Any, Any)],
        filter: org.apache.spark.sql.Column, expectSkip: Boolean): Unit = {
      val pr = Sinks.readTableWhere(spark, dir, preds)
      val got = pr.df.filter(filter).select($"k").as[Long].collect().sorted.toSeq
      val want = Sinks.readTable(spark, dir).filter(filter)
        .select($"k").as[Long].collect().sorted.toSeq
      assert(got == want, s"pruned read diverged for $preds")
      if (expectSkip) assert(pr.filesRead < pr.filesTotal,
        s"no files skipped for $preds (${pr.filesRead}/${pr.filesTotal})")
    }
    // long-range prune: a 10% key slice must not read all 16 files
    checkPrune(Map("k" -> (0L, 400L)), $"k".between(0L, 400L), expectSkip = true)
    // string prune (utf8 order): a tag prefix window
    checkPrune(Map("tag" -> ("s00000", "s00400")),
      $"tag".between("s00000", "s00400"), expectSkip = true)
    // double predicate on a column whose range spans every file: all
    // kept, result still exact (pruning may not help, must not hurt)
    checkPrune(Map("w" -> (2.0, 3.0)), $"w".between(2.0, 3.0), expectSkip = false)
    // un-stats'd column in preds → conservative keep-everything
    val prAll = Sinks.readTableWhere(spark, dir, Map("nosuch" -> ((0L, 1L))))
    assert(prAll.filesRead == prAll.filesTotal)
    // zero survivors: empty frame, schema intact
    val prNone = Sinks.readTableWhere(spark, dir, Map("k" -> (100000L, 200000L)))
    assert(prNone.filesRead == 0 && prNone.df.count() == 0)
    assert(prNone.df.columns.toSeq == Seq("k", "w", "tag"))
    // compaction carries stats through merges WITHOUT rescanning:
    // ranges stay exact, pruning still works, results still equal
    val sizes = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("part-")).map(_.length)
    val cs = Sinks.compactSnapshot(spark, dir, targetBytes = sizes.max * 4)
    assert(cs.filesAfter < cs.filesBefore)
    val v2 = Sinks.latestManifest(fs, new Path(dir)).get
    val merged = Sinks.manifestEntries(fs, new Path(dir), v2)
    assert(merged.forall(e => e.stats.keySet == Set("k", "w", "tag")),
      "compaction dropped stats from a merged file")
    // recompute ground truth per merged file and compare to carried stats
    merged.foreach { e =>
      val truth = Sinks.collectFileStats(spark, dir, Seq(e.name),
        Seq("k", "w", "tag"))(e.name)
      assert(truth == e.stats, s"carried stats for ${e.name} are not exact")
    }
    checkPrune(Map("k" -> (0L, 400L)), $"k".between(0L, 400L), expectSkip = true)
    // manifest round-trip of the degenerate string stat: empty-string
    // bounds serialize as 'col=S::' whose trailing empty fields a
    // default split would drop (review r17)
    val degenerate = Seq(Sinks.ManifestEntry("f0.parquet",
      Map("tag" -> Sinks.ColRange('S', "", ""))))
    val scratch = new Path(
      java.nio.file.Files.createTempDirectory("manifestrt").toString)
    Sinks.commitEntries(fs, scratch, 0L, degenerate, kind = "init")
    assert(Sinks.manifestEntries(fs, scratch, 1L) == degenerate)
  }

  test("appendSnapshot + readTableChanges: exact ingest batches, atomic flip, rewrite commits refuse change capture") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("snapappend").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select($"id".as("k"), ($"id" * 2).as("v"))
    val v1 = Sinks.writeLayoutSnapshot(
      batch(0, 1000).repartitionByRange(4, $"k").sortWithinPartitions("k"),
      dir, statsCols = Seq("k"))
    val v2 = Sinks.appendSnapshot(batch(1000, 1500), dir, statsCols = Seq("k"))
    val v3 = Sinks.appendSnapshot(batch(1500, 1800), dir, statsCols = Seq("k"))
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(Sinks.manifestKind(fs, new Path(dir), 2L).contains("append"))
    // live read = union of all batches; time travel = each prefix
    assert(Sinks.readTable(spark, dir).count() == 1800)
    assert(Sinks.readTableAsOf(spark, dir, 1L).count() == 1000)
    assert(Sinks.readTableAsOf(spark, dir, 2L).count() == 1500)
    // change capture is row-exact per interval
    def ks(df: org.apache.spark.sql.DataFrame) =
      df.select($"k").as[Long].collect().sorted.toSeq
    assert(ks(Sinks.readTableChanges(spark, dir, 1L, 2L)) == (1000L until 1500L))
    assert(ks(Sinks.readTableChanges(spark, dir, 2L, 3L)) == (1500L until 1800L))
    assert(ks(Sinks.readTableChanges(spark, dir, 1L, 3L)) == (1000L until 1800L))
    // appended files carry stats → pruning reaches them
    val pr = Sinks.readTableWhere(spark, dir, Map("k" -> (1600L, 1700L)))
    assert(pr.filesRead < pr.filesTotal)
    assert(ks(pr.df.filter($"k".between(1600L, 1700L))) == (1600L to 1700L))
    // a crash injected before the manifest flip leaves readers on the
    // old snapshot with no phantom rows (staged files are unreferenced)
    var fired = false
    Sinks.fsOpHook = tag =>
      if (tag.startsWith("manifest-commit")) { fired = true; throw new RuntimeException("injected crash") }
    intercept[RuntimeException] { Sinks.appendSnapshot(batch(1800, 2000), dir) }
    Sinks.fsOpHook = _ => ()
    assert(fired, "append crash hook never fired")
    assert(Sinks.latestManifest(fs, new Path(dir)).get == 3L)
    assert(Sinks.readTable(spark, dir).count() == 1800)
    // a compaction (rewrite) commit in the interval refuses change
    // capture loudly instead of replaying rewritten rows as inserts
    val sizes = new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("part-") || f.getName.startsWith("append-"))
      .map(_.length)
    val cs = Sinks.compactSnapshot(spark, dir, targetBytes = sizes.max * 8)
    assert(cs.binsRewritten >= 1, "fixture should compact something")
    val v4 = Sinks.latestManifest(fs, new Path(dir)).get
    assert(Sinks.manifestKind(fs, new Path(dir), v4).contains("compact"))
    intercept[IllegalArgumentException] {
      Sinks.readTableChanges(spark, dir, 3L, v4)
    }
    // but intervals of pure appends before the rewrite still serve
    assert(ks(Sinks.readTableChanges(spark, dir, 1L, 3L)) == (1000L until 1800L))
    // and the crash residue (staged-but-uncommitted append files) is
    // reclaimed by the vacuum sweep once it predates the live manifest
    val residue = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("append-v4-")).map(_.getName).toSeq
    assert(residue.nonEmpty, "expected staged residue from the injected crash")
    Sinks.expireSnapshots(spark, dir, keep = 1)
    residue.foreach(n => assert(!fs.exists(new Path(s"$dir/$n")),
      s"vacuum left crash residue $n"))
    assert(Sinks.readTable(spark, dir).count() == 1800)
  }

  test("appendSnapshotBatch: bootstraps on batch 0, replays are no-ops, interleaved appends don't confuse the txn ledger") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("snapbatch").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select($"id".as("k"))
    // batch 0 bootstraps an empty directory to manifest-v1
    assert(Sinks.appendSnapshotBatch(batch(0, 100), dir, "appA", 0L) == 1L)
    assert(Sinks.manifestKind(fs, new Path(dir), 1L).contains("append"))
    assert(Sinks.lastCommittedBatch(fs, new Path(dir), "appA").contains(0L))
    // batch 1 appends; a REPLAY of batch 1 (worst case: different,
    // bigger payload — the rewritten attempt) is a no-op
    assert(Sinks.appendSnapshotBatch(batch(100, 200), dir, "appA", 1L) == 2L)
    assert(Sinks.appendSnapshotBatch(batch(0, 10000), dir, "appA", 1L) == 2L)
    assert(Sinks.readTable(spark, dir).count() == 200)
    // an out-of-band manual append (no txn) doesn't advance appA's
    // ledger; appA's next batch still commits once
    Sinks.appendSnapshot(batch(200, 250), dir)
    assert(Sinks.lastCommittedBatch(fs, new Path(dir), "appA").contains(1L))
    assert(Sinks.appendSnapshotBatch(batch(250, 300), dir, "appA", 2L) == 4L)
    assert(Sinks.readTable(spark, dir).count() == 300)
    // a second app keeps its own ledger
    assert(Sinks.lastCommittedBatch(fs, new Path(dir), "appB").isEmpty)
    assert(Sinks.appendSnapshotBatch(batch(300, 310), dir, "appB", 0L) == 5L)
    assert(Sinks.lastCommittedBatch(fs, new Path(dir), "appA").contains(2L))
    assert(Sinks.readTable(spark, dir).count() == 310)
    // bootstrap refuses a directory that holds UN-snapshotted data —
    // committing manifest-v1 over it would orphan those files into
    // vacuum-bait (review r17)
    val plain = java.nio.file.Files.createTempDirectory("snapplain").toString + "/t"
    Sinks.writeColumnar(batch(0, 50), plain)
    intercept[IllegalArgumentException] {
      Sinks.appendSnapshotBatch(batch(50, 60), plain, "appC", 0L)
    }
    assert(spark.read.parquet(plain).count() == 50, "guard must not mutate")
  }

  test("bloom sidecars: point lookups prune hash-laid files range stats cannot, merge exactly through compaction, die with their manifests") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("snapbloom").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // HASH layout: every file's k-range spans ~the whole domain, so
    // range stats are useless for `k = v` — exactly the bloom's case
    val df = spark.range(4096)
      .select($"id".as("k"), concat(lit("s"), format_string("%05d", $"id")).as("tag"))
      .repartition(16)
    assert(Sinks.writeLayoutSnapshot(df, dir, statsCols = Seq("k"),
      bloom = Some(Sinks.BloomSpec(Seq("k", "tag")))) == 1L)
    val entries = Sinks.manifestEntries(fs, new Path(dir), 1L)
    assert(entries.forall(e => e.blooms.keySet == Set("k", "tag")))
    entries.flatMap(_.blooms.values).foreach(r =>
      assert(fs.exists(new Path(s"$dir/${r.file}")), s"missing sidecar ${r.file}"))
    // control: on the hash layout most files' ranges straddle any
    // point, so the range stat alone keeps most of them
    val prRange = Sinks.readTableWhere(spark, dir, Map("k" -> ((17L, 17L))))
    assert(prRange.filesRead > prRange.filesTotal / 2,
      "hash layout should mostly defeat range pruning (fixture assumption)")
    // the bloom prunes to (almost) only the holding file
    def lookup(eq: Map[String, Any]) = Sinks.readTableWhere(spark, dir, Map.empty, eq)
    val hit = lookup(Map("k" -> 17L))
    assert(hit.filesRead < hit.filesTotal / 2,
      s"bloom pruned nothing: ${hit.filesRead}/${hit.filesTotal}")
    assert(hit.df.filter($"k" === 17L).count() == 1)
    val hitS = lookup(Map("tag" -> "s00042"))
    assert(hitS.filesRead < hitS.filesTotal / 2)
    assert(hitS.df.filter($"tag" === "s00042").select($"k").as[Long].head() == 42L)
    // a key absent from the table: every file provably excluded
    assert(lookup(Map("k" -> 999999L)).filesRead == 0)
    // a probe value outside the hash domain fails LOUDLY — a Double's
    // "17.0" vs the build side's "17" would otherwise silently prune
    // every file (review r17)
    intercept[IllegalArgumentException] { lookup(Map("k" -> 17.0)) }
    // appended files carry their own sidecars
    val v2 = Sinks.appendSnapshotBatch(
      spark.range(10000, 10500).select($"id".as("k"),
        concat(lit("s"), format_string("%05d", $"id")).as("tag")),
      dir, "bloomApp", 0L, bloom = Some(Sinks.BloomSpec(Seq("k", "tag"))))
    assert(v2 == 2L)
    val hitNew = lookup(Map("k" -> 10250L))
    assert(hitNew.filesRead < hitNew.filesTotal)
    assert(hitNew.df.filter($"k" === 10250L).count() == 1)
    // compaction ORs the sources' bitsets — lookups stay exact and
    // still prune afterwards
    val sizes = new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("part-")).map(_.length)
    val cs = Sinks.compactSnapshot(spark, dir, targetBytes = sizes.max * 4)
    assert(cs.binsRewritten >= 1)
    val v3 = Sinks.latestManifest(fs, new Path(dir)).get
    val merged = Sinks.manifestEntries(fs, new Path(dir), v3)
    assert(merged.forall(_.blooms.keySet == Set("k", "tag")),
      "compaction dropped a bloom")
    val hit2 = lookup(Map("k" -> 17L))
    assert(hit2.df.filter($"k" === 17L).count() == 1)
    assert(hit2.filesRead < hit2.filesTotal)
    assert(lookup(Map("k" -> 999999L)).filesRead == 0)
    // retention GC deletes expired manifests' sidecars, keeps live ones
    val deadSidecars = entries.flatMap(_.blooms.values.map(_.file))
      .filterNot(merged.flatMap(_.blooms.values.map(_.file)).toSet)
    assert(deadSidecars.nonEmpty)
    Sinks.expireSnapshots(spark, dir, keep = 1)
    deadSidecars.foreach(n => assert(!fs.exists(new Path(s"$dir/$n")),
      s"expired sidecar $n survived GC"))
    merged.flatMap(_.blooms.values.map(_.file)).foreach(n =>
      assert(fs.exists(new Path(s"$dir/$n")), s"live sidecar $n was GC'd"))
    assert(lookup(Map("k" -> 17L)).df.filter($"k" === 17L).count() == 1)
  }

  test("writeBranches: side output splits one pass into n sinks") {
    val dir = java.nio.file.Files.createTempDirectory("branches").toString
    Sinks.writeBranches(region, Seq(
      ((df: org.apache.spark.sql.DataFrame) => df.filter($"r_regionkey" < 2), s"$dir/low"),
      ((df: org.apache.spark.sql.DataFrame) => df.filter($"r_regionkey" >= 2), s"$dir/high")))
    val low = spark.read.parquet(s"$dir/low").count()
    val high = spark.read.parquet(s"$dir/high").count()
    assert(low + high == region.count())
    assert(low > 0 && high > 0)
  }
}
