package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink helpers (SURVEY §2.1 S4-S5).
  *
  * The reference writes Snappy Avro containers everywhere
  * (JobExtractTransform.java:67-71); this environment ships no
  * spark-avro module, so Avro is routed through the generic writer and
  * the harness standardizes on Parquet (also Snappy). ORC/CSV/JSON come
  * free from the DataFrameWriter surface.
  */
object Sinks {

  /** Snappy-compressed columnar write, format ∈ {parquet, orc}. */
  def writeColumnar(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.write.mode("overwrite").format(format).option("compression", "snappy").save(path)

  /** Line-format write (csv with header, or json). */
  def writeLines(df: DataFrame, path: String, format: String = "csv"): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  /** Hive-style partitioned write: one directory per distinct value of
    * `partCols`. Downstream filters on those columns become partition
    * pruning (no data read at all for excluded values) — the coarse
    * analog of parquet row-group pushdown.
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*)
      .option("compression", "snappy").parquet(path)

  /** Bucketed table write: pre-hash-partitioned and sorted on the join
    * key, so equi-joins and aggregations on `bucketCols` plan with NO
    * shuffle on this side. Requires a table catalog (`saveAsTable`) —
    * buckets are metadata, plain files can't carry them.
    */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Morton/Z-order value of `cols` — bit-interleaving of the
    * low `bits` bits of each column (column j contributes bit i at
    * output position i·n + j), the multi-dimensional locality key
    * behind Z-ordered data layouts: rows close in EVERY dimension get
    * close z-values, so range-sorting by z clusters them into the
    * same files and per-file min/max column statistics become tight
    * on ALL z-columns at once. Inputs must already be non-negative
    * integers below 2^bits (rank/bucket-encode upstream — a
    * percentile encoding is a one-pass approxQuantile bucketing);
    * 2 cols × 16 bits fills 32 output bits, well inside the long.
    * Pure shift/mask column arithmetic — codegen'd, zero shuffle.
    */
  def zOrderValue(cols: Seq[org.apache.spark.sql.Column], bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val n = cols.size
    require(n >= 1 && n * bits <= 63, s"$n cols x $bits bits overflow a long")
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ordered layout: range-repartition into `files` partitions on
    * the [[zOrderValue]] of `zCols` and sort within each — after a
    * parquet write, every file covers a compact z-range, so its
    * min/max statistics form a tight box over ALL z-columns and a
    * reader's multi-column predicate skips most files (the
    * data-skipping layout tool for 100 TB fact tables that
    * [[writePartitioned]]'s coarse directories and [[writeBucketed]]'s
    * single-key hash can't provide; SinksSpec measures the skip rate
    * against a hash layout). One range exchange (sampled boundaries)
    * + partition-local sort — exactly a global-sort's cost, amortized
    * over every selective read thereafter. The z column is internal
    * and dropped before the write.
    */
  def zOrderLayout(
      df: DataFrame, zCols: Seq[String], files: Int, bits: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zOrderValue(zCols.map(col), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** [[zOrderLayout]] + snappy parquet write. */
  def writeZOrdered(
      df: DataFrame, path: String, zCols: Seq[String], files: Int,
      bits: Int = 16): Unit =
    writeColumnar(zOrderLayout(df, zCols, files, bits), path)

  /** Hilbert-curve index of a 2-D point — the stronger-locality
    * sibling of [[zOrderValue]] (a Hilbert traversal never makes the
    * long diagonal jumps Morton makes at quadrant boundaries, so
    * consecutive indices are ALWAYS unit Manhattan steps and file
    * boxes come out tighter; SinksSpec proves the adjacency property
    * over the full grid). Classic xy2d bit-twiddling (Hamilton's
    * formulation) as a FOLD over the bit levels with (x, y, d) struct
    * state. The fold shape matters (measured, r15): a plan-build-time
    * unroll duplicates the previous level's (x, y) in every rotation
    * branch, so the expression tree grows ~3^bits, blows the codegen
    * size limit and INTERPRETS a ~700-node tree per row — 4.1 s at
    * sf0.1 vs 0.15 s for the Morton key. The fold keeps the
    * expression LINEAR in `bits` (the per-level constants ride as a
    * literal array); the lambda itself is interpreted, but it is ~40
    * arithmetic ops × `bits` per row — measured back at Morton-key
    * cost. Zero shuffle either way. d spans [0, 4^bits), so
    * `bits ≤ 30` keeps it in a long.
    */
  def hilbertValue(
      xCol: org.apache.spark.sql.Column, yCol: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{aggregate, array, lit, struct, when}
    require(bits >= 1 && bits <= 30, s"bits=$bits outside [1, 30]")
    val svals = array((0 until bits).reverse.map(i => lit(1L << i)): _*)
    val init = struct(xCol.cast("long").as("x"), yCol.cast("long").as("y"),
      lit(0L).as("d"))
    aggregate(svals, init, (st, s) => {
      val x = st.getField("x")
      val y = st.getField("y")
      val rx = when(x.bitwiseAND(s) > 0, 1L).otherwise(0L)
      val ry = when(y.bitwiseAND(s) > 0, 1L).otherwise(0L)
      val nd = st.getField("d") + s * s * (lit(3L) * rx).bitwiseXOR(ry)
      val nx = when(ry === 0,
        when(rx === 1, s - lit(1L) - y).otherwise(y)).otherwise(x)
      val ny = when(ry === 0,
        when(rx === 1, s - lit(1L) - x).otherwise(x)).otherwise(y)
      struct(nx.as("x"), ny.as("y"), nd.as("d"))
    }).getField("d")
  }

  /** [[zOrderLayout]] with the Hilbert key instead of Morton. */
  def hilbertLayout(
      df: DataFrame, xCol: String, yCol: String, files: Int,
      bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__h", hilbertValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** N-dimensional Hilbert index via Skilling's transform ("Programming
    * the Hilbert curve", AIP Conf. Proc. 707, 2004) — the 3-plus-column
    * generalization of [[hilbertValue]] (VERDICT r15 #5: zOrderValue is
    * N-D but the stronger-locality Hilbert key was 2-D only). Skilling's
    * formulation is two bit-level sweeps over the coordinate vector —
    * an "inverse undo" of the per-quadrant rotations, then a Gray
    * decode with a parity correction — followed by MSB-first bit
    * interleave; every step is shift/mask/xor integer arithmetic, so
    * the DuckDB twin replays it level-for-level (generated SQL, the
    * hilbertOracleSql device) and SinksSpec proves the same adjacency
    * property as 2-D: consecutive indices are unit Manhattan steps
    * over the full N-D grid.
    *
    * Expression shape (the r15 codegen-size lesson): the level loop is
    * a runtime `aggregate` FOLD over a literal level array with the
    * coordinate vector as struct state — LINEAR in `bits`, not the
    * 3^bits plan-time unroll that blew the 2-D key's first cut. All
    * post-loop steps run inside the fold's `finish` lambda, where the
    * final struct and the parity term bind ONCE as lambda variables
    * instead of re-evaluating per reference. Inputs must be
    * non-negative integers below 2^bits ([[quantileBuckets]]-encode
    * upstream); the index spans [0, 2^(n*bits)), so n*bits <= 63.
    */
  def hilbertValueN(
      cols: Seq[org.apache.spark.sql.Column],
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{aggregate, array, lit, shiftleft, shiftright, struct, when}
    val n = cols.size
    require(n >= 2, s"hilbertValueN needs >= 2 columns, got $n")
    require(bits >= 2 && n * bits <= 63,
      s"$n cols x $bits bits outside [2, 63] total index bits")
    val names = (0 until n).map(i => s"x$i")
    // M = 2^(bits-1) down to 2 — Skilling's Q loop
    val qvals = array(((bits - 1) to 1 by -1).map(k => lit(1L << k)): _*)
    val init = struct(cols.zip(names).map {
      case (c, nm) => c.cast("long").as(nm) }: _*)
    aggregate(qvals, init,
      (st, q) => {
        val p = q - lit(1L)
        var xs: Seq[org.apache.spark.sql.Column] = names.map(st.getField)
        for (i <- 0 until n) {
          val hi = xs(i).bitwiseAND(q) =!= 0
          if (i == 0)
            // exchange with itself is the identity — only the invert arm acts
            xs = xs.updated(0, when(hi, xs(0).bitwiseXOR(p)).otherwise(xs(0)))
          else {
            val t = xs(0).bitwiseXOR(xs(i)).bitwiseAND(p)
            val nx0 = when(hi, xs(0).bitwiseXOR(p)).otherwise(xs(0).bitwiseXOR(t))
            val nxi = when(hi, xs(i)).otherwise(xs(i).bitwiseXOR(t))
            xs = xs.updated(0, nx0).updated(i, nxi)
          }
        }
        struct(xs.zip(names).map { case (c, nm) => c.as(nm) }: _*)
      },
      st => {
        // Gray decode: g_i = x_0 ^ ... ^ x_i (st fields are bound refs)
        val g = names.map(st.getField)
          .scanLeft(lit(0L))((acc, x) => acc.bitwiseXOR(x)).drop(1)
        // parity correction from the top coordinate's bits
        val tAgg = aggregate(qvals, lit(0L), (acc, q) =>
          when(g.last.bitwiseAND(q) =!= 0, acc.bitwiseXOR(q - lit(1L)))
            .otherwise(acc))
        // bind t once, then MSB-first interleave: bit k of coord i
        // lands at position k*n + (n-1-i)
        aggregate(array(tAgg), lit(0L), (acc, t) =>
          (for (i <- 0 until n; k <- 0 until bits) yield
            shiftleft(shiftright(g(i).bitwiseXOR(t), k).bitwiseAND(lit(1L)),
              k * n + (n - 1 - i))).foldLeft(acc)(_ bitwiseOR _))
      })
  }

  /** [[zOrderLayoutQuantile]] with the N-D Hilbert key: quantile
    * bucket-encode each layout column, range-partition + sort on the
    * Skilling index of the buckets, write the original columns. */
  def hilbertLayoutQuantile(
      df: DataFrame, hCols: Seq[String], files: Int, bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.col
    val h = hilbertValueN(quantileBuckets(df, hCols, bits), bits)
    df.withColumn("__h", h)
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** Quantile bucket-encoding of arbitrary numeric columns into the
    * [0, 2^bits) integer domain [[zOrderValue]] needs — the upstream
    * encode step for Z-ordering skewed or unbounded columns (raw
    * values would waste most of the bit budget on empty range).
    * Boundaries come from ONE driver-side `approxQuantile` pass
    * (Greenwald–Khanna; 2^bits − 1 cut points per column — a bounded,
    * k-row driver artifact like the K-Means centroids), compiled into
    * a map-side sum-of-indicators expression (codegen'd; 2^bits − 1
    * comparisons per row, fine for the 6–8 bit encodings a z-layout
    * uses). Equal values share a bucket, so the encoding is
    * deterministic given the boundaries; the boundaries themselves
    * are engine-specific (approximate sketch) — layout tooling, not
    * an oracle surface (spec-verified balance + monotonicity). NULL
    * values satisfy no indicator and land in bucket 0 — acceptable
    * for a layout key (nulls cluster together); filter first if they
    * should not.
    */
  def quantileBucket(
      df: DataFrame, colName: String, bits: Int,
      relErr: Double = 0.001): org.apache.spark.sql.Column =
    quantileBuckets(df, Seq(colName), bits, relErr).head

  /** Multi-column form of [[quantileBucket]]: ALL boundary sets come
    * from ONE `approxQuantile` pass over the dataset (the API takes
    * multiple columns natively), not one full scan per column — on
    * the 100 TB tables this layout tooling targets, k z-columns would
    * otherwise pay k−1 redundant full-table reads (review r15).
    * Returns one bucket expression per input column, in order.
    */
  def quantileBuckets(
      df: DataFrame, colNames: Seq[String], bits: Int,
      relErr: Double = 0.001): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val n = 1 << bits
    val probes = (1 until n).map(_.toDouble / n).toArray
    val allBounds = df.stat.approxQuantile(colNames.toArray, probes, relErr)
    colNames.zip(allBounds).map { case (c, bs) =>
      bs.distinct.map(b => when(col(c) >= b, 1L).otherwise(0L))
        .reduceOption(_ + _).getOrElse(lit(0L))
    }
  }

  /** [[zOrderLayout]] over quantile-bucket-encoded columns: encode
    * each z-column with [[quantileBucket]], range-partition + sort on
    * the Morton key of the BUCKETS, write the ORIGINAL columns. This
    * is the general-input form of [[writeZOrdered]] — skew-robust
    * because every bucket holds ~1/2^bits of the rows regardless of
    * the value distribution.
    */
  def zOrderLayoutQuantile(
      df: DataFrame, zCols: Seq[String], files: Int, bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.col
    val z = zOrderValue(quantileBuckets(df, zCols, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Result of a [[compact]] pass. */
  final case class CompactStats(
      filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long,
      binsRewritten: Int)

  /** Greedy consecutive bin-packing shared by [[compact]] and
    * [[compactSnapshot]]: a bin closes when adding the next file
    * would cross `targetBytes`; oversized singletons pass through.
    * Input order (name order / manifest order = key order) is
    * preserved inside and across bins.
    */
  private def packBins[T](
      files: Seq[T], len: T => Long, targetBytes: Long): List[Vector[T]] = {
    val bins = scala.collection.mutable.ListBuffer.empty[Vector[T]]
    files.foreach { f =>
      if (bins.nonEmpty && bins.last.map(len).sum + len(f) <= targetBytes)
        bins(bins.size - 1) = bins.last :+ f
      else bins += Vector(f)
    }
    bins.toList
  }

  /** Merge each bin's source files (in order) into `tmp/bin<idx>` as
    * one parquet file — the concurrent rewrite stage shared by both
    * compaction paths. unionAll keeps parent-partition order and
    * coalesce(1) concatenates parents in order: rows land
    * first-file-first, original order inside each file.
    */
  private def mergeBins(
      spark: org.apache.spark.sql.SparkSession,
      bins: Seq[(Int, Seq[String])], tmp: String, parallelism: Int): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, bins.size))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      import scala.concurrent.{Await, Future}
      val jobs = bins.map { case (i, srcs) => Future {
        srcs.map(spark.read.parquet(_)).reduce(_ unionAll _).coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/bin$i")
      }}
      Await.result(Future.sequence(jobs.toList),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }

  /** The staged single parquet part file of `tmp/bin<idx>`. */
  private def stagedPart(
      fs: org.apache.hadoop.fs.FileSystem, tmp: String,
      idx: Int): org.apache.hadoop.fs.Path =
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/bin$idx"))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file for bin $idx"))

  /** Small-file compaction that PRESERVES a z/Hilbert layout's order
    * (VERDICT r15 #7 — the day-2 operation every 100 TB table needs:
    * streaming appends and over-parallel writes leave directories of
    * kilobyte files whose per-file overhead dominates scans, but a
    * naive `repartition + rewrite` destroys the range layout the
    * table was built for). Contract: the directory was written by
    * this module's layout writers — range-partitioned part files
    * whose NAME order is key order and whose rows are sorted within
    * each file. Compaction then never needs to recompute the layout
    * key: it greedily packs CONSECUTIVE files into bins of up to
    * `targetBytes` and concatenates each bin in name order (per-file
    * row order preserved by the single-partition coalesce), so the
    * output is the same global key order in fewer files, and each
    * merged file's min/max stats stay tight — consecutive ranges
    * union to one range, no overlap is introduced (SinksSpec measures
    * both). Single-file bins are left byte-identical in place; each
    * merged bin takes its FIRST member's file name, keeping the
    * name-order contract for the next compaction pass.
    *
    * Scale: the driver work is one file listing (already
    * driver-sized on any FS) and the greedy scan; each bin rewrite is
    * an independent small job — submitted concurrently (`parallelism`
    * in-flight) so a wide cluster fills, and each job reads only its
    * own bin's bytes. Atomicity (r17): on a snapshot-managed table
    * (see [[initSnapshot]]) this method dispatches to
    * [[compactSnapshot]] — staged files + ONE manifest rename, so a
    * [[readTable]] reader sees exactly the old or the new snapshot at
    * every crash point (SinksSpec injects a crash between every pair
    * of FS ops to prove it). On a plain directory the swap-in is
    * rename-only until every copy is safe — stage, hide sources,
    * commit, delete — with every FileSystem rename/delete return code
    * CHECKED, so a failure aborts loudly and both crash directions
    * recover by rename; but plain-directory readers can still observe
    * the brief hide→commit gap, which is why 100 TB tables should be
    * snapshot-managed.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long, parallelism: Int = 4): CompactStats = {
    require(targetBytes > 0 && parallelism >= 1)
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(hconf)
    // a snapshot-managed table compacts through the atomic manifest
    // swap (r17) — readers via readTable never see a half-swapped
    // state; the in-place path below remains for plain directories
    if (latestManifest(fs, dir).isDefined)
      return compactSnapshot(spark, path, targetBytes, parallelism)
    val files = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && isDataFile(st.getPath.getName))
      .sortBy(_.getPath.getName)
    val bytesBefore = files.map(_.getLen).sum
    val toMerge = packBins[org.apache.hadoop.fs.FileStatus](
      files, _.getLen, targetBytes).filter(_.size >= 2)
    if (toMerge.nonEmpty) {
      val tmp = new org.apache.hadoop.fs.Path(dir, ".compact-tmp")
      fs.mkdirs(tmp)
      mergeBins(spark, toMerge.zipWithIndex.map { case (bin, i) =>
        (i, bin.map(_.getPath.toString))
      }, tmp.toString, parallelism)
      // swap in — rename-only until every copy is safe (review r17;
      // the r16 order deleted sources BEFORE the staged file took the
      // final name, so a crash there left the only copy hidden):
      //   1. stage the merged file into the table dir under a
      //      dot-name (parquet readers skip dot-files — live view
      //      still serves the sources);
      //   2. HIDE each source by renaming it to `.retired-<name>`
      //      (reversible — nothing is destroyed yet);
      //   3. COMMIT: rename staged -> the first member's name (name
      //      order — and thus key order — survives);
      //   4. only then DELETE the hidden sources.
      // Both crash directions now recover by rename alone: before
      // step 3 the sources exist intact under `.retired-*` (rename
      // back); after step 3 the merged file is live and the hidden
      // sources are redundant copies. Every rename/delete result is
      // CHECKED: Hadoop FileSystems signal failure by RETURNING
      // FALSE, not throwing, and an unchecked false would silently
      // destroy the only copy of a bin (review r16). For readers
      // that must never see even the brief hide->commit gap, use the
      // manifest snapshot protocol ([[initSnapshot]]/[[readTable]]) —
      // [[compact]] detects a manifest and switches to one atomic
      // manifest swap instead.
      def mustRename(from: org.apache.hadoop.fs.Path, to: org.apache.hadoop.fs.Path): Unit =
        require(fs.rename(from, to), s"compact: rename $from -> $to failed")
      def mustDelete(pth: org.apache.hadoop.fs.Path): Unit =
        require(fs.delete(pth, false), s"compact: delete $pth failed")
      toMerge.zipWithIndex.foreach { case (bin, i) =>
        val part = stagedPart(fs, tmp.toString, i)
        val finalName = bin.head.getPath.getName
        val staged = new org.apache.hadoop.fs.Path(dir, s".compacting-$finalName")
        mustRename(part, staged)
        val hidden = bin.map { f =>
          val h = new org.apache.hadoop.fs.Path(dir, s".retired-${f.getPath.getName}")
          mustRename(f.getPath, h)
          h
        }
        mustRename(staged, new org.apache.hadoop.fs.Path(dir, finalName))
        hidden.foreach(mustDelete)
      }
      fs.delete(tmp, true)
    }
    val after = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && isDataFile(st.getPath.getName))
    CompactStats(files.size, after.size, bytesBefore,
      after.map(_.getLen).sum, toMerge.size)
  }

  // --------------------------------------------------------------
  // Manifest snapshot protocol (VERDICT r16 next #1): atomic
  // visibility for layout tables
  // --------------------------------------------------------------

  /** Test seam: invoked with a short tag before every mutating
    * FileSystem operation of the snapshot protocol. SinksSpec's
    * crash-injection test throws at each successive op index and
    * asserts a reader always sees exactly the old or the new
    * snapshot — never a mix, never missing rows. Production cost:
    * one no-op lambda call per (rare, driver-side) FS mutation.
    */
  private[graft] var fsOpHook: String => Unit = _ => ()

  private val ManifestName = "manifest-v([0-9]+)".r

  /** Visible DATA files only: dot/underscore temporaries, manifests,
    * and bloom sidecars are table metadata — a listing that feeds a
    * parquet reader or a manifest's file list must never pick them up
    * (a crashed init retry once listed a staged `bloom-*` sidecar as
    * data; review r17). */
  private def isDataFile(n: String): Boolean =
    !n.startsWith("_") && !n.startsWith(".") && !n.startsWith("bloom-") &&
      !ManifestName.pattern.matcher(n).matches()

  private def fsFor(
      spark: org.apache.spark.sql.SparkSession, path: String) = {
    val dir = new org.apache.hadoop.fs.Path(path)
    (dir.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
  }

  /** Newest committed manifest version under `dir`, if the table is
    * snapshot-managed. Readers resolve THIS, then read exactly the
    * files it lists — a half-finished maintenance pass (staged files,
    * hidden files, unpublished manifests) is invisible by
    * construction.
    */
  def latestManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case ManifestName(v) => v.toLong }
      .sorted.lastOption

  /** Per-column [min, max] of one data file as carried in its
    * manifest line — the driver-side statistic behind
    * [[readTableWhere]]'s file skipping (the Iceberg/Delta device: at
    * 100 TB the win is not reading less of a file but never LISTING
    * or OPENING 99% of them — parquet row-group stats still require
    * one footer read per file, the manifest line requires none).
    * `kind`: 'L' integral, 'D' floating (floats are widened to double
    * at collection — exact), 'S' string (compared in UTF-8 byte
    * order, matching Spark's and parquet's binary collation, not
    * java.lang.String's UTF-16 order). min/max hold the decoded
    * values in canonical string form.
    */
  final case class ColRange(kind: Char, min: String, max: String) {
    private def utf8Cmp(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    private def asL(v: Any): Long = v match {
      case n: Long => n
      case n: Int => n.toLong
      case n: Short => n.toLong
      case n: Byte => n.toLong
      case other => throw new IllegalArgumentException(
        s"integral bound expected, got $other (${other.getClass.getName})")
    }
    private def asD(v: Any): Double = v match {
      case n: Double => n
      case n: Float => n.toDouble
      case n: Long => n.toDouble
      case n: Int => n.toDouble
      case other => throw new IllegalArgumentException(
        s"numeric bound expected, got $other (${other.getClass.getName})")
    }
    private def cmp(a: String, b: String): Int = kind match {
      case 'L' => java.lang.Long.compare(a.toLong, b.toLong)
      case 'D' => java.lang.Double.compare(a.toDouble, b.toDouble)
      case 'S' => utf8Cmp(a, b)
      case other =>
        throw new IllegalStateException(s"unknown stat kind '$other'")
    }

    /** The smallest range covering both inputs — what a compaction
      * records for a merged file WITHOUT rescanning it (a merge
      * permutes no values, so the union of the sources' ranges is
      * exact). None when the kinds disagree (schema drift between
      * files — drop the stat, stay conservative). */
    def union(that: ColRange): Option[ColRange] =
      if (kind != that.kind) None
      else Some(ColRange(kind,
        if (cmp(min, that.min) <= 0) min else that.min,
        if (cmp(max, that.max) >= 0) max else that.max))

    /** Conservative intersection test of this file's range with the
      * inclusive query interval [lo, hi] — false ONLY when the file
      * provably holds no matching row. */
    def overlaps(lo: Any, hi: Any): Boolean = kind match {
      case 'L' => !(max.toLong < asL(lo) || min.toLong > asL(hi))
      case 'D' => !(max.toDouble < asD(lo) || min.toDouble > asD(hi))
      case 'S' =>
        !(utf8Cmp(max, lo.toString) < 0 || utf8Cmp(min, hi.toString) > 0)
      case other =>
        throw new IllegalStateException(s"unknown stat kind '$other'")
    }
  }

  /** Pointer to a per-file Bloom sidecar: `file` (relative to the
    * table dir) holds the m-bit Kirsch–Mitzenmacher bitset over one
    * column's values of ONE data file — the point-lookup complement
    * of [[ColRange]] stats (a range prunes nothing for `key = v` on a
    * column the layout isn't sorted by; the bloom answers "provably
    * absent from this file" in m/8 bytes read driver-side). Sidecars
    * are referenced BY the manifest like data files — retention GC
    * keeps them alive exactly as long as some manifest lists them. */
  final case class BloomRef(file: String, mBits: Int, k: Int)

  /** Bloom-sidecar build request for the snapshot writers: one filter
    * per column in `cols` (integral or string), 2^mBits bits, k
    * probes. fpp ≈ (1 − e^(−k·n/m))^k for n distinct values per data
    * file — the default 2^20 bits / k=5 holds fpp < 1e-6 up to ~10k
    * values per file and < 1% up to ~100k, at 128 KiB per sidecar. */
  final case class BloomSpec(cols: Seq[String], mBits: Int = 20, k: Int = 5)

  /** One manifest line: a data file (name relative to the table dir)
    * plus its optional per-column ranges and Bloom sidecar refs. */
  final case class ManifestEntry(
      name: String, stats: Map[String, ColRange],
      blooms: Map[String, BloomRef] = Map.empty)

  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8")
  private def dec(v: String): String =
    java.net.URLDecoder.decode(v, "UTF-8")

  /** Manifest line format (versioned by shape, backward compatible):
    * `name` alone, or `name<TAB>tok<TAB>…` where each tok is either a
    * range stat `col=K:encMin:encMax` (K the [[ColRange]] kind) or a
    * Bloom sidecar ref `col=B:mBits:k:encFile`; enc is URL-encoding
    * (so values carry no tab/newline/colon). Lines starting with `#`
    * are headers (`#kind=append|init|compact|replace`,
    * `#txn=app:batch`), skipped by the entry parser and read by
    * [[manifestKind]]/[[lastCommittedBatch]].
    */
  private def serializeEntry(e: ManifestEntry): String = {
    require(!e.name.contains('\t') && !e.name.contains('\n'),
      s"file name ${e.name} cannot be carried in a manifest line")
    def ckCol(c: String): String = {
      require(!c.contains('=') && !c.contains('\t'),
        s"column name $c cannot be carried in a manifest stat")
      c
    }
    val toks =
      e.stats.toSeq.sortBy(_._1).map { case (c, r) =>
        s"${ckCol(c)}=${r.kind}:${enc(r.min)}:${enc(r.max)}"
      } ++ e.blooms.toSeq.sortBy(_._1).map { case (c, b) =>
        s"${ckCol(c)}=B:${b.mBits}:${b.k}:${enc(b.file)}"
      }
    (e.name +: toks).mkString("\t")
  }

  private def parseEntry(line: String): ManifestEntry = {
    val toks = line.split('\t')
    var stats = Map.empty[String, ColRange]
    var blooms = Map.empty[String, BloomRef]
    toks.tail.foreach { t =>
      val eq = t.indexOf('=')
      require(eq > 0, s"malformed manifest stat token '$t'")
      val col = t.substring(0, eq)
      // limit -1: split must KEEP trailing empty fields — enc("") is
      // empty, so a string stat over empty values serializes as
      // 'col=S::' and the default split would drop both bounds
      val parts = t.substring(eq + 1).split(":", -1)
      parts(0) match {
        case "B" =>
          require(parts.length == 4, s"malformed manifest bloom token '$t'")
          blooms += col -> BloomRef(dec(parts(3)), parts(1).toInt, parts(2).toInt)
        case k if k.length == 1 && parts.length == 3 =>
          stats += col -> ColRange(k.charAt(0), dec(parts(1)), dec(parts(2)))
        case _ => throw new IllegalArgumentException(
          s"malformed manifest stat token '$t'")
      }
    }
    ManifestEntry(toks.head, stats, blooms)
  }

  private def manifestLines(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, version: Long): Seq[String] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"manifest-v$version"))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The data-file entries (names + optional column ranges) listed by
    * manifest `version`, in manifest (= key) order. */
  def manifestEntries(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, version: Long): Seq[ManifestEntry] =
    manifestLines(fs, dir, version).filterNot(_.startsWith("#")).map(parseEntry)

  /** The commit kind recorded in manifest `version`'s header —
    * `append` / `init` / `compact` / `replace` — or None for a
    * pre-header manifest. [[readTableChanges]] keys its exactness
    * check on this. */
  def manifestKind(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, version: Long): Option[String] =
    manifestLines(fs, dir, version)
      .find(_.startsWith("#kind=")).map(_.stripPrefix("#kind="))

  /** The file names (relative to `dir`, one per line, KEY ORDER — the
    * manifest carries the layout's name-order contract once
    * compaction renames files) listed by manifest `version`. */
  def manifestFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, version: Long): Seq[String] =
    manifestEntries(fs, dir, version).map(_.name)

  /** Atomically publish manifest `expectedVersion + 1` listing
    * `files` (names relative to `dir`, in key order). The commit
    * point is ONE same-directory rename of a fully-written dot-file —
    * atomic on HDFS and POSIX local FS — so a crash at any earlier
    * step leaves the previous manifest authoritative and a crash
    * after it leaves the new one fully published; there is no state
    * in between. Optimistic concurrency: if `expectedVersion + 1`
    * already exists (a racing committer won), the commit FAILS
    * loudly — retry against the new snapshot.
    */
  def commit(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      expectedVersion: Long, files: Seq[String]): Long =
    commitEntries(fs, dir, expectedVersion,
      files.map(ManifestEntry(_, Map.empty)), kind = "replace")

  /** [[commit]] with per-file column ranges and a commit-kind header —
    * the full manifest form the stats-aware writers
    * ([[initSnapshot]]/[[appendSnapshot]]/[[compactSnapshot]]) publish.
    * Same atomicity and optimistic-concurrency contract. */
  def commitEntries(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      expectedVersion: Long, entries: Seq[ManifestEntry],
      kind: String, txn: Option[(String, Long)] = None): Long = {
    val next = expectedVersion + 1
    val target = new org.apache.hadoop.fs.Path(dir, s"manifest-v$next")
    require(!fs.exists(target),
      s"commit: manifest-v$next already exists under $dir — a " +
        "concurrent committer won; re-resolve the latest snapshot and retry")
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".manifest-tmp-${java.util.UUID.randomUUID}")
    fsOpHook(s"manifest-write:$next")
    val headers = s"#kind=$kind" +:
      txn.toSeq.map { case (app, bid) => s"#txn=${enc(app)}:$bid" }
    val out = fs.create(tmp, false)
    try out.write(
      (headers ++ entries.map(serializeEntry)).mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fsOpHook(s"manifest-commit:$next")
    // publish through FileContext with the no-overwrite flag: on HDFS
    // this rename atomically FAILS if the target exists, closing the
    // check-then-rename race two committers could otherwise win
    // simultaneously (FileSystem.rename on a POSIX local FS maps to
    // rename(2), which silently REPLACES an existing target — review
    // r17). On the local FS the no-overwrite check is re-done inside
    // FileContext just before the rename — not truly atomic, but
    // local mode means a single driver; the multi-writer 100 TB story
    // runs on HDFS/object-store semantics where this IS atomic.
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.makeQualified(dir).toUri, fs.getConf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(target),
        org.apache.hadoop.fs.Options.Rename.NONE)
    } catch {
      case e: java.io.IOException =>
        fs.delete(tmp, false)
        throw new IllegalStateException(
          s"commit: publishing manifest-v$next under $dir failed " +
            s"(concurrent committer or FS error: ${e.getMessage}); " +
            "snapshot unchanged", e)
    }
    next
  }

  /** Bring an existing layout directory (written by this module's
    * layout writers — name order = key order) under snapshot
    * management: publish manifest-v1 listing the current visible part
    * files in name order. From then on, maintenance passes
    * ([[compact]]) become staged-files + one manifest swap, and
    * [[readTable]] readers never observe a half-swapped directory.
    */
  def initSnapshot(
      spark: org.apache.spark.sql.SparkSession, path: String,
      statsCols: Seq[String] = Seq.empty,
      bloom: Option[BloomSpec] = None): Long = {
    val (fs, dir) = fsFor(spark, path)
    require(latestManifest(fs, dir).isEmpty,
      s"initSnapshot: $path is already snapshot-managed")
    val names = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && isDataFile(st.getPath.getName))
      .map(_.getPath.getName).sorted
    require(names.nonEmpty, s"initSnapshot: no data files under $path")
    val (stats, bloomBits) = collectFileMeta(spark, path, names, statsCols, bloom)
    val blooms = stageBlooms(fs, dir, bloomBits, bloom)
    commitEntries(fs, dir, 0L,
      names.map(n => ManifestEntry(n, stats.getOrElse(n, Map.empty),
        blooms.getOrElse(n, Map.empty))),
      kind = "init")
  }

  /** Per-file min/max of `cols` over the given data files — ONE scan,
    * column-pruned to exactly the stat columns, grouped by
    * `input_file_name` (so at write time a table pays one cheap
    * footer-friendly pass; thereafter every [[readTableWhere]] prunes
    * from the manifest without touching the files at all). Integral
    * columns record kind 'L', float/double 'D' (floats widened to
    * double — exact), strings 'S'; other types (and all-null files)
    * simply record no range for that column, which readers treat as
    * "cannot prune" — conservative by construction.
    */
  def collectFileStats(
      spark: org.apache.spark.sql.SparkSession, path: String,
      names: Seq[String], cols: Seq[String]): Map[String, Map[String, ColRange]] =
    collectFileMeta(spark, path, names, cols, None)._1

  /** One pass for everything a manifest entry records about a file:
    * min/max ranges on `statsCols` AND bloom bitsets on `bloom.cols`,
    * from a SINGLE job grouped by `input_file_name` (a separate scan
    * per family would read the freshly staged data twice per append;
    * review r17). Files are processed in bounded groups to cap driver
    * memory (each file's bloom is m/8 bytes on the wire).
    */
  private def collectFileMeta(
      spark: org.apache.spark.sql.SparkSession, path: String,
      names: Seq[String], statsCols: Seq[String], bloom: Option[BloomSpec]):
      (Map[String, Map[String, ColRange]], Map[String, Map[String, Array[Long]]]) = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min, udaf}
    import org.apache.spark.sql.types._
    val bloomCols = bloom.map(_.cols).getOrElse(Seq.empty)
    if ((statsCols.isEmpty && bloomCols.isEmpty) || names.isEmpty)
      return (Map.empty, Map.empty)
    val probe = spark.read.parquet(names.map(n => s"$path/$n"): _*)
    val kinds: Seq[(String, Char)] = statsCols.map { c =>
      val k = probe.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => 'L'
        case FloatType | DoubleType => 'D'
        case StringType => 'S'
        case other => throw new IllegalArgumentException(
          s"collectFileStats: unsupported stat column type $other for $c " +
            "(supported: integral, float/double, string)")
      }
      c -> k
    }
    bloomCols.foreach { c =>
      probe.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType => ()
        case other => throw new IllegalArgumentException(
          s"collectFileBlooms: unsupported bloom column type $other for $c " +
            "(supported: integral, string)")
      }
    }
    val statAggs = kinds.flatMap { case (c, k) =>
      val base = if (k == 'D') col(c).cast("double") else col(c)
      Seq(min(base).as(s"__min_$c"), max(base).as(s"__max_$c"))
    }
    val bloomAggs = bloomCols.map { c =>
      val (h1, h2) = bloomHashExprs(col(c))
      val u = udaf(new graft.functions.BloomBitsAgg(bloom.get.k, bloom.get.mBits))
      u(h1, h2).as(s"__bloom_$c")
    }
    val aggs = statAggs ++ bloomAggs
    val stats = scala.collection.mutable.Map.empty[String, Map[String, ColRange]]
    val blooms = scala.collection.mutable.Map.empty[String, Map[String, Array[Long]]]
    names.grouped(64).foreach { group =>
      val df = spark.read.parquet(group.map(n => s"$path/$n"): _*)
      val rows = df.groupBy(input_file_name().as("__file"))
        .agg(aggs.head, aggs.tail: _*).collect()
      rows.foreach { r =>
        val fname = r.getString(0).split('/').last
        stats += fname -> kinds.zipWithIndex.flatMap { case ((c, k), i) =>
          val mn = r.get(1 + 2 * i)
          val mx = r.get(2 + 2 * i)
          if (mn == null || mx == null) None
          else Some(c -> ColRange(k, mn.toString, mx.toString))
        }.toMap
        blooms += fname -> bloomCols.zipWithIndex.map { case (c, i) =>
          c -> r.getSeq[Long](1 + 2 * kinds.size + i).toArray
        }.toMap
      }
    }
    (stats.toMap, blooms.toMap)
  }

  // ---- Bloom sidecars: point-lookup pruning ----------------------

  /** The bloom hash family, shared between the build column and the
    * driver-side probe: both Kirsch–Mitzenmacher base hashes are
    * xxhash64 (seed 42, the `functions.xxhash64` default) of a
    * distinguishing int tag and the value's STRING form — casting to
    * string on the build side and `toString` on the probe side agree
    * for the supported integral/string columns, which is what pins the
    * two sides to identical bits. */
  private def bloomHashExprs(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.{lit, xxhash64}
    (xxhash64(lit(1), c.cast("string")), xxhash64(lit(2), c.cast("string")))
  }

  private def bloomHashValue(tag: Int, v: Any): Long = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    XxHash64(Seq(Literal(tag), Literal(v.toString)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]
  }

  /** Sidecar naming: a DISTINCT `bloom-` prefix, never a suffix on the
    * data file's name — a `part-*`-globbing reader or size scan must
    * not mistake a 128 KiB bitset for a parquet file. */
  private def bloomSidecarName(dataFile: String, col: String): String =
    s"bloom-$col-$dataFile"

  private val BloomMagic = 0x47424c31 // "GBL1"

  private def writeBloomSidecar(
      fs: org.apache.hadoop.fs.FileSystem, dir: org.apache.hadoop.fs.Path,
      name: String, mBits: Int, k: Int, bits: Array[Long]): Unit = {
    fsOpHook(s"bloom-write:$name")
    // overwrite = true: a sidecar at this name is residue of a crashed
    // attempt at the same commit, same as compactSnapshot's staged files
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(dir, name), true))
    try {
      out.writeInt(BloomMagic); out.writeInt(mBits); out.writeInt(k)
      bits.foreach(out.writeLong)
    } finally out.close()
  }

  private def readBloomSidecar(
      fs: org.apache.hadoop.fs.FileSystem, dir: org.apache.hadoop.fs.Path,
      name: String): (Int, Int, Array[Long]) = {
    val in = new java.io.DataInputStream(
      fs.open(new org.apache.hadoop.fs.Path(dir, name)))
    try {
      require(in.readInt() == BloomMagic, s"$name is not a bloom sidecar")
      val mBits = in.readInt(); val k = in.readInt()
      val bits = Array.fill(1 << (mBits - 6))(in.readLong())
      (mBits, k, bits)
    } finally in.close()
  }

  /** Process-wide decoded-sidecar LRU so repeated point lookups pay the
    * FS read once per sidecar, not once per call (review r17). Safe to
    * cache by name: append sidecars embed a UUID (never reused) and a
    * compaction crash-retry rewrites the same name with byte-identical
    * contents (deterministic OR of the same sources). 256 entries
    * ≈ 32 MiB at the default 2^20 bits. */
  private val sidecarCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (Int, Int, Array[Long])](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Int, Int, Array[Long])]): Boolean =
        size() > 256
    })

  private def readBloomSidecarCached(
      fs: org.apache.hadoop.fs.FileSystem, dir: org.apache.hadoop.fs.Path,
      name: String): (Int, Int, Array[Long]) = {
    val key = s"${fs.makeQualified(dir)}/$name"
    val hit = sidecarCache.get(key)
    if (hit != null) hit
    else {
      val v = readBloomSidecar(fs, dir, name)
      sidecarCache.put(key, v)
      v
    }
  }

  /** Per-file Bloom bitsets over `spec.cols` for the given data files —
    * ONE scan column-pruned to the bloom columns, each file's hashes
    * OR-aggregated map-side into its m/64-long buffer
    * ([[graft.functions.BloomBitsAgg]] under `functions.udaf`), so only
    * files × m/8 bytes reach the driver. Files are processed in bounded
    * groups to cap driver memory; at append scale (a micro-batch's few
    * files) this is one small job. Supported column types: integral and
    * string (the realistic point-lookup keys; the hash family needs a
    * canonical string form both sides agree on).
    */
  def collectFileBlooms(
      spark: org.apache.spark.sql.SparkSession, path: String,
      names: Seq[String], spec: BloomSpec): Map[String, Map[String, Array[Long]]] =
    collectFileMeta(spark, path, names, Seq.empty, Some(spec))._2

  /** Stage the sidecars for pre-collected per-file bitsets and return
    * the manifest refs to attach — shared by the snapshot writers. */
  private def stageBlooms(
      fs: org.apache.hadoop.fs.FileSystem, dir: org.apache.hadoop.fs.Path,
      byFile: Map[String, Map[String, Array[Long]]],
      bloom: Option[BloomSpec]): Map[String, Map[String, BloomRef]] =
    bloom match {
      case None => Map.empty
      case Some(spec) =>
        byFile.map { case (f, byCol) =>
          f -> byCol.map { case (c, bits) =>
            val sc = bloomSidecarName(f, c)
            writeBloomSidecar(fs, dir, sc, spec.mBits, spec.k, bits)
            c -> BloomRef(sc, spec.mBits, spec.k)
          }
        }
    }

  /** Write a (layout) frame and bring it under snapshot management in
    * one step — the composition every z/Hilbert-ordered 100 TB table
    * should ship with: `writeLayoutSnapshot(hilbertLayout(df, …), p)`
    * publishes manifest-v1 over the freshly-written part files (name
    * order = key order), after which [[compact]] maintains the table
    * through atomic manifest swaps and [[readTable]] readers never
    * observe maintenance in progress. Returns the committed version.
    */
  def writeLayoutSnapshot(
      df: DataFrame, path: String, statsCols: Seq[String] = Seq.empty,
      bloom: Option[BloomSpec] = None): Long = {
    writeColumnar(df, path)
    initSnapshot(df.sparkSession, path, statsCols, bloom)
  }

  /** Snapshot-aware table read: resolve the newest manifest and read
    * exactly the files it lists (in manifest = key order); a
    * directory without a manifest falls back to the plain parquet
    * read. This is the ONLY read path that is immune to concurrent
    * compaction — a plain directory listing can catch the staged
    * files of an in-flight pass.
    */
  def readTable(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val (fs, dir) = fsFor(spark, path)
    latestManifest(fs, dir) match {
      case Some(v) =>
        val files = manifestFiles(fs, dir, v).map(n => s"$path/$n")
        spark.read.parquet(files: _*)
      case None => spark.read.parquet(path)
    }
  }

  /** All committed snapshot versions under `dir`, ascending. */
  def snapshotVersions(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case ManifestName(v) => v.toLong }.sorted

  /** Time-travel read: the table exactly as manifest `version`
    * committed it. Works as long as the version has not been expired
    * by [[expireSnapshots]] — compaction never deletes a file a
    * SURVIVING manifest references, so every retained snapshot stays
    * readable forever (the audit/reproducibility property a training
    * pipeline needs: re-read the exact table a run trained on).
    */
  def readTableAsOf(
      spark: org.apache.spark.sql.SparkSession, path: String,
      version: Long): DataFrame = {
    val (fs, dir) = fsFor(spark, path)
    require(snapshotVersions(fs, dir).contains(version),
      s"readTableAsOf: snapshot v$version is not retained under $path " +
        s"(retained: ${snapshotVersions(fs, dir).mkString(",")})")
    val files = manifestFiles(fs, dir, version).map(n => s"$path/$n")
    spark.read.parquet(files: _*)
  }

  /** Result of a stats-pruned snapshot read: the surviving files'
    * rows, plus the prune arithmetic a caller can assert or publish.
    * `df` holds ALL rows of the kept files — pruning is a
    * FILE-skipping hint, not a row filter; apply the real predicate
    * downstream (a kept file may hold non-matching rows, a pruned
    * file provably holds none). */
  final case class PruneResult(df: DataFrame, filesTotal: Int, filesRead: Int)

  /** Snapshot read with manifest-level data skipping: drop every file
    * whose recorded [min, max] on EVERY `preds` column misses the
    * inclusive [lo, hi] interval. Files without a recorded range for
    * a predicate column are KEPT (conservative), so the result is
    * always row-equal to `readTable(...).filter(preds)` once the
    * caller applies the same predicate. This is the 100 TB read path:
    * the prune runs on the driver against the manifest alone — no
    * file listing, no parquet footers — so a selective query on a
    * 100k-file layout table plans in milliseconds and schedules tasks
    * only for the files that can match (parquet row-group stats then
    * skip WITHIN the survivors).
    */
  def readTableWhere(
      spark: org.apache.spark.sql.SparkSession, path: String,
      preds: Map[String, (Any, Any)],
      eq: Map[String, Any] = Map.empty): PruneResult = {
    val (fs, dir) = fsFor(spark, path)
    val v = latestManifest(fs, dir).getOrElse(
      throw new IllegalArgumentException(
        s"readTableWhere: $path is not snapshot-managed — run initSnapshot " +
          "with statsCols first"))
    val entries = manifestEntries(fs, dir, v)
    // point predicates pre-hash once; sidecars read at most once each.
    // Only integral/string probe values are accepted — the hash family
    // is defined over the value's canonical string form, and e.g. a
    // Double probe of a bigint column ("137.0" vs "137") would silently
    // exclude every file instead of failing (review r17)
    val eqHashes = eq.map { case (c, x) =>
      x match {
        case _: Long | _: Int | _: Short | _: Byte | _: String => ()
        case other => throw new IllegalArgumentException(
          s"readTableWhere: eq probe for $c must be integral or string " +
            s"(the bloom hash domain), got $other (${other.getClass.getName})")
      }
      c -> (x, bloomHashValue(1, x), bloomHashValue(2, x))
    }
    val kept = entries.filter { e =>
      preds.forall { case (c, (lo, hi)) =>
        e.stats.get(c).forall(_.overlaps(lo, hi))
      } && eqHashes.forall { case (c, (x, h1, h2)) =>
        // a point lookup prunes through the range stat when present
        // AND the Bloom sidecar when present — both conservative
        e.stats.get(c).forall(_.overlaps(x, x)) &&
          e.blooms.get(c).forall { ref =>
            val (mBits, k, bits) = readBloomSidecarCached(fs, dir, ref.file)
            graft.functions.Bloom.mightContain(bits, k, mBits, h1, h2)
          }
      }
    }
    val df =
      if (kept.nonEmpty) spark.read.parquet(kept.map(e => s"$path/${e.name}"): _*)
      else {
        // zero survivors: serve an empty frame with the table's schema
        // (read one listed file's schema, emit no rows)
        import org.apache.spark.sql.functions.lit
        spark.read.parquet(s"$path/${entries.head.name}").filter(lit(false))
      }
    PruneResult(df, entries.size, kept.size)
  }

  /** Append-commit: stage `df`'s part files into the table directory
    * under fresh collision-free names (visible on disk but
    * unreferenced by the live manifest, so concurrent [[readTable]]
    * readers never see them early), then publish manifest v+1 =
    * previous entries ++ new entries in ONE atomic rename — the
    * ingest half of the snapshot protocol (readers flip from v to
    * v+1 with no intermediate state; a crash at any step leaves v
    * authoritative and only unreferenced residue, which
    * [[expireSnapshots]]' vacuum sweep reclaims). New files carry
    * min/max ranges on `statsCols` (one scan of the APPENDED data
    * only). Appended files join at the END of the manifest: a layout
    * table's global key-disjointness is intentionally relaxed by
    * ingest (stats stay exact per file, so [[readTableWhere]] pruning
    * stays correct) and restored by the next re-layout pass. Names
    * embed a UUID, not just the version: two racing appenders must
    * never stage over each other's files — the loser's commit fails
    * on the version check and its staged files become vacuumable
    * orphans, never part of the winner's snapshot.
    */
  def appendSnapshot(
      df: DataFrame, path: String,
      statsCols: Seq[String] = Seq.empty,
      bloom: Option[BloomSpec] = None): Long = {
    val v = {
      val (fs, dir) = fsFor(df.sparkSession, path)
      latestManifest(fs, dir).getOrElse(
        throw new IllegalArgumentException(
          s"appendSnapshot: $path is not snapshot-managed — run initSnapshot first"))
    }
    appendCommit(df, path, v, statsCols, bloom, txn = None)
  }

  /** Stage `df`'s part files into the table dir under fresh
    * collision-free `append-v{next}-{uuid}-p*` names — visible on disk
    * but unreferenced by any manifest until a commit lists them. */
  private def stageAppend(
      df: DataFrame, fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, nextVersion: Long): Seq[String] = {
    val token = java.util.UUID.randomUUID.toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".append-tmp-$token")
    writeColumnar(df, tmp.toString)
    val parts = fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && isDataFile(st.getPath.getName))
      .sortBy(_.getPath.getName)
    val named = parts.zipWithIndex.map { case (p, i) =>
      val name = f"append-v$nextVersion-$token-p$i%05d.parquet"
      fsOpHook(s"append-stage:$name")
      require(fs.rename(p.getPath, new org.apache.hadoop.fs.Path(dir, name)),
        s"appendSnapshot: staging $name failed")
      name
    }
    fs.delete(tmp, true)
    named
  }

  private def appendCommit(
      df: DataFrame, path: String, expectedVersion: Long,
      statsCols: Seq[String], bloom: Option[BloomSpec],
      txn: Option[(String, Long)]): Long = {
    val spark = df.sparkSession
    val (fs, dir) = fsFor(spark, path)
    val prior =
      if (expectedVersion == 0L) Seq.empty
      else manifestEntries(fs, dir, expectedVersion)
    val named = stageAppend(df, fs, dir, expectedVersion + 1)
    val (stats, bloomBits) = collectFileMeta(spark, path, named, statsCols, bloom)
    val blooms = stageBlooms(fs, dir, bloomBits, bloom)
    commitEntries(fs, dir, expectedVersion,
      prior ++ named.map(n => ManifestEntry(n, stats.getOrElse(n, Map.empty),
        blooms.getOrElse(n, Map.empty))),
      kind = "append", txn = txn)
  }

  /** The newest batch id a `#txn=appId:batchId` header records for
    * `appId` across the RETAINED manifests — how
    * [[appendSnapshotBatch]] recognizes a replayed micro-batch.
    * Retention caveat (same as Delta's txn table): [[expireSnapshots]]
    * discards expired manifests' headers, so keep retention longer
    * than the longest possible stream-restart window. */
  def lastCommittedBatch(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, appId: String): Option[Long] = {
    val tag = s"#txn=${enc(appId)}:"
    // bids are monotone per app in version order (a replayed bid never
    // commits), so the newest manifest carrying this app's tag holds
    // the max — scan newest-first and STOP there, instead of paying
    // O(retained versions × manifest size) driver I/O on every
    // micro-batch of a long-retention stream (review r17)
    snapshotVersions(fs, dir).reverseIterator
      .map(v => manifestLines(fs, dir, v).find(_.startsWith(tag)))
      .collectFirst { case Some(l) => l.stripPrefix(tag).toLong }
  }

  /** Exactly-once-effective streaming append — the `foreachBatch` sink
    * for snapshot tables. Structured Streaming replays a micro-batch
    * whose offsets did not commit (at-least-once), so the sink must
    * deduplicate by (query, batchId): each commit records its
    * `#txn=appId:batchId` header, and a call whose batchId is ≤ the
    * newest recorded for this appId is a REPLAY — skipped entirely,
    * returning the already-committed version. First call on an empty
    * directory bootstraps the table (manifest-v1). Everything else is
    * [[appendSnapshot]]: staged collision-free files + one atomic
    * manifest rename, min/max ranges on `statsCols`, so the ingested
    * table serves [[readTableWhere]] pruning and [[readTableChanges]]
    * capture from the first batch on.
    */
  def appendSnapshotBatch(
      df: DataFrame, path: String, appId: String, batchId: Long,
      statsCols: Seq[String] = Seq.empty,
      bloom: Option[BloomSpec] = None): Long = {
    val (fs, dir) = fsFor(df.sparkSession, path)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val v = latestManifest(fs, dir) match {
      case Some(ver) => ver
      case None =>
        // bootstrap is for an EMPTY directory only: committing
        // manifest-v1 over pre-existing plain parquet files would
        // orphan them out of every snapshot read and a later vacuum
        // would delete them for good (review r17) — an existing table
        // must opt in through initSnapshot. The protocol's own staged
        // residue (`append-v*` files a crashed first batch left
        // uncommitted) is exempt: it was never visible to any reader.
        require(!fs.listStatus(dir).exists(st =>
          st.isFile && isDataFile(st.getPath.getName) &&
            !st.getPath.getName.startsWith("append-v")),
          s"appendSnapshotBatch: $path holds data but no manifest — run " +
            "initSnapshot first (bootstrapping over it would orphan the " +
            "existing files)")
        0L
    }
    if (lastCommittedBatch(fs, dir, appId).exists(_ >= batchId)) v
    else appendCommit(df, path, v, statsCols, bloom, txn = Some((appId, batchId)))
  }

  /** Incremental (change-capture) read: exactly the rows committed
    * between snapshot `fromVersion` (exclusive) and `toVersion`
    * (inclusive) — the consumption primitive incremental dedup /
    * downstream refresh builds on (process each ingest batch once,
    * never rescan the table). Row-exact ONLY while every commit in
    * the interval is an [[appendSnapshot]] (`#kind=append`): a
    * compaction or re-layout commit REWRITES existing rows into new
    * files, which a file-level diff would replay as phantom inserts —
    * so any non-append commit in the interval fails loudly rather
    * than double-count (consume changes before compacting, or full
    * re-read across a rewrite; the same contract Iceberg's
    * incremental scan enforces).
    */
  def readTableChanges(
      spark: org.apache.spark.sql.SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val (fs, dir) = fsFor(spark, path)
    val retained = snapshotVersions(fs, dir)
    require(fromVersion < toVersion,
      s"readTableChanges: need fromVersion < toVersion, got $fromVersion >= $toVersion")
    require(retained.contains(fromVersion) && retained.contains(toVersion),
      s"readTableChanges: versions ($fromVersion, $toVersion] not retained " +
        s"under $path (retained: ${retained.mkString(",")})")
    retained.filter(v => v > fromVersion && v <= toVersion).foreach { v =>
      val k = manifestKind(fs, dir, v)
      require(k.contains("append"),
        s"readTableChanges: snapshot v$v is kind=${k.getOrElse("unknown")} — " +
          "a file-level diff across a rewrite commit would replay existing " +
          "rows as inserts; consume changes before compaction or re-read in full")
    }
    val before = manifestFiles(fs, dir, fromVersion).toSet
    val added = manifestFiles(fs, dir, toVersion).filterNot(before)
    if (added.nonEmpty) spark.read.parquet(added.map(n => s"$path/$n"): _*)
    else {
      import org.apache.spark.sql.functions.lit
      readTableAsOf(spark, path, toVersion).filter(lit(false))
    }
  }

  /** Retention GC: keep the newest `keep` manifests; delete the rest,
    * every data file that is PROVABLY dead (referenced by an expired
    * manifest and by no surviving one), AND — the vacuum sweep —
    * every unreferenced visible data file STRICTLY OLDER than the
    * newest surviving manifest. The age gate is what makes the sweep
    * safe against an in-flight committer: its staged files are
    * necessarily newer than the latest manifest it read (ties spared
    * — `<`, not `≤`), while crash residue (a pass that staged but
    * never committed, or a previous GC that deleted manifests and
    * then died before its file loop — both leave files referenced by
    * NOTHING, which the expired-referenced rule alone would leak
    * forever; review r17) is necessarily older. Deletion order is
    * manifests-first — a crash mid-GC leaves unreferenced files the
    * NEXT vacuum sweep reclaims, never a manifest pointing at deleted
    * data. Returns (manifestsDeleted, filesDeleted incl. vacuumed).
    */
  def expireSnapshots(
      spark: org.apache.spark.sql.SparkSession, path: String,
      keep: Int): (Int, Int) = {
    require(keep >= 1, "must keep at least the latest snapshot")
    val (fs, dir) = fsFor(spark, path)
    val versions = snapshotVersions(fs, dir)
    val survivors = versions.takeRight(keep)
    val expired = versions.dropRight(keep)
    // a manifest references its data files AND their bloom sidecars —
    // both live and die with the manifests that list them
    def referenced(v: Long): Seq[String] =
      manifestEntries(fs, dir, v).flatMap(e =>
        e.name +: e.blooms.values.map(_.file).toSeq)
    val live = survivors.flatMap(referenced).toSet
    val dead = expired.flatMap(referenced).toSet -- live
    expired.foreach { v =>
      fsOpHook(s"expire-manifest:$v")
      require(fs.delete(new org.apache.hadoop.fs.Path(dir, s"manifest-v$v"), false),
        s"expireSnapshots: deleting manifest-v$v failed")
    }
    dead.toSeq.sorted.foreach { n =>
      fsOpHook(s"expire-file:$n")
      require(fs.delete(new org.apache.hadoop.fs.Path(dir, n), false),
        s"expireSnapshots: deleting $n failed")
    }
    // vacuum: unreferenced visible data files strictly older than the
    // newest surviving manifest are provably dead crash residue
    val latestMtime = survivors.lastOption.map(v =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, s"manifest-v$v"))
        .getModificationTime).getOrElse(Long.MinValue)
    val orphans = fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
        ManifestName.findFirstIn(n).isEmpty && !live(n) && !dead(n) &&
        st.getModificationTime < latestMtime
    }.map(_.getPath.getName).sorted
    orphans.foreach { n =>
      fsOpHook(s"vacuum:$n")
      require(fs.delete(new org.apache.hadoop.fs.Path(dir, n), false),
        s"expireSnapshots: vacuuming $n failed")
    }
    (expired.size, dead.size + orphans.size)
  }

  /** Snapshot compaction — the crash-safe form of [[compact]] for
    * manifest-managed tables. Greedy consecutive bins are computed
    * over the MANIFEST's file order (the key order), merged bins are
    * staged into the directory under fresh `compact-v{N+1}-*` names
    * (not listed by manifest N, so live readers are untouched), and
    * the whole pass becomes visible through ONE manifest rename.
    * Sources stay on disk, still referenced by manifest N — physical
    * reclamation is [[expireSnapshots]]' job, so every retained
    * snapshot remains time-travel readable ([[readTableAsOf]]). A
    * crash at any step leaves readers on exactly manifest N or
    * exactly manifest N+1 (all new files staged before the commit);
    * the only crash residue is unreferenced files, never a missing or
    * doubled row. Returns the same [[CompactStats]] as the in-place
    * form (file/byte counts over the LIVE snapshot's files).
    */
  def compactSnapshot(
      spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long, parallelism: Int = 4): CompactStats = {
    require(targetBytes > 0 && parallelism >= 1)
    val (fs, dir) = fsFor(spark, path)
    val v = latestManifest(fs, dir).getOrElse(
      throw new IllegalArgumentException(
        s"compactSnapshot: $path has no manifest — run initSnapshot first"))
    val entries = manifestEntries(fs, dir, v)
    val sized = entries.map { e =>
      e -> fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, e.name)).getLen
    }
    val bytesBefore = sized.map(_._2).sum
    // greedy consecutive packing in manifest (= key) order
    val bins = packBins[(ManifestEntry, Long)](sized, _._2, targetBytes)
    val mergeIdx = bins.zipWithIndex.filter(_._1.size >= 2)
    if (mergeIdx.isEmpty)
      return CompactStats(entries.size, entries.size, bytesBefore, bytesBefore, 0)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".compact-tmp-v${v + 1}")
    fs.mkdirs(tmp)
    mergeBins(spark, mergeIdx.map { case (bin, i) =>
      (i, bin.map(f => s"$path/${f._1.name}"))
    }, tmp.toString, parallelism)
    // stage each merged file into the table dir under a fresh
    // versioned name — VISIBLE on disk but unreferenced by manifest v,
    // so live readers (via readTable) never see it early
    val mergedName = scala.collection.mutable.Map.empty[Int, String]
    mergeIdx.foreach { case (_, i) =>
      val part = stagedPart(fs, tmp.toString, i)
      val name = f"compact-v${v + 1}-b$i%05d.parquet"
      val dest = new org.apache.hadoop.fs.Path(dir, name)
      // a file already at this deterministic name is residue of a
      // CRASHED pass at the same target version (had that pass
      // committed, latestManifest would have moved past v and the
      // name would carry a higher version) — replace it, or retries
      // wedge forever on HDFS's rename-fails-on-existing semantics
      // (review r17)
      if (fs.exists(dest)) {
        fsOpHook(s"unstage:$name")
        require(fs.delete(dest, false),
          s"compactSnapshot: clearing stale staged $name failed")
      }
      fsOpHook(s"stage:$name")
      require(fs.rename(part, dest),
        s"compactSnapshot: staging $name failed")
      mergedName(i) = name
    }
    val newEntries = bins.zipWithIndex.map { case (bin, i) =>
      mergedName.get(i) match {
        case None => bin.head._1 // untouched singleton keeps its stats
        case Some(name) =>
          // merged file: union the sources' ranges per column — exact
          // without rescanning (a merge permutes no values); a column
          // any source lacks (or whose kinds drifted) records no range
          val shared = bin.map(_._1.stats.keySet).reduce(_ intersect _)
          val stats = shared.toSeq.flatMap { c =>
            bin.tail.foldLeft(Option(bin.head._1.stats(c))) { (acc, e) =>
              acc.flatMap(_.union(e._1.stats(c)))
            }.map(c -> _)
          }.toMap
          // bloom sidecars merge the same way: OR of the sources' bit
          // arrays IS the filter over the union (the aggregator's own
          // merge op) — provided every source filtered this column
          // with identical (mBits, k); otherwise drop, conservative
          val bloomShared = bin.map(_._1.blooms.keySet).reduce(_ intersect _)
          val blooms = bloomShared.toSeq.flatMap { c =>
            val refs = bin.map(_._1.blooms(c))
            val (m0, k0) = (refs.head.mBits, refs.head.k)
            if (!refs.forall(r => r.mBits == m0 && r.k == k0)) None
            else {
              val acc = new Array[Long](1 << (m0 - 6))
              refs.foreach { r =>
                val (_, _, bits) = readBloomSidecar(fs, dir, r.file)
                var i = 0
                while (i < acc.length) { acc(i) |= bits(i); i += 1 }
              }
              val sc = bloomSidecarName(name, c)
              writeBloomSidecar(fs, dir, sc, m0, k0, acc)
              Some(c -> BloomRef(sc, m0, k0))
            }
          }.toMap
          ManifestEntry(name, stats, blooms)
      }
    }
    val newFiles = newEntries.map(_.name)
    commitEntries(fs, dir, v, newEntries, kind = "compact") // THE atomic visibility flip
    // NO physical deletes here (r17): the merged bins' sources are
    // still referenced by manifest v — deleting them would break
    // [[readTableAsOf]](v) for every retained snapshot. Space is
    // reclaimed by [[expireSnapshots]], which deletes a file only
    // once NO surviving manifest references it — the Iceberg split
    // between logical commit and physical GC.
    fs.delete(tmp, true)
    val bytesAfter = newFiles.map { n =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, n)).getLen
    }.sum
    CompactStats(entries.size, newFiles.size, bytesBefore, bytesAfter, mergeIdx.size)
  }

  /** Partition-aware compaction (VERDICT r16 next #7):
    * [[writePartitioned]] tables hold their part files under
    * Hive-style `col=value` leaf directories, one layout per leaf.
    * Recurse to each leaf that holds data files and compact it
    * independently (manifest-aware per leaf via [[compact]]'s
    * dispatch), preserving each partition's own name-order contract;
    * stats are aggregated across leaves.
    */
  def compactPartitioned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long, parallelism: Int = 4): CompactStats = {
    val (fs, root) = fsFor(spark, path)
    def leaves(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(d).toSeq
        .filter { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
      val subdirs = entries.filter(_.isDirectory)
      if (subdirs.isEmpty) Seq(d)
      else subdirs.flatMap(s => leaves(s.getPath))
    }
    leaves(root)
      .filter(d => fs.listStatus(d).exists(_.isFile))
      .map(d => compact(spark, d.toString, targetBytes, parallelism))
      .foldLeft(CompactStats(0, 0, 0L, 0L, 0)) { (a, b) =>
        CompactStats(a.filesBefore + b.filesBefore,
          a.filesAfter + b.filesAfter,
          a.bytesBefore + b.bytesBefore,
          a.bytesAfter + b.bytesAfter,
          a.binsRewritten + b.binsRewritten)
      }
  }

  /** Side/branch output (SURVEY §2.1 S5): the reference's
    * AvroMultipleOutputs writes a filtered branch of one reduce pass to
    * a second file set (ReducerExtractFeatureTFIDF.java:85-88). Spark
    * has no multi-sink single-pass at the DataFrame level, so: persist
    * the parent once, run each branch write against the cached plan —
    * one upstream computation, n sink scans.
    */
  def writeBranches(df: DataFrame, branches: Seq[(DataFrame => DataFrame, String)]): Unit = {
    val cached = df.persist()
    try branches.foreach { case (f, path) => writeColumnar(f(cached), path) }
    finally cached.unpersist()
  }
}
