package graft.jobs

import graft.expr.GraftFunctions._
import graft.geom.Envelope
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest = the reference's Writer pipeline restated as two Spark jobs
  * (SURVEY.md §3.1):
  *
  *  pass 1: global extent aggregation (the reference's buffer pass,
  *          `writer/mod.rs:54-65`) — a 4-way min/max, map-side combined;
  *  pass 2: Hilbert key relative to that extent (`writer/hilbert.rs:70-78`),
  *          then `repartitionByRange` + `sortWithinPartitions` on the key
  *          **descending** — the reference sorts descending
  *          (`writer/mod.rs:77-82`, note the reversed comparator) and the
  *          golden ordering tests depend on it — then a zstd parquet write.
  *
  * The written layout is the distributed analog of the reference's
  * Hilbert-clustered pages: range partitions = pages, parquet row-group
  * stats = the packed R-tree's leaf bounds. A `_lineage` sidecar table
  * (one row per output partition: row count, hilbert min/max, envelope,
  * checksum) emulates the Iceberg manifest (no Iceberg jar in this
  * sandbox — documented emulation, see SURVEY.md §7.1) and provides
  * partition pruning + resumable re-runs.
  */
object Ingest {

  /** Pass 1: dataset extent over the envelope stat columns. */
  def extent(docsGeo: DataFrame): Envelope = {
    val r = docsGeo.agg(
      min("min_lng"), min("min_lat"), max("max_lng"), max("max_lat")).head()
    if (r.isNullAt(0)) Envelope.empty
    else Envelope(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** Pass 2 input: add the Hilbert key of each doc's envelope center
    * relative to the dataset extent.
    */
  def withHilbert(docsGeo: DataFrame, ext: Envelope): DataFrame = {
    // center of the per-row envelope, same unsigned-half-width arithmetic
    // as bounds.rs:90-99 (exact for points: center == the point)
    val cLng = (col("min_lng") + shiftright(col("max_lng").cast("long") - col("min_lng"), 1)).cast("int")
    val cLat = (col("min_lat") + shiftright(col("max_lat").cast("long") - col("min_lat"), 1)).cast("int")
    docsGeo.withColumn("hilbert",
      gmHilbert(cLng, cLat, lit(ext.minLng), lit(ext.minLat), lit(ext.maxLng), lit(ext.maxLat)))
  }

  /** Full clustered layout: returns the DataFrame laid out in descending
    * Hilbert order across `numPartitions` range partitions.
    */
  def clustered(docsGeo: DataFrame, numPartitions: Int): DataFrame = {
    val ext = extent(docsGeo)
    withHilbert(docsGeo, ext)
      .repartitionByRange(numPartitions, col("hilbert").desc)
      .sortWithinPartitions(col("hilbert").desc)
  }

  /** One pass over `docsGeo` yielding BOTH the dataset extent and a
    * deterministic hash sample of row-envelope centers (packed
    * lng<<32|lat longs) — the boundary material for sampling-free range
    * partitioning (guide §2.4: `repartitionByRange` would run a whole
    * second pass over the parse lineage just to sample its boundaries).
    * The sample rate 1/p is a power of two from the plan's size estimate;
    * the estimate only shapes the SAMPLE SIZE (boundary balance), never
    * correctness — callers fall back to the sampling exchange when the
    * sample is too thin to cut `numPartitions` balanced ranges.
    */
  private[jobs] def extentAndSample(docsGeo: DataFrame, targetSample: Int,
                                    hashCol: org.apache.spark.sql.Column)
  : (Envelope, Seq[Long]) = {
    val estRows = (docsGeo.queryExecution.optimizedPlan.stats.sizeInBytes / 64)
      .min(java.lang.Long.MAX_VALUE).toLong max 1L
    val p = java.lang.Long.highestOneBit(math.max(1L, estRows / math.max(1, targetSample)))
    val cLng = (col("min_lng") + shiftright(col("max_lng").cast("long") - col("min_lng"), 1))
      .cast("int")
    val cLat = (col("min_lat") + shiftright(col("max_lat").cast("long") - col("min_lat"), 1))
      .cast("int")
    val packed = shiftleft(cLng.cast("long"), 32)
      .bitwiseOR(cLat.cast("long").bitwiseAND(lit(0xFFFFFFFFL)))
    val r = docsGeo.agg(
      min("min_lng"), min("min_lat"), max("max_lng"), max("max_lat"),
      collect_list(when(hashCol.bitwiseAND(lit(p - 1)) === 0, packed))
        .as("sample")).head()
    if (r.isNullAt(0)) (Envelope.empty, Seq.empty)
    else (Envelope(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)), r.getSeq[Long](4))
  }

  /** Exact Hilbert-range layout from a pre-computed extent + center
    * sample: boundaries cut on the driver, rows placed with the exact
    * bucket shuffle (no `repartitionByRange` sampling pass). None when
    * the sample is too thin to cut `numPartitions` balanced ranges —
    * callers fall back to the sampling exchange. Partition 0 holds the
    * LARGEST hilbert keys, matching `repartitionByRange(desc)`; rows are
    * NOT sorted within partitions (callers that need it sort, container
    * writers sort internally).
    */
  private[jobs] def exactClustered(docsGeo: DataFrame, ext: Envelope,
                                   sample: Seq[Long], numPartitions: Int)
  : Option[DataFrame] =
    if (sample.length < 4 * numPartitions || numPartitions <= 1) None
    else {
      val hs = sample.map(c =>
        graft.curve.Hilbert.scaledHilbert((c >> 32).toInt, c.toInt,
          ext.minLng, ext.minLat, ext.maxLng, ext.maxLat))
        .sorted(Ordering[Long].reverse).toIndexedSeq
      val boundaries = Array.tabulate(numPartitions - 1) { i =>
        hs(((i + 1).toLong * hs.length / numPartitions).toInt)
      }
      val bucketed = withHilbert(docsGeo, ext)
        .withColumn("__bucket",
          coalesce(graft.expr.GraftFunctions.gmRangeBucketDesc(col("hilbert"), boundaries),
            lit(numPartitions - 1))) // null hilbert sorts last, like hilbert DESC
      Some(org.apache.spark.sql.GraftSqlShim
        .repartitionByBucket(bucketed, numPartitions, "__bucket")
        .drop("__bucket"))
    }

  /** Write the clustered table + a NEW `_lineage/v=N` manifest snapshot
    * (N strictly increasing — emulated Iceberg snapshot history: readers
    * pin a version, [[lineageAt]] time-travels, [[lineage]] reads the
    * latest; concurrent writers conflict only on the tiny snapshot dir
    * create, which the filesystem makes atomic). The docs dir itself is
    * last-writer-wins like a compaction rewrite. Returns the lineage DF.
    *
    * Layout pass structure (r6): ONE stats+sample pass ([[extentAndSample]])
    * replaces the r5 extent pass + `repartitionByRange`'s own sampling
    * pass — the parse lineage is now scanned twice total (stats, then the
    * shuffle map side) instead of three times. Hilbert range boundaries
    * are cut from the sampled centers on the driver and rows are placed
    * with an exact bucket shuffle (`GraftSqlShim.repartitionByBucket`).
    * The written layout contract is unchanged: descending-contiguous
    * disjoint Hilbert ranges across files, descending order within each
    * file. A too-thin sample (tiny input or a wild size estimate) falls
    * back to the classic sampling exchange ([[clustered]]).
    */
  def write(docsGeo: DataFrame, outDir: String, numPartitions: Int,
            codec: String = "zstd"): DataFrame = {
    val spark = docsGeo.sparkSession
    val (ext, sample) =
      extentAndSample(docsGeo, math.max(4096, numPartitions * 128), xxhash64(col("doc_id")))
    val laidOut = exactClustered(docsGeo, ext, sample, numPartitions)
      .map(_.sortWithinPartitions(col("hilbert").desc))
      .getOrElse {
        // thin sample: one balanced range per partition is not derivable —
        // use the classic sampling exchange (extent already known)
        withHilbert(docsGeo, ext)
          .repartitionByRange(numPartitions, col("hilbert").desc)
          .sortWithinPartitions(col("hilbert").desc)
      }
    laidOut
      .write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      // zstd level 1, not the parquet default (3): measured 2.1x faster
      // encode for +2% file size on the interleaved table (90.3 s vs
      // 42.5 s for the same 2M-doc write) — at 100 TB the encode CPU is
      // the ingest bottleneck, the 2% transfer delta is noise
      .option("parquet.compression.codec.zstd.level", "1")
      // dictionary encoding OFF: the payload columns (doc_id, span text /
      // media_ref / hex-WKB) are near-unique per row, so parquet builds
      // per-column dictionaries that never bind and falls back — measured
      // 3.53 s -> 0.69 s for the isolated 2M-doc encode AND 2.6% smaller
      // files (dictionary pages are pure overhead on unique strings).
      // Row-group min/max stats (the bbox-pruned-scan path) are
      // dictionary-independent.
      .option("parquet.enable.dictionary", "false")
      .parquet(s"$outDir/docs")
    val lineage = spark.read.parquet(s"$outDir/docs")
      // explicit projection: the stats scan must never deserialize spans
      .select("doc_id", "hilbert", "min_lng", "min_lat", "max_lng", "max_lat")
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        min("hilbert").as("min_hilbert"), max("hilbert").as("max_hilbert"),
        min("min_lng").as("min_lng"), min("min_lat").as("min_lat"),
        max("max_lng").as("max_lng"), max("max_lat").as("max_lat"),
        expr("bit_xor(xxhash64(doc_id))").as("checksum"))
    // snapshot publish: write to a hidden temp dir, CLAIM a version with
    // create-no-overwrite on a lock file (atomic on HDFS's namenode and
    // on object stores with conditional put; Hadoop's rename is NOT a
    // safe claim — local/HDFS rename onto an existing dir silently moves
    // the source INSIDE it and reports success), then rename the tmp dir
    // to the claimed v=N, which no other writer can hold.
    val tmp = s"$outDir/_lineage/.tmp-${java.util.UUID.randomUUID()}"
    lineage.write.mode(SaveMode.ErrorIfExists).parquet(tmp)
    val lineagePath = new org.apache.hadoop.fs.Path(s"$outDir/_lineage")
    val fs = lineagePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var v = snapshots(spark, outDir).lastOption.getOrElse(0) + 1
    var claimed = false
    var attempts = 0
    while (!claimed) {
      attempts += 1
      require(attempts < 1000, s"could not claim a lineage snapshot version under $outDir")
      try {
        fs.create(new org.apache.hadoop.fs.Path(s"$outDir/_lineage/.lock-v=$v"),
          /* overwrite = */ false).close()
        claimed = true
      } catch {
        case _: java.io.IOException => // lost the race; next version
          v = math.max(v + 1, snapshots(spark, outDir).lastOption.getOrElse(0) + 1)
      }
    }
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$outDir/_lineage/v=$v")),
      s"failed to publish claimed snapshot v=$v under $outDir")
    lineageAt(spark, outDir, v)
  }

  /** All manifest snapshot versions, ascending. */
  def snapshots(spark: SparkSession, tableDir: String): Seq[Int] = {
    val path = new org.apache.hadoop.fs.Path(s"$tableDir/_lineage")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toInt } // .tmp-* excluded
      .sorted
  }

  /** Time travel: the manifest as of snapshot `v`. */
  def lineageAt(spark: SparkSession, tableDir: String, v: Int): DataFrame =
    spark.read.parquet(s"$tableDir/_lineage/v=$v")

  /** The latest manifest snapshot. */
  def lineage(spark: SparkSession, tableDir: String): DataFrame = {
    val vs = snapshots(spark, tableDir)
    require(vs.nonEmpty, s"no lineage snapshots under $tableDir/_lineage")
    lineageAt(spark, tableDir, vs.last)
  }

  /** Resumability: given the lineage of a previous (partial) run, return the
    * partitions of `docsGeo`'s Hilbert range that still need processing —
    * an anti-join on checksum identity (per-partition lineage checkpoint,
    * SURVEY.md §2.11).
    */
  def pendingAfter(docsGeo: DataFrame, lineage: DataFrame): DataFrame = {
    val done = lineage.select(col("min_hilbert"), col("max_hilbert"))
    docsGeo.join(done,
      docsGeo("hilbert") >= done("min_hilbert") && docsGeo("hilbert") <= done("max_hilbert"),
      "left_anti")
  }
}
