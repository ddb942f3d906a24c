package graft

import graft.expr.GraftFunctions._
import graft.geom.Envelope
import graft.jobs.{Ingest, Knn, SpatialJoin, Tiles}
import graft.table.InterleavedDocs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Headline metric (BASELINE.json north rule): spatial-join +
  * tile-assignment throughput in docs/sec over the interleaved-doc table,
  * evidenced at two parallelism levels (SPARK_GRAFT_CPUS=8 vs 32) for the
  * N -> 4N scaling-efficiency criterion (see BASELINE.md "Scaling
  * protocol").
  *
  * The bench corpus is synthesized at BENCH_DOCS (default 2,000,000) docs
  * with the exact same deterministic formulas as the sf tables
  * (FIXTURES.md §1), flowing through the full engine path: spans array ->
  * hex WKB -> envelope expressions -> cell join -> PIP refine -> tile
  * assignment. Polygon build side = the nation 5x5 world grid.
  */
object Bench {

  def benchDocs(spark: SparkSession, n: Long): DataFrame = benchDocs(spark, n, 0)

  /** numSlices > 0 pins the source partition count — used by the scaling
    * protocol to set the job's parallelism independent of local[K].
    */
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // Scaling protocol (BASELINE.md): the sandbox's exogenous slow windows
    // last minutes, so cross-JVM N-vs-4N runs are incomparable. Instead,
    // alternate the two parallelism levels WITHIN one session at seconds
    // granularity (parallelism = source partition count; the executor pool
    // local[K] stays fixed and idle threads cost nothing), so both levels
    // see identical conditions. Reports per-level medians + efficiency.
    if (sys.env.get("SPARK_GRAFT_SCALING").contains("1")) {
      val n1 = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt
      val n4 = n1 * 4
      val rectsS = InterleavedDocs.nationRects(spark, sfDir)
      def pipeline(p: Int): Long =
        SpatialJoin.cellJoin(InterleavedDocs.withGeometry(benchDocs(spark, nDocs, p)), rectsS)
          .withColumn("tile_id", gmTile(col("lng"), col("lat"), 6))
          .groupBy("poly_id", "tile_id").agg(count(lit(1)).as("n"))
          .agg(sum("n")).head().getLong(0)
      pipeline(n1); pipeline(n4) // warm both generated plans
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
      val tsN = Array.fill(reps)(0.0); val tsN4 = Array.fill(reps)(0.0)
      for (i <- 0 until reps) {
        tsN(i) = time(pipeline(n1))._1
        tsN4(i) = time(pipeline(n4))._1
      }
      def median(a: Array[Double]) = a.sorted.apply(a.length / 2)
      val mN = median(tsN); val mN4 = median(tsN4)
      val thrN = nDocs / mN; val thrN4 = nDocs / mN4
      val eff = thrN4 / (4.0 * thrN)
      spark.stop()
      emit(
        s"""{"metric":"scaling efficiency N->4N","value":${"%.3f".format(eff)},"unit":"ratio","queries":{"docs_per_sec_n$n1":${"%.1f".format(thrN)},"docs_per_sec_n$n4":${"%.1f".format(thrN4)},"median_sec_n$n1":${"%.3f".format(mN)},"median_sec_n$n4":${"%.3f".format(mN4)}},"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"runs_n$n1":[${tsN.map("%.3f".format(_)).mkString(",")}],"runs_n$n4":[${tsN4.map("%.3f".format(_)).mkString(",")}]}""")
      return
    }

    // Cache a NARROW projection for the query benchmarks: columnar-caching
    // the nested spans array costs ~1ms/row to build (measured — see
    // BASELINE.md "cache note"), while the span->WKB->envelope parse
    // itself is ~25us/row; the ingest benchmark below still runs the full
    // spans-carrying pipeline uncached.
    val geoFull = InterleavedDocs.withGeometry(benchDocs(spark, nDocs))
    val geo = geoFull
      .select("doc_id", "lng", "lat", "min_lng", "min_lat", "max_lng", "max_lat")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    geo.count() // warm

    val rects = InterleavedDocs.nationRects(spark, sfDir)

    // Headline = the FULL pipeline a 100 TB job runs: read the interleaved
    // table (spans payload), parse the geom span (hex -> WKB -> envelope),
    // cell join against the polygon set, PIP refine, tile-assign,
    // aggregate. Deliberately NOT from the narrow cache: the parse work is
    // part of the operator path and is what scales with cores (the cached
    // narrow join alone is memory-bandwidth-bound at this size and cannot
    // strong-scale — measured, see BASELINE.md).
    def headline(): (Double, Long) = time {
      SpatialJoin.cellJoin(geoFull, rects)
        .withColumn("tile_id", gmTile(col("lng"), col("lat"), 6))
        .groupBy("poly_id", "tile_id").agg(count(lit(1)).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    // One untimed warmup of the EXACT headline plan (C2-compiles the
    // generated whole-stage code — the first execution of a fresh plan
    // runs 10-30x slower while interpreted), then median of 3 warm runs.
    headline()
    val runs = Seq(headline(), headline(), headline())
    val tJoinTiles = runs.map(_._1).sorted.apply(1)
    val joined = runs.head._2

    // fast mode for interleaved N-vs-4N scaling pairs: headline only
    if (sys.env.get("SPARK_GRAFT_HEADLINE_ONLY").contains("1")) {
      spark.stop()
      emit(
        s"""{"metric":"spatial-join+tile throughput","value":${"%.3f".format(tJoinTiles)},"unit":"sec","queries":{"spatial_join_tiles":${"%.3f".format(tJoinTiles)}},"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"docs_per_sec":${"%.1f".format(nDocs / tJoinTiles)},"join_rows":$joined,"headline_runs":[${runs.map(r => "%.3f".format(r._1)).mkString(",")}]}""")
      return
    }

    val (tSalted, _) = time {
      SpatialJoin.saltedCellJoin(geo, rects).agg(count(lit(1))).head()
    }

    val (tKnn, _) = time {
      Knn.knn(geo, InterleavedDocs.nationQueryPoints(spark, sfDir), k = 3).agg(count(lit(1))).head()
    }

    val (tBbox, _) = time {
      SpatialJoin.bboxFilter(geo, Envelope(-1183000000, 335000000, -1170000000, 345000000))
        .agg(count(lit(1))).head()
    }

    // ingest: extent -> hilbert -> descending range layout -> zstd write.
    // Materialize the synthesized source first (untimed): real ingest reads
    // an existing table; without this the extent pass, the range-sampling
    // pass and the write pass would each re-run the synthesizer.
    val outDir = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val geoSrc = geoFull.localCheckpoint(true)
    val (tIngest, _) = time { Ingest.write(geoSrc, outDir, numPartitions = cpus) }

    // pruned read-back of the clustered layout (the select_bbox read path)
    val (tPruned, _) = time {
      val written = spark.read.parquet(s"$outDir/docs")
      written.where(
        col("max_lng") >= -1183000000 && col("max_lat") >= 335000000 &&
          col("min_lng") <= -1170000000 && col("min_lat") <= 345000000)
        .agg(count(lit(1))).head()
    }

    val docsPerSec = nDocs / tJoinTiles
    val total = tJoinTiles + tSalted + tKnn + tBbox + tIngest + tPruned
    val qs = Seq(
      "spatial_join_tiles" -> tJoinTiles, "spatial_join_salted" -> tSalted,
      "knn" -> tKnn, "bbox_filter" -> tBbox,
      "ingest_hilbert_write" -> tIngest, "bbox_pruned_scan" -> tPruned)
      .map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
    spark.stop()
    emit(
      s"""{"metric":"spatial-join+tile throughput","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"docs_per_sec":${"%.1f".format(docsPerSec)},"join_rows":$joined}""")
  }
}
