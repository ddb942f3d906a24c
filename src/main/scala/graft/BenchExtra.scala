package graft

import graft.expr.GraftFunctions._
import graft.geom.Envelope
import graft.jobs.{Ingest, Knn, SpatialJoin}
import graft.table.InterleavedDocs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round instrumentation main (guide §1): the official
  * `Bench` is FROZEN for measurement, so the per-phase breakdowns, the
  * noop-sink isolation (§1.4) and the pure-JVM host-burn control
  * (BASELINE.md protocol) live here. Prints ONE JSON line with:
  *
  *  - `burn_s`: a short host-burn sample before every timed block — the
  *    in-record control that convicts a degraded host window (VERDICT r5
  *    item 1: two consecutive official records were host-stall artifacts);
  *  - `phases`: ingest decomposed into its passes (parse-only scan,
  *    extent agg, range-shuffle+sort to a noop sink, full zstd write,
  *    lineage read-back) so the optimization targets the right pass;
  *  - `queries`: every official bench query re-timed with min-of-3 after
  *    one warmup, identical actions to Bench (documentation evidence only
  *    — BENCH_r06.json remains the record of record).
  *
  * With `SPARK_GRAFT_PLANS_DIR` set, also writes `.explain("formatted")`
  * for each bench query to `<dir>/<name>.txt` (judge evidence).
  */
object BenchExtra {

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
    val nDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong).getOrElse(2000000L)
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val burns = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val burnIters = sys.env.getOrElse("SPARK_GRAFT_BURN_ITERS", "4000000").toLong
    def control(label: String): Unit = burns += (label -> burn(cpus, burnIters / cpus))

    // Same untimed setup as Bench: synthesize + write the parquet table.
    val tableDir =
      java.nio.file.Files.createTempDirectory("graft_benchx_src").toString + "/docs"
    Bench.benchDocs(spark, nDocs, 32).write.option("compression", "zstd").parquet(tableDir)
    val docsTable = spark.read.parquet(tableDir)
    val rects = InterleavedDocs.nationRects(spark, sfDir)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Array[Double]]
    def runs3(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      f // warmup (codegen / C2)
      control(name)
      results(name) = Array(time(f)._1, time(f)._1, time(f)._1)
      spark.sparkContext.setJobDescription(null)
    }

    def plan(name: String, df: DataFrame): Unit = plansDir.foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // ---- ingest phase breakdown -------------------------------------------
    val geoAll = InterleavedDocs.withGeometry(docsTable)
    plan("ingest_parse_only", geoAll)
    runs3("phase_parse_noop") { noop(geoAll) }
    runs3("phase_parse_env_only") {
      noop(docsTable.select(gmSpanEnvelope(col("spans")).as("env")))
    }
    runs3("phase_extent") { Ingest.extent(InterleavedDocs.withGeometry(docsTable)); () }
    locally {
      val ext = Ingest.extent(geoAll)
      runs3("phase_hilbert_shuffle_sort_noop") {
        noop(Ingest.withHilbert(InterleavedDocs.withGeometry(docsTable), ext)
          .repartitionByRange(cpus, col("hilbert").desc)
          .sortWithinPartitions(col("hilbert").desc))
      }
    }
    def rmTree(dir: String): Unit =
      try {
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Exception => () }
    var outDir = ""
    runs3("phase_full_write") {
      if (outDir.nonEmpty) rmTree(outDir)
      outDir = java.nio.file.Files.createTempDirectory("graft_benchx").toString
      Ingest.write(InterleavedDocs.withGeometry(docsTable), outDir, numPartitions = cpus)
      ()
    }
    runs3("phase_lineage_readback") {
      val lineage = spark.read.parquet(s"$outDir/docs")
        .select("doc_id", "hilbert", "min_lng", "min_lat", "max_lng", "max_lat")
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("rows"),
          min("hilbert").as("min_hilbert"), max("hilbert").as("max_hilbert"),
          min("min_lng").as("min_lng"), min("min_lat").as("min_lat"),
          max("max_lng").as("max_lng"), max("max_lat").as("max_lat"),
          expr("bit_xor(xxhash64(doc_id))").as("checksum"))
      noop(lineage)
    }

    // ---- official bench queries, noop/action-isolated ---------------------
    def joinTilesDf(src: DataFrame): DataFrame =
      SpatialJoin.cellJoin(InterleavedDocs.withGeometry(src), rects)
        .withColumn("tile_id", gmTile(col("lng"), col("lat"), 6))
        .groupBy("poly_id", "tile_id").agg(count(lit(1)).as("n"))
        .agg(sum("n"))
    plan("spatial_join_tiles", joinTilesDf(docsTable))
    runs3("spatial_join_tiles") { joinTilesDf(docsTable).head(); () }

    val geo = InterleavedDocs.withGeometry(docsTable)
      .select("doc_id", "lng", "lat", "min_lng", "min_lat", "max_lng", "max_lat")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    geo.count()

    plan("spatial_join_salted", SpatialJoin.saltedCellJoin(geo, rects).agg(count(lit(1))))
    runs3("spatial_join_salted") {
      SpatialJoin.saltedCellJoin(geo, rects).agg(count(lit(1))).head(); ()
    }
    plan("spatial_join_range", SpatialJoin.hilbertRangeJoin(geo, rects).agg(count(lit(1))))
    runs3("spatial_join_range") {
      SpatialJoin.hilbertRangeJoin(geo, rects).agg(count(lit(1))).head(); ()
    }
    plan("knn", Knn.knn(geo, InterleavedDocs.nationQueryPoints(spark, sfDir), k = 3))
    runs3("knn") {
      Knn.knn(geo, InterleavedDocs.nationQueryPoints(spark, sfDir), k = 3)
        .agg(count(lit(1))).head(); ()
    }
    plan("bbox_filter", SpatialJoin.bboxFilter(geo,
      Envelope(-1183000000, 335000000, -1170000000, 345000000)).agg(count(lit(1))))
    runs3("bbox_filter") {
      SpatialJoin.bboxFilter(geo, Envelope(-1183000000, 335000000, -1170000000, 345000000))
        .agg(count(lit(1))).head(); ()
    }
    runs3("ingest_hilbert_write") {
      if (outDir.nonEmpty) rmTree(outDir)
      outDir = java.nio.file.Files.createTempDirectory("graft_benchx").toString
      Ingest.write(InterleavedDocs.withGeometry(docsTable), outDir, numPartitions = cpus)
      ()
    }
    locally {
      val written = spark.read.parquet(s"$outDir/docs")
      val prunedDf = written.where(
        col("max_lng") >= -1183000000 && col("max_lat") >= 335000000 &&
          col("min_lng") <= -1170000000 && col("min_lat") <= 345000000)
        .agg(count(lit(1)))
      plan("bbox_pruned_scan", prunedDf)
    }
    runs3("bbox_pruned_scan") {
      spark.read.parquet(s"$outDir/docs").where(
        col("max_lng") >= -1183000000 && col("max_lat") >= 335000000 &&
          col("min_lng") <= -1170000000 && col("min_lat") <= 345000000)
        .agg(count(lit(1))).head(); ()
    }

    val gmDir = java.nio.file.Files.createTempDirectory("graft_benchx_gm").toString + "/shards"
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
    plan("geomedea_full_scan", gmTable().agg(sum(length(col("wkb")))))
    runs3("geomedea_full_scan") { gmTable().agg(sum(length(col("wkb")))).head(); () }
    plan("geomedea_bbox_scan", gmTable().where(
      col("max_lng") >= -1183000000 && col("max_lat") >= 335000000 &&
        col("min_lng") <= -1170000000 && col("min_lat") <= 345000000)
      .agg(count(lit(1))))
    runs3("geomedea_bbox_scan") {
      gmTable().where(
        col("max_lng") >= -1183000000 && col("max_lat") >= 335000000 &&
          col("min_lng") <= -1170000000 && col("min_lat") <= 345000000)
        .agg(count(lit(1))).head(); ()
    }
    plan("geomedea_count", gmTable().groupBy().count())
    runs3("geomedea_count") { gmTable().groupBy().count().head(); () }

    spark.stop()
    def arr(v: Array[Double]) = v.map("%.3f".format(_)).mkString("[", ",", "]")
    val qs = results.map { case (k, v) => s""""$k":${"%.3f".format(v.min)}""" }.mkString("{", ",", "}")
    val rs = results.map { case (k, v) => s""""$k":${arr(v)}""" }.mkString("{", ",", "}")
    val bs = burns.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"benchextra","unit":"sec","queries":$qs,"runs":$rs,"burn_s":$bs,"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCHX_OUT", "BENCHX_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Exception => () }
    System.out.println(json)
    System.out.flush()
  }
}
