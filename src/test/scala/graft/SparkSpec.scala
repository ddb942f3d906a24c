package graft

import graft.expr.GraftFunctions
import graft.geom.Envelope
import graft.jobs.{Ingest, Knn, SpatialJoin}
import graft.table.InterleavedDocs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SparkSpec extends AnyFunSuite {
  val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }

  lazy val docs: DataFrame = InterleavedDocs.docs(spark, Sf).cache()
  lazy val geo: DataFrame = InterleavedDocs.withGeometry(docs).cache()
  lazy val rects: DataFrame = InterleavedDocs.nationRects(spark, Sf)

  private def rows(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet

  test("docs table matches input_hint shape and is non-empty") {
    assert(docs.columns.toSeq == Seq("doc_id", "spans"))
    val spanType = docs.schema("spans").dataType.simpleString
    assert(spanType == "array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    assert(docs.count() > 0)
  }

  test("geometry parses out of the geom span; WKB roundtrip is exact vs integer formulas") {
    val raw = InterleavedDocs.raw(spark, Sf)
    val expected = raw.select(
      format_string("doc-%09d", col("doc_id")).as("doc_id"),
      InterleavedDocs.lngOf(col("doc_id")).cast("int").as("lng"),
      InterleavedDocs.latOf(col("doc_id")).cast("int").as("lat"))
    assert(rows(geo, "doc_id", "lng", "lat") == rows(expected, "doc_id", "lng", "lat"))
  }

  test("all three spatial-join strategies equal brute force (incl. skewed hot cell)") {
    val brute = rows(SpatialJoin.bruteForce(geo, rects), "poly_id", "doc_id")
    assert(brute.nonEmpty)
    assert(rows(SpatialJoin.cellJoin(geo, rects), "poly_id", "doc_id") == brute)
    assert(rows(SpatialJoin.rtreeJoin(geo, rects), "poly_id", "doc_id") == brute)
    assert(rows(SpatialJoin.saltedCellJoin(geo, rects), "poly_id", "doc_id") == brute)
    // J6: shuffle-based Hilbert-range join, at two chunk resolutions
    assert(rows(SpatialJoin.hilbertRangeJoin(geo, rects), "poly_id", "doc_id") == brute)
    assert(rows(SpatialJoin.hilbertRangeJoin(geo, rects, res = 3), "poly_id", "doc_id") == brute)
    // skew exists: hot rect holds ~90% of docs
    val top = SpatialJoin.cellJoin(geo, rects).groupBy("poly_id").count()
      .orderBy(col("count").desc).head()
    assert(top.getLong(1) > geo.count() / 2)
  }

  test("distance-within join equals brute force at several radii, both join strategies") {
    val queries = InterleavedDocs.nationQueryPoints(spark, Sf)
    // radii straddling cell sizes at res 4 (225e6 x 112.5e6): sub-cell,
    // cell-ish, multi-cell, and 0 (exact-hit only — likely empty, must
    // not error); plus a non-default res and the shuffled-join variant
    for (r <- Seq(0L, 50000000L, 150000000L, 400000000L)) {
      val brute = rows(SpatialJoin.distanceBruteForce(geo, queries, r), "query_id", "doc_id")
      assert(rows(SpatialJoin.distanceJoin(geo, queries, r), "query_id", "doc_id") == brute)
      assert(rows(SpatialJoin.distanceJoin(geo, queries, r, res = 6), "query_id", "doc_id") == brute)
      assert(rows(SpatialJoin.distanceJoin(geo, queries, r, broadcastQueries = false),
        "query_id", "doc_id") == brute)
    }
    // the headline radius used by q52 returns rows on this data
    assert(rows(SpatialJoin.distanceJoin(geo, queries, 300000000L), "query_id", "doc_id").nonEmpty)
  }

  test("tile pyramid: every zoom's counts sum to the doc count; parents sum their children") {
    val total = geo.count()
    val pyr = graft.jobs.Tiles.pyramid(geo, maxZoom = 6).cache()
    val perZoom = pyr.groupBy("zoom").agg(sum("n").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perZoom.keySet == (0L to 6L).toSet)
    assert(perZoom.values.forall(_ == total))
    // parent tile count == sum of its (<=4) children at the next zoom
    val children = pyr.where(col("zoom") === 6)
      .select((col("tile_x") / 2).cast("long").as("px"),
        (col("tile_y") / 2).cast("long").as("py"), col("n"))
      .groupBy("px", "py").agg(sum("n").as("cn"))
    val parents = pyr.where(col("zoom") === 5)
      .select(col("tile_x").as("px"), col("tile_y").as("py"), col("n").as("pn"))
    val mismatch = parents.join(children, Seq("px", "py"), "full_outer")
      .where(col("pn").isNull || col("cn").isNull || col("pn") =!= col("cn")).count()
    assert(mismatch == 0)
    // zoom-z agreement with the single-zoom raster operator
    val r4 = rows(graft.jobs.Tiles.raster(geo, 4), "tile_id", "n")
    assert(rows(pyr.where(col("zoom") === 4), "tile_id", "n") == r4)
    pyr.unpersist()
  }

  test("spatial anti-join is the exact complement of the semi-join; zonal stats match SQL semantics") {
    // subset rects {3, 15} so the complement is non-empty (the full grid
    // tiles the world; at this SF every scattered doc sits in rect 0, so
    // rect 0 must be excluded) and rect 3 is a genuinely empty zone
    val sub = rects.where(col("poly_id") % 12 === 3)
    val matched = SpatialJoin.bruteForce(geo, sub).select("doc_id").distinct()
      .collect().map(_.getString(0)).toSet
    val anti = SpatialJoin.antiJoin(geo, sub).select("doc_id")
      .collect().map(_.getString(0)).toSet
    val all = geo.select("doc_id").collect().map(_.getString(0)).toSet
    assert(anti == (all -- matched))
    assert(anti.nonEmpty && matched.nonEmpty)
    // zonal: per-poly count/extent over brute-force membership; empty
    // polys kept with n = 0 and null extents
    val zs = SpatialJoin.zonalStats(geo, sub).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    val bruteCounts = SpatialJoin.bruteForce(geo, sub).groupBy("poly_id")
      .agg(count(lit(1)).as("n"), min("lng").cast("long").as("mn"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), Some(r.getLong(2)))).toMap
    val polyIds = sub.select("poly_id").collect().map(_.getLong(0)).toSet
    assert(zs.keySet == polyIds)
    for (pid <- polyIds)
      assert(zs(pid) == bruteCounts.getOrElse(pid, (0L, None)), s"poly $pid")
    assert(polyIds.exists(pid => !bruteCounts.contains(pid)), "an empty zone must exist")
  }

  test("polygon x polygon cover join equals brute force and emits each pair exactly once") {
    val s = spark
    import s.implicits._
    val regions = InterleavedDocs.regionRects(spark, Sf)
    def brute(a: DataFrame, b: DataFrame): Set[(Long, Long)] = {
      val ar = a.collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      val br = b.collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      (for {
        (ai, amnx, amny, amxx, amxy) <- ar
        (bi, bmnx, bmny, bmxx, bmxy) <- br
        if amxx >= bmnx && bmxx >= amnx && amxy >= bmny && bmxy >= amny
      } yield (ai, bi)).toSet
    }
    for (res <- Seq(2, 4, 6)) {
      val got = SpatialJoin.polyPolyJoin(rects, regions, res)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"res=$res: duplicate pair emitted")
      assert(got.toSet == brute(rects, regions), s"res=$res")
    }
    // shuffled variant (two huge sets): identical result, still exactly-once
    val shuffled = SpatialJoin.polyPolyJoin(rects, regions, broadcastB = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(shuffled.length == shuffled.toSet.size)
    assert(shuffled.toSet == brute(rects, regions))
    // touching edges (closed-interval contract): rects sharing only a
    // boundary line / corner DO intersect and appear exactly once
    def rectDf(rows: Seq[(Long, Int, Int, Int, Int)]): DataFrame =
      rows.toDF("poly_id", "p_min_lng", "p_min_lat", "p_max_lng", "p_max_lat")
        .select(col("poly_id"),
          GraftFunctions.stRectWkb(col("p_min_lng"), col("p_min_lat"),
            col("p_max_lng"), col("p_max_lat")).as("poly_wkb"),
          col("p_min_lng"), col("p_min_lat"), col("p_max_lng"), col("p_max_lat"))
    val left = rectDf(Seq((1L, 0, 0, 100, 100), (2L, -500, -500, -300, -300)))
    val right = rectDf(Seq(
      (10L, 100, 0, 200, 100),   // shares the lng=100 edge with 1
      (11L, 100, 100, 200, 200), // shares only the corner (100,100) with 1
      (12L, 50, 50, 60, 60),     // fully inside 1
      (13L, 900, 900, 950, 950)))// disjoint from both
    val got = SpatialJoin.polyPolyJoin(left, right, res = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "edge/corner pairs must not duplicate")
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("span-sequence invariant: join output spans equal input spans per doc_id") {
    val out = SpatialJoin.cellJoin(geo, rects).select("doc_id", "spans")
    val in = docs.withColumnRenamed("spans", "spans_in")
    val mismatches = out.join(in, "doc_id")
      .where(not(col("spans") === col("spans_in")))
      .count()
    assert(mismatches == 0)
  }

  test("kNN cell-ring expansion equals brute force") {
    val queries = InterleavedDocs.nationQueryPoints(spark, Sf)
    val a = rows(Knn.knn(geo, queries, 3), "query_id", "rank", "doc_id")
    val b = rows(Knn.bruteForce(geo, queries, 3), "query_id", "rank", "doc_id")
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("kNN past maxBroadcast switches to the distributed expansion, brute-equal") {
    val queries = InterleavedDocs.nationQueryPoints(spark, Sf)
    val n = queries.count()
    assert(n > 3, "fixture must exceed the forced broadcast ceiling")
    // maxBroadcast+1 queries -> the executor-side flatMap + shuffle join
    // path; results must be identical to brute force (and so to the
    // broadcast path the previous test locked)
    val a = rows(Knn.knn(geo, queries, 3, maxBroadcast = 3), "query_id", "rank", "doc_id")
    val b = rows(Knn.bruteForce(geo, queries, 3), "query_id", "rank", "doc_id")
    assert(a == b)
    // the fallback really ran: the probe side is the executor-side
    // flatMap (SerializeFromObject), not the driver-collected
    // LocalTableScan the broadcast path builds
    val plan = Knn.knn(geo, queries, 3, maxBroadcast = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SerializeFromObject"),
      s"distributed kNN fallback must expand rings executor-side:\n$plan")
  }

  test("bbox filter equals brute-force predicate and respects closed intervals") {
    val q = Envelope(-1183000000, 335000000, -1170000000, 345000000)
    val got = rows(SpatialJoin.bboxFilter(geo, q), "doc_id")
    val brute = rows(geo.where(
      col("lng") >= q.minLng && col("lng") <= q.maxLng &&
        col("lat") >= q.minLat && col("lat") <= q.maxLat), "doc_id")
    assert(got == brute && got.nonEmpty)
  }

  test("exact-bucket layout equals the sampling exchange: same rows, disjoint desc ranges") {
    // r6 write() replaces repartitionByRange's sampling pass with exact
    // boundaries from the single stats+sample pass; this locks the layout
    // contract the swap must preserve
    val out = java.nio.file.Files.createTempDirectory("graft_exact").toString
    Ingest.write(geo, out, numPartitions = 4)
    val written = spark.read.parquet(s"$out/docs")
    // identical row set to the input (no row lost/duplicated by placement)
    assert(rows(written, "doc_id", "hilbert") ==
      rows(Ingest.withHilbert(geo, Ingest.extent(geo)), "doc_id", "hilbert"))
    // per-file [min,max] hilbert ranges are DISJOINT (range-partitioned
    // files, the pruning + pendingAfter contract)
    val ranges = written.withColumn("file", input_file_name())
      .groupBy("file").agg(min("hilbert").as("lo"), max("hilbert").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlapping file ranges: $ranges")
      case _ => ()
    }
    assert(ranges.length > 1, "exact-bucket path should cut multiple files here")
  }

  test("ingest layout: hilbert descending across and within partitions; lineage sums match") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val lineage = Ingest.write(geo, out, numPartitions = 4)
    val written = spark.read.parquet(s"$out/docs")
    assert(written.count() == geo.count())
    // descending hilbert order within each file
    val disorder = written
      .withColumn("file", input_file_name())
      .withColumn("prev", lag("hilbert", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("file").orderBy(monotonically_increasing_id())))
      .where(col("prev").isNotNull && col("prev") < col("hilbert"))
    assert(disorder.count() == 0)
    // lineage covers all rows exactly once
    assert(lineage.agg(sum("rows")).head().getLong(0) == geo.count())
    // resume: nothing pending after a full run
    val g = Ingest.withHilbert(geo, Ingest.extent(geo))
    assert(Ingest.pendingAfter(g, lineage).count() == 0)
  }

  test("2x2 e2e matrix: {zstd, none} x {1, many partitions} ingest + bbox read-back") {
    // the Spark analog of the reference's {compressed, uncompressed} x
    // {single-page, multi-page} reader matrix (reader.rs:411-498)
    val q = Envelope(-1183000000, 335000000, -1170000000, 345000000)
    val brute = rows(SpatialJoin.bboxFilter(geo, q), "doc_id")
    assert(brute.nonEmpty)
    for {
      codec <- Seq("zstd", "none")
      parts <- Seq(1, 8)
    } {
      val out = java.nio.file.Files.createTempDirectory(s"graft_m_${codec}_$parts").toString
      Ingest.write(geo, out, numPartitions = parts, codec = codec)
      val written = spark.read.parquet(s"$out/docs")
      val files = written.select(input_file_name()).distinct().count()
      if (parts == 1) assert(files == 1L, s"$codec/$parts") else assert(files > 1L, s"$codec/$parts")
      assert(written.count() == geo.count(), s"$codec/$parts")
      val got = rows(SpatialJoin.bboxFilter(written, q), "doc_id")
      assert(got == brute, s"$codec/$parts")
      // layout invariant holds in every configuration
      val disorder = written
        .withColumn("file", input_file_name())
        .withColumn("prev", lag("hilbert", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("file").orderBy(monotonically_increasing_id())))
        .where(col("prev").isNotNull && col("prev") < col("hilbert"))
      assert(disorder.count() == 0, s"$codec/$parts")
    }
  }

  test("manifest snapshots: every write appends a version; time travel reads history") {
    val out = java.nio.file.Files.createTempDirectory("graft_snap").toString
    Ingest.write(geo, out, numPartitions = 4)
    Ingest.write(geo.limit(100), out, numPartitions = 2)
    assert(Ingest.snapshots(spark, out) == Seq(1, 2))
    val v1 = Ingest.lineageAt(spark, out, 1).agg(sum("rows")).head().getLong(0)
    val v2 = Ingest.lineageAt(spark, out, 2).agg(sum("rows")).head().getLong(0)
    assert(v1 == geo.count() && v2 == 100L)
    // latest == newest snapshot, and Describe reads the latest
    assert(Ingest.lineage(spark, out).agg(sum("rows")).head().getLong(0) == 100L)
    assert(graft.table.Describe.summary(spark, out).head().getLong(0) == 100L)
  }

  test("S6/S7 object-store scan planning: split batching is config-driven like the reference's range merging") {
    // The reference's HTTP reader merges nearby byte ranges (threshold
    // 16,000 bytes, packed_r_tree/reader.rs:159-161) and batches feature
    // fetches (2x page goal with 1.1x overfetch, http_reader.rs:162-176).
    // The Spark analogs are the file-source split-planning knobs:
    // openCostInBytes (= the "merge small nearby reads" constant) and
    // maxPartitionBytes (= the fetch batch size). This test pins the
    // mapping executably: small batch size -> one split per file; large
    // batch + open cost -> files coalesce into few splits.
    val out = java.nio.file.Files.createTempDirectory("graft_scan").toString
    Ingest.write(geo, out, numPartitions = 8)
    def partitionsWith(maxPartitionBytes: String, openCost: String): Int = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      spark.conf.set("spark.sql.files.openCostInBytes", openCost)
      try spark.read.parquet(s"$out/docs").rdd.getNumPartitions
      finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    }
    // 16 KiB batches with zero open cost: no two of our ~10 KiB files
    // share a split, so >= one split per file; big batches + 4 MiB open
    // cost coalesce them into few splits
    val finegrained = partitionsWith("16384", "0")
    val coalesced = partitionsWith("134217728", "4194304")
    assert(finegrained >= 8, s"expected >= one split per file, got $finegrained")
    // the floor is default parallelism (4 here) — files merged 2-per-split
    assert(coalesced < finegrained && coalesced <= 4, s"coalesced=$coalesced fine=$finegrained")
  }

  test("SQL registration: gm_/st_ functions usable from spark.sql") {
    val r = spark.sql(
      """SELECT gm_cell(-1182562000, 341060000, 4) AS cell,
        |       st_contains(st_rect_wkb(-1190000000, 340000000, -1180000000, 342000000),
        |                   -1182562000, 341060000) AS hit,
        |       gm_hilbert(5000000, 5000000, 0, 0, 30000000, 30000000) AS h,
        |       gm_dz_decode(gm_dz_encode(array(1, 2, 3)))[1] AS two
        |""".stripMargin).head()
    assert(r.getAs[Boolean]("hit"))
    assert(r.getAs[Long]("h") == 143165576L)
    assert(r.getAs[Int]("two") == 2)
  }

  test("GraftExtensions injects the SQL surface (spark.sql.extensions deployment path)") {
    val reg = spark.sessionState.functionRegistry
    val fn = org.apache.spark.sql.catalyst.FunctionIdentifier("gm_cell")
    reg.dropFunction(fn)
    assert(!reg.functionExists(fn))
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlShim.applyCheckRules(ext, spark)
    assert(reg.functionExists(fn))
    assert(spark.sql("SELECT gm_cell(0, 0, 4)").head().getLong(0) >= 0)
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
