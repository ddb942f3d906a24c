package graft

import graft.codec.FeatureCodec.{Feature, PInt64, PString}
import graft.geom.{Envelope, Wkb}
import graft.sources.{GeomedeaFile, GeomedeaSpark}
import graft.sources.v2.GeomedeaScan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.read.format("geomedea")` — the first-class native-format read
  * path (reference `reader.rs:313-346` select/select_bbox semantics
  * driven by ordinary Catalyst WHERE filters).
  */
class DataSourceV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Two shards with DISJOINT extents (west ~[0,10], east ~[100,110] deg)
    * plus one empty file — so file-level pruning is observable.
    */
  lazy val shardDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("gm_dsv2").toString
    def pt(lngDeg: Double, latDeg: Double, id: Long) = Feature(
      Wkb.Pt((lngDeg * 1e7).toInt, (latDeg * 1e7).toInt),
      Vector("doc" -> PString(s"doc-$id"), "id" -> PInt64(id)))
    val west = (0 until 40).map(i => pt(i % 10, i / 10, i.toLong))
    val east = (0 until 40).map(i => pt(100 + i % 10, i / 10, 1000L + i))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/west.geomedea"),
      GeomedeaFile.write(west, compressed = true, pageSizeGoal = 256))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/east.geomedea"),
      GeomedeaFile.write(east, compressed = false, pageSizeGoal = 256))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/empty.geomedea"),
      GeomedeaFile.write(Seq.empty, compressed = true, pageSizeGoal = 256))
    dir
  }

  private def bboxWhere(df: DataFrame, q: Envelope): DataFrame =
    df.where(col("max_lng") >= q.minLng && col("max_lat") >= q.minLat &&
      col("min_lng") <= q.maxLng && col("min_lat") <= q.maxLat)

  private def scanOf(df: DataFrame): GeomedeaScan =
    // logical plan, not executedPlan: AQE (any shuffle, e.g. ORDER BY)
    // hides the BatchScanExec inside AdaptiveSparkPlanExec
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collectFirst { case s: GeomedeaScan => s }
      .getOrElse(fail("no GeomedeaScan in plan"))

  test("full scan reads every feature of every shard with stable FeatureLocations") {
    val df = spark.read.format("geomedea").load(shardDir)
    assert(df.count() == 80)
    // row surface matches the functional bridge (same columns, same rows)
    val viaBridge = GeomedeaSpark.readDir(spark, shardDir)
    assert(df.columns.toSet == viaBridge.columns.toSet)
    def key(d: DataFrame) = d
      .select(regexp_extract(col("source_file"), "([a-z]+)\\.geomedea", 1),
        col("page_offset"), col("feature_offset"), element_at(col("prop_vals"), 1))
      .collect().map(_.toSeq).toSet
    assert(key(df) == key(viaBridge))
    // full scan plans one partition per non-empty-or-not file (no filter
    // pushed -> no planning-time prune; the empty file just yields 0 rows)
    assert(scanOf(df).toBatch.planInputPartitions().length == 3)
  }

  test("geom-only projections equal the full read (props skip is value-invisible)") {
    // r6: a projection with no props/prop_keys/prop_vals column decodes
    // pages geometry-only (pointer jump over the props bytes) — the
    // emitted wkb/offsets/envelope values must be identical to the full
    // decode, on both the compressed and uncompressed shard
    val full = spark.read.format("geomedea").load(shardDir)
    def key(d: DataFrame) = d
      .select(col("page_offset"), col("feature_offset"), hex(col("wkb")),
        col("min_lng"), col("min_lat"), col("max_lng"), col("max_lat"))
      .collect().map(_.toSeq).toSet
    val geomOnly = key(full) // projection has no props column -> skip path
    val viaFull = full.select(col("page_offset"), col("feature_offset"), hex(col("wkb")),
        col("min_lng"), col("min_lat"), col("max_lng"), col("max_lat"),
        element_at(col("prop_vals"), 1).as("pv")) // props required -> full decode path
      .drop("pv")
      .collect().map(_.toSeq).toSet
    assert(geomOnly == viaFull && geomOnly.size == 80)
  }

  test("WHERE bbox pushes filters, prunes whole files at planning, equals post-filter") {
    val q = Envelope.fromDegrees(100, 0, 110, 10) // east shard only
    val full = spark.read.format("geomedea").load(shardDir)
    val pruned = bboxWhere(full, q)
    // correctness: identical to filtering the full scan
    val expect = full.collect().count { r =>
      r.getAs[Int]("max_lng") >= q.minLng && r.getAs[Int]("max_lat") >= q.minLat &&
        r.getAs[Int]("min_lng") <= q.maxLng && r.getAs[Int]("min_lat") <= q.maxLat
    }
    assert(expect == 40)
    assert(pruned.count() == 40)
    assert(pruned.select("source_file").distinct().collect()
      .forall(_.getString(0).endsWith("east.geomedea")))
    // pushdown evidence: the scan carries the bbox + pushed filters
    val scan = scanOf(pruned)
    assert(scan.description().contains("PushedFilters: ["), scan.description())
    assert(scan.description().contains("GreaterThanOrEqual(max_lng"), scan.description())
    // planning-time prune: west + empty shards are never planned
    assert(scan.toBatch.planInputPartitions().length == 1)
  }

  test("point-query filters on min_* columns prune too (max >= min superset argument)") {
    // a user filtering points often writes equality-ish bounds on min_*
    val df = spark.read.format("geomedea").load(shardDir)
      .where(col("min_lng") >= 1000000000 && col("min_lng") <= 1100000000 &&
        col("min_lat") >= 0 && col("min_lat") <= 100000000)
    assert(df.count() == 40)
    assert(scanOf(df).toBatch.planInputPartitions().length == 1)
  }

  test("column pruning: narrow projection still correct (ReadSchema subset)") {
    val df = spark.read.format("geomedea").load(shardDir)
      .select("source_file", "min_lng")
    val rows = df.collect()
    assert(rows.length == 80)
    assert(rows.forall(_.length == 2))
    val west = rows.filter(_.getString(0).endsWith("west.geomedea"))
    assert(west.map(_.getInt(1)).min == 0)
    assert(scanOf(df).readSchema().fieldNames.toSeq == Seq("source_file", "min_lng"))
  }

  test("SQL over the format: CREATE TABLE USING geomedea + WHERE drives the same prune") {
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gm USING geomedea OPTIONS (path '$shardDir')")
    val out = spark.sql(
      """SELECT element_at(prop_vals, 2) AS id FROM gm
        |WHERE max_lng >= 1000000000 AND min_lng <= 1100000000
        |  AND max_lat >= 0 AND min_lat <= 100000000
        |ORDER BY id""".stripMargin)
    val ids = out.collect().map(_.getString(0))
    assert(ids.length == 40 && ids.forall(_.toLong >= 1000L))
    assert(scanOf(out).toBatch.planInputPartitions().length == 1)
  }

  test("X5 analog: .geomedea dir split packing follows openCostInBytes/maxPartitionBytes") {
    // The reference's HTTP reader merges nearby byte ranges (16,000-byte
    // threshold, packed_r_tree/reader.rs:159-161) and batches feature
    // fetches (http_reader.rs:121-187). BASELINE.md maps those constants
    // to Spark's split-packing knobs; this pins the mapping over the
    // sharded .geomedea directory itself (binaryFile-planned readDir):
    // a huge openCostInBytes means "never merge" -> one split per file;
    // zero open cost + one-partition floor packs all files together.
    def partitionsWith(maxPB: String, openCost: String): Int = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPB)
      spark.conf.set("spark.sql.files.openCostInBytes", openCost)
      spark.conf.set("spark.sql.files.minPartitionNum", "1")
      try GeomedeaSpark.readDir(spark, shardDir).rdd.getNumPartitions
      finally Seq("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes",
        "spark.sql.files.minPartitionNum").foreach(spark.conf.unset)
    }
    val onePerFile = partitionsWith("134217728", (1L << 30).toString)
    assert(onePerFile == 3, s"huge open cost must plan one split per file, got $onePerFile")
    val packed = partitionsWith("134217728", "0")
    assert(packed == 1, s"zero open cost + 1-partition floor must pack all files, got $packed")
  }

  test("limit pushdown: plans only enough files, decodes only enough pages, reports metrics") {
    val df = spark.read.format("geomedea").load(shardDir).limit(10)
    assert(df.count() == 10)
    val scan = scanOf(df)
    assert(scan.description().contains("limit=10"), scan.description())
    // file planning: 10 rows fit in the first shard (40 features) — only
    // one partition planned instead of three
    assert(scan.toBatch.planInputPartitions().length == 1)
    // reader-level early stop: drive a reader directly and check the
    // task metrics — with pageSizeGoal=256 the 40-feature shard holds
    // ~10 pages, and the pushed limit of 10 (~4 features/page) must
    // range-read only a strict prefix of them
    val parts = scan.toBatch.planInputPartitions()
    val reader = scan.toBatch.createReaderFactory().createReader(parts.head)
    var n = 0
    while (reader.next()) n += 1
    assert(n <= 10 && n > 0)
    val metrics = reader.currentMetricsValues().map(m => m.name() -> m.value()).toMap
    assert(metrics("rowsDecoded") == n)
    val totalPages = {
      val f = new java.io.File(shardDir).listFiles
        .filter(_.getName.endsWith(".geomedea")).minBy(_.getName)
      GeomedeaFile.header(java.nio.file.Files.readAllBytes(f.toPath))._2
    }
    assert(metrics("pagesDecoded") < totalPages,
      s"limit must stop decoding early: ${metrics("pagesDecoded")} of $totalPages pages")
    assert(metrics("bytesDecoded") > 0)
    // supported metric names line up with what readers emit
    assert(scan.supportedCustomMetrics().map(_.name()).toSet ==
      Set("pagesDecoded", "bytesDecoded", "rowsDecoded"))

    // file-level: the range-read limited scan is exactly the full scan's
    // prefix, and its transfer is header + needed pages only
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      new java.io.File(shardDir).listFiles.filter(_.getName.endsWith(".geomedea"))
        .minBy(_.getName).toString))
    val all = GeomedeaFile.selectAllLocated(bytes)
    var transferred = 0L
    val lim = GeomedeaFile.selectLimitRange((off, k) => {
      transferred += k; bytes.slice(off.toInt, off.toInt + k)
    }, 7)
    assert(lim.features.map(_._1) == all.take(7).map(_._1))
    assert(lim.features.map(f => Wkb.asText(f._2.geom)) ==
      all.take(7).map(f => Wkb.asText(f._2.geom)))
    assert(transferred < bytes.length / 2,
      s"bounded transfer: $transferred of ${bytes.length} bytes")
  }

  test("COUNT(*) pushdown: answered from file headers, no page decoded") {
    val df = spark.read.format("geomedea").load(shardDir)
    // the count itself
    assert(df.count() == 80)
    // and the plan proves it came from the header-count scan, not a scan
    // of decoded features
    val agg = df.groupBy().count()
    val scans = agg.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(scans.exists(_.isInstanceOf[graft.sources.v2.GeomedeaStatsScan]),
      agg.queryExecution.optimizedPlan.toString)
    assert(agg.head().getLong(0) == 80)
    // filtered counts must NOT push (filters are residual): normal scan
    val filtered = bboxWhere(df, Envelope.fromDegrees(100, 0, 110, 10)).groupBy().count()
    val fScans = filtered.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(!fScans.exists(_.isInstanceOf[graft.sources.v2.GeomedeaStatsScan]))
    assert(filtered.head().getLong(0) == 40)
  }

  test("envelope MIN/MAX pushdown: lake extent answered from headers") {
    val df = spark.read.format("geomedea").load(shardDir)
    val agg = df.groupBy().agg(
      min("min_lng").as("a"), min("min_lat").as("b"),
      max("max_lng").as("c"), max("max_lat").as("d"), count("*").as("n"))
    val scans = agg.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(scans.exists(_.isInstanceOf[graft.sources.v2.GeomedeaStatsScan]),
      agg.queryExecution.optimizedPlan.toString)
    // ground truth through the NON-pushed path: a residual filter blocks
    // aggregate pushdown (ours always stay residual), forcing decode
    val brute = df.where(col("feature_offset") >= 0).groupBy().agg(
      min("min_lng"), min("min_lat"), max("max_lng"), max("max_lat"), count("*"))
    val bScans = brute.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(!bScans.exists(_.isInstanceOf[graft.sources.v2.GeomedeaStatsScan]))
    assert(agg.head().toSeq == brute.head().toSeq,
      "header-derived extent must equal the decoded aggregation exactly")

    // the misaligned pair is NOT derivable from root bounds: never pushed
    val wrongPair = df.groupBy().agg(min("max_lng"))
    val wScans = wrongPair.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(!wScans.exists(_.isInstanceOf[graft.sources.v2.GeomedeaStatsScan]))
    // and a mixed list with one unsupported aggregate rejects the whole push
    val mixed = df.groupBy().agg(min("min_lng"), avg("min_lat"))
    val mScans = mixed.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(!mScans.exists(_.isInstanceOf[graft.sources.v2.GeomedeaStatsScan]))
    assert(mixed.head().getInt(0) == brute.head().getInt(0))
  }

  test("scan reports true header statistics (rows/bytes) to Catalyst") {
    val df = spark.read.format("geomedea").load(shardDir)
    val full = scanOf(df).estimateStatistics()
    assert(full.numRows().getAsLong == 80)
    assert(full.sizeInBytes().getAsLong ==
      new java.io.File(shardDir).listFiles.filter(_.getName.endsWith(".geomedea"))
        .map(_.length).sum)
    // bbox narrows the estimate to the surviving shard's totals
    val east = scanOf(bboxWhere(df, Envelope.fromDegrees(100, 0, 110, 10)))
      .estimateStatistics()
    assert(east.numRows().getAsLong == 40)
    // and Catalyst's plan-level stats see the scan's sizeInBytes (not a
    // default-huge relation), so broadcast decisions are informed
    val planBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(planBytes > 0 && planBytes < 10L * 1024 * 1024, planBytes)
  }

  test("distributed write: one executor-side shard per partition, roundtrip + overwrite") {
    val src = spark.read.format("geomedea").load(shardDir)
    val out = java.nio.file.Files.createTempDirectory("gm_wr").toString + "/out"
    src.select("wkb", "props").repartition(2)
      .write.format("geomedea").mode("append").save(out)
    def shards = new java.io.File(out).listFiles.toSeq
      .map(_.getName).filter(_.endsWith(".geomedea")).sorted
    assert(shards.length == 2 && shards.forall(!_.startsWith("_tmp")), shards)
    val back = spark.read.format("geomedea").load(out)
    assert(back.count() == 80)
    // same feature multiset (geometry + flat prop view) as the source dir
    def key(d: DataFrame) = d.select(hex(col("wkb")), col("prop_vals").cast("string"))
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(key(back) == key(src))
    // a SECOND append job (fresh job token) must never collide with the
    // first job's shard names — appends accumulate
    src.select("wkb", "props").repartition(1)
      .write.format("geomedea").mode("append").save(out)
    assert(shards.length == 3, shards)
    // decode-path check, NOT count(): count() is answered from headers
    // (aggregate pushdown), which would mask a writer that stamps a
    // correct header over corrupt pages
    assert(spark.read.format("geomedea").load(out).collect().length == 160)
    // extra columns are ignored; overwrite truncates previous shards
    src.select(col("wkb"), col("props"), col("min_lng").as("junk")).repartition(1)
      .write.format("geomedea").mode("overwrite").save(out)
    assert(shards.length == 1, shards)
    assert(spark.read.format("geomedea").load(out).count() == 80)
    // a written shard is a genuine reference-format container
    val one = GeomedeaFile.selectAll(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/${shards.head}")))
    assert(one.length == 80)
  }

  test("all 7 geometry types + empties + holes + typed vec/map roundtrip write->read") {
    import graft.codec.FeatureCodec._
    def pk(x: Int, y: Int) = Wkb.pack(x, y)
    val outer = Array(pk(0, 0), pk(100, 0), pk(100, 100), pk(0, 100), pk(0, 0))
    val hole = Array(pk(40, 40), pk(60, 40), pk(60, 60), pk(40, 60), pk(40, 40))
    val geoms: Seq[Wkb.Geom] = Seq(
      Wkb.Pt(15000000, -25000000),
      Wkb.Line(Array(pk(0, 0), pk(10, 10), pk(-10, 5))),
      Wkb.Line(Array.empty),
      Wkb.Poly(Vector(outer, hole)),
      Wkb.Poly(Vector.empty),
      Wkb.MultiPt(Array(pk(1, 1), pk(2, 2))),
      Wkb.MultiLine(Vector(Array(pk(0, 0), pk(5, 5)), Array.empty)),
      Wkb.MultiPoly(Vector(Vector(outer), Vector.empty)),
      Wkb.Collection(Vector(Wkb.Pt(7, 7), Wkb.Line(Array(pk(1, 0), pk(0, 1))))))
    val feats = geoms.zipWithIndex.map { case (g, i) =>
      Feature(g, Vector(
        "i" -> PInt64(i.toLong),
        "v" -> PVec(Vector(PBool(i % 2 == 0), PString(s"elem$i"))),
        "m" -> PMap(Vector("z" -> PFloat64(i * 0.5), "a" -> PUInt64(-1L)))))
    }
    val s = spark
    import s.implicits._
    val df = feats.map(f => (Wkb.write(f.geom),
        f.props.map { case (k, v) => graft.sources.GeoJsonIngest.toCell(k, v) }))
      .toDF("wkb", "props")
    val out = java.nio.file.Files.createTempDirectory("gm_geoms").toString + "/g"
    df.repartition(3).write.format("geomedea").mode("append").save(out)
    val back = spark.read.format("geomedea").load(out)
      .select("wkb", "props").as[(Array[Byte], Seq[graft.sources.GeoJsonIngest.PropCell])]
      .collect()
      .map { case (wkb, cells) =>
        (Wkb.asText(Wkb.read(wkb)), cells.map(graft.sources.GeoJsonIngest.fromCell).toVector)
      }.toSet
    val expect = feats.map(f => (Wkb.asText(f.geom), f.props)).toSet
    assert(back == expect)
  }

  /** 300-feature clustered file (many 256-byte pages) for the ranged
    * bbox scan tests: a hot cluster near (5,5) deg and a sparse far band.
    */
  private lazy val rangedFixture: Array[Byte] = {
    // ~250-byte payloads so the PAGE section dominates the index — the
    // shape where bounded transfer is measurable (at real scale pages
    // outweigh the tree by 1000x; here ~8x)
    def pt(lngDeg: Double, latDeg: Double, id: Long) = Feature(
      Wkb.Pt((lngDeg * 1e7).toInt, (latDeg * 1e7).toInt),
      Vector("doc" -> PString(s"d-$id-" +
        new scala.util.Random(id).alphanumeric.take(240).mkString), // incompressible
        "id" -> PInt64(id)))
    val hot = (0 until 200).map(i => pt(5 + (i % 20) * 0.01, 5 + (i / 20) * 0.01, i.toLong))
    val far = (0 until 100).map(i => pt(120 + i * 0.1, -40 + i * 0.2, 1000L + i))
    GeomedeaFile.write(hot ++ far, compressed = true, pageSizeGoal = 2048)
  }

  /** Fetch window matched to the fixture's 2 KiB page goal (the
    * reference's 2x-goal-x1.1 rule applied at the fixture scale).
    */
  private val FixtureBatch = (2 * 2048 * 1.1).toInt

  test("selectBboxRange: same rows/locations as the in-memory indexed scan, bounded transfer") {
    val bytes = rangedFixture
    for (q <- Seq(
      Envelope.fromDegrees(4.9, 4.9, 5.05, 5.05),   // selective corner of the hot cluster
      Envelope.fromDegrees(119, -41, 131, -19),     // far band only
      Envelope.fromDegrees(-180, -90, 180, 90),     // everything
      Envelope.fromDegrees(60, 60, 61, 61))) {      // nothing
      val expect = GeomedeaFile.selectBboxLocated(bytes, q)
      var transferred = 0L
      val scan = GeomedeaFile.selectBboxRange((off, k) => {
        transferred += k; bytes.slice(off.toInt, off.toInt + k)
      }, bytes.length.toLong, q, FixtureBatch)
      val got = scan.toVector
      assert(got.map(_._1) == expect.map(_._1), s"locations for $q")
      assert(got.map(f => Wkb.asText(f._2.geom)) == expect.map(f => Wkb.asText(f._2.geom)))
      assert(scan.bytesTransferred == transferred)
      // pruning accounting mirrors the in-memory scan's
      val counted = GeomedeaFile.selectBboxCounted(bytes, q)
      assert(scan.pagesDecoded == counted.pagesFetched, s"pages for $q")
      if (expect.nonEmpty && expect.length < 150)
        assert(transferred < bytes.length / 2,
          s"selective bbox must transfer a strict subset: $transferred of ${bytes.length}")
    }
  }

  test("selectBboxRange: tiny fetch windows (forced splits/tails) stay exact") {
    val bytes = rangedFixture
    val q = Envelope.fromDegrees(4.9, 4.9, 5.12, 5.12)
    val expect = GeomedeaFile.selectBboxLocated(bytes, q)
    // window smaller than a page: every page needs a tail fetch
    for (batch <- Seq(GeomedeaFile.PageBatchBytes, 64, 16, 12)) {
      val scan = GeomedeaFile.selectBboxRange(
        (off, k) => bytes.slice(off.toInt, off.toInt + k), bytes.length.toLong, q, batch)
      val got = scan.toVector
      assert(got.map(_._1) == expect.map(_._1), s"batch=$batch")
    }
    // uncompressed container too
    val un = {
      val feats = GeomedeaFile.selectAll(bytes)
      GeomedeaFile.write(feats, compressed = false, pageSizeGoal = 256)
    }
    val scanU = GeomedeaFile.selectBboxRange(
      (off, k) => un.slice(off.toInt, off.toInt + k), un.length.toLong, q, 64)
    assert(scanU.toVector.map(_._1) == GeomedeaFile.selectBboxLocated(un, q).map(_._1))
  }

  test("selectBboxRange: index transfer is level-pruned (never the whole tree)") {
    val bytes = rangedFixture
    val (_, _, featureCount) = GeomedeaFile.header(bytes)
    val treeBytes = graft.index.PackedRTree.nodeCount(featureCount) *
      graft.index.PackedRTree.NodeBytes
    // selective query: only the hit subtree's node ranges are fetched, so
    // total transfer stays under header + tree + hit pages even though the
    // range-merge threshold coalesces small gaps
    val q = Envelope.fromDegrees(120.0, -40.0, 120.5, -39.0)
    val scan = GeomedeaFile.selectBboxRange(
      (off, k) => bytes.slice(off.toInt, off.toInt + k), bytes.length.toLong, q)
    val n = scan.size
    assert(n > 0)
    assert(scan.requests >= 3) // header + >=1 index level + >=1 page window
    assert(scan.bytesTransferred < bytes.length.toLong,
      s"${scan.bytesTransferred} of ${bytes.length}; tree=$treeBytes")
  }

  test("selectAllStream: page-by-page full scan equals the materialized scan") {
    val bytes = rangedFixture
    val expect = GeomedeaFile.selectAllLocated(bytes)
    var pages = 0L
    val got = GeomedeaFile.selectAllStream(
      new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)),
      onPage = _ => pages += 1).toVector
    assert(got.map(_._1) == expect.map(_._1))
    assert(got.map(f => Wkb.asText(f._2.geom)) == expect.map(f => Wkb.asText(f._2.geom)))
    assert(pages == GeomedeaFile.header(bytes)._2)
  }

  test("manifest: v2 writes publish _manifest.tsv and planning consumes it") {
    import graft.sources.v2.GeomedeaManifest
    val src = spark.read.format("geomedea").load(shardDir)
    val out = java.nio.file.Files.createTempDirectory("gm_manifest").toString + "/m"
    src.select("wkb", "props").repartition(2)
      .write.format("geomedea").mode("append").save(out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val m1 = GeomedeaManifest.read(fs, new org.apache.hadoop.fs.Path(out))
    assert(m1.isDefined && m1.get.size == 2)
    assert(m1.get.values.map(_.count).sum == 80)
    // appends refresh it to cover every shard
    src.select("wkb", "props").repartition(1)
      .write.format("geomedea").mode("append").save(out)
    val m2 = GeomedeaManifest.read(fs, new org.apache.hadoop.fs.Path(out))
    assert(m2.get.size == 3 && m2.get.values.map(_.count).sum == 160)
    // PROOF the planner trusts a consistent manifest: rewrite it with a
    // far-away extent for every shard (names/lengths intact) — a bbox
    // over the true data must now prune everything at planning
    val forged = m2.get.values.map(e => e.copy(minLng = 1790000000,
      minLat = 880000000, maxLng = 1800000000, maxLat = 890000000)).toSeq
    GeomedeaManifest.write(fs, new org.apache.hadoop.fs.Path(out), forged, "forge")
    val q = Envelope.fromDegrees(0, 0, 10, 10)
    assert(graft.sources.v2.GeomedeaTable.scanFiles(out, Some(q)).isEmpty,
      "consistent manifest extents must drive file pruning")
    // STALENESS: drop one manifest line -> coverage check fails -> header
    // fallback gives the true answer again
    GeomedeaManifest.write(fs, new org.apache.hadoop.fs.Path(out), forged.tail, "stale")
    assert(graft.sources.v2.GeomedeaTable.scanFiles(out, Some(q)).nonEmpty,
      "stale manifest must fall back to header reads")
    // and a wrong byte length is also rejected
    GeomedeaManifest.write(fs, new org.apache.hadoop.fs.Path(out),
      forged.map(e => e.copy(len = e.len + 1)), "badlen")
    assert(graft.sources.v2.GeomedeaTable.scanFiles(out, Some(q)).nonEmpty)
    // manifest refresh is BEST-EFFORT: a corrupt foreign shard in the
    // dir must not fail a commit whose data already published (the
    // refresh degrades; planning falls back and names the bad file)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/junk.geomedea"),
      Array[Byte](1, 2, 3))
    src.select("wkb", "props").repartition(1)
      .write.format("geomedea").mode("append").save(out) // must not throw
    val e = intercept[Exception](graft.sources.v2.GeomedeaTable.scanFiles(out, None))
    assert(e.getMessage != null && e.getMessage.contains("junk.geomedea"))
  }

  test("writer options: pageSizeGoal shapes pages; wrong wkb type fails at planning") {
    val src = spark.read.format("geomedea").load(shardDir)
    val out = java.nio.file.Files.createTempDirectory("gm_psg").toString + "/p"
    src.select("wkb", "props").repartition(1)
      .write.format("geomedea").option("pageSizeGoal", "128").mode("append").save(out)
    val shard = new java.io.File(out).listFiles.filter(_.getName.endsWith(".geomedea")).head
    val (_, pageCount, n) = GeomedeaFile.header(java.nio.file.Files.readAllBytes(shard.toPath))
    assert(n == 80)
    assert(pageCount > 5, s"128-byte page goal must yield many pages, got $pageCount")
    // non-binary wkb: clean driver-side failure, not an executor decode error
    val bad = src.select(hex(col("wkb")).as("wkb"), col("props"))
    val err = intercept[Exception] {
      bad.write.format("geomedea").mode("append").save(out + "2")
    }
    assert(err.getMessage.contains("wkb column must be binary"), err.getMessage)
  }

  test("truncated/corrupt .geomedea file fails planning with a filename-bearing error") {
    val dir = java.nio.file.Files.createTempDirectory("gm_trunc").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.geomedea"),
      Array[Byte](1, 2, 3))
    val err = intercept[Exception] {
      spark.read.format("geomedea").load(dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m => m.contains("bad.geomedea") && m.contains("shorter")),
      messages(err).mkString(" | "))
  }

  test("streaming read: tails a growing shard lake exactly once, resumes from checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("gm_stream").toString
    val lake = s"$base/lake"
    val ckpt = s"$base/ckpt"
    def writeBatch(ids: Range): Unit =
      ids.map { i =>
        (Wkb.write(Wkb.Pt(i * 1000000, i * 500000)),
          Seq(graft.sources.GeoJsonIngest.toCell("id", PInt64(i.toLong))))
      }.toDF("wkb", "props")
        .repartition(2).write.format("geomedea").mode("append").save(lake)

    def runOnce(): Set[Long] = {
      // foreachBatch (checkpoint-recoverable, unlike the memory sink):
      // the buffer holds exactly this run's batches, i.e. only the
      // shards NEW since the checkpoint
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val q = spark.readStream.format("geomedea").load(lake)
        .select(col("props")(0)("i").as("id"))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.collect().foreach(r => got.add(r.getLong(0)))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }

    writeBatch(0 until 30)
    assert(runOnce() == (0L until 30L).toSet)
    writeBatch(30 until 50)
    assert(runOnce() == (30L until 50L).toSet,
      "restart from checkpoint must emit ONLY the new shards (offset roundtrip)")
    assert(runOnce() == Set.empty, "no new shards -> empty batch")

    // the bbox OPTION prunes whole NEW shards at streaming planning
    // (Spark never calls pushFilters on micro-batch scans — the option
    // is the streaming push channel; the where stays as defense)
    val far = spark.readStream.format("geomedea")
      .option("bbox", "900000000,-900000000,910000000,900000000").load(lake)
      .where(col("max_lng") >= 900000000 && col("min_lng") <= 910000000 &&
        col("max_lat") >= -900000000 && col("min_lat") <= 900000000)
      .select(col("props")(0)("i").as("id"))
    val q2 = far.writeStream.format("memory").queryName("gm_stream_bbox")
      .option("checkpointLocation", s"$base/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // no shard extent reaches lng >= 90 deg (ids < 50 -> lng <= 4.9 deg)
    assert(spark.table("gm_stream_bbox").count() == 0)
  }

  test("typed props survive the v2 reader (same cells as the bridge)") {
    val df = spark.read.format("geomedea").load(s"$shardDir/west.geomedea")
    val cells = df.orderBy("page_offset", "feature_offset")
      .selectExpr("props[1].kind", "props[1].i").head()
    assert(cells.getString(0) == "i64")
    // single-file load works as well as directory load
    assert(df.count() == 40)
  }
}
