package graft.table

import graft.expr.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's primary input: an "Iceberg-shaped" table of interleaved
  * text + media documents, pinned by BASELINE.json `input_hint`:
  *
  *   (doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)
  *
  * Synthesized deterministically from the driver's `documents.parquet`
  * (doc_id:int64, text, lang, source, n_chars) using pure integer
  * arithmetic on doc_id, so an independent DuckDB oracle can replay the
  * exact same geometry without ever parsing WKB (see SparkEntry.oracleSql).
  *
  * Geometry is carried inside the spans array as a `kind='geom'` span whose
  * media_ref is hex-encoded WKB — the analog of the reference's
  * per-feature geometry (`/root/reference/geomedea/src/feature.rs:6-10`).
  * The span array's element order IS the per-row invariant (span-sequence
  * equality), mirroring the reference's insertion-ordered properties
  * (`feature.rs:45-83`).
  *
  * Skew by construction: 90% of docs land in a 2°x2° hot cluster (around
  * the reference's golden coordinate -118.2562, 34.106) so hot-cell
  * handling (salting / AQE skew join) is actually exercised; the remaining
  * 10% spread uniformly over the world.
  */
object InterleavedDocs {

  /** Deterministic scaled-int coords from the numeric doc id (bigint col). */
  def lngOf(id: Column): Column =
    when(id % 10 === 0, (id * 48271L) % 3600000000L - 1800000000L)
      .otherwise(lit(-1182562000L) + (id * 48271L) % 20000000L)

  def latOf(id: Column): Column =
    when(id % 10 === 0, (id * 69621L) % 1800000000L - 900000000L)
      .otherwise(lit(331060000L) + (id * 69621L) % 20000000L)

  /** The same formulas as DuckDB SQL, for oracle CTEs. */
  val OracleSqlPts: String =
    """pts AS (
      |  SELECT printf('doc-%09d', doc_id) AS doc_id,
      |         CASE WHEN doc_id % 10 = 0
      |              THEN (doc_id * 48271) % 3600000000 - 1800000000
      |              ELSE -1182562000 + (doc_id * 48271) % 20000000 END AS lng,
      |         CASE WHEN doc_id % 10 = 0
      |              THEN (doc_id * 69621) % 1800000000 - 900000000
      |              ELSE 331060000 + (doc_id * 69621) % 20000000 END AS lat
      |  FROM documents
      |)""".stripMargin

  def raw(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** The input_hint-shaped table: (doc_id string, spans array<struct<...>>). */
  def docs(spark: SparkSession, sfDir: String): DataFrame = {
    val r = raw(spark, sfDir)
    val id = col("doc_id")
    val span = (k: String, t: Column, m: Column, o: Int) =>
      struct(lit(k).as("kind"), t.as("text"), m.as("media_ref"), lit(o).as("offset"))
    r.select(
      format_string("doc-%09d", id).as("doc_id"),
      array(
        span("text", coalesce(col("text"), lit("")), lit(""), 0),
        span("media", lit(""), concat(lit("media://"), col("source"), lit("/"), id), 1),
        span("geom", lit(""),
          hex(stPointWkb(lngOf(id), latOf(id))), 2)
      ).as("spans"))
  }

  /** Parse the geometry span back out: adds wkb + scaled-int point coords +
    * envelope stat columns (min/max lng/lat as plain ints so Catalyst can
    * push comparisons into the Parquet scan — SURVEY.md §4).
    */
  def withGeometry(docs: DataFrame): DataFrame = {
    // wkb + env via the FUSED span-parse expression: ONE static call and
    // ONE hex decode per row yields the wkb bytes AND the envelope
    // (r5 fused only the envelope; the ingest path, which writes both the
    // wkb column and the stat columns, still hex-decoded every row twice
    // — measured 0.437 s full parse vs 0.208 s env-only at 2M docs).
    // CollapseProject keeps the non-cheap StaticInvoke in its own project,
    // so the struct is evaluated once and the fields extracted from it.
    docs
      .withColumn("gf", gmSpanFeature(col("spans")))
      .select(col("*"),
        col("gf").getField("wkb").as("wkb"),
        col("gf").getField("min_lng").as("min_lng"),
        col("gf").getField("min_lat").as("min_lat"),
        col("gf").getField("max_lng").as("max_lng"),
        col("gf").getField("max_lat").as("max_lat"))
      .drop("gf")
      .withColumn("lng", col("min_lng"))
      .withColumn("lat", col("min_lat"))
  }

  /** Polygon build side for joins/tiles: a 5x5 world grid of rectangles
    * derived from `nation` (n_nationkey 0..24 — constant across scale
    * factors, so the grid tiles the whole world at every sf), as WKB
    * polygons + envelope ints. Deterministic, oracle-replayable. The hot
    * doc cluster falls entirely inside poly 15 — the skewed build row.
    */
  def nationRects(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    val k = col("n_nationkey").cast("long")
    val colIdx = k % 5
    // Column `/` is double division; floor() recovers exact integer division
    // for these small positive keys
    val rowIdx = floor(k / 5).cast("long") % 5
    val minLng = lit(-1800000000L) + colIdx * 720000000L
    val minLat = lit(-900000000L) + rowIdx * 360000000L
    n.select(
      k.as("poly_id"),
      stRectWkb(minLng, minLat, minLng + 720000000L, minLat + 360000000L).as("poly_wkb"),
      minLng.cast("int").as("p_min_lng"), minLat.cast("int").as("p_min_lat"),
      (minLng + 720000000L).cast("int").as("p_max_lng"),
      (minLat + 360000000L).cast("int").as("p_max_lat"))
  }

  /** The same rectangles in DuckDB SQL. */
  val OracleSqlRects: String =
    """rects AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS poly_id,
      |         -1800000000 + (CAST(n_nationkey AS BIGINT) % 5) * 720000000 AS p_min_lng,
      |         -900000000 + ((CAST(n_nationkey AS BIGINT) // 5) % 5) * 360000000 AS p_min_lat,
      |         -1800000000 + (CAST(n_nationkey AS BIGINT) % 5) * 720000000 + 720000000 AS p_max_lng,
      |         -900000000 + ((CAST(n_nationkey AS BIGINT) // 5) % 5) * 360000000 + 360000000 AS p_max_lat
      |  FROM nation
      |)""".stripMargin

  /** Second polygon set for polygon x polygon joins: a 3x2 grid of larger
    * rectangles derived from `region` (r_regionkey 0..4, constant across
    * scale factors), offset from the nation grid so every region rect
    * straddles several nation rects and no corners coincide (the
    * exactly-once emission rule is exercised on real multi-cell overlaps).
    */
  def regionRects(spark: SparkSession, sfDir: String): DataFrame = {
    val r = spark.read.parquet(s"$sfDir/region.parquet")
    val k = col("r_regionkey").cast("long")
    val colIdx = k % 3
    val rowIdx = floor(k / 3).cast("long")
    val minLng = lit(-1620000000L) + colIdx * 900000000L
    val minLat = lit(-810000000L) + rowIdx * 540000000L
    r.select(
      k.as("poly_id"),
      stRectWkb(minLng, minLat, minLng + 900000000L, minLat + 540000000L).as("poly_wkb"),
      minLng.cast("int").as("p_min_lng"), minLat.cast("int").as("p_min_lat"),
      (minLng + 900000000L).cast("int").as("p_max_lng"),
      (minLat + 540000000L).cast("int").as("p_max_lat"))
  }

  /** The same region rectangles in DuckDB SQL. */
  val OracleSqlRegionRects: String =
    """rrects AS (
      |  SELECT CAST(r_regionkey AS BIGINT) AS poly_id,
      |         -1620000000 + (CAST(r_regionkey AS BIGINT) % 3) * 900000000 AS p_min_lng,
      |         -810000000 + (CAST(r_regionkey AS BIGINT) // 3) * 540000000 AS p_min_lat,
      |         -1620000000 + (CAST(r_regionkey AS BIGINT) % 3) * 900000000 + 900000000 AS p_max_lng,
      |         -810000000 + (CAST(r_regionkey AS BIGINT) // 3) * 540000000 + 540000000 AS p_max_lat
      |  FROM region
      |)""".stripMargin

  /** Query points for kNN, derived from `nation` (25 rows). */
  def nationQueryPoints(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    val k = col("n_nationkey").cast("long")
    n.select(
      k.as("query_id"),
      ((k * 7919L) % 3600000000L - 1800000000L).cast("int").as("q_lng"),
      ((k * 104729L) % 1800000000L - 900000000L).cast("int").as("q_lat"))
  }

  val OracleSqlQueryPts: String =
    """qpts AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS query_id,
      |         (CAST(n_nationkey AS BIGINT) * 7919) % 3600000000 - 1800000000 AS q_lng,
      |         (CAST(n_nationkey AS BIGINT) * 104729) % 1800000000 - 900000000 AS q_lat
      |  FROM nation
      |)""".stripMargin
}
