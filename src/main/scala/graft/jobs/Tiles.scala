package graft.jobs

import graft.expr.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster <-> vector tile materialization (SURVEY.md §2.11): a tile at
  * zoom z is a grid cell; raster tiles aggregate per-tile counts (heat
  * grid), vector tiles materialize the per-tile feature list, preserving
  * each feature's span payload. One shuffle each (the groupBy on tile),
  * map-side combined for raster.
  */
object Tiles {

  /** (tile_id, tile_x, tile_y, n) heat grid. */
  def raster(docsGeo: DataFrame, zoom: Int): DataFrame = {
    val per = 1L << zoom
    docsGeo
      .withColumn("tile_id", gmTile(col("lng"), col("lat"), zoom))
      .groupBy("tile_id")
      .agg(count(lit(1)).as("n"))
      .withColumn("tile_x", floor(col("tile_id") / per).cast("long"))
      .withColumn("tile_y", pmod(col("tile_id"), lit(per)).cast("long"))
      .select("tile_id", "tile_x", "tile_y", "n")
  }

  /** Full raster pyramid (every zoom 0..maxZoom) from ONE scan of the
    * data: aggregate to the base-zoom heat grid first (map-side combined,
    * <= 4^maxZoom rows survive the shuffle), then derive every ancestor
    * tile ARITHMETICALLY from the base tiles (parent x/y = child x/y >> 1
    * per level) and re-aggregate the tiny grid. The raw table is touched
    * exactly once — the shape that survives 100x: a per-zoom loop rescans
    * the table maxZoom+1 times, and exploding zoom levels BEFORE the
    * first aggregation shuffles (maxZoom+1)x the data. Returns
    * (zoom, tile_id, tile_x, tile_y, n); within a zoom, tile ids use that
    * zoom's own 2^zoom x 2^zoom grid (same packing as [[raster]]).
    */
  def pyramid(docsGeo: DataFrame, maxZoom: Int): DataFrame = {
    require(maxZoom >= 0 && maxZoom <= graft.curve.Cells.MaxRes,
      s"maxZoom must be in [0, ${graft.curve.Cells.MaxRes}]; got $maxZoom")
    val perMax = 1L << maxZoom
    val base = docsGeo
      .withColumn("t", gmTile(col("lng"), col("lat"), maxZoom))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .withColumn("bx", floor(col("t") / perMax).cast("long"))
      .withColumn("by", pmod(col("t"), lit(perMax)).cast("long"))
    base
      .withColumn("zoom", explode(sequence(lit(0), lit(maxZoom))))
      .withColumn("shift", lit(maxZoom) - col("zoom"))
      .withColumn("tile_x", expr("shiftright(bx, shift)"))
      .withColumn("tile_y", expr("shiftright(by, shift)"))
      .withColumn("tile_id",
        col("tile_x") * expr("shiftleft(CAST(1 AS BIGINT), zoom)") + col("tile_y"))
      .groupBy(col("zoom").cast("long").as("zoom"), col("tile_id"),
        col("tile_x"), col("tile_y"))
      .agg(sum("n").as("n"))
  }

  val DefaultBuckets = 64

  /** Vector tiles as bucketed sub-tiles — the 100 TB shape:
    * (tile_id, bucket, n, doc_ids array). With skewed data one tile holds
    * most docs; a single collect_list per tile funnels them into ONE
    * reduce task and builds one giant payload (OOM/straggler at scale).
    * Hash-bucketing doc_ids spreads the hot tile over `buckets` tasks and
    * bounds every materialized payload; consumers stream a tile as its
    * bucket sequence. Each bucket list is sorted, so output is
    * deterministic. For real tile payloads, swap the id list for
    * collect_list(struct(doc_id, spans, wkb)).
    */
  def vector(docsGeo: DataFrame, zoom: Int, buckets: Int = DefaultBuckets): DataFrame =
    vectorBy(docsGeo, zoom, pmod(xxhash64(col("doc_id")), lit(buckets.toLong)))

  /** [[vector]] with an explicit bucket key — same scale shape, caller
    * picks the spread function (xxhash64 default; an arithmetic key makes
    * the bucketing independently replayable by a SQL oracle).
    */
  def vectorBy(docsGeo: DataFrame, zoom: Int, bucket: org.apache.spark.sql.Column): DataFrame =
    docsGeo
      .withColumn("tile_id", gmTile(col("lng"), col("lat"), zoom))
      .withColumn("bucket", bucket)
      .groupBy("tile_id", "bucket")
      .agg(
        count(lit(1)).as("n"),
        array_sort(collect_list(col("doc_id"))).as("doc_ids"))

  /** Single-payload-per-tile view (tile_id, n, doc_ids csv), composed from
    * the bucketed sub-tiles. The final per-tile concat necessarily lands
    * on one task — bounded-cardinality tiles / test-scale exports only;
    * the scale path is [[vector]].
    */
  def vectorCombined(docsGeo: DataFrame, zoom: Int, buckets: Int = DefaultBuckets): DataFrame =
    vector(docsGeo, zoom, buckets)
      .groupBy("tile_id")
      .agg(
        sum("n").as("n"),
        array_join(array_sort(flatten(collect_list(col("doc_ids")))), ",").as("doc_ids"))
}
