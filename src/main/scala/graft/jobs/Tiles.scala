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
