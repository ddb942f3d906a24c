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

  /** (tile_id, n, doc_ids) vector tile: the member list in deterministic
    * (sorted) order. For real tile payloads, swap the id list for
    * collect_list(struct(doc_id, spans, wkb)).
    */
  def vector(docsGeo: DataFrame, zoom: Int): DataFrame =
    docsGeo
      .withColumn("tile_id", gmTile(col("lng"), col("lat"), zoom))
      .groupBy("tile_id")
      .agg(
        count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("doc_id"))), ",").as("doc_ids"))
}
