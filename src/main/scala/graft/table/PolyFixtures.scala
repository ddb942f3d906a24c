package graft.table

import graft.expr.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic polygon fixtures (FIXTURES.md §2). The reference's
  * USCounties binary fixture is absent from the mirror
  * (`/root/reference/.MISSING_LARGE_BLOBS`), so the stand-in is a seeded
  * deterministic grid of 3221 county-like rectangles over the continental
  * US extent (lng -125..-66, lat 24..50) — same cardinality as the real
  * fixture (3221 MultiPolygons, `geomedea/src/http_reader.rs:786-803`),
  * with our own frozen golden counts for the reference's query rectangle
  * (-86,10)-(-85,40) committed in PolyFixturesSpec.
  */
object PolyFixtures {
  val NumCounties = 3221
  val Cols = 57
  val MinLng = -1250000000L
  val MinLat = 240000000L
  val CellW: Long = 590000000L / Cols // ~1.035 deg
  val CellH: Long = 260000000L / 57   // ~0.456 deg

  /** 3221 county rectangles as (poly_id, poly_wkb, envelope ints). */
  def usCountiesStandIn(spark: SparkSession): DataFrame = {
    val k = col("id")
    val colIdx = k % Cols
    val rowIdx = floor(k / Cols).cast("long")
    val minLng = lit(MinLng) + colIdx * CellW
    val minLat = lit(MinLat) + rowIdx * CellH
    spark.range(NumCounties).select(
      k.as("poly_id"),
      stRectWkb(minLng, minLat, minLng + CellW, minLat + CellH).as("poly_wkb"),
      minLng.cast("int").as("p_min_lng"), minLat.cast("int").as("p_min_lat"),
      (minLng + CellW).cast("int").as("p_max_lng"), (minLat + CellH).cast("int").as("p_max_lat"))
  }
}
