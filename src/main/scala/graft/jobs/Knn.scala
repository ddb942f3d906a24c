package graft.jobs

import graft.curve.Cells
import graft.expr.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN via cell-ring expansion (SURVEY.md §2.11): for each query point,
  * probe candidates from the grid cells within Chebyshev ring `r` of the
  * query's cell, and widen `r` (doubling) until the k-th best candidate is
  * provably closer than anything outside the ring.
  *
  * Completeness argument: a point whose cell is at Chebyshev cell-distance
  * > r from the query cell is at least r * min(cellW, cellH) away in
  * scaled units, so once the k-th candidate distance is strictly below
  * that bound (or the ring covers the whole grid) the top-k is final.
  *
  * The query side is small (it is broadcast); the doc side is only ever
  * touched through a cell equi-join — no cross product, no full sort.
  * Distances are squared Euclidean in scaled-int space computed in double
  * (dx*dx + dy*dy, exact IEEE ordering reproducible by the DuckDB oracle);
  * ties break on doc_id for determinism.
  */
object Knn {

  val DefaultRes = 4

  /** points: (doc_id, lng, lat, ...); queries: (query_id, q_lng, q_lat).
    * Returns (query_id, rank, doc_id, dist2), rank 1..k.
    */
  def knn(points: DataFrame, queries: DataFrame, k: Int, res: Int = DefaultRes): DataFrame = {
    val spark = points.sparkSession
    val minDim = math.min(Cells.cellWidth(res), Cells.cellHeight(res)).toDouble
    val perAxis = Cells.cellsPerAxis(res).toInt

    val pts = points
      .select(col("doc_id"), col("lng"), col("lat"))
      .withColumn("cell", gmCell(col("lng"), col("lat"), res))

    val w = Window.partitionBy(col("query_id")).orderBy(col("dist2").asc, col("doc_id").asc)

    var ring = 1
    var pending = queries.select("query_id", "q_lng", "q_lat")
    var acc: DataFrame = null
    var exhausted = false

    while (!exhausted && !pending.isEmpty) {
      val coversWorld = ring >= perAxis
      val qcells = pending
        .withColumn("qcell", gmCell(col("q_lng"), col("q_lat"), res))
        .withColumn("cell", explode(gmKRing(col("qcell"), res, lit(ring))))
        .drop("qcell")

      val dx = (col("lng").cast("long") - col("q_lng").cast("long")).cast("double")
      val dy = (col("lat").cast("long") - col("q_lat").cast("long")).cast("double")
      val topk = pts.join(broadcast(qcells), Seq("cell"), "inner")
        .withColumn("dist2", dx * dx + dy * dy)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("query_id", "rank", "doc_id", "dist2")

      // a query is final when its k-th hit beats the ring's exclusion bound
      val bound = math.pow(ring * minDim, 2)
      val status = topk.groupBy("query_id")
        .agg(count(lit(1)).as("n"), max("dist2").as("worst"))
      val doneIds =
        if (coversWorld) status.select("query_id")
        else status.where(col("n") === k && col("worst") < bound).select("query_id")

      val finished = topk.join(doneIds, Seq("query_id"), "left_semi")
      acc = if (acc == null) finished else acc.unionByName(finished)
      pending = pending.join(doneIds, Seq("query_id"), "left_anti")
      if (coversWorld) exhausted = true
      ring *= 2
    }
    if (acc == null) spark.emptyDataFrame else acc
  }

  /** Test/oracle brute force: window top-k over the full cross join. */
  def bruteForce(points: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val dx = (col("lng").cast("long") - col("q_lng").cast("long")).cast("double")
    val dy = (col("lat").cast("long") - col("q_lat").cast("long")).cast("double")
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist2").asc, col("doc_id").asc)
    points.select(col("doc_id"), col("lng"), col("lat"))
      .crossJoin(broadcast(queries))
      .withColumn("dist2", dx * dx + dy * dy)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "dist2")
  }
}
