package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join: events (huge) x time windows
  * (small or moderate) — "which window(s) does each event fall in", the
  * temporal sibling of [[SpatialJoin.cellJoin]] with the same plan shape.
  * The reference engine is batch-spatial only; this is a scale-path extra
  * the same pipelines need on their time axis (maintenance windows,
  * campaign ranges, validity intervals).
  *
  * Scale shape — exactly the cell-join trick on one dimension: intervals
  * explode to the bucket range they cover (an interval of length L costs
  * ceil(L/bucketWidth)+1 rows), points key to ONE bucket, Catalyst plans
  * a plain equi-join on the bucket (broadcast while the exploded interval
  * side fits, shuffle-hash past it — no hint), and the exact closed
  * `start <= t <= end` predicate refines inline. Because a point owns
  * exactly one bucket, every (point, interval) pair meets in exactly one
  * task — exactly-once for free, no distinct, no cross product, no
  * data-dependent bucket tuning beyond the width. AQE splits skewed hot
  * buckets (a flash-crowd minute) like any other equi-join key.
  *
  * Contract: `points` carries a long time column `pointTime` (e.g. epoch
  * micros); `intervals` carries long `start`/`end` (closed, start <= end
  * required — rows violating it are dropped as empty intervals, matching
  * SQL BETWEEN). All columns of both sides are preserved on output.
  */
object IntervalJoin {

  /** Widest per-interval bucket cover accepted before failing loudly: a
    * sentinel open end (Long.MaxValue "still valid") would otherwise blow
    * past Spark's max array length inside `sequence` with a cryptic
    * runtime error — clamp sentinel ends to the data's max time, or widen
    * the bucket, instead.
    */
  val MaxBucketsPerInterval: Long = 1L << 20

  def pointInInterval(points: DataFrame, pointTime: String,
                      intervals: DataFrame, start: String, end: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "__bucket is reserved by pointInInterval")
    // exact integer floorDiv over the FULL long range: Spark's `/` on
    // longs is double division (rounds past 2^53 — silently off-by-one
    // buckets for nano-scale epochs), so use integral `div` with the
    // classic truncation->floor shift for negatives (no subtraction that
    // could wrap near Long.MinValue)
    def bucketOf(c: org.apache.spark.sql.Column) =
      when(c >= 0, call_function("div", c, lit(bucketWidth)))
        .otherwise(call_function("div", c + 1, lit(bucketWidth)) - 1)
    val bs = bucketOf(col(start))
    val be = bucketOf(col(end))
    val beGuarded = when(be - bs < lit(MaxBucketsPerInterval), be)
      .otherwise(raise_error(format_string(
        s"interval [%d, %d] covers %d buckets of width $bucketWidth " +
          s"(> $MaxBucketsPerInterval) — widen bucketWidth or clamp sentinel end times",
        col(start), col(end), be - bs + lit(1L))).cast("long"))
    val iv = intervals
      .where(col(start) <= col(end))
      .withColumn("__bucket", explode(sequence(bs, beGuarded)))
    val pts = points.withColumn("__bucket", bucketOf(col(pointTime)))
    pts.join(iv, Seq("__bucket"))
      .where(col(pointTime) >= col(start) && col(pointTime) <= col(end))
      .drop("__bucket")
  }
}
