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

  def pointInInterval(points: DataFrame, pointTime: String,
                      intervals: DataFrame, start: String, end: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // exact floorDiv (also for times <= 0): subtract the non-negative
    // pmod first, so the double division is of exact multiples (integer
    // quotient, exactly representable — never a boundary off-by-one the
    // way floor(t/w) in binary floating point can be)
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(bucketWidth))) / lit(bucketWidth)).cast("long")
    val iv = intervals
      .where(col(start) <= col(end))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(start)), bucketOf(col(end)))))
    val pts = points.withColumn("__bucket", bucketOf(col(pointTime)))
    pts.join(iv, Seq("__bucket"))
      .where(col(pointTime) >= col(start) && col(pointTime) <= col(end))
      .drop("__bucket")
  }
}
