package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed per-group quantiles (discrete / type-1): the p-th
  * percentile of a group of n rows is the element at 1-based rank
  * ceil(n*p/100) in value order — an actual data element, computed with
  * pure integer rank math, so the result is hash-exact cross-engine
  * (unlike interpolating quantiles or approx sketches, whose float
  * interpolation/merge order never replays bit-for-bit).
  *
  * Scale shape: ONE hash shuffle on the group key; `row_number` and the
  * partition count ride the same Window partitioning (Catalyst reuses the
  * exchange), then a map-side-combined groupBy picks the ranked elements
  * for every requested percentile in one pass — k percentiles cost one
  * scan, not k. Exact quantiles inherently sort each group; a
  * pathologically hot group serializes inside one task (same caveat as
  * any per-key window — for ONE global quantile over 10^12 rows use
  * iterative selection instead; per-group with group cardinality >=
  * parallelism, the common case, this is the plan you want).
  */
object Quantiles {

  /** @param percents 1..100; output column `p<P>` per requested percentile
    * plus `n` (group size). Ties in `valueCol` are fine: every engine
    * sees the same multiset, so the element AT a rank is well defined
    * even when row order among equals is not.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
            percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(gcols: _*)))
    def rankOf(p: Int): Column = // ceil(n*p/100) in exact integer math
      call_function("div", col("__n") * p + 99, lit(100L))
    val aggs = max(col("__n")).as("n") +:
      percents.map(p => max(when(col("__rn") === rankOf(p), col(valueCol))).as(s"p$p"))
    ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
