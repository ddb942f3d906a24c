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

  /** @param percents 1..100, distinct; output column `p<P>` per requested
    * percentile plus `n` (count of non-NULL values in the group). Ties in
    * `valueCol` are fine: every engine sees the same multiset, so the
    * element AT a rank is well defined even when row order among equals
    * is not. NULL values are ignored like every SQL aggregate (ranked
    * last, counted out of `n`, never selectable); a group whose values
    * are all NULL stays in the output with n=0 and NULL percentiles.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
            percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    require(percents.distinct.size == percents.size,
      s"duplicate percentiles would emit colliding p<P> columns: $percents")
    val outNames = "n" +: percents.map(p => s"p$p")
    require(!groupCols.exists(outNames.contains),
      s"group columns $groupCols collide with output columns $outNames")
    // Temp rank/count columns must not clobber caller columns.
    def fresh(base: String): String = {
      var nm = base; while (df.columns.contains(nm)) nm += "_"; nm
    }
    val rnC = fresh("__rn"); val nC = fresh("__n")
    val gcols = groupCols.map(col)
    // NULLS LAST so non-NULL rows own ranks 1..n; n counts non-NULLs only
    // (count(col) skips NULLs) so rankOf can never land on a NULL row.
    val w = Window.partitionBy(gcols: _*).orderBy(col(valueCol).asc_nulls_last)
    val ranked = df
      // running count = 1-based rank as a LONG: row_number() is
      // IntegerType and wraps past 2^31 rows in one group, silently
      // yielding all-NULL percentiles; the running count cannot.
      .withColumn(rnC, count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(nC, count(col(valueCol)).over(Window.partitionBy(gcols: _*)))
    def rankOf(p: Int): Column = // ceil(n*p/100) in exact integer math
      call_function("div", col(nC) * p + 99, lit(100L))
    val aggs = max(col(nC)).as("n") +:
      percents.map(p => max(when(col(rnC) === rankOf(p), col(valueCol))).as(s"p$p"))
    ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
