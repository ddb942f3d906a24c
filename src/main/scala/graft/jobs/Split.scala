package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment for training-data
  * pipelines: the split is a pure function of (salt, key) — an md5-prefix
  * bucket in [0, 10000) compared against basis-point thresholds — so it
  * is stable across runs, cluster sizes, partitionings and table versions
  * (no RNG state, no sampling pass, no shuffle: one codegen'd projection).
  * Every derived table keyed the same way lands in the same split, which
  * is what makes the assignment leakage-safe: a near-duplicate pair split
  * across train/test is prevented upstream by keying on [[Dedup.cluster]]
  * canonical ids rather than raw doc ids.
  *
  * The hash family is the engine's oracle-replayable 60-bit md5 prefix
  * ([[Dedup.md5Half]]), so the exact assignment — not just the split
  * sizes — is verified cross-engine in the driver gate.
  */
object Split {

  /** Adds `split_bucket` (long in [0, 10000)) and `split` (train/val/test)
    * columns. `trainBp`/`valBp` are basis points; test takes the rest.
    */
  def assign(df: DataFrame, keyCol: String, salt: String,
             trainBp: Int = 8000, valBp: Int = 1000): DataFrame = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= 10000,
      s"basis points out of range: train=$trainBp val=$valBp")
    // concat (NOT concat_ws) so a NULL key propagates to a NULL bucket and
    // a NULL split — SQL semantics, matching the oracle's 'salt' || ':' ||
    // key — instead of silently pooling every unkeyed row into one split
    val bucket = pmod(
      Dedup.md5Half(concat(lit(salt), lit(":"), col(keyCol).cast("string")), 1),
      lit(10000L))
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket").isNull, lit(null).cast("string"))
          .when(col("split_bucket") < trainBp, "train")
          .when(col("split_bucket") < trainBp + valBp, "val")
          .otherwise("test"))
  }

  /** Balanced downsampling: keep at most `k` rows per group, picked by the
    * deterministic salted md5-prefix order of `orderKey` — the "cap the
    * over-represented domains/languages" pass of a corpus-balancing
    * pipeline. Like [[assign]], selection is a pure function of
    * (salt, key): stable across runs, partitionings and cluster sizes, and
    * exactly replayable by the DuckDB oracle (same 60-bit hash family).
    *
    * `orderKey` must be non-null and must uniquely identify a row (or at
    * least its full content) — otherwise which of several hash-tied rows
    * survives the cap is engine-dependent. Adds `sample_rank` (1-based
    * within group).
    *
    * Scale shape: ONE hash exchange on `groupCol`; the per-group sort is
    * in-partition (window + filter, no global sort). A single giant group
    * serializes into one partition — the same documented caveat as
    * [[Quantiles.exact]]; for k << group at that scale, pre-filter with a
    * coarse hash-range cut before the window. NULLS-LAST ordering matches
    * the DuckDB default so both engines agree even if a null slips in.
    */
  def cappedPerGroup(df: DataFrame, groupCol: String, orderKey: Column,
                     salt: String, k: Int): DataFrame = {
    require(k >= 1, s"per-group cap must be >= 1, got $k")
    val rankHash =
      Dedup.md5Half(concat(lit(salt), lit(":"), orderKey.cast("string")), 1)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(rankHash.asc_nulls_last, orderKey.cast("string").asc_nulls_last)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }
}
