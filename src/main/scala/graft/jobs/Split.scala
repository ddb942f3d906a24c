package graft.jobs

import org.apache.spark.sql.DataFrame
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
}
