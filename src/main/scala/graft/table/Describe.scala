package graft.table

import graft.jobs.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table inspection utilities — the analog of the reference's `info` CLI
  * (S11, `geomedea/src/bin/info.rs`) and byte-level inspector (S12,
  * `inspector.rs`): summarize an ingested DocTable's layout from its
  * `_lineage` manifest without scanning data.
  */
object Describe {

  /** One row per output file: rows, hilbert span, bbox, checksum — plus
    * derived layout-health columns (hilbert spans of consecutive files
    * should be disjoint and descending under the clustered layout).
    */
  def layout(spark: SparkSession, tableDir: String): DataFrame =
    Ingest.lineage(spark, tableDir)
      .orderBy(col("max_hilbert").desc)
      .withColumn("hilbert_span", col("max_hilbert") - col("min_hilbert"))

  /** Header-style summary (feature_count / page_count analog of the
    * reference's 17-byte header, lib.rs:91-97).
    */
  def summary(spark: SparkSession, tableDir: String): DataFrame =
    Ingest.lineage(spark, tableDir).agg(
      sum("rows").as("doc_count"),
      count(lit(1)).as("file_count"),
      min("min_hilbert").as("min_hilbert"), max("max_hilbert").as("max_hilbert"),
      min("min_lng").as("min_lng"), min("min_lat").as("min_lat"),
      max("max_lng").as("max_lng"), max("max_lat").as("max_lat"))
}
