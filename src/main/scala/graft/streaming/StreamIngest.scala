package graft.streaming

import graft.expr.GraftFunctions._
import graft.table.InterleavedDocs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming ingest: micro-batch append of interleaved docs
  * with per-batch lineage rows (SURVEY.md §2.9 — the reference has no
  * semantic streaming, so this is plain availableNow batch-increment; no
  * stateful operators, no watermarks needed).
  *
  * Streaming cannot two-pass for the dataset extent, so the curve is
  * scaled to the FIXED world extent (documented deviation from the batch
  * ingest, which reproduces the reference's dataset-extent curve; world
  * scaling trades a little curve resolution for single-pass ingest —
  * exactly the tradeoff noted in SURVEY.md §4 "Two-pass extent-then-sort").
  */
object StreamIngest {

  /** Process everything currently in srcDir (parquet of doc_id+spans) into
    * outDir/docs + outDir/_stream_lineage, one lineage row per micro-batch.
    * Returns the number of micro-batches executed.
    */
  def runAvailableNow(spark: SparkSession, srcDir: String, outDir: String,
                      checkpointDir: String): Long = {
    // readStream needs an explicit schema; derive it from the source dir
    // itself (one batch-read of the footer — no data scan).
    val schema = spark.read.parquet(srcDir).schema
    val batches = new java.util.concurrent.atomic.AtomicLong(0)

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)

    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // IDEMPOTENT under replay: each micro-batch owns a partition dir
        // (batch_id=N) written with OVERWRITE — a batch replayed after a
        // crash between its write and the checkpoint commit replaces its
        // own residue instead of appending duplicate rows (a flat append
        // dir cannot be made replay-safe). Readers of $outDir/docs see
        // batch_id as a discovered partition column.
        val geo = InterleavedDocs.withGeometry(batch)
          .withColumn("hilbert", gmHilbert(col("lng"), col("lat"),
            lit(-1800000000), lit(-900000000), lit(1800000000), lit(900000000)))
          // ONE scan per batch: the docs write and the lineage aggregate
          // are two actions over the same parsed batch
          .persist()
        try {
          geo.write.mode("overwrite").option("compression", "zstd")
            .option("parquet.compression.codec.zstd.level", "1") // see Ingest.write
            .parquet(s"$outDir/docs/batch_id=$batchId")
          geo.groupBy()
            .agg(
              count(lit(1)).as("rows"),
              min("hilbert").as("min_hilbert"), max("hilbert").as("max_hilbert"),
              min("min_lng").as("min_lng"), min("min_lat").as("min_lat"),
              max("max_lng").as("max_lng"), max("max_lat").as("max_lat"),
              expr("bit_xor(xxhash64(doc_id))").as("checksum"))
            .write.mode("overwrite").parquet(s"$outDir/_stream_lineage/batch_id=$batchId")
        } finally geo.unpersist()
        batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }
}
