package graft.jobs

import graft.expr.GraftFunctions._
import graft.geom.Envelope
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest = the reference's Writer pipeline restated as two Spark jobs
  * (SURVEY.md §3.1):
  *
  *  pass 1: global extent aggregation (the reference's buffer pass,
  *          `writer/mod.rs:54-65`) — a 4-way min/max, map-side combined;
  *  pass 2: Hilbert key relative to that extent (`writer/hilbert.rs:70-78`),
  *          then `repartitionByRange` + `sortWithinPartitions` on the key
  *          **descending** — the reference sorts descending
  *          (`writer/mod.rs:77-82`, note the reversed comparator) and the
  *          golden ordering tests depend on it — then a zstd parquet write.
  *
  * The written layout is the distributed analog of the reference's
  * Hilbert-clustered pages: range partitions = pages, parquet row-group
  * stats = the packed R-tree's leaf bounds. A `_lineage` sidecar table
  * (one row per output partition: row count, hilbert min/max, envelope,
  * checksum) emulates the Iceberg manifest (no Iceberg jar in this
  * sandbox — documented emulation, see SURVEY.md §7.1) and provides
  * partition pruning + resumable re-runs.
  */
object Ingest {

  /** Pass 1: dataset extent over the envelope stat columns. */
  def extent(docsGeo: DataFrame): Envelope = {
    val r = docsGeo.agg(
      min("min_lng"), min("min_lat"), max("max_lng"), max("max_lat")).head()
    if (r.isNullAt(0)) Envelope.empty
    else Envelope(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** Pass 2 input: add the Hilbert key of each doc's envelope center
    * relative to the dataset extent.
    */
  def withHilbert(docsGeo: DataFrame, ext: Envelope): DataFrame = {
    // center of the per-row envelope, same unsigned-half-width arithmetic
    // as bounds.rs:90-99 (exact for points: center == the point)
    val cLng = (col("min_lng") + shiftright(col("max_lng").cast("long") - col("min_lng"), 1)).cast("int")
    val cLat = (col("min_lat") + shiftright(col("max_lat").cast("long") - col("min_lat"), 1)).cast("int")
    docsGeo.withColumn("hilbert",
      gmHilbert(cLng, cLat, lit(ext.minLng), lit(ext.minLat), lit(ext.maxLng), lit(ext.maxLat)))
  }

  /** Full clustered layout: returns the DataFrame laid out in descending
    * Hilbert order across `numPartitions` range partitions.
    */
  def clustered(docsGeo: DataFrame, numPartitions: Int): DataFrame = {
    val ext = extent(docsGeo)
    withHilbert(docsGeo, ext)
      .repartitionByRange(numPartitions, col("hilbert").desc)
      .sortWithinPartitions(col("hilbert").desc)
  }

  /** Write the clustered table + `_lineage` manifest. Returns the lineage DF. */
  def write(docsGeo: DataFrame, outDir: String, numPartitions: Int): DataFrame = {
    val spark = docsGeo.sparkSession
    clustered(docsGeo, numPartitions)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .parquet(s"$outDir/docs")
    val lineage = spark.read.parquet(s"$outDir/docs")
      // explicit projection: the stats scan must never deserialize spans
      .select("doc_id", "hilbert", "min_lng", "min_lat", "max_lng", "max_lat")
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        min("hilbert").as("min_hilbert"), max("hilbert").as("max_hilbert"),
        min("min_lng").as("min_lng"), min("min_lat").as("min_lat"),
        max("max_lng").as("max_lng"), max("max_lat").as("max_lat"),
        expr("bit_xor(xxhash64(doc_id))").as("checksum"))
    lineage.write.mode(SaveMode.Overwrite).parquet(s"$outDir/_lineage")
    spark.read.parquet(s"$outDir/_lineage")
  }

  /** Resumability: given the lineage of a previous (partial) run, return the
    * partitions of `docsGeo`'s Hilbert range that still need processing —
    * an anti-join on checksum identity (per-partition lineage checkpoint,
    * SURVEY.md §2.11).
    */
  def pendingAfter(docsGeo: DataFrame, lineage: DataFrame): DataFrame = {
    val done = lineage.select(col("min_hilbert"), col("max_hilbert"))
    docsGeo.join(done,
      docsGeo("hilbert") >= done("min_hilbert") && docsGeo("hilbert") <= done("max_hilbert"),
      "left_anti")
  }
}
