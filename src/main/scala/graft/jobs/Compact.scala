package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Global re-cluster / compaction for a `.geomedea` shard lake.
  *
  * Every append job partitions independently, so a multi-append directory
  * accumulates shards with overlapping extents and planning-time pruning
  * (R-tree root bounds per file) erodes toward "every file survives every
  * bbox". The reference's answer is "concatenating files = re-ingest"
  * (SURVEY.md §2.7; there is no incremental merge in the format —
  * `writer/mod.rs` always rebuilds the Hilbert order and the packed
  * R-tree from scratch). The distributed analog:
  *
  *   read all shards (DSv2 streaming scan) -> global extent (4-way
  *   min/max, map-side combined) -> Hilbert key of each envelope center
  *   relative to that extent -> `repartitionByRange(hilbert desc)` ->
  *   rewrite through the distributed v2 writer (overwrite = truncate at
  *   job COMMIT, after all read work is done, so the swap is
  *   readers-never-see-partial and the job is safely re-runnable).
  *
  * After compaction each shard owns a contiguous descending Hilbert range
  * of the GLOBAL curve, so shard extents are spatially localized and a
  * selective bbox plans a strict subset of files again — the same reason
  * the reference's single-file layout prunes pages. The per-shard
  * within-file order/index is rebuilt by the writer itself
  * ([[graft.sources.GeomedeaFile.write]] re-sorts per shard extent).
  *
  * At 100 TB this is one shuffle of the payload (the honest cost of
  * re-clustering, identical to ingest) and should be scheduled like any
  * table-maintenance job: triggered when the manifest shows extent
  * overlap, not per append.
  *
  * Streams: compaction rewrites ROW IDENTITY (every shard gets a fresh
  * name), so a stream tailing the lake cannot continue exactly-once
  * across it. The streaming sources detect the rewrite at the next
  * micro-batch and fail with an actionable error
  * ([[graft.sources.v2.GeomedeaOffset.requireNoRewrite]]) instead of
  * replaying into deleted files or silently re-emitting the lake;
  * restart tailing streams with a fresh checkpoint after compacting.
  */
object Compact {

  /** Aim for ~64 MiB shards by default: large enough that header reads
    * and task setup amortize, small enough that a shard (the format's
    * single-node unit) never approaches the writer's 256 MB guard.
    */
  val DefaultTargetShardBytes: Long = 64L << 20

  /** Rewrite `dir` as `numShards` globally-Hilbert-clustered shards
    * (0 = size the shard count from the current lake bytes /
    * `targetShardBytes`; range partitioning may yield fewer when the
    * key space is tiny). Returns the number of shards actually written,
    * 0 for an empty or absent lake (no-op). `format` picks the
    * container: `"geomedea"` (default) or `"flatgeobuf"` — both DSv2
    * sources share the row surface (wkb/props + envelope stats) and the
    * truncate-at-commit overwrite protocol, so the same maintenance job
    * serves both lakes.
    */
  def compact(spark: SparkSession, dir: String, numShards: Int = 0,
              compressed: Boolean = true,
              targetShardBytes: Long = DefaultTargetShardBytes,
              format: String = "geomedea"): Int = {
    require(numShards >= 0, s"numShards must be >= 0; got $numShards")
    val suffix = format match {
      case "geomedea"   => ".geomedea"
      case "flatgeobuf" => ".fgb"
      case other => throw new IllegalArgumentException(
        s"unsupported compaction format '$other' (geomedea | flatgeobuf)")
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p))
      require(fs.getFileStatus(p).isDirectory,
        s"compact expects a shard DIRECTORY; $dir is a single file (the v2 writer " +
          "cannot overwrite a file path with a shard dir)")
    val shards =
      if (fs.exists(p))
        fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      else Seq.empty
    if (shards.isEmpty) return 0
    val totalBytes = shards.map(_.getLen).sum
    val n =
      if (numShards > 0) numShards
      else math.max(1L, (totalBytes + targetShardBytes - 1) / targetShardBytes).toInt

    // envelope stats come straight off the scan (decoded once per row by
    // the reader); spans/props beyond the write contract are pruned
    val docs = spark.read.format(format).load(dir)
      .select("wkb", "props", "min_lng", "min_lat", "max_lng", "max_lat")
    val ext = Ingest.extent(docs)
    val clustered = Ingest.withHilbert(docs, ext)
      .repartitionByRange(n, col("hilbert").desc)
      .select("wkb", "props")
      .write.format(format).mode("overwrite")
    (if (format == "geomedea") clustered.option("compressed", compressed.toString)
     else clustered)
      .save(dir)
    fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(suffix))
  }
}
