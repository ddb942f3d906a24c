package graft.jobs

import graft.sources.v2.GeomedeaManifest
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Global re-cluster / compaction for a `.geomedea` (or `.fgb`) shard
  * lake.
  *
  * Every append job partitions independently, so a multi-append directory
  * accumulates shards with overlapping extents and planning-time pruning
  * (R-tree root bounds per file) erodes toward "every file survives every
  * bbox". The reference's answer is "concatenating files = re-ingest"
  * (SURVEY.md §2.7; there is no incremental merge in the format —
  * `writer/mod.rs` always rebuilds the Hilbert order and the packed
  * R-tree from scratch). The distributed analog:
  *
  *   pin the PLANNED shard set (a union of single-file scans, so the
  *   read set is exactly the recorded list — not whatever a directory
  *   listing says later) -> global extent (4-way min/max, map-side
  *   combined) -> Hilbert key of each envelope center relative to that
  *   extent -> `repartitionByRange(hilbert desc)` -> APPEND through the
  *   distributed v2 writer -> journal the condemned names -> delete
  *   EXACTLY the planned shards -> prune them from the manifest.
  *
  * The targeted delete (not truncate-overwrite) is what makes the job
  * safe under concurrent appends: a shard committed by another job at
  * ANY point during compaction is not in the planned set and survives
  * untouched — a truncate would silently destroy it. The cost is a
  * short window after the append commit where readers see old +
  * compacted shards together (duplicate rows); run compaction in a
  * maintenance window if that matters. Crash recovery: once the append
  * has committed, the condemned names are journaled
  * (`_compact_pending.tsv`, no shard suffix so no reader/stream ever
  * sees it) and the next `compact` call on the dir finishes a crashed
  * swap before planning. The journal is written only AFTER the new data
  * is live, so recovery can never delete unreplaced rows; only a crash
  * in the tiny gap between the append commit and the journal write
  * leaves duplicates behind.
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
  * overlap, not per append — and sliced (compact sub-ranges of shards,
  * several calls) rather than one job over millions of files: the
  * pinned-union plan and the single shuffle both want bounded inputs.
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

  /** Crashed-swap journal: names condemned by an already-committed
    * compaction append, one per line.
    */
  val PendingFile = "_compact_pending.tsv"

  /** Rewrite `dir` as `numShards` globally-Hilbert-clustered shards
    * (0 = size the shard count from the current lake bytes /
    * `targetShardBytes`; range partitioning may yield fewer when the
    * key space is tiny). Returns the number of live shards after the
    * swap, 0 for an empty or absent lake (no-op). `format` picks the
    * container: `"geomedea"` (default) or `"flatgeobuf"` — both DSv2
    * sources share the row surface (wkb/props + envelope stats) and the
    * same commit protocol, so one maintenance job serves both lakes.
    */
  def compact(spark: SparkSession, dir: String, numShards: Int = 0,
              compressed: Boolean = true,
              targetShardBytes: Long = DefaultTargetShardBytes,
              format: String = "geomedea"): Int = {
    require(numShards >= 0, s"numShards must be >= 0; got $numShards")
    require(targetShardBytes > 0, s"targetShardBytes must be positive; got $targetShardBytes")
    val suffix = format match {
      case "geomedea"   => ".geomedea"
      case "flatgeobuf" => ".fgb"
      case other => throw new IllegalArgumentException(
        s"unsupported compaction format '$other' (geomedea | flatgeobuf)")
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0
    require(fs.getFileStatus(p).isDirectory,
      s"compact expects a shard DIRECTORY; $dir is a single file (the v2 writer " +
        "cannot overwrite a file path with a shard dir)")
    finishPendingSwap(fs, p)
    val shards =
      fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
    if (shards.isEmpty) return 0
    val totalBytes = shards.map(_.getLen).sum
    val n =
      if (numShards > 0) numShards
      else math.max(1L, (totalBytes + targetShardBytes - 1) / targetShardBytes).toInt

    // pinned read set: one single-file scan per PLANNED shard, unioned —
    // rows from shards other jobs commit mid-compaction can never leak
    // into the rewrite (and so never be duplicated by it). Envelope
    // stats come straight off the scan; columns beyond the write
    // contract are pruned.
    val docs = shards.map(s => spark.read.format(format).load(s.getPath.toString))
      .reduce(_ union _)
      .select("wkb", "props", "min_lng", "min_lat", "max_lng", "max_lat")
    val ext = Ingest.extent(docs)
    val clustered = Ingest.withHilbert(docs, ext)
      .repartitionByRange(n, col("hilbert").desc)
      .select("wkb", "props")
      .write.format(format).mode("append")
    (if (format == "geomedea") clustered.option("compressed", compressed.toString)
     else clustered)
      .save(dir)

    // swap: journal the condemned names (the compacted copy is LIVE from
    // here — recovery may re-run these deletes but never new ones), then
    // delete exactly the planned shards and drop them from the manifest
    val condemned = shards.map(_.getPath.getName)
    writePending(fs, p, condemned)
    condemned.foreach(nm => fs.delete(new Path(p, nm), false))
    pruneManifest(fs, p, condemned.toSet)
    fs.delete(new Path(p, PendingFile), false)
    fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(suffix))
  }

  /** Complete a crashed swap: delete whatever the journal condemns that
    * still exists, fix the manifest, drop the journal.
    */
  private def finishPendingSwap(fs: FileSystem, p: Path): Unit = {
    val pending = new Path(p, PendingFile)
    if (!fs.exists(pending)) return
    val buf = new Array[Byte](fs.getFileStatus(pending).getLen.toInt)
    val in = fs.open(pending)
    try in.readFully(0, buf) finally in.close()
    val names = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split('\n').toSeq.filter(_.nonEmpty)
      // journal content becomes DELETE paths — a corrupt/forged line
      // with a separator could otherwise reach outside the lake dir
      .filter(nm => !nm.contains('/') && !nm.contains('\\'))
    names.foreach(nm => fs.delete(new Path(p, nm), false))
    pruneManifest(fs, p, names.toSet)
    fs.delete(pending, false)
  }

  private def writePending(fs: FileSystem, p: Path, names: Seq[String]): Unit = {
    val out = fs.create(new Path(p, PendingFile), true)
    try out.write(names.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Drop deleted names from the advisory manifest (best effort: a
    * failure just costs the header-read fallback at planning).
    */
  private def pruneManifest(fs: FileSystem, p: Path, deleted: Set[String]): Unit =
    try GeomedeaManifest.read(fs, p).foreach { m =>
      GeomedeaManifest.write(fs, p,
        m.values.toSeq.filterNot(e => deleted(e.name)), "compact")
    } catch { case scala.util.control.NonFatal(_) => () }
}
