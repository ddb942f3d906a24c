package graft.sources.v2

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.util.SerializableConfiguration

/** Streaming READ side of the `.geomedea` lake — the inverse of the
  * streaming->native-format sink (`streaming/StreamIngest` +
  * foreachBatch writer): `spark.readStream.format("geomedea")
  * .load(dir)` tails a directory that another job keeps appending
  * shards to, emitting each NEW shard's features exactly once.
  *
  * Offsets: the sorted list of shard file names already emitted (shard
  * names are job-token-unique and shards are immutable once published
  * by the commit rename, so name-set difference IS the new-data set; a
  * byte or timestamp watermark would mis-handle out-of-order job
  * tokens). The offset JSON grows with the lake — fine for streaming
  * checkpoints at the shard counts a micro-batch cadence produces;
  * compaction would switch to lineage-manifest generations.
  *
  * Scale shape: one input partition per new shard, decoded by the SAME
  * streaming reader as the batch path (O(page) memory, no file-size
  * ceiling). In-flight `_tmp_` names are invisible by construction
  * (suffix filter), so a batch never observes a half-written shard.
  */
class GeomedeaMicroBatchStream(path: String, bbox: Option[graft.geom.Envelope],
                               required: org.apache.spark.sql.types.StructType,
                               checkpointLocation: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  private def listShards(): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p.toString)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".geomedea"))
      .map(_.getPath.toString)
      .sorted
  }

  private var availableNowTarget: Option[GeomedeaOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(GeomedeaOffset(listShards()))

  override def latestOffset(): Offset =
    availableNowTarget.getOrElse(GeomedeaOffset(listShards()))

  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): no rate
  // limiting — each micro-batch takes every published shard; under
  // AvailableNow the target is the snapshot taken at prepare time
  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def initialOffset(): Offset = GeomedeaOffset(Seq.empty)

  override def deserializeOffset(json: String): Offset = GeomedeaOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GeomedeaOffset].files.toSet
    val fresh = end.asInstanceOf[GeomedeaOffset].files.filterNot(seen)
    GeomedeaOffset.requireNoRewrite(path, listShards(),
      start.asInstanceOf[GeomedeaOffset].files, end.asInstanceOf[GeomedeaOffset].files)
    // same planning-time file pruning as the batch scan: with a pushed
    // bbox, new shards whose root bounds miss the rect are skipped
    // ENTIRELY (the offset still advances past them — offsets track
    // names, not survivors, so pruned shards never replan). Filters stay
    // residual, so pruning is a superset and Spark re-applies them.
    // Extents come from the _manifest.tsv when it covers the new shards
    // (one read for the whole batch) and a POOLED header fan-out
    // otherwise — a large backlog must not serialize planning on one
    // object-store round trip per shard.
    val kept = bbox match {
      case None => fresh
      case Some(q) =>
        val dir = new org.apache.hadoop.fs.Path(path)
        val fs = dir.getFileSystem(conf.value)
        val manifest = GeomedeaManifest.read(fs, dir).getOrElse(Map.empty)
        val (known, unknown) = fresh.partition(f =>
          manifest.contains(new org.apache.hadoop.fs.Path(f).getName))
        val keptKnown = known.filter(f =>
          manifest(new org.apache.hadoop.fs.Path(f).getName).extent.exists(_.intersects(q)))
        val keptUnknown = PlannerPool.mapFiles(unknown) { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val st = fs.getFileStatus(p)
          val head = new Array[Byte](math.min(GeomedeaTable.HeadBytes.toLong, st.getLen).toInt)
          val in = fs.open(p)
          try in.readFully(0, head) finally in.close()
          if (GeomedeaTable.fileExtent(head).exists(_.intersects(q))) Some(f) else None
        }.flatten
        (keptKnown ++ keptUnknown).sorted
    }
    kept.map(f => GeomedeaPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GeomedeaReaderFactory(bbox = bbox, required = required, limit = None, conf = conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Streaming READ of a `.fgb` lake — same offset/exactly-once model as
  * [[GeomedeaMicroBatchStream]] (sorted emitted-name sets; shards are
  * immutable once commit-renamed by [[FgbWrite]], `_tmp_` invisible),
  * with pushed-bbox pruning of new shards from their header envelopes
  * (read via two positioned range reads each, pooled).
  */
class FgbMicroBatchStream(path: String, bbox: Option[graft.geom.Envelope],
                          required: org.apache.spark.sql.types.StructType,
                          checkpointLocation: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  private def listShards(): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p.toString)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".fgb"))
      .map(_.getPath.toString)
      .sorted
  }

  private var availableNowTarget: Option[GeomedeaOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(GeomedeaOffset(listShards()))
  override def latestOffset(): Offset =
    availableNowTarget.getOrElse(GeomedeaOffset(listShards()))
  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def initialOffset(): Offset = GeomedeaOffset(Seq.empty)
  override def deserializeOffset(json: String): Offset = GeomedeaOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GeomedeaOffset].files.toSet
    val fresh = end.asInstanceOf[GeomedeaOffset].files.filterNot(seen)
    GeomedeaOffset.requireNoRewrite(path, listShards(),
      start.asInstanceOf[GeomedeaOffset].files, end.asInstanceOf[GeomedeaOffset].files)
    val kept = bbox match {
      case None => fresh
      case Some(q) =>
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf.value)
        PlannerPool.mapFiles(fresh) { f =>
          val in = fs.open(new org.apache.hadoop.fs.Path(f))
          val h =
            try graft.sources.FlatGeobuf.readHeaderRanged((off, k) => {
              val b = new Array[Byte](k); in.readFully(off, b); b
            })
            finally in.close()
          val keep = h.envelope.forall { case (mnx, mny, mxx, mxy) =>
            !(mxx < q.minLng / 1e7 || mxy < q.minLat / 1e7 ||
              mnx > q.maxLng / 1e7 || mny > q.maxLat / 1e7)
          }
          if (keep) Some(f) else None
        }.flatten.sorted
    }
    kept.map(f => GeomedeaPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FgbReaderFactory(bbox, required, limit = None, conf = conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = the set of shard names already emitted, JSON-encoded as a
  * sorted array (deterministic equality across restarts).
  */
final case class GeomedeaOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.sorted.map(GeomedeaOffset.quote).mkString("[", ",", "]")
}

object GeomedeaOffset {

  /** Rewrite detection: offsets track shard NAMES, and shards are
    * immutable once commit-renamed — so an offset-tracked name missing
    * from the live listing means the lake was REWRITTEN underneath the
    * stream (compaction or truncate-overwrite). Failing fast here turns
    * two bad outcomes into one actionable error: a replayed batch would
    * otherwise die executor-side with a bare FileNotFoundException, and
    * a continuing stream would silently RE-EMIT every row (the rewritten
    * shards all carry fresh names). Cost: one listing per micro-batch,
    * which planning already pays.
    *
    * Deliberate strictness: retention deletion of an already-consumed
    * shard is INDISTINGUISHABLE from a rewrite under name-set offsets
    * (both leave a tracked name missing; in both cases the listing also
    * holds unseen names), so it too trips this check. That is the
    * documented price of exactly-once here: deleting ANY offset-tracked
    * shard requires restarting the checkpoint. Failing the benign case
    * loudly is strictly safer than passing the rewrite case silently.
    */
  private[v2] def requireNoRewrite(path: String, live: Seq[String],
                                   start: Seq[String], end: Seq[String]): Unit = {
    val liveSet = live.toSet
    val gone = (start.iterator ++ end.iterator).filterNot(liveSet).toSeq.distinct
    if (gone.nonEmpty) throw new IllegalStateException(
      s"streaming offsets reference ${gone.size} shard(s) no longer present under " +
        s"$path (e.g. ${gone.head}): the lake was rewritten (compaction or " +
        "truncate-overwrite) while a stream was tailing it. Compaction rewrites row " +
        "identity; restart the stream with a FRESH checkpoint over the compacted lake.")
  }

  private[v2] def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""

  def fromJson(json: String): GeomedeaOffset = {
    // inverse of json() only — a flat array of strings
    val t = json.trim
    require(t.startsWith("[") && t.endsWith("]"), s"bad geomedea offset: $json")
    val body = t.substring(1, t.length - 1)
    if (body.isEmpty) return GeomedeaOffset(Seq.empty)
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (!inStr) {
        if (c == '"') inStr = true
        // commas/whitespace between strings ignored
      } else c match {
        case '"' => inStr = false; out += sb.result(); sb.clear()
        case '\\' =>
          i += 1
          body.charAt(i) match {
            case 'u' => sb += Integer.parseInt(body.substring(i + 1, i + 5), 16).toChar; i += 4
            case e   => sb += e
          }
        case other => sb += other
      }
      i += 1
    }
    GeomedeaOffset(out.result())
  }
}
