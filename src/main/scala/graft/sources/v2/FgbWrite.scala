package graft.sources.v2

import graft.codec.FeatureCodec.Feature
import graft.sources.{FlatGeobuf, GeoJsonIngest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{BinaryType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** Distributed `.fgb` writer: `df.write.format("flatgeobuf")
  * .mode(append|overwrite).save(dir)` emits ONE spec-conformant FGB
  * shard per input partition, written EXECUTOR-side (Hilbert-asc layout
  * + packed R-tree index applied per shard by [[FlatGeobuf.write]]) —
  * the same scale shape, commit protocol (invisible `_tmp_` names,
  * job-commit rename, job-unique tokens, task-level abort) and input
  * contract (`wkb: binary` + `props: array<PropCell>`, extra columns
  * ignored) as [[GeomedeaWrite]]. `option("indexNodeSize", n)` tunes
  * the R-tree branching (default 16, spec default).
  */
class FgbWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val nodeSize = info.options.getInt("indexNodeSize", FlatGeobuf.DefaultNodeSize)
      require(nodeSize >= 2, s"indexNodeSize must be >= 2; got $nodeSize")
      new FgbBatchWrite(path, info.schema(), nodeSize, doTruncate)
    }
  }
}

final case class FgbCommit(tmpName: String, finalName: String) extends WriterCommitMessage

class FgbBatchWrite(path: String, schema: StructType, nodeSize: Int,
                    truncate: Boolean) extends BatchWrite {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  private val jobToken = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FgbWriterFactory(path, schema, nodeSize, conf, jobToken)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(_.getPath.getName.endsWith(".fgb"))
        .foreach(s => fs.delete(s.getPath, false))
    messages.foreach {
      case FgbCommit(tmp, fin) =>
        require(fs.rename(new Path(dir, tmp), new Path(dir, fin)),
          s"failed to publish $tmp -> $fin under $path")
      case _ => ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    messages.foreach {
      case FgbCommit(tmp, _) => fs.delete(new Path(dir, tmp), false)
      case _                 => ()
    }
  }
}

class FgbWriterFactory(path: String, schema: StructType, nodeSize: Int,
                       conf: SerializableConfiguration, jobToken: String)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val wkbIdx = schema.fieldIndex("wkb")
      private val propsIdx = schema.fieldIndex("props")
      private val propsType = schema(propsIdx).dataType
      private val enc = ExpressionEncoder[GeomedeaWriterFactory.WRow]()
      private val deser = enc.resolveAndBind().createDeserializer()
      private val feats = Vector.newBuilder[Feature]
      private val fin = f"part-$jobToken-$partitionId%05d-$taskId.fgb"
      // tmp suffix must NOT be .fgb: reader globs/truncate select on it
      private val tmp = s"_tmp_$fin.tmp"
      private var wroteTmp = false

      override def write(record: InternalRow): Unit = {
        val w = deser(new GenericInternalRow(Array[Any](
          record.get(wkbIdx, BinaryType), record.get(propsIdx, propsType))))
        feats += Feature(graft.geom.Wkb.read(w.wkb),
          w.props.map(GeoJsonIngest.fromCell).toVector)
      }

      override def commit(): WriterCommitMessage = {
        val bytes = FlatGeobuf.write(feats.result(), nodeSize = nodeSize)
        require(bytes.length <= graft.sources.GeomedeaSpark.MaxFileBytes,
          s"partition $partitionId: ${bytes.length} bytes > " +
            s"${graft.sources.GeomedeaSpark.MaxFileBytes}; repartition to more shards")
        val dir = new Path(path)
        val fs = dir.getFileSystem(conf.value)
        fs.mkdirs(dir)
        wroteTmp = true
        val out = fs.create(new Path(dir, tmp), true)
        try out.write(bytes) finally out.close()
        FgbCommit(tmp, fin)
      }

      override def abort(): Unit =
        if (wroteTmp) {
          val dir = new Path(path)
          try dir.getFileSystem(conf.value).delete(new Path(dir, tmp), false)
          catch { case _: java.io.IOException => () }
        }
      override def close(): Unit = ()
    }
}
