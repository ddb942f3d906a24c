package graft

import graft.expr.ExtentAggregator
import graft.geom.Envelope
import graft.streaming.StreamIngest
import graft.table.InterleavedDocs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamAndAggSpec extends AnyFunSuite {
  val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("ExtentAggregator equals the 4-way min/max and obeys the empty monoid") {
    val geo = InterleavedDocs.withGeometry(InterleavedDocs.docs(spark, Sf))
    val viaAgg = geo.select(ExtentAggregator.stExtent(
      col("min_lng"), col("min_lat"), col("max_lng"), col("max_lat"))).head()
      .getStruct(0)
    val viaMinMax = geo.agg(
      min("min_lng"), min("min_lat"), max("max_lng"), max("max_lat")).head()
    assert(viaAgg.getInt(0) == viaMinMax.getInt(0))
    assert(viaAgg.getInt(1) == viaMinMax.getInt(1))
    assert(viaAgg.getInt(2) == viaMinMax.getInt(2))
    assert(viaAgg.getInt(3) == viaMinMax.getInt(3))
    // empty input -> the inverted-rectangle identity (bounds.rs:41-46)
    val empty = geo.where(lit(false)).select(ExtentAggregator.stExtent(
      col("min_lng"), col("min_lat"), col("max_lng"), col("max_lat"))).head().getStruct(0)
    assert(Envelope(empty.getInt(0), empty.getInt(1), empty.getInt(2), empty.getInt(3)) == Envelope.empty)
  }

  test("streaming availableNow ingest: all rows land, per-batch lineage, spans preserved") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val docs = InterleavedDocs.docs(spark, Sf)
    // several source files -> several micro-batches (maxFilesPerTrigger=1)
    docs.repartition(3).write.parquet(s"$base/src")

    val nBatches = StreamIngest.runAvailableNow(spark, s"$base/src", s"$base/out", s"$base/ckpt")
    assert(nBatches >= 3)

    val written = spark.read.parquet(s"$base/out/docs")
    assert(written.count() == docs.count())
    // span-sequence invariant through the streaming path
    val in = docs.withColumnRenamed("spans", "spans_in")
    assert(written.join(in, "doc_id").where(not(col("spans") === col("spans_in"))).count() == 0)

    val lineage = spark.read.parquet(s"$base/out/_stream_lineage")
    assert(lineage.count() == nBatches)
    assert(lineage.agg(sum("rows")).head().getLong(0) == docs.count())

    // resume semantics: a second availableNow run over the same source +
    // checkpoint processes nothing new
    val again = StreamIngest.runAvailableNow(spark, s"$base/src", s"$base/out", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/out/docs").count() == docs.count())
  }
}
