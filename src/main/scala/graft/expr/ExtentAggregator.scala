package graft.expr

import graft.geom.Envelope
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ST_Extent: the reference's only aggregate — the monoid fold of
  * `Bounds::extend` (`/root/reference/geomedea/src/writer/mod.rs:57-61`,
  * identity `bounds.rs:41-46`) — as a typed Spark [[Aggregator]].
  * Zero = the inverted rectangle; reduce/merge = envelope union; fully
  * map-side combinable.
  */
object ExtentAggregator
  extends Aggregator[(Int, Int, Int, Int), Envelope, Envelope] {

  override def zero: Envelope = Envelope.empty

  override def reduce(b: Envelope, a: (Int, Int, Int, Int)): Envelope =
    b.union(Envelope(a._1, a._2, a._3, a._4))

  override def merge(b1: Envelope, b2: Envelope): Envelope = b1.union(b2)

  override def finish(r: Envelope): Envelope = r

  override def bufferEncoder: Encoder[Envelope] = Encoders.product[Envelope]
  override def outputEncoder: Encoder[Envelope] = Encoders.product[Envelope]

  /** Column form: stExtent(min_lng, min_lat, max_lng, max_lat). */
  def stExtent(minLng: Column, minLat: Column, maxLng: Column, maxLat: Column): Column =
    udaf(this).apply(minLng, minLat, maxLng, maxLat).as("extent")
}
