package graft.geom

/** Axis-aligned bounding box over scaled-int coordinates.
  *
  * Semantics mirror the reference's `Bounds`
  * (`/root/reference/geomedea/src/bounds.rs`):
  *  - always min/max normalized; antimeridian-spanning boxes unsupported;
  *  - the empty envelope is the inverted rectangle, so [[union]] is a monoid fold;
  *  - [[intersects]] is CLOSED-interval: touching edges intersect
  *    (`bounds.rs:101-119`);
  *  - [[centerLng]]/[[centerLat]] use unsigned half-width arithmetic
  *    (`bounds.rs:90-99`), golden: RECT(1 2,-3 -6).center == (-1, -2).
  */
final case class Envelope(minLng: Int, minLat: Int, maxLng: Int, maxLat: Int) {

  def isEmpty: Boolean = maxLng < minLng || maxLat < minLat

  /** widths as unsigned 32-bit values (exact for any normalized box). */
  def lngWidth: Long = maxLng.toLong - minLng.toLong
  def latHeight: Long = maxLat.toLong - minLat.toLong

  def centerLng: Int = minLng + (lngWidth / 2).toInt
  def centerLat: Int = minLat + (latHeight / 2).toInt

  /** Closed-interval rect-rect intersection (touching edges count). */
  def intersects(o: Envelope): Boolean =
    !(maxLng < o.minLng || maxLat < o.minLat || minLng > o.maxLng || minLat > o.maxLat)

  def containsPoint(lng: Int, lat: Int): Boolean =
    lng >= minLng && lng <= maxLng && lat >= minLat && lat <= maxLat

  def union(o: Envelope): Envelope =
    Envelope(
      math.min(minLng, o.minLng),
      math.min(minLat, o.minLat),
      math.max(maxLng, o.maxLng),
      math.max(maxLat, o.maxLat)
    )

  def extendPoint(lng: Int, lat: Int): Envelope =
    Envelope(
      math.min(minLng, lng),
      math.min(minLat, lat),
      math.max(maxLng, lng),
      math.max(maxLat, lat)
    )
}

object Envelope {
  /** Monoid identity: the inverted rectangle (`bounds.rs:41-46`). */
  val empty: Envelope = Envelope(Int.MaxValue, Int.MaxValue, Int.MinValue, Int.MinValue)

  /** Normalize two arbitrary corners into a min/max box (`bounds.rs:48-58`). */
  def fromCorners(lng0: Int, lat0: Int, lng1: Int, lat1: Int): Envelope =
    Envelope(math.min(lng0, lng1), math.min(lat0, lat1), math.max(lng0, lng1), math.max(lat0, lat1))

  def fromDegrees(lng0: Double, lat0: Double, lng1: Double, lat1: Double): Envelope =
    fromCorners(
      ScaledCoord.toScaled(lng0), ScaledCoord.toScaled(lat0),
      ScaledCoord.toScaled(lng1), ScaledCoord.toScaled(lat1))
}
