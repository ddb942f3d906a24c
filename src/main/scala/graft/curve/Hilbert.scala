package graft.curve

import graft.geom.Envelope

/** 32-bit Hilbert curve index of a 16-bit (x, y) cell.
  *
  * Implements the branch-free public-domain algorithm from
  * https://github.com/rawrunprotected/hilbert_curves (the same public
  * algorithm the reference uses, see
  * `/root/reference/geomedea/src/writer/hilbert.rs:7`), so curve
  * orientation matches the reference goldens exactly:
  * scaled_hilbert of the unit-rect centers of RECT(0 0,1 1) and
  * RECT(2 2,3 3) within extent (0,0)-(3,3) are 143165576 and
  * 2720145952 (`writer/hilbert.rs:85-98`).
  *
  * The result is an unsigned 32-bit value returned as a Long so it sorts
  * correctly with Spark's signed comparisons.
  */
object Hilbert {
  final val Max: Int = 0xFFFF

  /** Hilbert d-index of (x, y), each in 0..=0xFFFF. Returns 0..=0xFFFFFFFF. */
  def index(x: Int, y: Int): Long = {
    require(x >= 0 && x <= Max && y >= 0 && y <= Max, s"coords out of range: ($x, $y)")

    // Four 16-bit state vectors, transformed log2(16)=4 times (1,2,4,8-bit
    // strides), then Gray-decoded and bit-interleaved into the 32-bit index.
    var a = x ^ y
    var b = 0xFFFF ^ a
    var c = 0xFFFF ^ (x | y)
    var d = x & (y ^ 0xFFFF)

    var a2 = a | (b >>> 1)
    var b2 = (a >>> 1) ^ a
    var c2 = ((c >>> 1) ^ (b & (d >>> 1))) ^ c
    var d2 = ((a & (c >>> 1)) ^ (d >>> 1)) ^ d

    a = a2; b = b2; c = c2; d = d2
    a2 = (a & (a >>> 2)) ^ (b & (b >>> 2))
    b2 = (a & (b >>> 2)) ^ (b & ((a ^ b) >>> 2))
    c2 = c ^ ((a & (c >>> 2)) ^ (b & (d >>> 2)))
    d2 = d ^ ((b & (c >>> 2)) ^ ((a ^ b) & (d >>> 2)))

    a = a2; b = b2; c = c2; d = d2
    a2 = (a & (a >>> 4)) ^ (b & (b >>> 4))
    b2 = (a & (b >>> 4)) ^ (b & ((a ^ b) >>> 4))
    c2 = c ^ ((a & (c >>> 4)) ^ (b & (d >>> 4)))
    d2 = d ^ ((b & (c >>> 4)) ^ ((a ^ b) & (d >>> 4)))

    a = a2; b = b2; c = c2; d = d2
    c2 = c ^ ((a & (c >>> 8)) ^ (b & (d >>> 8)))
    d2 = d ^ ((b & (c >>> 8)) ^ ((a ^ b) & (d >>> 8)))

    a = c2 ^ (c2 >>> 1)
    b = d2 ^ (d2 >>> 1)

    var i0 = x ^ y
    var i1 = b | (0xFFFF ^ (i0 | a))

    i0 = (i0 | (i0 << 8)) & 0x00FF00FF
    i0 = (i0 | (i0 << 4)) & 0x0F0F0F0F
    i0 = (i0 | (i0 << 2)) & 0x33333333
    i0 = (i0 | (i0 << 1)) & 0x55555555

    i1 = (i1 | (i1 << 8)) & 0x00FF00FF
    i1 = (i1 | (i1 << 4)) & 0x0F0F0F0F
    i1 = (i1 | (i1 << 2)) & 0x33333333
    i1 = (i1 | (i1 << 1)) & 0x55555555

    (((i1 << 1) | i0).toLong) & 0xFFFFFFFFL
  }

  /** Project a scaled-int point onto a Hilbert curve filling `extent`:
    * extent.min -> (0,0), extent.max -> (Max, Max), integer math identical
    * to the reference (`writer/hilbert.rs:70-78`): u64 intermediate,
    * truncating division. Degenerate (zero-width) extents map to 0.
    */
  def scaled(lng: Int, lat: Int, extent: Envelope): Long = {
    val w = extent.lngWidth
    val h = extent.latHeight
    val x = if (w <= 0) 0L else (lng.toLong - extent.minLng.toLong) * Max / w
    val y = if (h <= 0) 0L else (lat.toLong - extent.minLat.toLong) * Max / h
    // clamp instead of crash: callers key on envelope CENTERS, and an
    // EMPTY geometry's inverted envelope puts its center far outside
    // the dataset extent (found by the FGB roundtrip property with a
    // MULTIPOLYGON EMPTY among real features). Any deterministic
    // in-range key is correct for a LAYOUT sort; in-extent centers are
    // untouched, so the Hilbert goldens and q03 oracle are unaffected.
    // index() itself keeps its strict require (golden-parity twin).
    index(math.max(0L, math.min(x, Max.toLong)).toInt,
      math.max(0L, math.min(y, Max.toLong)).toInt)
  }

  /** Java-friendly static entry points for Catalyst StaticInvoke codegen. */
  def scaledHilbert(lng: Int, lat: Int,
                    extMinLng: Int, extMinLat: Int, extMaxLng: Int, extMaxLat: Int): Long =
    scaled(lng, lat, Envelope(extMinLng, extMinLat, extMaxLng, extMaxLat))

  // --- curve chunks (order-res prefixes) for the Hilbert-range join (J6) ---

  /** By self-similarity of the curve, the top 2*res bits of the order-16
    * index are the order-`res` Hilbert index of the containing cell — so a
    * "chunk" identifies one contiguous curve range [chunk << 2k,
    * (chunk+1) << 2k) with k = 16-res. Points and envelope covers keyed by
    * chunk therefore equi-join exactly where their curve ranges overlap:
    * the shuffle-based range join for build sides too big to broadcast.
    */
  def chunk(lng: Int, lat: Int, extent: Envelope, res: Int): Long = {
    require(res >= 1 && res <= 16, s"res $res out of 1..16")
    scaled(lng, lat, extent) >>> (2 * (16 - res))
  }

  /** All order-res chunks whose cell intersects `env` (clamped to the
    * extent). Uses the same coordinate projection as [[scaled]], so a
    * point inside `env` always lands in one of the returned chunks.
    */
  /** Cap on per-envelope chunk fan-out: a cover bigger than this means
    * the resolution is far too fine for the geometry — fail loudly
    * instead of exploding the join (and instead of overflowing 32-bit
    * size math at res=16 over a world-spanning envelope).
    */
  val MaxChunksPerEnvelope: Long = 1L << 22

  def chunksOfEnvelope(env: Envelope, extent: Envelope, res: Int): Array[Long] = {
    require(res >= 1 && res <= 16, s"res $res out of 1..16")
    if (env.isEmpty) return Array.empty
    val shift = 16 - res
    def xc(lng: Int): Int = {
      val w = extent.lngWidth
      val clamped = math.max(extent.minLng, math.min(extent.maxLng, lng))
      if (w <= 0) 0 else ((clamped.toLong - extent.minLng.toLong) * Max / w).toInt
    }
    def yc(lat: Int): Int = {
      val h = extent.latHeight
      val clamped = math.max(extent.minLat, math.min(extent.maxLat, lat))
      if (h <= 0) 0 else ((clamped.toLong - extent.minLat.toLong) * Max / h).toInt
    }
    val cx0 = xc(env.minLng) >>> shift; val cx1 = xc(env.maxLng) >>> shift
    val cy0 = yc(env.minLat) >>> shift; val cy1 = yc(env.maxLat) >>> shift
    val count = (cx1 - cx0 + 1).toLong * (cy1 - cy0 + 1).toLong
    require(count <= MaxChunksPerEnvelope,
      s"envelope covers $count order-$res chunks (> $MaxChunksPerEnvelope); lower res")
    val out = new Array[Long](count.toInt)
    var i = 0
    var cy = cy0
    while (cy <= cy1) {
      var cx = cx0
      while (cx <= cx1) {
        out(i) = index(cx << shift, cy << shift) >>> (2 * shift)
        i += 1; cx += 1
      }
      cy += 1
    }
    out
  }
}
