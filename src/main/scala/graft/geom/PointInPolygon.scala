package graft.geom

/** Exact point-in-polygon over scaled-int coordinates.
  *
  * Even-odd ray casting over all rings (exterior + holes), with a
  * CLOSED boundary convention: points exactly on an edge or vertex are
  * inside. This matches the closed-interval bbox semantics of the
  * reference (`/root/reference/geomedea/src/bounds.rs:101-119`) so the
  * bbox prefilter and the exact refinement never disagree on boundary rows.
  *
  * Integer cross products use Long arithmetic; exact for any segment whose
  * span times the point offset stays under 2^63 (true for all real-world
  * polygons; only degenerate near-global segments could overflow).
  */
object PointInPolygon {

  /** Even-odd test of (lng, lat) against a ring list. */
  def containsRings(rings: IndexedSeq[Array[Long]], lng: Int, lat: Int): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var i = 0
      val n = ring.length
      // edges wrap i -> (i+1) % n: WKT/WKB rings are SUPPOSED to repeat
      // the first point last, but external emitters often leave rings
      // unclosed and neither parser validates closure — without the wrap
      // edge an unclosed ring silently misclassifies half the plane. For
      // a properly closed ring the wrap edge is zero-length and changes
      // nothing (no y-crossing; onSegment only re-reports the vertex).
      while (i < n) {
        val j = if (i + 1 == n) 0 else i + 1
        val x1 = Wkb.lngOf(ring(i)); val y1 = Wkb.latOf(ring(i))
        val x2 = Wkb.lngOf(ring(j)); val y2 = Wkb.latOf(ring(j))
        if (onSegment(x1, y1, x2, y2, lng, lat)) return true
        // half-open crossing rule [min(y1,y2), max(y1,y2))
        if ((y1 > lat) != (y2 > lat)) {
          // lng < x-intersection of the edge with the horizontal ray
          val cross = (x2.toLong - x1) * (lat.toLong - y1) - (lng.toLong - x1) * (y2.toLong - y1)
          // sign of (edge direction) x (point - start); orient by edge y-direction
          if (y2 > y1) { if (cross > 0) inside = !inside }
          else { if (cross < 0) inside = !inside }
        }
        i += 1
      }
      r += 1
    }
    inside
  }

  private def onSegment(x1: Int, y1: Int, x2: Int, y2: Int, px: Int, py: Int): Boolean = {
    val cross = (x2.toLong - x1) * (py.toLong - y1) - (px.toLong - x1) * (y2.toLong - y1)
    if (cross != 0L) return false
    px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
      py >= math.min(y1, y2) && py <= math.max(y1, y2)
  }

  /** Point-in-geometry against a WKB blob (polygonal parts only; points /
    * lines contain nothing except via onSegment for lines is NOT implied —
    * non-areal geometries return false unless the point coincides).
    */
  def containsWkb(wkb: Array[Byte], lng: Int, lat: Int): Boolean =
    containsGeom(Wkb.read(wkb), lng, lat)

  def containsGeom(g: Wkb.Geom, lng: Int, lat: Int): Boolean = g match {
    case Wkb.Pt(plng, plat)  => plng == lng && plat == lat
    case Wkb.Poly(rings)     => containsRings(rings, lng, lat)
    case Wkb.MultiPoly(ps)   => ps.exists(rings => containsRings(rings, lng, lat))
    case Wkb.Collection(gs)  => gs.exists(containsGeom(_, lng, lat))
    case _                   => false
  }
}
