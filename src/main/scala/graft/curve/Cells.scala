package graft.curve

import graft.geom.Envelope

/** Hierarchical grid-cell scheme over the scaled-int world, the engine's
  * H3/S2 analog (built from first principles — coursier is offline, so no
  * external geo index deps; see SURVEY.md §2.11).
  *
  * At resolution r (0..9) the world rectangle
  * lng ∈ [-1.8e9, 1.8e9], lat ∈ [-0.9e9, 0.9e9] (scaled ints) is divided
  * into 2^r x 2^r cells. Both 3600000000 and 1800000000 are divisible by
  * 2^9, so cell widths are exact integers up to r = 9 — this keeps the
  * cell function expressible in plain integer SQL, which is what lets the
  * DuckDB oracle replay the same cell assignment independently.
  *
  * cellId = cx * 2^r + cy  (cx, cy ∈ [0, 2^r)).
  *
  * Separately, [[Hilbert]] supplies the space-filling-curve key used for
  * range partitioning / clustering; cells are the equi-join key.
  */
object Cells {
  final val WorldMinLng = -1800000000L
  final val WorldMinLat = -900000000L
  final val WorldLngSpan = 3600000000L
  final val WorldLatSpan = 1800000000L
  final val MaxRes = 9

  /** Every public entry point validates: above MaxRes the cell widths
    * stop being exact integers (breaking the DuckDB-oracle replay
    * property this scheme exists for), and a negative res wraps the
    * shift into garbage ids. Hilbert.chunk enforces its own range the
    * same way.
    */
  @inline private def checkRes(res: Int): Unit =
    require(res >= 0 && res <= MaxRes, s"cell res must be in [0, $MaxRes]; got $res")

  @inline def cellsPerAxis(res: Int): Long = 1L << res
  @inline def cellWidth(res: Int): Long = WorldLngSpan / cellsPerAxis(res)
  @inline def cellHeight(res: Int): Long = WorldLatSpan / cellsPerAxis(res)

  @inline private def clamp(v: Long, max: Long): Long =
    if (v < 0) 0L else if (v > max) max else v

  def cellX(lng: Int, res: Int): Long =
    clamp((lng.toLong - WorldMinLng) / cellWidth(res), cellsPerAxis(res) - 1)

  def cellY(lat: Int, res: Int): Long =
    clamp((lat.toLong - WorldMinLat) / cellHeight(res), cellsPerAxis(res) - 1)

  /** Cell id of a point at resolution res. */
  def cellId(lng: Int, lat: Int, res: Int): Long = {
    checkRes(res)
    cellX(lng, res) * cellsPerAxis(res) + cellY(lat, res)
  }

  /** All cells intersecting an envelope (the polygon cover set); empty
    * for an empty/inverted envelope — the clamp would otherwise turn an
    * EMPTY geometry's inverted envelope into x0 > x1 whose product of
    * negative spans goes positive, i.e. a large array of bogus cell-0
    * entries joining everything at the world corner.
    */
  def cover(env: Envelope, res: Int): Array[Long] = {
    checkRes(res)
    if (env.isEmpty) return Array.empty
    val x0 = cellX(env.minLng, res); val x1 = cellX(env.maxLng, res)
    val y0 = cellY(env.minLat, res); val y1 = cellY(env.maxLat, res)
    if (x1 < x0 || y1 < y0) return Array.empty
    val n = ((x1 - x0 + 1) * (y1 - y0 + 1)).toInt
    val out = new Array[Long](n)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) { out(i) = x * cellsPerAxis(res) + y; i += 1; y += 1 }
      x += 1
    }
    out
  }

  /** Cover of a WKB geometry's envelope (StaticInvoke-friendly). */
  def coverWkb(wkb: Array[Byte], res: Int): Array[Long] =
    cover(graft.geom.Wkb.read(wkb).envelope, res)

  /** Ring of cells at Chebyshev distance <= k around a cell (clipped at the
    * world edge) — the kNN expansion primitive (SURVEY.md §2.11 "KRing").
    */
  def kRing(cell: Long, res: Int, k: Int): Array[Long] = {
    checkRes(res)
    require(k >= 0, s"kRing radius must be >= 0; got $k")
    val per = cellsPerAxis(res)
    val cx = cell / per
    val cy = cell % per
    val x0 = math.max(0L, cx - k); val x1 = math.min(per - 1, cx + k)
    val y0 = math.max(0L, cy - k); val y1 = math.min(per - 1, cy + k)
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) { out(i) = x * per + y; i += 1; y += 1 }
      x += 1
    }
    out
  }

  /** Web-map-style tile assignment (z, x, y) packed into a long:
    * tileId = x * 2^z + y at zoom z over the same world rectangle
    * (SURVEY.md §2.11 "TileAssign"). Identical arithmetic to cellId, kept
    * as a named concept because tiles are a materialization target.
    */
  def tileId(lng: Int, lat: Int, zoom: Int): Long = cellId(lng, lat, zoom)

  def tileX(tile: Long, zoom: Int): Long = tile / cellsPerAxis(zoom)
  def tileY(tile: Long, zoom: Int): Long = tile % cellsPerAxis(zoom)
}
