package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._
import graft.curve.{Hilbert, Cells}
import graft.index.PackedRTree
import graft.codec.DeltaZigZag

/** Pure-JVM goldens ported from the reference test suite (values, not code).
  * Citations into /root/reference/ per test.
  */
class CoreSpec extends AnyFunSuite {

  // geometry/mod.rs:350-355
  test("coordinate scaling truncates toward zero (golden -118.2562, 34.1060)") {
    assert(ScaledCoord.toScaled(-118.2562) == -1182562000)
    assert(ScaledCoord.toScaled(34.1060) == 341060000)
    // truncation, not rounding: 1.99999999e-7 deg -> 1 unit
    assert(ScaledCoord.toScaled(1.99999999e-7) == 1)
    assert(ScaledCoord.toScaled(-1.99999999e-7) == -1)
  }

  // bounds.rs:122-141
  test("envelope center (incl. negative) and normalization") {
    val b = Envelope.fromDegrees(0, 0, 3, 3)
    assert(b.centerLng == ScaledCoord.toScaled(1.5) && b.centerLat == ScaledCoord.toScaled(1.5))
    val n2 = Envelope.fromDegrees(2, 2, 3, 3)
    assert(n2.centerLng == ScaledCoord.toScaled(2.5))
    val neg = Envelope.fromDegrees(1, 2, -3, -6)
    assert(neg.centerLng == ScaledCoord.toScaled(-1.0) && neg.centerLat == ScaledCoord.toScaled(-2.0))
  }

  // bounds.rs:101-119 — closed interval: touching edges intersect
  test("envelope intersects is closed-interval") {
    val a = Envelope.fromDegrees(0, 0, 1, 1)
    val b = Envelope.fromDegrees(1, 1, 2, 2)
    assert(a.intersects(b) && b.intersects(a))
    val c = Envelope.fromDegrees(1.0000001, 1.0000001, 2, 2)
    assert(!a.intersects(c))
    assert(Envelope.empty.union(a) == a) // monoid identity
  }

  // writer/hilbert.rs:85-98
  test("scaled hilbert goldens 143165576 / 2720145952") {
    val n1 = Envelope.fromDegrees(0, 0, 1, 1)
    val n2 = Envelope.fromDegrees(2, 2, 3, 3)
    val extent = n1.union(n2)
    assert(Hilbert.scaled(n1.centerLng, n1.centerLat, extent) == 143165576L)
    assert(Hilbert.scaled(n2.centerLng, n2.centerLat, extent) == 2720145952L)
  }

  // reader.rs:431-457 — diagonal points sort 3,2,1,0 under DESCENDING hilbert
  test("hilbert descending order of diagonal points is 3,2,1,0") {
    val pts = (0 to 3).map(i => (ScaledCoord.toScaled(i), ScaledCoord.toScaled(i)))
    val extent = pts.foldLeft(Envelope.empty) { case (e, (x, y)) => e.extendPoint(x, y) }
    val order = pts.zipWithIndex
      .sortBy { case ((x, y), _) => -Hilbert.scaled(x, y, extent) }
      .map(_._2)
    assert(order == Seq(3, 2, 1, 0))
  }

  // packed_r_tree/mod.rs:196-292
  test("packed r-tree shape goldens") {
    assert(PackedRTree.nodesPerLevel(0) == Vector.empty)
    assert(PackedRTree.nodesPerLevel(1) == Vector(1L))
    assert(PackedRTree.nodesPerLevel(2) == Vector(1L, 2L))
    assert(PackedRTree.nodesPerLevel(16) == Vector(1L, 16L))
    assert(PackedRTree.nodesPerLevel(17) == Vector(1L, 2L, 17L))
    assert(PackedRTree.nodesPerLevel(33) == Vector(1L, 3L, 33L))
    assert(PackedRTree.nodesPerLevel(255) == Vector(1L, 16L, 255L))
    assert(PackedRTree.nodesPerLevel(257) == Vector(1L, 2L, 17L, 257L))
    assert(PackedRTree.nodeCount(257) == 277L)
    assert(PackedRTree.nodeRangesByLevel(257) == Vector((0L, 1L), (1L, 3L), (3L, 20L), (20L, 277L)))
    assert(PackedRTree.childrenRange(17, 0).contains((1L, 3L)))
    assert(PackedRTree.childrenRange(17, 1).contains((3L, 19L)))
    assert(PackedRTree.childrenRange(17, 2).contains((19L, 20L)))
    assert(PackedRTree.childrenRange(1, 0).isEmpty)
    assert(PackedRTree.childrenRange(3, 2).isEmpty)
    assert(!PackedRTree.isLeafNode(257, 0))
    assert(!PackedRTree.isLeafNode(257, 19))
    assert(PackedRTree.isLeafNode(257, 20))
    assert(PackedRTree.isLeafNode(257, 277 - 1))
    assert(PackedRTree.levelForNodeIdx(250, 17) == 0)
    assert(PackedRTree.levelForNodeIdx(250, 266) == 0)
    assert(PackedRTree.levelForNodeIdx(250, 16) == 1)
    assert(PackedRTree.levelForNodeIdx(250, 1) == 1)
    assert(PackedRTree.levelForNodeIdx(250, 0) == 2)
  }

  // packed_r_tree/writer.rs:104-131 — single-node byte golden
  test("packed r-tree single-node byte golden") {
    val bytes = PackedRTree.build(IndexedSeq((Envelope(1, 2, 3, 4), 60L, 8)))
    val expected = Array[Int](
      1, 0, 0, 0, 2, 0, 0, 0, 3, 0, 0, 0, 4, 0, 0, 0,
      60, 0, 0, 0, 0, 0, 0, 0, 8, 0, 0, 0
    ).map(_.toByte)
    assert(bytes.toSeq == expected.toSeq)
  }

  // packed_r_tree/writer.rs:134-176 — multi-layer bounds rollup
  test("packed r-tree 17-leaf rollup bounds") {
    val leaves = (0 until 17).map { i =>
      (Envelope.fromDegrees(i, i, i * 2.0, i * 2.0), (i / 10).toLong, i % 10)
    }
    val bytes = PackedRTree.build(leaves)
    val tree = new PackedRTree(17, bytes)
    assert(tree.nodeEnvelope(0) == Envelope.fromDegrees(0, 0, 32, 32))
    assert(tree.nodeEnvelope(1) == Envelope.fromDegrees(0, 0, 30, 30))
    assert(tree.nodeEnvelope(2) == Envelope.fromDegrees(16, 16, 32, 32))
    assert(tree.nodeEnvelope(3) == Envelope.fromDegrees(0, 0, 0, 0))
    assert(tree.nodeEnvelope(19) == Envelope.fromDegrees(16, 16, 32, 32))
  }

  // packed_r_tree/reader.rs:285-352 — 4-leaf search incl. tree-order output
  test("packed r-tree bbox search goldens") {
    val leaves = IndexedSeq(
      (Envelope.fromDegrees(0, 0, 1, 1), 0L, 0),
      (Envelope.fromDegrees(1, 1, 2, 2), 0L, 1),
      (Envelope.fromDegrees(2, 2, 3, 3), 10L, 0),
      (Envelope.fromDegrees(3, 3, 4, 4), 10L, 1)
    )
    val tree = new PackedRTree(4, PackedRTree.build(leaves))
    val hit1 = tree.queryBbox(Envelope.fromDegrees(0.5, 0.5, 0.75, 0.75))
    assert(hit1.toSeq == Seq(0L))
    // (1.5,1.5)-(2,2) hits leaves 1 and 2 in tree order: (page 0, feat 1), (page 10, feat 0)
    val q = Envelope.fromDegrees(1.5, 1.5, 2.0, 2.0)
    val hits = (0L until PackedRTree.nodeCount(4)).filter(i =>
      PackedRTree.isLeafNode(4, i) && tree.nodeEnvelope(i).intersects(q))
      .map(i => (tree.payloadHi(i), tree.payloadLo(i)))
    assert(hits == Seq((0L, 1), (10L, 0)))
    assert(tree.queryBbox(q).toSeq == Seq(0L, 10L))
    // empty tree
    assert(new PackedRTree(0, Array.empty).queryBbox(q).isEmpty)
  }

  // geometry/mod.rs:357-371 — recursive bounds of a mixed collection
  test("geometry collection envelope golden RECT(-20 -30, 10 20)") {
    val pt = Wkb.Pt(ScaledCoord.toScaled(1.0), ScaledCoord.toScaled(2.0))
    val line = Wkb.Line(Array(
      Wkb.pack(ScaledCoord.toScaled(10.0), ScaledCoord.toScaled(20.0)),
      Wkb.pack(ScaledCoord.toScaled(-20.0), ScaledCoord.toScaled(-30.0))))
    val coll = Wkb.Collection(Vector(pt, line))
    assert(coll.envelope == Envelope.fromDegrees(-20, -30, 10, 20))
  }

  test("wkb roundtrip for all 7 geometry types") {
    def rt(g: Wkb.Geom): Unit = {
      val decoded = Wkb.read(Wkb.write(g))
      assert(Wkb.asText(decoded) == Wkb.asText(g))
      assert(decoded.envelope == g.envelope)
    }
    val c = (d: Double, e: Double) => Wkb.pack(ScaledCoord.toScaled(d), ScaledCoord.toScaled(e))
    val ring = Array(c(0, 0), c(4, 0), c(4, 4), c(0, 4), c(0, 0))
    val hole = Array(c(1, 1), c(2, 1), c(2, 2), c(1, 2), c(1, 1))
    rt(Wkb.Pt(ScaledCoord.toScaled(-118.2562), ScaledCoord.toScaled(34.106)))
    rt(Wkb.Line(Array(c(0, 0), c(1, 1), c(2, 0))))
    rt(Wkb.Poly(Vector(ring, hole)))
    rt(Wkb.MultiPt(Array(c(0, 0), c(5, 5))))
    rt(Wkb.MultiLine(Vector(Array(c(0, 0), c(1, 1)), Array(c(2, 2), c(3, 3)))))
    rt(Wkb.MultiPoly(Vector(Vector(ring), Vector(hole))))
    rt(Wkb.Collection(Vector(Wkb.Pt(1, 2), Wkb.Line(Array(c(10, 20), c(-20, -30))))))
  }

  test("point-in-polygon: interior, exterior, hole, boundary (closed)") {
    val c = (d: Double, e: Double) => Wkb.pack(ScaledCoord.toScaled(d), ScaledCoord.toScaled(e))
    val ring = Array(c(0, 0), c(4, 0), c(4, 4), c(0, 4), c(0, 0))
    val hole = Array(c(1, 1), c(2, 1), c(2, 2), c(1, 2), c(1, 1))
    val poly = Wkb.Poly(Vector(ring, hole))
    def pip(lng: Double, lat: Double) =
      PointInPolygon.containsGeom(poly, ScaledCoord.toScaled(lng), ScaledCoord.toScaled(lat))
    assert(pip(3, 3))        // interior
    assert(!pip(5, 3))       // exterior
    assert(!pip(1.5, 1.5))   // inside the hole
    assert(pip(0, 0))        // vertex -> closed
    assert(pip(2, 0))        // edge -> closed
    assert(pip(1, 1.5))      // hole boundary -> closed (on segment)
    assert(pip(4, 4))        // far corner
    val multi = Wkb.MultiPoly(Vector(Vector(ring), Vector(Array(c(10, 10), c(12, 10), c(12, 12), c(10, 12), c(10, 10)))))
    assert(PointInPolygon.containsGeom(multi, ScaledCoord.toScaled(11), ScaledCoord.toScaled(11)))
    assert(!PointInPolygon.containsGeom(multi, ScaledCoord.toScaled(7), ScaledCoord.toScaled(7)))
  }

  test("point-in-polygon: UNCLOSED rings classify like their closed twins") {
    val c = (d: Double, e: Double) => Wkb.pack(ScaledCoord.toScaled(d), ScaledCoord.toScaled(e))
    // same square/hole as the closed test, WITHOUT the repeated last
    // point — external emitters produce these and neither parser
    // validates closure; the implicit closing edge must be cast against
    val ring = Array(c(0, 0), c(4, 0), c(4, 4), c(0, 4))
    val hole = Array(c(1, 1), c(2, 1), c(2, 2), c(1, 2))
    val poly = Wkb.Poly(Vector(ring, hole))
    def pip(lng: Double, lat: Double) =
      PointInPolygon.containsGeom(poly, ScaledCoord.toScaled(lng), ScaledCoord.toScaled(lat))
    assert(pip(3, 3))        // interior
    assert(!pip(5, 3))       // exterior
    assert(!pip(-5, 2))      // exterior LEFT of the implicit closing edge
    assert(!pip(1.5, 1.5))   // inside the hole
    assert(pip(0, 2))        // ON the implicit closing edge -> closed
    assert(pip(0, 0))        // vertex -> closed
  }

  test("cells: empty/inverted envelopes cover nothing; res out of range is rejected") {
    // an EMPTY geometry's envelope is inverted (min > max): the clamp
    // would turn it into a huge array of bogus cell-0 entries joining
    // everything at the world corner
    assert(Cells.cover(Envelope.empty, 4).isEmpty)
    assert(Cells.cover(Envelope(10, 10, -10, 10), 9).isEmpty) // one axis inverted
    intercept[IllegalArgumentException](Cells.cellId(0, 0, Cells.MaxRes + 1))
    intercept[IllegalArgumentException](Cells.cover(Envelope(0, 0, 1, 1), -1))
    intercept[IllegalArgumentException](Cells.kRing(0L, 4, -1))
  }

  test("cells: cellId/cover/kRing/tile arithmetic") {
    val res = 4 // 16x16 grid, cell = 22.5 x 11.25 degrees
    // world corners
    assert(Cells.cellId(ScaledCoord.toScaled(-180), ScaledCoord.toScaled(-90), res) == 0L)
    assert(Cells.cellId(ScaledCoord.toScaled(179.9999), ScaledCoord.toScaled(89.9999), res) == 255L)
    // max edge is clamped into the last cell
    assert(Cells.cellId(1800000000.toInt, 900000000.toInt, res) == 255L)
    // cover of a rect spanning 2x2 cells
    val env = Envelope.fromDegrees(-10, -10, 10, 10)
    val cov = Cells.cover(env, res)
    assert(cov.length == 4 && cov.distinct.length == 4)
    assert(cov.forall { id =>
      val x = id / 16; val y = id % 16
      x >= 7 && x <= 8 && y >= 7 && y <= 8
    })
    // kRing clipping at world edge
    assert(Cells.kRing(0L, res, 1).toSet == Set(0L, 1L, 16L, 17L))
    assert(Cells.kRing(Cells.cellId(0, 0, res), res, 1).length == 9)
    // tile == cell arithmetic
    assert(Cells.tileId(0, 0, 3) == Cells.cellId(0, 0, 3))
    val t = Cells.tileId(ScaledCoord.toScaled(10), ScaledCoord.toScaled(10), 3)
    assert(Cells.tileX(t, 3) == 4L && Cells.tileY(t, 3) == 4L)
  }

  test("delta-zigzag codec roundtrip + compactness") {
    assert(DeltaZigZag.zigzag(0L) == 0L && DeltaZigZag.zigzag(-1L) == 1L && DeltaZigZag.zigzag(1L) == 2L)
    assert(DeltaZigZag.unzigzag(DeltaZigZag.zigzag(-123456789L)) == -123456789L)
    val vals = Array(-1182562000, -1182561990, -1182561980, 341060000, 341060010)
    assert(DeltaZigZag.decode(DeltaZigZag.encode(vals)).toSeq == vals.toSeq)
    // hilbert-adjacent values compress far below 4 bytes/value
    val near = Array.tabulate(1000)(i => 500000000 + i * 3)
    assert(DeltaZigZag.encode(near).length < 1200)
    assert(DeltaZigZag.decode(DeltaZigZag.encode(near)).toSeq == near.toSeq)
    val longs = Array(143165576L, 2720145952L, 0L, -5L)
    assert(DeltaZigZag.decodeLongs(DeltaZigZag.encodeLongs(longs)).toSeq == longs.toSeq)
    assert(DeltaZigZag.decode(DeltaZigZag.encode(Array.empty[Int])).isEmpty)
  }

  test("WKT parser goldens (wkt.rs:150-300)") {
    import graft.geom.Wkt
    def deg(d: Double) = ScaledCoord.toScaled(d)
    def pt(x: Double, y: Double) = Wkb.pack(deg(x), deg(y))

    // optional decimal + point (wkt.rs:151-161)
    assert(Wkt.parse("POINT(1 2.0)") == Wkb.Pt(deg(1), deg(2)))
    assert(Wkt.parse("POINT(1 2)") == Wkb.Pt(deg(1), deg(2)))
    // line_string (wkt.rs:163-170)
    assert(Wkt.parse("LINESTRING(1 2,3 4)").asInstanceOf[Wkb.Line].coords.toSeq ==
      Seq(pt(1, 2), pt(3, 4)))
    assert(Wkt.parse("LINESTRING EMPTY").asInstanceOf[Wkb.Line].coords.isEmpty)
    // polygon (wkt.rs:172-182)
    val poly = Wkt.parse("POLYGON((1 2,3 4))").asInstanceOf[Wkb.Poly]
    assert(poly.rings.map(_.toSeq) == Vector(Seq(pt(1, 2), pt(3, 4))))
    // multi_point (wkt.rs:184-191)
    assert(Wkt.parse("MULTIPOINT(1 2,3 4)").asInstanceOf[Wkb.MultiPt].coords.toSeq ==
      Seq(pt(1, 2), pt(3, 4)))
    // multi_line_string with nested EMPTY (wkt.rs:193-204)
    val mls = Wkt.parse("MULTILINESTRING((1 2,3 4),EMPTY,(5 6,7 8))").asInstanceOf[Wkb.MultiLine]
    assert(mls.lines.map(_.toSeq) ==
      Vector(Seq(pt(1, 2), pt(3, 4)), Seq.empty, Seq(pt(5, 6), pt(7, 8))))
    // multi_polygon with nested EMPTY (wkt.rs:206-235)
    val mp = Wkt.parse(
      "MULTIPOLYGON(((0 1,1 1,1 0,0 1)),EMPTY,((5 5,7 8,5 6,5 5),(9 10, 11 12,12 12,9 10)))")
      .asInstanceOf[Wkb.MultiPoly]
    assert(mp.polys.map(_.map(_.toSeq)) == Vector(
      Vector(Seq(pt(0, 1), pt(1, 1), pt(1, 0), pt(0, 1))),
      Vector.empty,
      Vector(Seq(pt(5, 5), pt(7, 8), pt(5, 6), pt(5, 5)),
        Seq(pt(9, 10), pt(11, 12), pt(12, 12), pt(9, 10)))))
    // geometry_collection of all six (wkt.rs:237-287)
    val gc = Wkt.parse(
      """GEOMETRYCOLLECTION(
        |  POINT(1 2),
        |  LINESTRING(1 2,3 4),
        |  POLYGON((1 2,3 4,5 6,1 2)),
        |  MULTIPOINT(1 2,3 4),
        |  MULTILINESTRING((1 2,3 4),EMPTY,(5 6,7 8)),
        |  MULTIPOLYGON(((0 1,1 1,1 0,0 1)),EMPTY,((5 5,7 8,5 6,5 5),(9 10, 11 12,12 12,9 10))))""".stripMargin)
      .asInstanceOf[Wkb.Collection]
    assert(gc.geoms.length == 6)
    assert(gc.geoms.head == Wkb.Pt(deg(1), deg(2)))
    assert(Wkb.asText(gc.geoms(2)) == "POLYGON((1.0 2.0,3.0 4.0,5.0 6.0,1.0 2.0))")
    // bounds (wkt.rs:289-297)
    assert(Wkt.parseRect("RECT(1 2,3 4)") ==
      Envelope.fromCorners(deg(1), deg(2), deg(3), deg(4)))
    // EMPTY collections + rejections (wkt.rs:37-39, 57-59)
    assert(Wkt.parse("GEOMETRYCOLLECTION EMPTY").asInstanceOf[Wkb.Collection].geoms.isEmpty)
    assert(Wkt.parse("MULTIPOLYGON EMPTY").asInstanceOf[Wkb.MultiPoly].polys.isEmpty)
    intercept[IllegalArgumentException](Wkt.parse("POINT EMPTY"))
    intercept[IllegalArgumentException](Wkt.parse("LINESTRING()"))
    intercept[IllegalArgumentException](Wkt.parse("TRIANGLE(0 0,1 1,2 0)"))
    // WKT out -> WKT in is a fixpoint through the engine formatter
    val round = Wkt.parse(Wkb.asText(mp))
    assert(Wkb.asText(round) == Wkb.asText(mp))
  }
}
