package graft

import graft.codec.FeatureCodec
import graft.codec.FeatureCodec._
import graft.geom.{Envelope, ScaledCoord, Wkb}
import graft.sources.GeomedeaFile
import org.scalatest.funsuite.AnyFunSuite

/** Byte-parity goldens for the bincode feature codec and the single-file
  * container, transcribed from the reference's own test output:
  * header golden `geomedea/src/lib.rs:180-195`, empty file
  * `lib.rs:136-155`, full annotated hexdump `inspector.rs:214-312`.
  */
class FeatureCodecSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.split("[,\\s]+").filter(_.nonEmpty).map(t => Integer.parseInt(t.trim, 16).toByte)

  private def deg(d: Double): Int = ScaledCoord.toScaled(d)

  private def pointFeature(lngDeg: Double, latDeg: Double, idx: Int): Feature =
    Feature(Wkb.Pt(deg(lngDeg), deg(latDeg)),
      Vector("some_prop" -> PString(s"value-$idx")))

  test("header byte golden (lib.rs:180-195)") {
    val expected = hex("00 01 00 00 00 00 00 00 00 03 00 00 00 00 00 00 00")
    assert(FeatureCodec.encodeHeader(isCompressed = false, pageCount = 1, featureCount = 3)
      .sameElements(expected))
  }

  test("empty file is 29 bytes and scans to zero features (lib.rs:136-155)") {
    for (compressed <- Seq(false, true)) {
      val bytes = GeomedeaFile.write(Nil, compressed)
      // compressed empty page: zstd of 0 bytes is a small non-zero frame,
      // so only the uncompressed file matches the reference's 29 exactly
      if (!compressed) assert(bytes.length == 29, s"compressed=$compressed")
      assert(GeomedeaFile.selectAll(bytes).isEmpty)
      assert(GeomedeaFile.header(bytes) == ((compressed, 1L, 0L)))
    }
  }

  test("feature byte golden: POINT(11 12) + some_prop=value-1 (inspector.rs:268-276)") {
    val expected = hex(
      "00 00 00 00 80 77 8E 06 00 0E 27 07 01 00 00 00 00 00 00 00 09 00 00 00 00 00 00 00" +
        " 73 6F 6D 65 5F 70 72 6F 70 0C 00 00 00 07 00 00 00 00 00 00 00 76 61 6C 75 65 2D 31")
    val enc = FeatureCodec.encodeFeature(pointFeature(11, 12, 1))
    assert(enc.length == 56)
    assert(enc.sameElements(expected))
    val dec = FeatureCodec.decodeFeature(enc)
    assert(dec == pointFeature(11, 12, 1))
  }

  test("whole-file byte golden: 3-point file, page goal 100 (inspector.rs:214-312)") {
    val header = "00 02 00 00 00 00 00 00 00 03 00 00 00 00 00 00 00"
    val index =
      "80 69 67 FF 00 D3 CE FE 80 77 8E 06 00 0E 27 07 00 00 00 00 00 00 00 00 00 00 00 00 " +
        "80 77 8E 06 00 0E 27 07 80 77 8E 06 00 0E 27 07 00 00 00 00 00 00 00 00 00 00 00 00 " +
        "80 96 98 00 00 2D 31 01 80 96 98 00 00 2D 31 01 00 00 00 00 00 00 00 00 40 00 00 00 " +
        "80 69 67 FF 00 D3 CE FE 80 69 67 FF 00 D3 CE FE 8C 00 00 00 00 00 00 00 00 00 00 00"
    val page0Header = "80 00 00 00 80 00 00 00 02 00 00 00"
    val flen = "38 00 00 00 00 00 00 00"
    def feat(lngLatHex: String, v: Int) =
      s"00 00 00 00 $lngLatHex 01 00 00 00 00 00 00 00 09 00 00 00 00 00 00 00 " +
        "73 6F 6D 65 5F 70 72 6F 70 0C 00 00 00 07 00 00 00 00 00 00 00 76 61 6C 75 65 2D 3" + v
    val page1Header = "40 00 00 00 40 00 00 00 01 00 00 00"
    val expected = hex(Seq(
      header, index,
      page0Header, flen, feat("80 77 8E 06 00 0E 27 07", 1), // POINT(11 12) value-1
      flen, feat("80 96 98 00 00 2D 31 01", 0),              // POINT(1 2)   value-0
      page1Header, flen, feat("80 69 67 FF 00 D3 CE FE", 2)  // POINT(-1 -2) value-2
    ).mkString(" "))
    assert(expected.length == 345)

    val features = Seq(pointFeature(1, 2, 0), pointFeature(11, 12, 1), pointFeature(-1, -2, 2))
    val got = GeomedeaFile.write(features, compressed = false, pageSizeGoal = 100)
    assert(got.length == expected.length,
      s"file length ${got.length} != ${expected.length}")
    assert(got.sameElements(expected),
      s"first diff at byte ${got.zip(expected).indexWhere(p => p._1 != p._2)}")
  }

  test("all geometry types + all 15 property variants roundtrip") {
    val ring = Array(Wkb.pack(0, 0), Wkb.pack(100, 0), Wkb.pack(100, 100), Wkb.pack(0, 0))
    val geoms: Seq[Wkb.Geom] = Seq(
      Wkb.Pt(-1, 2),
      Wkb.Line(Array(Wkb.pack(1, 2), Wkb.pack(3, 4))),
      Wkb.Poly(Vector(ring, ring)),
      Wkb.MultiPt(Array(Wkb.pack(5, 6))),
      Wkb.MultiLine(Vector(Array(Wkb.pack(1, 1)), Array(Wkb.pack(2, 2)))),
      Wkb.MultiPoly(Vector(Vector(ring))),
      Wkb.Collection(Vector(Wkb.Pt(9, 9), Wkb.Line(Array(Wkb.pack(0, 1))))))
    val props: Vector[(String, PValue)] = Vector(
      "b" -> PBool(true), "i8" -> PInt8(-5), "u8" -> PUInt8(200),
      "i16" -> PInt16(-1000), "u16" -> PUInt16(60000),
      "i32" -> PInt32(Int.MinValue), "u32" -> PUInt32(4000000000L),
      "i64" -> PInt64(Long.MinValue), "u64" -> PUInt64(-1L),
      "f32" -> PFloat32(1.5f), "f64" -> PFloat64(math.Pi),
      "bin" -> PBytes(Array[Byte](0, 1, -1)), "s" -> PString("héllo"),
      "vec" -> PVec(Vector(PInt32(1), PString("x"))),
      "map" -> PMap(Vector("inner" -> PBool(false))))
    geoms.foreach { g =>
      val f = Feature(g, props)
      val back = FeatureCodec.decodeFeature(FeatureCodec.encodeFeature(f))
      assert(Wkb.asText(back.geom) == Wkb.asText(g))
      assert(back.props == props)
    }
  }

  test("2x2 matrix: {zstd, none} x {single-page, multi-page} select_all/select_bbox (reader.rs:411-498)") {
    // deterministic 257-feature corpus (also exercises a 3-level R-tree)
    val feats = (0 until 257).map { i =>
      Feature(Wkb.Pt(deg(-120 + i * 0.9), deg(-45 + (i * 37 % 90))),
        Vector("idx" -> PInt64(i.toLong), "name" -> PString(s"f-$i")))
    }
    val q = Envelope.fromDegrees(-60, -10, 0, 40)
    val brute = feats.filter(f => f.geom.envelope.intersects(q)).map(_.props).toSet
    assert(brute.nonEmpty && brute.size < feats.size)
    for {
      compressed <- Seq(false, true)
      goal <- Seq(1024L * 1024, 512L) // one page vs many pages
    } {
      val bytes = GeomedeaFile.write(feats, compressed, goal)
      val all = GeomedeaFile.selectAll(bytes)
      assert(all.length == 257, s"compressed=$compressed goal=$goal")
      assert(all.map(_.props).toSet == feats.map(_.props).toSet)
      // layout order is Hilbert-descending of envelope centers
      val ext = feats.foldLeft(Envelope.empty)((e, f) => e.union(f.geom.envelope))
      val keys = all.map { f =>
        val b = f.geom.envelope
        graft.curve.Hilbert.scaled(b.centerLng, b.centerLat, ext)
      }
      assert(keys == keys.sorted(Ordering[Long].reverse), "not Hilbert-descending")
      val hits = GeomedeaFile.selectBbox(bytes, q)
      assert(hits.map(_.props).toSet == brute, s"compressed=$compressed goal=$goal")
      val (isC, pages, n) = GeomedeaFile.header(bytes)
      assert(isC == compressed && n == 257)
      if (goal == 512L) assert(pages > 1) else assert(pages == 1)
    }
  }
}
