package graft

import graft.codec.FeatureCodec.{Feature, PString}
import graft.geom.{ScaledCoord, Wkb}
import graft.sources.GeomedeaFile
import graft.table.Inspector
import org.scalatest.funsuite.AnyFunSuite

/** S12: the inspector's section offsets and decoded values on the
  * reference's own 3-point fixture must match the reference inspector
  * test (`inspector.rs:214-312`) — same file bytes (proven byte-equal in
  * FeatureCodecSpec), same walk.
  */
class InspectorSpec extends AnyFunSuite {

  private def pf(lng: Double, lat: Double, idx: Int) =
    Feature(Wkb.Pt(ScaledCoord.toScaled(lng), ScaledCoord.toScaled(lat)),
      Vector("some_prop" -> PString(s"value-$idx")))

  test("inspector reproduces the reference fixture's section map (inspector.rs:243-310)") {
    val bytes = GeomedeaFile.write(
      Seq(pf(1, 2, 0), pf(11, 12, 1), pf(-1, -2, 2)),
      compressed = false, pageSizeGoal = 100)
    val out = Inspector.describe(bytes)

    // section byte ranges — the reference's exact values
    for (hdr <- Seq(
      "== header ==\n0..17 (17 bytes)",
      "== index ==\n17..129 (112 bytes)",
      "== page #0 ==\n129..141 (12 bytes)",
      "== feature #0 len ==\n141..149 (8 bytes)",
      "== feature #0 ==\n149..205 (56 bytes)",
      "== feature #1 len ==\n205..213 (8 bytes)",
      "== feature #1 ==\n213..269 (56 bytes)",
      "== page #1 ==\n269..281 (12 bytes)",
      "== feature #0 len ==\n281..289 (8 bytes)",
      "== feature #0 ==\n289..345 (56 bytes)"))
      assert(out.contains(hdr), s"missing section [$hdr] in:\n$out")

    // decoded values — reference's header/page/index/feature facts
    assert(out.contains("Header { is_compressed: false, page_count: 2, feature_count: 3 }"))
    assert(out.contains("PageHeader { encoded_page_length: 128, decoded_page_length: 128, feature_count: 2 }"))
    assert(out.contains("PageHeader { encoded_page_length: 64, decoded_page_length: 64, feature_count: 1 }"))
    assert(out.contains("bounds: RECT(-1 -2,11 12)")) // root node
    assert(out.contains("page_starting_offset: 0, feature_offset: 64"))  // leaf 1
    assert(out.contains("page_starting_offset: 140, feature_offset: 0")) // leaf 2
    assert(out.contains("""Feature { geometry: POINT(11.0 12.0), properties: Properties { some_prop: "value-1" } }"""))
    assert(out.contains("""Feature { geometry: POINT(-1.0 -2.0), properties: Properties { some_prop: "value-2" } }"""))
  }

  test("inspector walks compressed files (in-page offsets)") {
    val bytes = GeomedeaFile.write(
      Seq(pf(1, 2, 0), pf(11, 12, 1), pf(-1, -2, 2)),
      compressed = true, pageSizeGoal = 100)
    val out = Inspector.describe(bytes)
    assert(out.contains("is_compressed: true"))
    assert(out.contains("POINT(11.0 12.0)"))
    assert(out.contains("in-page"))
  }
}
