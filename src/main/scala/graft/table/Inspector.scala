package graft.table

import graft.codec.FeatureCodec
import graft.codec.FeatureCodec.R
import graft.geom.Wkb
import graft.index.PackedRTree
import graft.sources.GeoJson

/** Byte-level inspector for the single-file container (S12) — the analog
  * of the reference's `Inspector` (`geomedea/src/inspector.rs`): walks
  * header, index levels, page headers, per-feature length prefixes and
  * feature bytes, annotating every section with its absolute byte range
  * and decoded value. The section offsets on the reference's own 3-point
  * fixture match its inspector test exactly (`inspector.rs:243-310`:
  * header 0..17, index 17..129, page#0 129..141, feature lens/bodies
  * 141..149/149..205, 205..213/213..269, page#1 269..281, 281..289,
  * 289..345) — asserted in InspectorSpec.
  */
object Inspector {

  private def hexRow(bytes: Array[Byte], from: Int, to: Int): String =
    bytes.slice(from, to).map(b => f"${b & 0xFF}%02X").mkString("0x[", ", ", "]")

  def describe(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    def section(name: String, from: Int, to: Int, decoded: String): Unit = {
      sb.append(s"== $name ==\n")
      sb.append(s"$from..$to (${to - from} bytes): ${hexRow(bytes, from, to)}:\n")
      sb.append(decoded).append("\n")
    }

    val r = new R(bytes)
    val (compressed, pageCount, featureCount) = FeatureCodec.decodeHeader(r)
    section("header", 0, r.pos,
      s"Header { is_compressed: $compressed, page_count: $pageCount, feature_count: $featureCount }")

    // index: levels root-first
    val indexStart = r.pos
    val nodeCount = PackedRTree.nodeCount(featureCount).toInt
    val treeBytes = r.take(nodeCount * PackedRTree.NodeBytes)
    val tree = new PackedRTree(featureCount, treeBytes)
    val levels = PackedRTree.nodeRangesByLevel(featureCount)
    // degree rendering like the reference's LngLat Debug: whole degrees
    // print without a decimal point (RECT(-1 -2,11 12))
    def deg(scaled: Int): String = {
      val d = scaled / 1e7
      if (d == d.toLong) d.toLong.toString else d.toString
    }
    val levelLines = levels.zipWithIndex.map { case ((s0, e0), lvl) =>
      val nodes = (s0 until e0).map { i =>
        val e = tree.nodeEnvelope(i)
        s"Node { bounds: RECT(${deg(e.minLng)} ${deg(e.minLat)},${deg(e.maxLng)} ${deg(e.maxLat)}), " +
          s"offset: FeatureLocation { page_starting_offset: ${tree.payloadHi(i)}, feature_offset: ${tree.payloadLo(i)} } }"
      }.mkString(", ")
      s"level $lvl: $nodes"
    }
    section("index", indexStart, r.pos, levelLines.mkString("\n"))

    // pages
    var page = 0L
    while (page < pageCount) {
      val phStart = r.pos
      val (encLen, decLen, count) = FeatureCodec.decodePageHeader(r)
      section(s"page #$page", phStart, r.pos,
        s"PageHeader { encoded_page_length: $encLen, decoded_page_length: $decLen, feature_count: $count }")
      val body =
        if (compressed) {
          val enc = r.take(encLen.toInt)
          com.github.luben.zstd.Zstd.decompress(enc, decLen.toInt)
        } else r.take(encLen.toInt)
      // annotate within-page feature records; absolute offsets only make
      // sense uncompressed (they then equal the reference's)
      val pr = new R(body)
      val base = if (compressed) -1 else r.pos - body.length
      var f = 0L
      while (f < count) {
        val lenStart = pr.pos
        val len = pr.u64().toInt
        if (base >= 0)
          section(s"feature #$f len", base + lenStart, base + pr.pos, len.toString)
        else sb.append(s"== feature #$f len == $len (in-page ${lenStart}..${pr.pos})\n")
        val featStart = pr.pos
        val feat = FeatureCodec.decodeFeature(pr.take(len))
        val props = feat.props.map { case (k, v) => s"$k: ${GeoJson.propValueJson(v)}" }
          .mkString("Properties { ", ", ", " }")
        val decoded = s"Feature { geometry: ${Wkb.asText(feat.geom)}, properties: $props }"
        if (base >= 0) section(s"feature #$f", base + featStart, base + pr.pos, decoded)
        else sb.append(decoded).append("\n")
        f += 1
      }
      page += 1
    }
    require(r.remaining == 0, s"${r.remaining} trailing bytes")
    sb.toString
  }
}
