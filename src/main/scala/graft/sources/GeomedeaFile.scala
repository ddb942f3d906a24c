package graft.sources

import graft.codec.FeatureCodec
import graft.codec.FeatureCodec.{Feature, R, W}
import graft.curve.Hilbert
import graft.geom.Envelope
import graft.index.PackedRTree

/** Single-file container, byte-compatible with the reference format
  * (S1-S3 at byte level; the Spark-scale ingest path remains
  * `jobs.Ingest`'s parquet layout — this is the interop/export twin):
  *
  *   Header(17B) ++ packed R-tree index ++ pages, where each page is
  *   PageHeader(12B) ++ body and the body is a sequence of
  *   u64-length-prefixed bincode features (`writer/mod.rs:68-140`).
  *
  * Layout semantics reproduced:
  *  - features sorted by Hilbert key of their bounds center relative to
  *    the dataset extent, DESCENDING (`writer/mod.rs:77-82`);
  *  - page rollover AFTER the feature that pushes the decoded size past
  *    `pageSizeGoal` (`writer/mod.rs:295-316`, default 64 KiB `lib.rs:47`);
  *  - `FeatureLocation = (page_starting_offset, feature_offset)` where the
  *    page offset counts encoded bytes + 12 per finished page and the
  *    feature offset is the uncompressed in-page position
  *    (`writer/mod.rs:184-206`);
  *  - index leaves pushed in layout order; inner nodes zero-payload
  *    (`packed_r_tree/mod.rs:43-55`);
  *  - zstd page compression when `compressed` (level 0 = zstd default,
  *    `writer/mod.rs:333`) — compressed BYTES are zstd-version dependent,
  *    so byte goldens are asserted uncompressed only, roundtrips both.
  */
object GeomedeaFile {

  val DefaultPageSizeGoal: Long = 64L * 1024

  final case class Written(bytes: Array[Byte], extent: Envelope, pageCount: Long)

  def write(features: Seq[Feature], compressed: Boolean,
            pageSizeGoal: Long = DefaultPageSizeGoal): Array[Byte] =
    writeFull(features, compressed, pageSizeGoal).bytes

  def writeFull(features: Seq[Feature], compressed: Boolean,
                pageSizeGoal: Long = DefaultPageSizeGoal): Written = {
    val withBounds = features.map(f => (f, f.geom.envelope))
    val extent = withBounds.foldLeft(Envelope.empty)((e, fb) => e.union(fb._2))
    // Hilbert-descending layout order (stable sort, like Rust's sort_by)
    val ordered = withBounds.sortBy { case (_, b) =>
      Hilbert.scaled(b.centerLng, b.centerLat, extent)
    }(Ordering[Long].reverse)

    // page assembly
    val leaves = Vector.newBuilder[(Envelope, Long, Int)]
    val pages = Vector.newBuilder[Array[Byte]] // pageHeader ++ encoded body
    var pageStart = 0L       // encoded offset of current page within page section
    var body = new W()       // uncompressed body of the current page
    var pageFeatures = 0L
    var pagesClosed = 0 // VectorBuilder forbids result() before the final build

    def closePage(): Unit = {
      pagesClosed += 1
      val decoded = body.result()
      val encoded = if (compressed) com.github.luben.zstd.Zstd.compress(decoded) else decoded
      val w = new W(12 + encoded.length)
      w.u32(encoded.length.toLong).u32(decoded.length.toLong).u32(pageFeatures)
      w.bytes(encoded)
      pages += w.result()
      pageStart += encoded.length.toLong + FeatureCodec.PageHeaderBytes
      body = new W()
      pageFeatures = 0
    }

    ordered.foreach { case (f, bounds) =>
      val loc = (pageStart, body.size)
      val enc = FeatureCodec.encodeFeature(f)
      body.u64(enc.length.toLong).bytes(enc)
      pageFeatures += 1
      leaves += ((bounds, loc._1, loc._2))
      if (body.size.toLong > pageSizeGoal) closePage()
    }
    if (pageFeatures > 0 || pagesClosed == 0) closePage()

    val pageBlocks = pages.result()
    val tree = PackedRTree.build(leaves.result())
    val out = new W(FeatureCodec.HeaderBytes + tree.length + pageBlocks.map(_.length).sum)
    out.bytes(FeatureCodec.encodeHeader(compressed, pageBlocks.length.toLong, ordered.length.toLong))
    out.bytes(tree)
    pageBlocks.foreach(out.bytes)
    Written(out.result(), extent, pageBlocks.length.toLong)
  }

  private def decodePage(r: R, compressed: Boolean): (Array[Byte], Long) = {
    val (encLen, decLen, count) = FeatureCodec.decodePageHeader(r)
    val enc = r.take(encLen.toInt)
    val dec =
      if (compressed) com.github.luben.zstd.Zstd.decompress(enc, decLen.toInt)
      else enc
    require(dec.length.toLong == decLen, s"page decoded ${dec.length} != $decLen")
    (dec, count)
  }

  private def featuresOfPage(body: Array[Byte], count: Long): Vector[Feature] = {
    val r = new R(body)
    Vector.fill(count.toInt) {
      val len = r.u64().toInt
      FeatureCodec.decodeFeature(r.take(len))
    }
  }

  /** Full scan (S4 twin): all features in layout (Hilbert desc) order. */
  def selectAll(bytes: Array[Byte]): Vector[Feature] =
    selectAllLocated(bytes).map(_._2)

  /** Full scan with each feature's `FeatureLocation = (page_starting_
    * offset, in-page offset)` — the format's own STABLE per-feature
    * identifier (`format.rs:4-10`), identical across full and bbox scans.
    */
  def selectAllLocated(bytes: Array[Byte]): Vector[((Long, Int), Feature)] = {
    val r = new R(bytes)
    val (compressed, pageCount, featureCount) = FeatureCodec.decodeHeader(r)
    r.take((PackedRTree.nodeCount(featureCount) * PackedRTree.NodeBytes).toInt) // skip index
    var pageStart = 0L
    val out = Vector.newBuilder[((Long, Int), Feature)]
    (0L until pageCount).foreach { _ =>
      val before = r.pos
      val (body, count) = decodePage(r, compressed)
      val pr = new R(body)
      var i = 0L
      while (i < count) {
        val featOff = pr.pos
        val len = pr.u64().toInt
        out += (((pageStart, featOff), FeatureCodec.decodeFeature(pr.take(len))))
        i += 1
      }
      pageStart += (r.pos - before).toLong
    }
    out.result()
  }

  /** Limited full scan (limit-pushdown path): decode pages ONLY until
    * `n` features have been read — the remaining pages are never
    * decompressed. Returns located features plus decode accounting.
    */
  final case class LimitedRead(features: Vector[((Long, Int), Feature)],
                               pagesDecoded: Long, totalPages: Long,
                               bytesDecoded: Long)

  /** Range-read limited scan: `readRange(offset, len)` is the only I/O
    * primitive (positioned read — FSDataInputStream.readFully or an HTTP
    * range request), and the TRANSFER is bounded too: exactly the 17-byte
    * header plus each needed page's 12-byte page header + encoded body,
    * never the R-tree index or the remaining pages. The partial-download
    * twin of the reference's HTTP reader, applied to LIMIT — and it works
    * on files of ANY size (nothing ever materializes the whole file).
    */
  def selectLimitRange(readRange: (Long, Int) => Array[Byte], n: Int): LimitedRead = {
    val hr = new R(readRange(0, FeatureCodec.HeaderBytes))
    val (compressed, pageCount, featureCount) = FeatureCodec.decodeHeader(hr)
    var pos = FeatureCodec.HeaderBytes.toLong +
      PackedRTree.nodeCount(featureCount) * PackedRTree.NodeBytes
    var pageStart = 0L
    var bytesRead = 0L
    val out = Vector.newBuilder[((Long, Int), Feature)]
    var taken = 0
    var pages = 0L
    var pi = 0L
    while (pi < pageCount && taken < n) {
      val ph = new R(readRange(pos, FeatureCodec.PageHeaderBytes))
      val (encLen, decLen, count) = FeatureCodec.decodePageHeader(ph)
      val enc = readRange(pos + FeatureCodec.PageHeaderBytes, encLen.toInt)
      val body =
        if (compressed) com.github.luben.zstd.Zstd.decompress(enc, decLen.toInt) else enc
      pages += 1
      bytesRead += FeatureCodec.PageHeaderBytes + encLen
      val pr = new R(body)
      var i = 0L
      while (i < count && taken < n) {
        val featOff = pr.pos
        val len = pr.u64().toInt
        out += (((pageStart, featOff), FeatureCodec.decodeFeature(pr.take(len))))
        taken += 1
        i += 1
      }
      val pageBytes = FeatureCodec.PageHeaderBytes + encLen
      pos += pageBytes
      pageStart += pageBytes
      pi += 1
    }
    LimitedRead(out.result(), pages, pageCount, bytesRead)
  }

  /** Read accounting for the indexed scan — the analog of the
    * reference's request/byte counting (`CountingReader`, and the README
    * measurement "153 requests, 81,175,859 bytes"): each fetched page is
    * one coalesced "request".
    */
  final case class BboxRead(features: Vector[Feature], locations: Vector[(Long, Int)],
                            pagesFetched: Long, totalPages: Long,
                            bytesFetched: Long, totalBytes: Long)

  /** Indexed bbox scan (S5/X3 twin): R-tree query -> page-local reads.
    * Emits features in tree (layout) order, like `reader.rs:25-49`.
    */
  def selectBbox(bytes: Array[Byte], q: Envelope): Vector[Feature] =
    selectBboxCounted(bytes, q).features

  /** Indexed bbox scan with stable FeatureLocations (same ids as
    * [[selectAllLocated]] for the same features).
    */
  def selectBboxLocated(bytes: Array[Byte], q: Envelope): Vector[((Long, Int), Feature)] = {
    val read = selectBboxCounted(bytes, q)
    read.locations.zip(read.features)
  }

  def selectBboxCounted(bytes: Array[Byte], q: Envelope): BboxRead = {
    val r = new R(bytes)
    val (compressed, pageCount, featureCount) = FeatureCodec.decodeHeader(r)
    val treeBytes = r.take((PackedRTree.nodeCount(featureCount) * PackedRTree.NodeBytes).toInt)
    val pageSectionStart = r.pos
    val tree = new PackedRTree(featureCount, treeBytes)

    // query returns leaf payloads in tree order; group by page to read
    // each hit page once (the moral twin of the reader's range merging)
    val locs = tree.queryBboxLocations(q)
    var fetched = 0L
    val byPage = locs.map(_._1).distinct.map { pageOff =>
      val pr = new R(bytes, pageSectionStart + pageOff.toInt)
      val (body, _) = decodePage(pr, compressed)
      fetched += pr.pos - (pageSectionStart + pageOff.toInt)
      pageOff -> body
    }.toMap
    val feats = locs.map { case (pageOff, featOff) =>
      val pr = new R(byPage(pageOff), featOff)
      val len = pr.u64().toInt
      FeatureCodec.decodeFeature(pr.take(len))
    }
    BboxRead(feats, locs, byPage.size.toLong, pageCount, fetched,
      (bytes.length - pageSectionStart).toLong)
  }

  def header(bytes: Array[Byte]): (Boolean, Long, Long) =
    FeatureCodec.decodeHeader(new R(bytes))
}
