package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Runtime WKT parser (F6) — the engine analog of the reference's
  * compile-time `wkt!` macro DSL (`geomedea/src/wkt.rs:24-142`), with the
  * same surface:
  *
  *  - POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING,
  *    MULTIPOLYGON, GEOMETRYCOLLECTION -> [[Wkb.Geom]]; RECT(x1 y1,x2 y2)
  *    -> [[Envelope]] ([[parseRect]]);
  *  - `EMPTY` allowed for every collection type AND nested (e.g.
  *    `MULTILINESTRING((1 2,3 4),EMPTY)`), but NOT for POINT
  *    (`wkt.rs:37-39`);
  *  - bare `()` is rejected ("use EMPTY instead of ()", `wkt.rs:57-59`);
  *  - coordinates accept optional decimals and quantize by truncation
  *    like `LngLat::degrees` ([[ScaledCoord.toScaled]]).
  */
object Wkt {

  def parse(text: String): Wkb.Geom = {
    val p = new P(text)
    val g = p.geometry()
    p.end()
    g
  }

  def parseRect(text: String): Envelope = {
    val p = new P(text)
    val e = p.rect()
    p.end()
    e
  }

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"invalid WKT at $i: $msg")

    private def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetter)) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i).toUpperCase
    }

    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    private def peek(): Char = { ws(); if (i < s.length) s.charAt(i) else '\u0000' }

    private def tryEmpty(): Boolean = {
      ws()
      if (s.regionMatches(true, i, "EMPTY", 0, 5)) { i += 5; true } else false
    }

    private def number(): Double = {
      ws()
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) fail("expected number")
      s.substring(start, i).toDouble
    }

    private def coord(): Long = {
      val x = number(); val y = number()
      // roundScaled (not toScaled): WKT text is predominantly OUR OWN
      // formatter's output (Wkb.asText prints scaled/1e7), and rounding is
      // the exact inverse of that division — truncation would drop 1 unit
      // whenever the double sits just below the true decimal (same
      // documented boundary as the self-produced-WKB decode path,
      // ScaledCoord.roundScaled).
      //
      // DOCUMENTED PARITY DEVIATION vs the reference (SURVEY.md F6): the
      // reference's wkt! path quantizes via LngLat::degrees, i.e.
      // `(deg * 1e7) as i32` — TRUNCATION of the rounded double product
      // (geometry/mod.rs:295-297) — so reference-authored text like
      // POINT(1.00000005 0) yields 10000000 there and 10000001 here (and
      // even POINT(839.1 0) yields 8390999999 there, the product double
      // landing just under the integer). Truncation and the format->parse
      // fixpoint are incompatible (no decimal digit count fixes a product
      // that ROUNDS below the integer), and the fixpoint is what our own
      // round-trip guarantees rest on, so we keep rounding and accept a
      // <=1 scaled-unit (1e-7 deg) deviation on externally-authored WKT.
      Wkb.pack(ScaledCoord.roundScaled(x), ScaledCoord.roundScaled(y))
    }

    /** `(x y, x y, ...)` or EMPTY -> packed coords */
    private def coordSeq(): Array[Long] = {
      if (tryEmpty()) return Array.empty
      expect('(')
      if (peek() == ')') fail("use `EMPTY` instead of () for an empty collection")
      val out = ArrayBuffer[Long](coord())
      while (peek() == ',') { i += 1; out += coord() }
      expect(')')
      out.toArray
    }

    /** `((ring),(ring))` or EMPTY -> rings */
    private def ringSeq(): Vector[Array[Long]] = {
      if (tryEmpty()) return Vector.empty
      expect('(')
      if (peek() == ')') fail("use `EMPTY` instead of () for an empty collection")
      val out = Vector.newBuilder[Array[Long]]
      out += coordSeq()
      while (peek() == ',') { i += 1; out += coordSeq() }
      expect(')')
      out.result()
    }

    def rect(): Envelope = {
      val name = ident()
      if (name != "RECT") fail("expected RECT")
      expect('(')
      val a = coord(); expect(','); val b = coord()
      expect(')')
      Envelope.fromCorners(Wkb.lngOf(a), Wkb.latOf(a), Wkb.lngOf(b), Wkb.latOf(b))
    }

    def geometry(): Wkb.Geom = ident() match {
      case "POINT" =>
        if (tryEmpty()) fail("EMPTY points are not supported") // wkt.rs:37-39
        expect('('); val c = coord(); expect(')')
        Wkb.Pt(Wkb.lngOf(c), Wkb.latOf(c))
      case "LINESTRING" => Wkb.Line(coordSeq())
      case "POLYGON"    => Wkb.Poly(ringSeq())
      case "MULTIPOINT" => Wkb.MultiPt(coordSeq())
      case "MULTILINESTRING" => Wkb.MultiLine(ringSeq())
      case "MULTIPOLYGON" =>
        if (tryEmpty()) Wkb.MultiPoly(Vector.empty)
        else {
          expect('(')
          if (peek() == ')') fail("use `EMPTY` instead of () for an empty collection")
          val out = Vector.newBuilder[Vector[Array[Long]]]
          out += ringSeq()
          while (peek() == ',') { i += 1; out += ringSeq() }
          expect(')')
          Wkb.MultiPoly(out.result())
        }
      case "GEOMETRYCOLLECTION" =>
        if (tryEmpty()) Wkb.Collection(Vector.empty)
        else {
          expect('(')
          if (peek() == ')') fail("use `EMPTY` instead of () for an empty collection")
          val out = Vector.newBuilder[Wkb.Geom]
          out += geometry()
          while (peek() == ',') { i += 1; out += geometry() }
          expect(')')
          Wkb.Collection(out.result())
        }
      case other => fail(s"unknown type $other. Must be one of POINT, LINESTRING, POLYGON, " +
        "MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, RECT, or GEOMETRYCOLLECTION")
    }

    def end(): Unit = {
      ws()
      if (i < s.length) fail("trailing input")
    }
  }

  /** StaticInvoke-friendly: WKT text -> WKB bytes. */
  def toWkb(text: String): Array[Byte] = Wkb.write(parse(text))
}
