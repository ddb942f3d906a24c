package graft.sources

import graft.codec.FeatureCodec._
import graft.geom.{ScaledCoord, Wkb}

/** GeoJSON <-> engine converters — the analog of the reference's geozero
  * bridge (S8 ingest: `geomedea_geozero/src/geozero_writer.rs`, S9 export:
  * `geozero_reader.rs`). Hand-rolled recursive-descent JSON (zero deps,
  * coursier is offline); coordinates quantize with the reference's
  * truncation semantics (`geometry/mod.rs:295-297`) exactly like the
  * geozero ingest path. 3D coordinates: the z is dropped (the reference
  * skips 3d fixtures entirely, `geozero_writer.rs:738-741` — we accept
  * and truncate to 2D, a documented superset).
  */
object GeoJson {

  // --- minimal JSON value model -------------------------------------------

  sealed trait J
  case class JObj(fields: Vector[(String, J)]) extends J {
    def get(k: String): Option[J] = fields.find(_._1 == k).map(_._2)
  }
  case class JArr(items: Vector[J]) extends J
  case class JStr(s: String) extends J
  /** integral = the literal had no '.'/exponent — distinguishes JSON int
    * from float for typed property mapping (serde_json semantics).
    */
  case class JNum(d: Double, integral: Boolean = false) extends J
  case class JBool(b: Boolean) extends J
  case object JNull extends J

  def parseJson(s: String): J = new Parser(s).parse()

  private final class Parser(s: String) {
    private var i = 0
    def parse(): J = { val v = value(); ws(); require(i >= s.length, s"trailing junk at $i"); v }
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def value(): J = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => expect("true"); JBool(true)
        case 'f' => expect("false"); JBool(false)
        case 'n' => expect("null"); JNull
        case _   => num()
      }
    }
    private def expect(lit: String): Unit = {
      require(s.regionMatches(i, lit, 0, lit.length), s"expected $lit at $i")
      i += lit.length
    }
    private def obj(): JObj = {
      i += 1; ws()
      val fields = Vector.newBuilder[(String, J)]
      if (s.charAt(i) == '}') { i += 1; return JObj(fields.result()) }
      while (true) {
        ws(); val k = str(); ws(); require(s.charAt(i) == ':', s"expected : at $i"); i += 1
        fields += (k -> value()); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return JObj(fields.result())
          case c   => throw new IllegalArgumentException(s"unexpected '$c' at $i")
        }
      }
      JObj(fields.result())
    }
    private def arr(): JArr = {
      i += 1; ws()
      val items = Vector.newBuilder[J]
      if (s.charAt(i) == ']') { i += 1; return JArr(items.result()) }
      while (true) {
        items += value(); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; return JArr(items.result())
          case c   => throw new IllegalArgumentException(s"unexpected '$c' at $i")
        }
      }
      JArr(items.result())
    }
    private def str(): String = {
      require(s.charAt(i) == '"', s"expected string at $i"); i += 1
      val sb = new java.lang.StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case o => throw new IllegalArgumentException(s"bad escape \\$o")
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def num(): JNum = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      val tok = s.substring(start, i)
      JNum(tok.toDouble, integral = !tok.exists(c => c == '.' || c == 'e' || c == 'E'))
    }
  }

  // --- GeoJSON geometry -> engine Geom ------------------------------------

  private def coord(j: J): Long = j match {
    case JArr(items) =>
      // [lng, lat] or [lng, lat, z] (z dropped)
      Wkb.pack(
        ScaledCoord.toScaled(items(0).asInstanceOf[JNum].d),
        ScaledCoord.toScaled(items(1).asInstanceOf[JNum].d))
    case _ => throw new IllegalArgumentException("bad coordinate")
  }
  private def line(j: J): Array[Long] = j.asInstanceOf[JArr].items.map(coord).toArray
  private def rings(j: J): Vector[Array[Long]] = j.asInstanceOf[JArr].items.map(line)

  def geometry(j: J): Wkb.Geom = {
    val o = j.asInstanceOf[JObj]
    val tpe = o.get("type").collect { case JStr(t) => t }
      .getOrElse(throw new IllegalArgumentException("geometry without type"))
    def cs = o.get("coordinates").getOrElse(throw new IllegalArgumentException("no coordinates"))
    tpe match {
      case "Point"              => val p = coord(cs); Wkb.Pt(Wkb.lngOf(p), Wkb.latOf(p))
      case "LineString"         => Wkb.Line(line(cs))
      case "Polygon"            => Wkb.Poly(rings(cs))
      case "MultiPoint"         => Wkb.MultiPt(line(cs))
      case "MultiLineString"    => Wkb.MultiLine(rings(cs))
      case "MultiPolygon"       => Wkb.MultiPoly(cs.asInstanceOf[JArr].items.map(rings))
      case "GeometryCollection" =>
        val gs = o.get("geometries").getOrElse(JArr(Vector.empty)).asInstanceOf[JArr]
        Wkb.Collection(gs.items.map(geometry))
      case other => throw new IllegalArgumentException(s"unsupported geometry type $other")
    }
  }

  /** One parsed feature: WKB + TYPED insertion-ordered properties (F9 —
    * the reference's ordered property map, feature.rs:45-83, with the
    * typed variants of geomedea_geozero/src/lib.rs:14-56). `properties`
    * is the legacy flat-string view.
    */
  final case class Feature(wkb: Array[Byte], props: Vector[(String, PValue)]) {
    def properties: Vector[(String, String)] =
      props.map { case (k, v) => k -> propValueString(v) }
  }

  /** JSON value -> typed PropertyValue, mirroring geozero's geojson
    * reader + the geozero->geomedea mapping (geomedea_geozero/src/lib.rs:
    * 37-56): bool -> Bool; integral number -> Int64 (UInt64 when above
    * i64::MAX); other number -> Float64; string -> String; arrays/objects
    * -> their JSON text as String (geozero ColumnValue::Json -> String);
    * null -> dropped (geozero skips null-valued properties).
    */
  def propValue(j: J): Option[PValue] = j match {
    case JBool(b) => Some(PBool(b))
    // strict upper bound: Long.MaxValue.toDouble rounds UP to exactly 2^63,
    // so `d <= that` would route 2^63 into the Int64 arm and silently clamp
    // it to Long.MaxValue — serde_json's u64 arm owns [2^63, 2^64)
    case JNum(d, true) if d >= Long.MinValue.toDouble && d < 9.223372036854776e18 =>
      Some(PInt64(d.toLong))
    case JNum(d, true) if d >= 9.223372036854776e18 && d < 1.8446744073709552e19 =>
      Some(PUInt64(new java.math.BigDecimal(d).toBigInteger.longValue()))
    case JNum(d, _) => Some(PFloat64(d))
    case JStr(s)    => Some(PString(s))
    case JNull      => None
    case other      => Some(PString(renderJson(other)))
  }

  def propValueString(v: PValue): String = v match {
    case PBool(b)    => b.toString
    case PInt64(x)   => x.toString
    case PUInt64(x)  => java.lang.Long.toUnsignedString(x)
    case PFloat64(d) => if (d == d.toLong) d.toLong.toString else d.toString
    case PString(s)  => s
    case other       => other.toString
  }

  /** Typed value -> JSON text (the export side of the typed mapping). */
  def propValueJson(v: PValue): String = v match {
    case PBool(b)    => b.toString
    case PInt8(x)    => x.toString
    case PUInt8(x)   => x.toString
    case PInt16(x)   => x.toString
    case PUInt16(x)  => x.toString
    case PInt32(x)   => x.toString
    case PUInt32(x)  => x.toString
    case PInt64(x)   => x.toString
    case PUInt64(x)  => java.lang.Long.toUnsignedString(x)
    case PFloat32(f) => floatJson(f.toDouble)
    case PFloat64(d) => floatJson(d)
    case PBytes(b)   => "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\""
    case PString(s)  => quoteJson(s)
    case PVec(xs)    => xs.map(propValueJson).mkString("[", ",", "]")
    case PMap(ps)    => ps.map { case (k, x) => s"${quoteJson(k)}:${propValueJson(x)}" }.mkString("{", ",", "}")
  }

  /** keep floats floats on reparse: whole doubles render with ".0" */
  private def floatJson(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString

  def quoteJson(s: String): String = {
    val sb = new java.lang.StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  private def renderJson(j: J): String = j match {
    case JObj(fs)   => fs.map { case (k, v) => s"${quoteJson(k)}:${renderJson(v)}" }.mkString("{", ",", "}")
    case JArr(xs)   => xs.map(renderJson).mkString("[", ",", "]")
    case JStr(s)    => quoteJson(s)
    case JNum(d, i) => if (i && d == d.toLong) d.toLong.toString else d.toString
    case JBool(b)   => b.toString
    case JNull      => "null"
  }

  def feature(j: J): Feature = {
    val o = j.asInstanceOf[JObj]
    // RFC 7946 allows "geometry": null for unlocated features — same
    // degradation path as a missing key, never a cast crash
    val geom = o.get("geometry").filter(_ != JNull).map(geometry)
      .getOrElse(Wkb.Pt(0, 0)) // geometry-less degrades to POINT(0 0), geozero_writer.rs:50-61
    val props = o.get("properties") match {
      case Some(JObj(fields)) =>
        fields.flatMap { case (k, v) => propValue(v).map(k -> _) }
      case _ => Vector.empty
    }
    Feature(Wkb.write(geom), props)
  }

  /** Parse a GeoJSON document (FeatureCollection / Feature / bare geometry). */
  def features(doc: String): Vector[Feature] = {
    parseJson(doc) match {
      case o: JObj =>
        o.get("type") match {
          case Some(JStr("FeatureCollection")) =>
            o.get("features").getOrElse(JArr(Vector.empty)).asInstanceOf[JArr].items.map(feature)
          case Some(JStr("Feature")) => Vector(feature(o))
          case Some(JStr(_))         => Vector(Feature(Wkb.write(geometry(o)), Vector.empty))
          case _                     => throw new IllegalArgumentException("not a GeoJSON document")
        }
      case _ => throw new IllegalArgumentException("not a GeoJSON object")
    }
  }

  // --- engine -> GeoJSON (export, S9/F11) ----------------------------------

  def geometryJson(g: Wkb.Geom): String = {
    def c(p: Long) = s"[${ScaledCoord.toDegrees(Wkb.lngOf(p))},${ScaledCoord.toDegrees(Wkb.latOf(p))}]"
    def l(cs: Array[Long]) = cs.map(c).mkString("[", ",", "]")
    def rs(r: Vector[Array[Long]]) = r.map(l).mkString("[", ",", "]")
    g match {
      case Wkb.Pt(lng, lat)  => s"""{"type":"Point","coordinates":${c(Wkb.pack(lng, lat))}}"""
      case Wkb.Line(cs)      => s"""{"type":"LineString","coordinates":${l(cs)}}"""
      case Wkb.Poly(r)       => s"""{"type":"Polygon","coordinates":${rs(r)}}"""
      case Wkb.MultiPt(cs)   => s"""{"type":"MultiPoint","coordinates":${l(cs)}}"""
      case Wkb.MultiLine(ls) => s"""{"type":"MultiLineString","coordinates":${rs(ls)}}"""
      case Wkb.MultiPoly(ps) => s"""{"type":"MultiPolygon","coordinates":${ps.map(rs).mkString("[", ",", "]")}}"""
      case Wkb.Collection(gs) =>
        s"""{"type":"GeometryCollection","geometries":${gs.map(geometryJson).mkString("[", ",", "]")}}"""
    }
  }

  /** StaticInvoke-friendly: WKB bytes -> GeoJSON geometry string. */
  def wkbToGeoJson(wkb: Array[Byte]): String = geometryJson(Wkb.read(wkb))
}
