package graft.sources

import graft.codec.FeatureCodec._
import graft.expr.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-facing GeoJSON ingest (S8): produces the engine's geometry frame
  * (wkb + envelope int stat columns + ordered TYPED properties), ready
  * for Ingest.write's Hilbert layout.
  *
  * Properties travel as `props: array<struct<key,kind,b,i,d,s,bin,vec,
  * kvs>>` — a tagged union covering ALL 15 of the reference's
  * PropertyValue variants: 13 scalars plus typed Vec (ArrayType of the
  * scalar union) and typed ordered Map (the reference's own bridge
  * rejects Vec/Map outright, geomedea_geozero/src/lib.rs:32-34, so this
  * exceeds format parity there). `prop_keys`/`prop_vals` remain as the
  * legacy flat-string view.
  *
  * Two paths:
  *  - [[fromFeatureCollection]]: one whole-document FeatureCollection
  *    (test fixtures, small reference datasets) — parsed on the driver,
  *    parallelized as rows.
  *  - [[fromJsonLines]]: newline-delimited GeoJSON features (the scale
  *    path: the text source splits by line, features parse per partition
  *    via the typed Dataset API — no driver bottleneck).
  */
object GeoJsonIngest {

  /** One typed SCALAR value — the leaf of the tagged union. kind is one
    * of bool,i8,u8,i16,u16,i32,u32,i64,u64,f32,f64,bytes,string; exactly
    * one value field is set (unsigned values carry their raw bits in
    * `i`).
    */
  final case class PropScalar(kind: String,
                              b: Option[Boolean] = None, i: Option[Long] = None,
                              d: Option[Double] = None, s: Option[String] = None,
                              bin: Option[Array[Byte]] = None)

  /** One (k, v) entry of a typed Map property — array<struct>, NOT Spark
    * MapType, because the reference's property maps are insertion-ordered
    * (`feature.rs:45-83`) and MapType would lose the order.
    */
  final case class PropEntry(k: String, v: PropScalar)

  /** Columnar tagged union for one typed property: the 13 scalar kinds
    * (value in the PropScalar-shaped fields) plus kind=vec (typed
    * elements in `vec`: ArrayType of the scalar union) and kind=map
    * (typed ordered entries in `kvs`). One level of typed nesting —
    * already beyond the reference's own Spark-facing bridge, which
    * rejects Vec/Map outright (`geomedea_geozero/src/lib.rs:32-34`);
    * deeper nesting (vec-of-vec) stays codec-only (FeatureCodec carries
    * it byte-exactly) and is rejected here with a clear error.
    */
  final case class PropCell(key: String, kind: String,
                            b: Option[Boolean] = None, i: Option[Long] = None,
                            d: Option[Double] = None, s: Option[String] = None,
                            bin: Option[Array[Byte]] = None,
                            vec: Option[Seq[PropScalar]] = None,
                            kvs: Option[Seq[PropEntry]] = None)

  def toScalar(v: PValue): PropScalar = v match {
    case PBool(x)    => PropScalar("bool", b = Some(x))
    case PInt8(x)    => PropScalar("i8", i = Some(x.toLong))
    case PUInt8(x)   => PropScalar("u8", i = Some(x.toLong))
    case PInt16(x)   => PropScalar("i16", i = Some(x.toLong))
    case PUInt16(x)  => PropScalar("u16", i = Some(x.toLong))
    case PInt32(x)   => PropScalar("i32", i = Some(x.toLong))
    case PUInt32(x)  => PropScalar("u32", i = Some(x))
    case PInt64(x)   => PropScalar("i64", i = Some(x))
    case PUInt64(x)  => PropScalar("u64", i = Some(x))
    case PFloat32(x) => PropScalar("f32", d = Some(x.toDouble))
    case PFloat64(x) => PropScalar("f64", d = Some(x))
    case PBytes(x)   => PropScalar("bytes", bin = Some(x))
    case PString(x)  => PropScalar("string", s = Some(x))
    case other       =>
      throw new IllegalArgumentException(
        s"columnar bridge carries one level of Vec/Map nesting; got nested $other")
  }

  def fromScalar(c: PropScalar): PValue = c.kind match {
    case "bool"   => PBool(c.b.get)
    case "i8"     => PInt8(c.i.get.toByte)
    case "u8"     => PUInt8(c.i.get.toInt)
    case "i16"    => PInt16(c.i.get.toShort)
    case "u16"    => PUInt16(c.i.get.toInt)
    case "i32"    => PInt32(c.i.get.toInt)
    case "u32"    => PUInt32(c.i.get)
    case "i64"    => PInt64(c.i.get)
    case "u64"    => PUInt64(c.i.get)
    case "f32"    => PFloat32(c.d.get.toFloat)
    case "f64"    => PFloat64(c.d.get)
    case "bytes"  => PBytes(c.bin.get)
    case "string" => PString(c.s.get)
    case k        => throw new IllegalArgumentException(s"unknown prop kind $k")
  }

  def toCell(key: String, v: PValue): PropCell = v match {
    case PVec(xs) => PropCell(key, "vec", vec = Some(xs.map(toScalar)))
    case PMap(ps) => PropCell(key, "map",
      kvs = Some(ps.map { case (k, x) => PropEntry(k, toScalar(x)) }))
    case scalar =>
      val sc = toScalar(scalar)
      PropCell(key, sc.kind, sc.b, sc.i, sc.d, sc.s, sc.bin)
  }

  def fromCell(c: PropCell): (String, PValue) = c.key -> (c.kind match {
    case "vec" => PVec(c.vec.get.map(fromScalar).toVector)
    case "map" => PMap(c.kvs.get.map(e => e.k -> fromScalar(e.v)).toVector)
    case _     => fromScalar(PropScalar(c.kind, c.b, c.i, c.d, c.s, c.bin))
  })

  final case class FeatRow(feature_id: Long, wkb: Array[Byte], props: Seq[PropCell],
                           prop_keys: Seq[String], prop_vals: Seq[String])

  private def toRow(f: GeoJson.Feature, i: Long): FeatRow =
    FeatRow(i, f.wkb, f.props.map { case (k, v) => toCell(k, v) },
      f.properties.map(_._1), f.properties.map(_._2))

  private[sources] def withEnvelope(df: DataFrame): DataFrame =
    df.withColumn("env", stEnvelope(col("wkb")))
      .select(col("*"),
        col("env.min_lng").as("min_lng"), col("env.min_lat").as("min_lat"),
        col("env.max_lng").as("max_lng"), col("env.max_lat").as("max_lat"))
      .drop("env")

  def fromFeatureCollection(spark: SparkSession, path: String): DataFrame = {
    val doc = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    import spark.implicits._
    withEnvelope(GeoJson.features(doc).zipWithIndex
      .map { case (f, i) => toRow(f, i.toLong) }.toDF())
  }

  def fromJsonLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.read.textFile(path)
      .filter(l => l.trim.nonEmpty)
      .mapPartitions { it =>
        it.map { line =>
          toRow(GeoJson.features(line.trim.stripSuffix(",")).head, 0L)
        }
      }
      .drop("feature_id")
      .withColumn("feature_id", monotonically_increasing_id())
    withEnvelope(parsed)
  }

  /** CSV export — the geozero CsvWriter analog (the reference replays
    * features into ANY geozero processor, `geozero_reader.rs:172-188`;
    * its README measures a 106 MB CSV extract). Column set follows
    * geozero's CsvWriter contract: `geometry` (WKT) + the FIRST
    * feature's property keys; later features contribute the values they
    * have under those keys (missing -> null). Returns a plain typed
    * DataFrame — `df.write.option("header", true).csv(dir)` then emits
    * reference-shaped CSV with Spark handling RFC-4180 quoting, in
    * parallel (the 100 TB path: no driver collect, one task per
    * partition).
    */
  def toCsvFrame(df: DataFrame): DataFrame = {
    // empty input -> geometry-only header (geozero emits headers from
    // the first feature; with none, only the geometry column exists)
    val keys = df.select("prop_keys").take(1).headOption
      .map(_.getSeq[String](0).distinct).getOrElse(Seq.empty)
    // props are an ORDERED list that permits duplicate keys; keep each
    // key's FIRST occurrence (geozero-style pick-one) so a repeated key
    // degrades gracefully instead of failing the whole export with
    // Spark's DUPLICATED_MAP_KEY (default mapKeyDedupPolicy=EXCEPTION)
    val firsts = filter(arrays_zip(col("prop_keys"), col("prop_vals")),
      (pr, i) => array_position(col("prop_keys"), pr("prop_keys")) === i + 1)
    val byKey = map_from_entries(firsts)
    df.select(stAsText(col("wkb")).as("geometry") +:
      keys.map(k => element_at(byKey, k).as(k)): _*)
  }

  /** CSV import — the inverse of [[toCsvFrame]] (geozero's bridge is
    * any-direction; CSV is one of its source formats). Input: any
    * DataFrame with a `geometry` WKT column (e.g. from
    * `spark.read.option("header", true).csv(dir)` — the scale path: the
    * CSV source splits by line and this is a per-row map). Every other
    * column becomes a string property in column order (CSV is untyped —
    * geozero surfaces strings; cast downstream if needed); null cells
    * (empty CSV fields) are dropped like GeoJSON nulls.
    */
  def fromCsvFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns
    val geomIdx = cols.indexOf("geometry")
    require(geomIdx >= 0, s"CSV import needs a geometry WKT column; got ${cols.mkString(",")}")
    val propCols = cols.zipWithIndex.filter(_._1 != "geometry")
    val parsed = df.map { row =>
      require(!row.isNullAt(geomIdx), "CSV row with empty geometry cell")
      val wkb = graft.geom.Wkb.write(graft.geom.Wkt.parse(row.getString(geomIdx)))
      val props = propCols.toSeq.collect {
        case (name, i) if !row.isNullAt(i) => name -> row.get(i).toString
      }
      FeatRow(0L, wkb, props.map { case (k, v) => toCell(k, PString(v)) },
        props.map(_._1), props.map(_._2))
    }
    withEnvelope(parsed.toDF()
      .drop("feature_id")
      .withColumn("feature_id", monotonically_increasing_id()))
  }

  /** Export (S9): geometry frame -> GeoJSON feature strings with TYPED
    * property values (bool/number/string render unquoted-JSON-typed,
    * mirroring geozero_reader.rs's ColumnValue emission).
    */
  def toGeoJsonFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("wkb"), col("props"))
      .as[(Array[Byte], Seq[PropCell])]
      .map { case (wkb, cells) =>
        val props = cells.map { c =>
          val (k, v) = fromCell(c)
          s"${GeoJson.quoteJson(k)}:${GeoJson.propValueJson(v)}"
        }.mkString("{", ",", "}")
        s"""{"type":"Feature","geometry":${GeoJson.wkbToGeoJson(wkb)},"properties":$props}"""
      }.toDF("feature_json")
  }
}
