package graft.sources

import graft.codec.FeatureCodec._
import graft.expr.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-facing GeoJSON ingest (S8): produces the engine's geometry frame
  * (wkb + envelope int stat columns + ordered TYPED properties), ready
  * for Ingest.write's Hilbert layout.
  *
  * Properties travel as `props: array<struct<key,kind,b,i,d,s,bin>>` — a
  * tagged union covering the reference's 13 scalar PropertyValue variants
  * (geomedea_geozero/src/lib.rs:14-56; Vec/Map are rejected there too,
  * `todo!("handle unsupported")`). `prop_keys`/`prop_vals` remain as the
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

  /** Columnar tagged union for one typed property. kind is one of
    * bool,i8,u8,i16,u16,i32,u32,i64,u64,f32,f64,bytes,string; exactly one
    * value field is set (unsigned values carry their raw bits in `i`).
    */
  final case class PropCell(key: String, kind: String,
                            b: Option[Boolean] = None, i: Option[Long] = None,
                            d: Option[Double] = None, s: Option[String] = None,
                            bin: Option[Array[Byte]] = None)

  def toCell(key: String, v: PValue): PropCell = v match {
    case PBool(x)    => PropCell(key, "bool", b = Some(x))
    case PInt8(x)    => PropCell(key, "i8", i = Some(x.toLong))
    case PUInt8(x)   => PropCell(key, "u8", i = Some(x.toLong))
    case PInt16(x)   => PropCell(key, "i16", i = Some(x.toLong))
    case PUInt16(x)  => PropCell(key, "u16", i = Some(x.toLong))
    case PInt32(x)   => PropCell(key, "i32", i = Some(x.toLong))
    case PUInt32(x)  => PropCell(key, "u32", i = Some(x))
    case PInt64(x)   => PropCell(key, "i64", i = Some(x))
    case PUInt64(x)  => PropCell(key, "u64", i = Some(x))
    case PFloat32(x) => PropCell(key, "f32", d = Some(x.toDouble))
    case PFloat64(x) => PropCell(key, "f64", d = Some(x))
    case PBytes(x)   => PropCell(key, "bytes", bin = Some(x))
    case PString(x)  => PropCell(key, "string", s = Some(x))
    case other       => // mirror the reference bridge: Vec/Map unsupported
      throw new IllegalArgumentException(s"unsupported columnar property: $other")
  }

  def fromCell(c: PropCell): (String, PValue) = c.key -> (c.kind match {
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
