package graft.sources

import graft.expr.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-facing GeoJSON ingest (S8): produces the engine's geometry frame
  * (wkb + envelope int stat columns + ordered properties), ready for
  * Ingest.write's Hilbert layout.
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

  final case class FeatRow(feature_id: Long, wkb: Array[Byte],
                           prop_keys: Seq[String], prop_vals: Seq[String])

  private def toDf(spark: SparkSession, feats: Seq[(GeoJson.Feature, Long)]): DataFrame = {
    import spark.implicits._
    feats.map { case (f, i) =>
      FeatRow(i, f.wkb, f.properties.map(_._1), f.properties.map(_._2))
    }.toDF()
  }

  private def withEnvelope(df: DataFrame): DataFrame =
    df.withColumn("env", stEnvelope(col("wkb")))
      .select(col("*"),
        col("env.min_lng").as("min_lng"), col("env.min_lat").as("min_lat"),
        col("env.max_lng").as("max_lng"), col("env.max_lat").as("max_lat"))
      .drop("env")

  def fromFeatureCollection(spark: SparkSession, path: String): DataFrame = {
    val doc = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    withEnvelope(toDf(spark, GeoJson.features(doc).zipWithIndex.map { case (f, i) => (f, i.toLong) }))
  }

  def fromJsonLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.read.textFile(path)
      .filter(l => l.trim.nonEmpty)
      .mapPartitions { it =>
        it.map { line =>
          val f = GeoJson.features(line.trim.stripSuffix(",")).head
          (f.wkb, f.properties.map(_._1), f.properties.map(_._2))
        }
      }
      .toDF("wkb", "prop_keys", "prop_vals")
      .withColumn("feature_id", monotonically_increasing_id())
    withEnvelope(parsed)
  }

  /** Export (S9): geometry frame -> GeoJSON feature strings. */
  def toGeoJsonFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("wkb"), col("prop_keys"), col("prop_vals"))
      .as[(Array[Byte], Seq[String], Seq[String])]
      .map { case (wkb, ks, vs) =>
        val props = ks.zip(vs).map { case (k, v) =>
          "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\":\"" +
            v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        }.mkString("{", ",", "}")
        s"""{"type":"Feature","geometry":${GeoJson.wkbToGeoJson(wkb)},"properties":$props}"""
      }.toDF("feature_json")
  }
}
