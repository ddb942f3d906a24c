package graft.sources

import graft.codec.FeatureCodec.Feature
import graft.expr.GraftFunctions._
import graft.sources.GeoJsonIngest.PropCell
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark <-> single-file container bridge: lets a reference user's
  * existing `.geomedea` files flow through the engine (S8/S9 for the
  * native format, alongside the GeoJSON bridge).
  *
  * The container is a single-node format (one header + one index +
  * sequential pages), so [[read]] decodes on the driver and
  * parallelizes rows, and [[write]] collects — both bounded by
  * [[MaxFileBytes]]. The 100 TB path is `Ingest.write`'s parquet layout;
  * this bridge is for interop at the reference's own file sizes (its
  * published fixtures are 5-13 MB).
  */
object GeomedeaSpark {

  val MaxFileBytes: Long = 256L << 20

  /** .geomedea file -> the engine's geometry frame (wkb + typed props +
    * envelope stat columns), in the file's Hilbert layout order.
    * feature_id is the layout-order index (a full scan sees every
    * feature, so the index is a stable id here; the pruned [[readDir]]
    * uses the format's FeatureLocation instead).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(bytes.length <= MaxFileBytes, s"${bytes.length} bytes > $MaxFileBytes")
    val rows = GeomedeaFile.selectAll(bytes).zipWithIndex.map { case (f, i) =>
      GeoJsonIngest.FeatRow(i.toLong, graft.geom.Wkb.write(f.geom),
        f.props.map { case (k, v) => GeoJsonIngest.toCell(k, v) },
        f.props.map(_._1),
        f.props.map { case (_, v) => GeoJson.propValueString(v) })
    }
    GeoJsonIngest.withEnvelope(rows.toDF())
  }

  /** Distributed scan over a DIRECTORY of .geomedea files — the 100 TB
    * interop shape (a data lake of reference-format files): Spark's
    * binaryFile source plans one split per file, each executor decodes
    * its files with the same driver-free codec, and an optional bbox
    * prunes per file via the embedded R-tree BEFORE decoding features
    * (the reference's indexed read, S5/S7, running fan-out-parallel).
    */
  def readDir(spark: SparkSession, dir: String,
              bbox: Option[graft.geom.Envelope] = None): DataFrame = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.geomedea")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          // located variants: (page_offset, feature_offset) is the
          // format's own per-feature id, IDENTICAL for the same feature
          // whether the scan was pruned or full (a scan-relative index
          // would not be)
          val feats = bbox match {
            case Some(q) => GeomedeaFile.selectBboxLocated(bytes, q)
            case None    => GeomedeaFile.selectAllLocated(bytes)
          }
          feats.iterator.map { case ((pageOff, featOff), f) =>
            (path, pageOff, featOff, graft.geom.Wkb.write(f.geom),
              f.props.map { case (k, v) => GeoJsonIngest.toCell(k, v) },
              f.props.map(_._1),
              f.props.map { case (_, v) => GeoJson.propValueString(v) })
          }
        }
      }
      .toDF("source_file", "page_offset", "feature_offset", "wkb", "props",
        "prop_keys", "prop_vals")
    GeoJsonIngest.withEnvelope(rows)
  }

  /** Geometry frame (wkb + props) -> .geomedea file bytes on disk. The
    * writer applies the format's own Hilbert-desc layout; input order is
    * irrelevant.
    */
  def write(df: DataFrame, path: String, compressed: Boolean,
            pageSizeGoal: Long = GeomedeaFile.DefaultPageSizeGoal): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val feats = df.select(col("wkb"), col("props"))
      .as[(Array[Byte], Seq[PropCell])]
      .collect()
      .map { case (wkb, cells) =>
        Feature(graft.geom.Wkb.read(wkb), cells.map(GeoJsonIngest.fromCell).toVector)
      }
    val bytes = GeomedeaFile.write(feats.toSeq, compressed, pageSizeGoal)
    require(bytes.length <= MaxFileBytes, s"${bytes.length} bytes > $MaxFileBytes")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }
}
