package graft

import graft.geom.{Envelope, PointInPolygon, ScaledCoord, Wkb}
import graft.sources.{GeoJson, GeoJsonIngest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** GeoJSON bridge goldens against the reference's own test fixtures
  * (read-only at /root/reference/test_fixtures — values from
  * geomedea_geozero tests, code written from scratch).
  */
class GeoJsonSpec extends AnyFunSuite {
  val Fixtures = "/root/reference/test_fixtures"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("countries.geojson: bbox (24,-4)-(24.5,-3.5) hits the DR Congo polygon") {
    // reference golden: geozero_writer.rs:701-731
    val df = GeoJsonIngest.fromFeatureCollection(spark, s"$Fixtures/countries.geojson")
    assert(df.count() > 100) // world countries
    val q = Envelope.fromDegrees(24, -4, 24.5, -3.5)
    val hits = df.where(
      col("max_lng") >= q.minLng && col("max_lat") >= q.minLat &&
        col("min_lng") <= q.maxLng && col("min_lat") <= q.maxLat)
      .collect()
    val names = hits.map { r =>
      val ks = r.getSeq[String](r.fieldIndex("prop_keys")); val vs = r.getSeq[String](r.fieldIndex("prop_vals"))
      ks.zip(vs).toMap.getOrElse("name", "")
    }
    assert(names.contains("Democratic Republic of the Congo"), s"got ${names.toSeq}")
    // exact PIP refinement on the bbox center also lands in DR Congo
    val drc = hits.find { r =>
      val ks = r.getSeq[String](r.fieldIndex("prop_keys")); val vs = r.getSeq[String](r.fieldIndex("prop_vals"))
      ks.zip(vs).toMap.get("name").contains("Democratic Republic of the Congo")
    }.get
    assert(PointInPolygon.containsWkb(drc.getAs[Array[Byte]]("wkb"),
      ScaledCoord.toScaled(24.25), ScaledCoord.toScaled(-3.75)))
  }

  test("places.json: feature count 1249; bbox (90,40)-(100,50) -> 3 features") {
    // reference goldens: geozero_writer.rs:645-663 (1249), benches/file_read.rs:30-44 (3)
    val df = GeoJsonIngest.fromFeatureCollection(spark, s"$Fixtures/places.json")
    assert(df.count() == 1249)
    val q = Envelope.fromDegrees(90, 40, 100, 50)
    val n = df.where(
      col("max_lng") >= q.minLng && col("max_lat") >= q.minLat &&
        col("min_lng") <= q.maxLng && col("min_lat") <= q.maxLat).count()
    assert(n == 3)
  }

  test("canonical-geojson corpus roundtrips through WKB (normalized)") {
    val dir = Paths.get(s"$Fixtures/canonical-geojson")
    val files = Files.list(dir).toArray.map(_.toString)
      .filter(f => f.endsWith(".geojson") && !f.contains("3d") && !f.contains("nullgeometry"))
    assert(files.length >= 10)
    files.foreach { f =>
      val doc = new String(Files.readAllBytes(Paths.get(f)))
      val feats = GeoJson.features(doc)
      assert(feats.nonEmpty, f)
      feats.foreach { feat =>
        val g = Wkb.read(feat.wkb)
        val g2 = Wkb.read(Wkb.write(g)) // reserialize
        assert(Wkb.asText(g2) == Wkb.asText(g), f)
        // export -> reparse -> same WKT (1e-7 quantized fixpoint)
        val exported = GeoJson.geometryJson(g)
        val reparsed = GeoJson.geometry(GeoJson.parseJson(exported))
        assert(Wkb.asText(reparsed) == Wkb.asText(g), f)
      }
    }
  }

  test("export job emits parseable features preserving property order") {
    val df = GeoJsonIngest.fromFeatureCollection(spark, s"$Fixtures/countries.geojson").limit(5)
    val out = GeoJsonIngest.toGeoJsonFeatures(df).collect().map(_.getString(0))
    assert(out.length == 5)
    out.foreach { line =>
      val parsed = GeoJson.features(line)
      assert(parsed.length == 1)
    }
  }
}
