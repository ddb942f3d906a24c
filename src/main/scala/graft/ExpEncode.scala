package graft

import graft.jobs.Ingest
import graft.table.InterleavedDocs
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B experiment: parquet writer options on the ingest layout
  * (optimization-round instrumentation; not part of the bench record).
  */
object ExpEncode {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tableDir =
      java.nio.file.Files.createTempDirectory("graft_exp_src").toString + "/docs"
    Bench.benchDocs(spark, 2000000L, 32).write.option("compression", "zstd").parquet(tableDir)
    val docsTable = spark.read.parquet(tableDir)
    // pre-shuffled, sorted input: isolate ONLY the encode+write
    val geo = InterleavedDocs.withGeometry(docsTable)
    val clustered = Ingest.withHilbert(geo, Ingest.extent(geo))
      .repartitionByRange(cpus, col("hilbert").desc)
      .sortWithinPartitions(col("hilbert").desc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clustered.count()
    def rm(dir: String): Unit =
      try java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      catch { case _: Exception => () }
    def sizeOf(dir: String): Long = {
      var s = 0L
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .forEach(p => if (java.nio.file.Files.isRegularFile(p)) s += java.nio.file.Files.size(p))
      s
    }
    def variant(name: String, opts: Map[String, String]): Unit = {
      val runs = (0 until 4).map { _ =>
        val out = java.nio.file.Files.createTempDirectory("graft_exp").toString + "/docs"
        val w = clustered.write.mode(SaveMode.Overwrite)
        opts.foreach { case (k, v) => w.option(k, v) }
        val t = time(w.parquet(out))
        val sz = sizeOf(out)
        rm(out)
        (t, sz)
      }
      println(f"$name%-40s min ${runs.map(_._1).min}%.3f s  runs ${runs.map(r => f"${r._1}%.3f").mkString(",")}  bytes ${runs.head._2}")
    }
    variant("zstd1+dict (current)", Map(
      "compression" -> "zstd", "parquet.compression.codec.zstd.level" -> "1"))
    variant("zstd1+nodict", Map(
      "compression" -> "zstd", "parquet.compression.codec.zstd.level" -> "1",
      "parquet.enable.dictionary" -> "false"))
    variant("zstd1+dict+bloomoff+page2m", Map(
      "compression" -> "zstd", "parquet.compression.codec.zstd.level" -> "1",
      "parquet.page.size" -> "2097152"))
    variant("zstd1+nodict+page2m", Map(
      "compression" -> "zstd", "parquet.compression.codec.zstd.level" -> "1",
      "parquet.enable.dictionary" -> "false", "parquet.page.size" -> "2097152"))
    spark.stop()
  }
}
