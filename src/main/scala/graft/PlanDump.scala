package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query (optimization-
  * round evidence): args = <sfDir> <outDir> [nameRegex]. Query closures
  * may run setup jobs (temp lakes, streams) — use a small SF.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val nameFilter = args.lift(2).map(_.r)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"[plandump] $name ok")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
