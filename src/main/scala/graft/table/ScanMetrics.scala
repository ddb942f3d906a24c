package graft.table

import org.apache.spark.GraftSparkShim
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte/row counting instrumentation (F10) — the Spark analog of the
  * reference's `CountingReader`/`CountingWriter` wrappers
  * (`io/counting_reader.rs:3-37`, `io/counting_writer.rs:4-50`): run an
  * action under a task-metrics listener and report what was actually
  * READ (bytes/records from Hadoop input metrics — row-group pruning and
  * column pruning are visible here, unlike plan-level file sizes). This
  * is how index-pruning claims become numbers, the analog of the
  * reference's "153 requests, 81 MB vs 310 requests, 340 MB" README
  * measurement; asserted in PlanQualitySpec.
  */
object ScanMetrics {

  final case class Scan(bytesRead: Long, recordsRead: Long, tasks: Long)

  /** Execute a count over the frame and sum task input metrics. */
  def measure(df: DataFrame): Scan = {
    val sc = df.sparkSession.sparkContext
    var bytes = 0L; var records = 0L; var tasks = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val im = te.taskMetrics.inputMetrics
        bytes += im.bytesRead
        records += im.recordsRead
        tasks += 1
      }
    }
    sc.addSparkListener(listener)
    try {
      // hash EVERY projected column so Catalyst can't column-prune the
      // measurement away (a bare count(1) reads zero columns)
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
      GraftSparkShim.drainListeners(sc)
    } finally sc.removeSparkListener(listener)
    Scan(bytes, records, tasks)
  }
}
