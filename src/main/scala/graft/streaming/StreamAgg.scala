package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregation (SURVEY §2.9 extension): watermarked
  * tumbling-window aggregates and gap-based sessionization with custom
  * state (`flatMapGroupsWithState`) — the two Structured-Streaming
  * patterns a 100 TB event pipeline needs beyond plain micro-batch
  * append. Both operate on the `events` table shape
  * (event_id, ts timestamp, user_id, event_type, value).
  */
object StreamAgg {

  /** Tumbling-window per-type counts/sums with a watermark: in append
    * mode a window emits exactly once, when the watermark passes its end
    * (late rows beyond the watermark are dropped — asserted in tests).
    */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, start: Long, end: Long, n: Long, total: Double)

  /** Gap-based sessionization per user via flatMapGroupsWithState:
    * events within `gapMinutes` of the session's end extend it; a larger
    * gap closes and emits it; the event-time timeout (watermark + gap)
    * flushes a user's open session once no on-time event can extend it.
    * State per key is one small Session — O(users) state, no event
    * buffering.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, rows: Iterator[Ev], state: GroupState[Session]): Iterator[Session] = {
      if (rows.isEmpty && state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(s)
      } else {
        val evs = rows.toArray.sortBy(_.ts.getTime)
        val closed = Vector.newBuilder[Session]
        var cur = state.getOption
        evs.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1, total = s.total + e.value))
            case Some(s) =>
              closed += s
              cur = Some(Session(userId, t, t, 1, e.value))
            case None =>
              cur = Some(Session(userId, t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // flush once the watermark passes end + gap (no on-time event
          // can extend this session any more)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Batch oracle for [[sessionize]]: the same gap sessions via windowed
    * lag/cumulative-sum SQL — runs on the static table.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapMs = gapMinutes * 60000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ms")
    events
      .select(col("user_id"), (col("ts").cast("double") * 1000).cast("long").as("ts_ms"), col("value"))
      .withColumn("prev", lag("ts_ms", 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_ms") - col("prev") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts_ms")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(min("ts_ms").as("start"), max("ts_ms").as("end"),
        count(lit(1)).as("n"), sum("value").as("total"))
      .select("user_id", "start", "end", "n", "total")
  }
}
