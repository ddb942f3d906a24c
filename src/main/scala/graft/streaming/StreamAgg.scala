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

  /** State for [[sessionize]]: the user's sessions still extendable by
    * an on-time event, disjoint and separated by more than the gap.
    */
  final case class OpenSessions(open: Seq[Session])

  /** Gap-based sessionization per user via flatMapGroupsWithState.
    * State per key is the user's OPEN sessions (those an on-time event
    * could still extend) — a LIST, not just the newest one: an
    * out-of-order event inside the watermark may open a session BEFORE
    * the current one, or bridge two of them, and single-session state
    * silently merged such events into whatever happened to be open
    * (wrong start, wrong count — the batch oracle disagreed). Each batch
    * interval-merges state + events (sort by start, join runs whose
    * gap <= gapMs), emits every session the watermark has sealed
    * (end + gap <= watermark: no on-time event can extend it), and
    * keeps the rest with an event-time timeout at the earliest seal
    * point. State is O(sessions-per-watermark-window), still bounded —
    * never an event buffer.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, rows: Iterator[Ev],
           state: GroupState[OpenSessions]): Iterator[Session] = {
      val wm = state.getCurrentWatermarkMs()
      val prior = state.getOption.map(_.open).getOrElse(Seq.empty)
      val units = rows.map(e =>
        Session(userId, e.ts.getTime, e.ts.getTime, 1, e.value)).toVector
      val all = (prior ++ units).sortBy(s => (s.start, s.end))
      val merged = Vector.newBuilder[Session]
      var cur: Session = null
      all.foreach { s =>
        if (cur == null) cur = s
        else if (s.start - cur.end <= gapMs)
          cur = Session(userId, cur.start, math.max(cur.end, s.end),
            cur.n + s.n, cur.total + s.total)
        else { merged += cur; cur = s }
      }
      if (cur != null) merged += cur
      // sealed at <=: a would-be extender of such a session has
      // ts <= end + gap <= wm, i.e. at-or-behind the watermark (dropped
      // before reaching this function) — and the strict > on the kept
      // side keeps setTimeoutTimestamp legal (must exceed the watermark)
      val (closed, open) = merged.result().partition(_.end + gapMs <= wm)
      if (open.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(OpenSessions(open))
        state.setTimeoutTimestamp(open.map(_.end).min + gapMs)
      }
      closed.iterator
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
