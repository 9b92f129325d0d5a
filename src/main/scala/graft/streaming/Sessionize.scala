package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization of the events stream
  * via flatMapGroupsWithState — the KeyValueGroupedDataset custom-state
  * shape (per-user state = open session; a new event either extends it or
  * closes it and opens the next). Event-time watermark bounds state.
  */
object Sessionize {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  /** State carries MICROSECOND epochs — java.sql.Timestamp.getTime is
    * millis-only and would truncate session boundaries. */
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                           n_events: Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Sessions closed by a gap > gapMs. Emits closed sessions; the open one
    * stays in state (flushed on timeout in a real run). */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, fromMicros(s.start), fromMicros(s.last), s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapMs * 1000L =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += Session(user, fromMicros(s.start), fromMicros(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000L + gapMs)
            }
            closed.result().iterator
          }
        })
  }

  /** BATCH gap-sessionization over a bounded events table — identical
    * session semantics to the streaming path above (a gap > gapMs opens a
    * new session; ties broken by event_id), including the final
    * still-open session of every user.
    *
    * Scale shape: per-user lag + running boundary count. The window is
    * per-key LINEAR (one pass per user after the user shuffle) — unlike the
    * per-key top-k windows this engine replaces with aggregates, a
    * sessionization window does O(events-of-user) work on O(events-of-user)
    * rows, so skew is bounded by the largest single user's event count.
    * Timestamps are compared in microseconds (Timestamp.getTime is
    * millis-only — same pitfall the streaming state avoids). */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // parquet event times are NTZ; under the UTC session timezone the cast
    // is exact and unix_micros matches DuckDB's epoch_us
    val us = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("prev_us", lag(us, 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || us - col("prev_us") > gapMs * 1000L, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(us).as("start_us"), max(us).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
  }
}
