package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Inactivity-gap sessionization — the training-pipeline primitive for
  * turning an event log into per-user sessions (funnels, engagement, rate
  * features). A new session starts when a user's gap since their previous
  * event exceeds `gapMinutes`.
  *
  * Two forms with identical semantics:
  *  - [[sessions]]: batch, pure window functions (lag → flag → running sum),
  *    oracle-checkable in ANSI SQL. Shuffles once on user_id.
  *  - [[sessionsStream]]: unbounded form via flatMapGroupsWithState with
  *    event-time timeout — per-user state is one open session (constant
  *    memory per key); sessions emit when the watermark passes their gap.
  *
  * The reference has no session concept (its streaming track is a
  * synchronous op log, SURVEY §2.9); this is part of the beyond-reference
  * streaming surface.
  */
object Sessionize {

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  /** Batch sessionization: (user_id, session_id, session_start, session_end,
    * n_events). session_id is 1-based per user in time order. */
  def sessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          // cast-through-timestamp accepts TIMESTAMP_NTZ sources too (the
          // testdata's parquet micros carry no zone); only the DIFFERENCE
          // is used, so any consistent zone interpretation is equivalent
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) >
            gapMinutes * 60L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming sessionization: one OpenSession per user held in state;
    * events extend it or close it and start the next. With event-time
    * timeout, idle users' state is evicted once the watermark passes the
    * gap — state size is O(active users), never O(events). */
  def sessionsStream(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // state times are MICROSECONDS since epoch — java.sql.Timestamp.getTime
    // is millis and would silently truncate the parquet's µs precision,
    // making streamed session bounds disagree with the batch form
    def micros(t: Timestamp): Long = (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: the open session is final
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, toTs(s.start), toTs(s.end), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(e => micros(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - s.end <= gapUs =>
                  open = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, toTs(s.start), toTs(s.end), s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end / 1000L + gapUs / 1000L + 1)
            }
            closed.result().iterator
          }
      }
  }
}
