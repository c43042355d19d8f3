package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Custom keyed streaming state via `mapGroupsWithState` — the Structured
  * Streaming scale path for state machines the built-in windowed
  * aggregates can't express (SURVEY.md §2.9; the reference's stateful
  * examples stop at session windows, this generalizes them). State lives
  * in the state store, partitioned by key: at 100 TB the transform
  * shuffles once on user_id and each task owns its keys' state, exactly
  * like a windowed aggregate.
  */
object Stateful {

  /** Running per-key state: event count, value sum, gap-session count,
    * and the last event time seen (micros). */
  final case class SessionState(
      n: Long, total: Double, sessions: Long, lastMicros: Long)

  final case class UserSessions(
      user_id: Long, n: Long, total_value: Double, sessions: Long)

  private[streaming] def advance(
      st: SessionState, rows: Seq[(Double, Long)], gapMicros: Long): SessionState =
    rows.foldLeft(st) { case (s, (v, ts)) =>
      val newSession = s.n == 0L || ts - s.lastMicros >= gapMicros
      SessionState(s.n + 1, s.total + v,
        s.sessions + (if (newSession) 1L else 0L), math.max(s.lastMicros, ts))
    }

  /** Per-user running count / value sum / session counter (a new session
    * starts after >= `gapMinutes` of silence), maintained across
    * micro-batches. Events within a batch are processed in event-time
    * order; across batches the state's high-water timestamp carries the
    * continuation (same sequencing contract as APPLY CHANGES).
    *
    * `events` needs (user_id, value, ts) columns; works on a streaming or
    * a batch DataFrame (Spark plans `mapGroupsWithState` for both).
    */
  def userSessions(events: DataFrame, gapMinutes: Int): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          val sorted = it.toSeq.sortBy(_._3).map(r => (r._2, r._3))
          val st = advance(
            state.getOption.getOrElse(SessionState(0L, 0.0, 0L, Long.MinValue)),
            sorted, gapMicros)
          state.update(st)
          UserSessions(uid, st.n, st.total, st.sessions)
      }
  }
}
