package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Inactivity-gap sessionization via flatMapGroupsWithState
  * (SURVEY.md §2.12): per-user session/event counters with a 30-minute
  * gap rule. The same state function runs in batch mode (where it is
  * DuckDB-oracle-verified as `ev_sessions`) and under Structured
  * Streaming (update mode, incremental state across triggers).
  *
  * State per key is three numbers — bounded regardless of stream length;
  * the shuffle is one hash exchange on user_id.
  */
object Sessionize {

  val GapSeconds = 1800.0

  case class Ev(user_id: Long, ts_sec: Double)
  case class SessionState(last_ts: Double, n_sessions: Long, n_events: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Fold a (within-trigger sorted) run of events into the state. */
  def advance(s: SessionState, tsSec: Double): SessionState = {
    val newSession = s.n_events == 0L || tsSec - s.last_ts > GapSeconds
    SessionState(tsSec, s.n_sessions + (if (newSession) 1L else 0L), s.n_events + 1L)
  }

  private def update(
      key: Long, events: Iterator[Ev], state: GroupState[SessionState]): Iterator[UserSessions] = {
    val sorted = events.map(_.ts_sec).toArray
    java.util.Arrays.sort(sorted)
    if (sorted.isEmpty) Iterator.empty
    else {
      var s = state.getOption.getOrElse(SessionState(0.0, 0L, 0L))
      sorted.foreach(ts => s = advance(s, ts))
      state.update(s)
      Iterator.single(UserSessions(key, s.n_sessions, s.n_events))
    }
  }

  /** Streaming (update-mode) or batch sessionization. Input needs
    * (user_id, ts) columns; ts is event time.
    */
  def apply(events: DataFrame): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts").cast("double").as("ts_sec"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
