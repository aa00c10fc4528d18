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
  case class EvT(user_id: Long, ts_sec: Double, ts: java.sql.Timestamp)
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
    *
    * State is bounded PER KEY but key cardinality is not: lifetime
    * session/event counters genuinely require a state row for every user
    * ever seen, so a multi-year deployment that does not need lifetime
    * counters should use [[withTtl]] to cap state at the active-key set.
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

  private def updateTtl(ttlMs: Long)(
      key: Long, events: Iterator[EvT], state: GroupState[SessionState]): Iterator[UserSessions] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val sorted = events.map(_.ts_sec).toArray
      java.util.Arrays.sort(sorted)
      if (sorted.isEmpty) Iterator.empty
      else {
        // a key whose data arrives in the SAME micro-batch its timeout
        // would have fired gets the data call (hasTimedOut=false), not
        // the timeout call — so staleness is re-checked here, making
        // expiry deterministic in the watermark rather than in
        // micro-batch arrival timing
        var s = state.getOption
          .filter(st => (st.last_ts * 1000).toLong + ttlMs > state.getCurrentWatermarkMs)
          .getOrElse(SessionState(0.0, 0L, 0L))
        sorted.foreach(ts => s = advance(s, ts))
        state.update(s)
        state.setTimeoutTimestamp(
          math.max((s.last_ts * 1000).toLong + ttlMs, state.getCurrentWatermarkMs + 1))
        Iterator.single(UserSessions(key, s.n_sessions, s.n_events))
      }
    }
  }

  /** [[apply]] with an event-time state TTL: a key idle for more than
    * `ttlSeconds` of event time (as measured by the watermark) has its
    * state expired and removed, so long-running streams hold state for
    * the ACTIVE key set only. An expired key's re-arrival starts over —
    * session/event counters restart from zero, exactly as if the user
    * were new; that is the trade this knob makes against [[apply]]'s
    * lifetime counters. Streaming-only (needs the watermark); the batch
    * twin `ev_sessions` keeps using [[apply]], whose semantics are
    * unchanged.
    */
  def withTtl(events: DataFrame, ttlSeconds: Long,
              watermarkDelay: String = "10 seconds"): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("double").as("ts_sec"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(updateTtl(ttlSeconds * 1000L))
  }
}
