package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful twin of the batch
  * as-of attribution ([[graft.queries.Relational.evAttribution]]'s
  * last-touch arm, which is [[graft.ops.AsofJoin]] over collapsed
  * touches): every purchase credits its user's latest touch at or
  * before the purchase timestamp.
  *
  * State per user is ONE row — the latest touch seen — so unlike a
  * stream-stream join there is no retention window to size: state is
  * O(users), constant per key, never grows with traffic. That is the
  * right shape for an always-on attribution feed at 100 TB/day: the
  * union-window as-of replays history in batch, this path carries the
  * same decision forward incrementally.
  *
  * Semantics matched to the batch/oracle contract exactly:
  * inclusive on equal timestamps (a touch at the purchase instant
  * counts), ties between touches at the same timestamp resolve to the
  * highest event_id (the batch side's argmax collapse), purchases with
  * no prior touch attribute to "none". Within a micro-batch events are
  * applied in (ts, purchase-last, event_id) order; across batches the
  * feed must be event-time ordered per key (the streaming-source
  * contract — late touches need the batch backfill, same as any
  * attribution system).
  */
object Attribution {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
                      event_type: String, value: Double, channel: String)
  final case class Touch(ts_us: Long, event_id: Long, channel: String)
  final case class Credit(event_id: Long, user_id: Long, ts: Timestamp,
                          value: Double, channel: String)

  private val touchTypes = Set("click", "view")

  /** Exact event-time micros: `getTime` alone is MILLIS and would
    * silently truncate the feed's sub-millisecond components, making
    * same-millisecond orderings diverge from the batch as-of (which
    * compares full-precision timestamps).
    */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private def attribute(userId: Long, it: Iterator[Ev],
                        state: GroupState[Touch]): Iterator[Credit] = {
    // touches sort before purchases at the same instant (inclusive as-of)
    val evs = it.toIndexedSeq.sortBy(e =>
      (micros(e.ts), if (e.event_type == "purchase") 1 else 0, e.event_id))
    var st = state.getOption
    val out = Vector.newBuilder[Credit]
    evs.foreach { e =>
      val us = micros(e.ts)
      if (touchTypes(e.event_type)) {
        val newer = st.forall(t =>
          us > t.ts_us || (us == t.ts_us && e.event_id > t.event_id))
        if (newer) st = Some(Touch(us, e.event_id, e.channel))
      } else if (e.event_type == "purchase") {
        out += Credit(e.event_id, userId, e.ts, e.value,
          st.map(_.channel).getOrElse("none"))
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** One transformation for both modes: streaming carries the latest
    * touch in keyed state; batch sees each key's full history in one
    * group (state starts empty) and produces the identical credits.
    */
  def lastTouch(events: DataFrame): Dataset[Credit] = {
    val s = events.sparkSession
    import s.implicits._
    events.as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Touch, Credit](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(attribute _)
  }
}
