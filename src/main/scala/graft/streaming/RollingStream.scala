package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-window aggregate — the stateful twin of the
  * batch RANGE-frame rolling query ([[graft.queries.Relational
  * .evRolling]]): at every purchase, the user's trailing 7-day count
  * and revenue, emitted immediately (append mode).
  *
  * State per key is the purchases still inside the trailing window —
  * bounded by window CONTENT, not by stream length (entries evict the
  * moment a newer event pushes them out), the natural size for a
  * sliding-window feature at 100 TB/day. Frame semantics match the
  * batch twin exactly: the frame key is floor(micros→seconds) — the
  * same floor division both engines spell — and the frame is
  * [t − 7d, t] inclusive, so same-second purchases see each other.
  *
  * The feed must be event-time ordered per key across micro-batches
  * (within a batch, rows sort by (ts, tie)); late purchases need the
  * batch backfill, as everywhere in this family.
  */
object RollingStream {

  final case class P(user_id: Long, ts: Timestamp, event_id: Long, cents: Long)
  final case class Win(secs: Array[Long], cents: Array[Long])
  final case class Rolled(event_id: Long, user_id: Long, ts: Timestamp,
                          n_7d: Long, rev_7d: Double)

  private val WindowSec = 7L * 86400L

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private def roll(userId: Long, it: Iterator[P],
                   state: GroupState[Win]): Iterator[Rolled] = {
    val ps = it.toIndexedSeq.sortBy(p => (micros(p.ts), p.event_id))
    var secs = state.getOption.map(_.secs.toVector).getOrElse(Vector.empty)
    var cents = state.getOption.map(_.cents.toVector).getOrElse(Vector.empty)
    var total = cents.sum // maintained incrementally below
    val out = Vector.newBuilder[Rolled]
    // a RANGE frame includes ALL peers of the current row's frame key
    // (later same-second purchases too) — process each same-second
    // group together and emit every member with the group-complete
    // totals, exactly the batch frame. Peers split ACROSS micro-batches
    // are the one divergence this cannot absorb (the feed-ordering
    // contract extends to whole seconds).
    ps.groupBy(p => Math.floorDiv(micros(p.ts), 1000000L)).toSeq.sortBy(_._1)
      .foreach { case (sec, peers) =>
        val cut = sec - WindowSec
        val drop = secs.indexWhere(_ >= cut) match {
          case -1 => secs.size
          case i  => i
        }
        cents.take(drop).foreach(total -= _)
        secs = secs.drop(drop); cents = cents.drop(drop)
        peers.foreach { p => secs :+= sec; cents :+= p.cents; total += p.cents }
        val n = secs.size.toLong
        val rev = total / 100.0
        peers.foreach(p => out += Rolled(p.event_id, userId, p.ts, n, rev))
      }
    state.update(Win(secs.toArray, cents.toArray))
    out.result().iterator
  }

  /** One transformation for both modes ([[Attribution]] contract). */
  def trailing(purchases: DataFrame): Dataset[Rolled] = {
    val s = purchases.sparkSession
    import s.implicits._
    purchases.as[P]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Win, Rolled](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(roll _)
  }
}
