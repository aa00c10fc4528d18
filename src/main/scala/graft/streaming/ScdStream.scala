package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 maintenance — the incremental twin of
  * [[graft.ops.Scd.applyIncrement]] for a continuous observation feed:
  * each key carries ONE state row (its current version), a change
  * observation CLOSES the current version (emits it with its final
  * [valid_from, valid_to)) and opens the next, and equal-attribute
  * observations are absorbed silently (the change-collapse rule).
  *
  * Emission contract (append mode): CLOSED versions are emitted the
  * moment their successor opens — exactly the rows whose intervals can
  * never change again. The OPEN version per key lives in state and is
  * readable as the "current dimension" side channel (batch rebuilds
  * materialize it; a stream consumer joins facts against closed rows +
  * state). This is the same closed-vs-open split every watermarked
  * aggregation makes.
  *
  * State is O(keys) and constant per key — no retention window, the
  * [[Attribution]] shape. The feed must be event-time ordered per key
  * across micro-batches (within a batch, rows sort by (ts, tie));
  * late observations need the batch rebuild, as in any SCD pipeline.
  */
object ScdStream {

  final case class Obs(key: Long, ts: Timestamp, tie: Long, attr: String)
  // state keeps the FULL-precision open timestamp — a millis long would
  // silently truncate sub-millisecond components and emit closed rows
  // whose valid_from no longer equals the batch build's (or even its
  // own predecessor's valid_to)
  final case class Open(attr: String, from: Timestamp, version: Int)
  final case class Closed(key: Long, attr: String, valid_from: Timestamp,
                          valid_to: Timestamp, version: Int)

  /** Exact event-time micros for ordering (`getTime` is millis only). */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private def advance(key: Long, it: Iterator[Obs],
                      state: GroupState[Open]): Iterator[Closed] = {
    val obs = it.toIndexedSeq.sortBy(o => (micros(o.ts), o.tie))
    var cur = state.getOption
    val out = Vector.newBuilder[Closed]
    obs.foreach { o =>
      cur match {
        case Some(c) if c.attr == o.attr => // no change — absorb
        case Some(c) =>
          out += Closed(key, c.attr, c.from, o.ts, c.version)
          cur = Some(Open(o.attr, o.ts, c.version + 1))
        case None =>
          cur = Some(Open(o.attr, o.ts, 1))
      }
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  /** One transformation for both modes (the [[Attribution]] contract):
    * streaming emits closed versions incrementally; batch sees each
    * key's full history in one group and emits the identical closed
    * set. `currentOf` exposes the open versions.
    */
  def closedVersions(obs: DataFrame): Dataset[Closed] = {
    val s = obs.sparkSession
    import s.implicits._
    obs.as[Obs]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Open, Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(advance _)
  }
}
