package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply: produce the next snapshot of a keyed table from a
  * changeset of inserts, updates and deletes — the Delta `MERGE INTO` /
  * Iceberg upsert semantics as a plain DataFrame transform (the
  * snapshot-diff twin of [[graft.queries.Relational]]'s qDiff, which
  * goes the other way: two snapshots → the changeset).
  *
  * Scale shape: the changeset first collapses to ONE latest change per
  * key (argmax by the sequence column as a map-side `max(struct)` —
  * partial aggregation, no window), then the base pays a single
  * left-anti join against the change KEYS — broadcast when the
  * changeset is small (the overwhelmingly common CDC case: a day's
  * changes vs years of base), so the 100 TB base is one scan with a
  * scan-side hash-set probe, zero base shuffle — and surviving changes
  * union in. Cost is O(base scan + changes), never O(base shuffle).
  */
object MergeInto {

  /** Apply `changes` to `base`. `changes` must carry every `base`
    * column plus `opCol` ('I' | 'U' | 'D') and `seqCol` (a per-key
    * strictly increasing change sequence — ties are broken by op then
    * payload for determinism, but a real CDC feed should never tie).
    * Later changes win; a key's final 'D' removes it; 'I'/'U' both
    * land as the new row (upsert semantics — an 'I' on an existing key
    * replaces it).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String, seqCol: String,
                   broadcastChanges: Boolean = true): DataFrame = {
    val payload = base.columns
    require(payload.contains(keyCol), s"base must contain key $keyCol")
    require((payload :+ opCol :+ seqCol).toSet.subsetOf(changes.columns.toSet),
      "changes must carry every base column plus op and seq")
    val rest = payload.filterNot(_ == keyCol)
    val packed = struct(col(seqCol) +: col(opCol) +: rest.map(col): _*)
    val latest = changes.groupBy(col(keyCol)).agg(max(packed).as("__m"))
      .select(col(keyCol) +: col(s"__m.$opCol").as(opCol) +:
        rest.map(c => col(s"__m.$c").as(c)): _*)
    val keys = latest.select(keyCol)
    val kept = base.join(
      if (broadcastChanges) broadcast(keys) else keys,
      Seq(keyCol), "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(payload.map(col).toIndexedSeq: _*)
    kept.select(payload.map(col).toIndexedSeq: _*).unionByName(upserts)
  }
}
