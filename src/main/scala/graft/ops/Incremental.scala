package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped aggregates — the materialized-
  * view refresh primitive. A nightly "metrics by key" table over a
  * 100 TB fact history must NOT rescan history per refresh: keep the
  * aggregate in sum-mergeable form (counts and sums — avg/stddev derive
  * from them at read time, the same algebraic-moments trick the
  * profiling and anomaly operators use), aggregate ONLY the delta, and
  * fold the two tables. Refresh cost is O(delta + |groups|),
  * independent of history size.
  */
object Incremental {

  /** Fold a maintained aggregate with a delta's partial aggregate.
    * Both frames must have identical schemas: `keys` plus sum-mergeable
    * value columns (every non-key column is summed). Groups new in the
    * delta appear; untouched groups pass through (sum with one input).
    * The fold shuffles |groups| + |delta groups| rows, never facts.
    */
  def refreshSums(maintained: DataFrame, deltaAgg: DataFrame,
                  keys: Seq[String]): DataFrame = {
    require(maintained.columns.sameElements(deltaAgg.columns),
      "maintained and delta aggregates must have identical schemas")
    val valueCols = maintained.columns.filterNot(keys.contains)
    require(valueCols.nonEmpty, "no value columns to fold")
    maintained.unionByName(deltaAgg)
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(sum(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => sum(col(c)).as(c)).toIndexedSeq: _*)
  }
}
