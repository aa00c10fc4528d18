package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet layout — the co-located-join half of the 100 TB
  * design (SURVEY.md §4): write both sides of a recurring join bucketed
  * by the join key into the same number of buckets, and every subsequent
  * join on that key is shuffle-free (bucketed scans satisfy the join's
  * required distribution, so no Exchange appears in the plan).
  *
  * At 100 TB the fact-to-fact shuffle is usually THE dominant cost; for
  * a join that runs every day (lineitem ⋈ orders), paying the shuffle
  * once at write time and never again is the standard warehouse layout
  * decision. `BucketedLayoutSpec` asserts the plan property.
  */
object BucketedLayout {

  /** Write `df` bucketed by `keyCol` into `nBuckets`, sorted within
    * buckets by the same key (sorted buckets additionally drop the
    * per-task Sort from sort-merge joins). Registers `table` in the
    * session catalog (bucketing metadata lives in the catalog; a plain
    * path write cannot carry it).
    *
    * An orphaned managed-table location (files left under the warehouse
    * dir by a previous process whose in-memory catalog is gone) would
    * make `saveAsTable` refuse to create the table even in overwrite
    * mode, so the stale entry AND location are removed first — this
    * gives `overwrite` the cross-process semantics a warehouse job
    * expects.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write
      .format("parquet")
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
