package graft

import org.apache.spark.sql.DataFrame

package object queries {

  /** Fan a scan-partitioned frame out to the session parallelism when
    * the input yields fewer splits than cores (single-row-group
    * small-SF parquet; one unsplittable gzip member) — the qProfile
    * guard. A no-op on real multi-file layouts, where splits >> cores.
    * One definition for the three query families; each call site keeps
    * its own applicability note (the guard is only worth its exchange
    * where the downstream per-row work dwarfs one extra move of the
    * projected rows — see the Spatial/Relational/Pipeline call sites
    * for the measured placement rules).
    */
  private[queries] def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
