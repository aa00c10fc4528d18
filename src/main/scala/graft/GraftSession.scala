package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** One place to build/enable graft on a SparkSession.
  *
  * Preferred production path is the extensions mechanism
  * (`spark.sql.extensions=graft.GraftSparkExtensions`); `enable(spark)`
  * covers sessions that already exist (tests, Verify, Bench, driver).
  */
object GraftSession {

  /** Confs every graft session needs. `cpus` sizes shuffle parallelism to
    * the local machine; on a real cluster this is cluster-managed.
    */
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Register graft's UDT, SQL functions and optimizer rules on an
    * existing session.
    */
  def enable(spark: SparkSession): SparkSession = {
    graft.geom.GeometryUDT.init()
    graft.functions.FunctionRegistration.registerAll(spark)
    graft.plans.RuleRegistration.registerAll(spark)
    spark
  }
}
