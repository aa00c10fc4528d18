package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Registers graft optimizer rules (spatial filter pushdown etc.). */
object RuleRegistration {

  def registerAll(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => SpatialFilterPushdown)

  /** Idempotent registration on an existing session (tests, Verify). */
  def registerAll(spark: SparkSession): Unit = {
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(SpatialFilterPushdown))
      spark.experimental.extraOptimizations = extra :+ SpatialFilterPushdown
  }
}
