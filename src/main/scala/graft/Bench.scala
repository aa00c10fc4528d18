package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times each SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Results are fully materialized through the noop sink (not `count()`,
  * which would let the optimizer prune expensive projection expressions
  * and under-report the real work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen/IO paths once so per-query times measure the
    // plan, not first-use classloading: a real parquet scan, a broadcast
    // join, an exchange and an aggregate (the first timed query otherwise
    // absorbs all session init).
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val warmR = sources.Tables.region(spark, sfDir)
    val warmN = sources.Tables.nation(spark, sfDir)
    warmN.join(org.apache.spark.sql.functions.broadcast(warmR),
        warmN("n_regionkey") === warmR("r_regionkey"))
      .groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // Failed queries are recorded as negative elapsed time (sentinel) and
    // listed under "errors" so a throw is never mistaken for a fast success.
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -v) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
