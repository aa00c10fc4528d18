package graft.tools
// scratch timing main (not part of the library surface)
object MeasureRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("ERROR")
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.queries.Pipeline.mmDecode(spark, "/root/repo/localdata/sf1")
        .write.format("noop").mode("overwrite").save()
      println(f"MMDECODE sf1 ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
