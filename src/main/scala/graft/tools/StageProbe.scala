package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import scala.collection.mutable.ArrayBuffer

/** Per-stage attribution for one or more declared queries: stage id,
  * task count, wall duration, summed task run/cpu time and the stage's
  * callsite — the evidence that separates "serial scan-side stage" from
  * "shuffle-bound" from "driver latency between jobs" (guide §1/§7.1;
  * the UI is disabled in this environment, so this is the stage page).
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> q1[,q2,...] [passes]
  */
object StageProbe {
  private final case class St(id: Int, attempt: Int, name: String,
      tasks: Int, wallMs: Long, runMs: Long, cpuMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, si.attemptNumber(), si.name.takeWhile(_ != '\n'),
            si.numTasks, wall,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000L)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // warm-up mirrors Bench
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val qs = SparkEntry.queries
    for (name <- names) {
      val fn = qs(name)
      // pass 0 warms codegen; the LAST pass is the reported one
      var wall = 0.0
      for (p <- 1 to passes) {
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        if (p == passes) {
          val snap = stages.synchronized(stages.toVector)
          val totalWall = snap.map(_.wallMs).sum
          println(f"== $name pass$p wall=$wall%.2f s stages=${snap.size} " +
            f"stageWallSum=${totalWall / 1000.0}%.2f s runSum=${snap.map(_.runMs).sum / 1000.0}%.2f s")
          for (s <- snap.sortBy(-_.wallMs).take(25))
            println(f"  stage ${s.id}%4d t=${s.tasks}%3d wall=${s.wallMs}%6d ms run=${s.runMs}%6d cpu=${s.cpuMs}%6d  ${s.name.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
