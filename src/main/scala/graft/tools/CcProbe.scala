package graft.tools

import graft.GraftSession
import graft.ops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round counts + phase timings for the alternating-star CC fixpoint
  * as the declared queries drive it (dd_components / dd_semantic_full):
  * how much of the entry is pair generation vs CC rounds vs final
  * labeling. Usage: runMain graft.tools.CcProbe <sfDir>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // dd_components pair source
    val docs = Tables.documents(spark, sfDir)
    val jp = time("jaccard pairs (count)") {
      val p = Dedup.jaccardJoin(docs, "doc_id", "text", k = 3, threshold = 0.8)
        .localCheckpoint()
      println(s"[ccprobe] jaccard pairs = ${p.count()}"); p
    }
    val (l1, r1) = time("cc over jaccard pairs") {
      val (l, r) = Dedup.connectedComponentsWithRounds(jp)
      l.write.format("noop").mode("overwrite").save(); (l, r)
    }
    println(s"[ccprobe] jaccard CC rounds = $r1")
    // dd_semantic_full pair source (nlist=1, threshold 0.4)
    val e = Tables.embeddings(spark, sfDir)
    val sem = time("semantic pairs nlist=1 (count)") {
      val c = e.select(col("vec_id").cast("long").as("id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("__v"))
      val c2 = c.localCheckpoint()
      val a = c2.select(col("id").as("id_a"), col("__v").as("__va"))
      val b = c2.select(col("id").as("id_b"), col("__v").as("__vb"))
      val p = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .filter(graft.functions.Vectors.cosine(col("__va"), col("__vb")) >= 0.4)
        .select("id_a", "id_b").localCheckpoint()
      println(s"[ccprobe] semantic pairs = ${p.count()}"); p
    }
    val (l2, r2) = time("cc over semantic pairs") {
      val (l, r) = Dedup.connectedComponentsWithRounds(sem)
      l.write.format("noop").mode("overwrite").save(); (l, r)
    }
    println(s"[ccprobe] semantic CC rounds = $r2")
    spark.stop()
  }
}
