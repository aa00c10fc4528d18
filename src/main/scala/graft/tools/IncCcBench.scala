package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operator-level measurement of incremental connected components: the
  * CORRECTNESS entry (dd_components_inc) necessarily re-pays pair
  * generation and the initial labeling inside one query, so the
  * maintenance win is invisible there. This main separates the phases
  * on the sf1 corpus: build labels once, then fold a small day's-batch
  * edge set via [[graft.ops.Dedup.mergeComponents]] vs re-running the
  * full [[graft.ops.Dedup.connectedComponents]] over all edges — the
  * choice a daily pipeline actually faces.
  */
object IncCcBench {

  private def time2(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; val d0 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); f; val d1 = (System.nanoTime() - t1) / 1e9
    math.min(d0, d1)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/localdata/sf1"
    val spark = graft.GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup

    val docs = graft.sources.Tables.documents(spark, dir)
    // the historical edge set, materialized once (the state a daily run
    // starts from — pair generation is NOT what's being measured)
    val pairs = Dedup.jaccardJoin(docs, "doc_id", "text", k = 3, threshold = 0.8)
      .select("id_a", "id_b").localCheckpoint()
    val nPairs = pairs.count()
    val labels = Dedup.connectedComponents(pairs).localCheckpoint()
    val nLabels = labels.count()
    println(s"corpus: $nLabels labeled ids from $nPairs historical pairs ($dir)")

    // a day's batch: 500 new edges — some bridging existing components,
    // some attaching brand-new ids (deterministic arithmetic)
    import spark.implicits._
    val newEdges = ((0L until 250L).map(i => (i * 7 % 5000, i * 13 % 5000 + 1)) ++
      (0L until 250L).map(i => (9000000L + i, i * 11 % 5000))).toDF("id_a", "id_b")
      .localCheckpoint()

    val tMerge = time2(noop(Dedup.mergeComponents(labels, newEdges)))
    val tRebuild = time2(noop(Dedup.connectedComponents(pairs.unionByName(newEdges))))
    println(f"| mergeComponents (fold 500 edges into ${nLabels} labels) | $tMerge%.2f s |")
    println(f"| full rebuild over ${nPairs} + 500 edges | $tRebuild%.2f s |")
    println(f"| incremental speedup | ${tRebuild / math.max(tMerge, 1e-9)}%.1fx |")

    // and the contract: both must agree (the dd_components_inc oracle
    // proves it vs SQL; this is the belt-and-braces operator-level check)
    val m = Dedup.mergeComponents(labels, newEdges)
    val f = Dedup.connectedComponents(pairs.unionByName(newEdges))
    val diff = m.exceptAll(f).count() + f.exceptAll(m).count()
    println(s"| merge == rebuild | diff rows: $diff (must be 0) |")

    // ---- the regime that motivates the operator: a LARGE history.
    // The sf1 corpus has only ~2.5k near-dup pairs, so a rebuild is
    // trivially cheap and the merge's fixed costs (a second CC
    // driver-round sequence + the labels scan) dominate. Synthesize a
    // 4M-edge history (2M disjoint 3-node chains over 6M ids — short
    // components, the realistic shape) and fold the same 500 edges.
    val big = spark.range(2000000L)
      .select((col("id") * 4).as("id_a"), (col("id") * 4 + 1).as("id_b"))
      .unionByName(spark.range(2000000L)
        .select((col("id") * 4 + 1).as("id_a"), (col("id") * 4 + 2).as("id_b")))
      .localCheckpoint()
    val labelsBig = Dedup.connectedComponents(big).localCheckpoint()
    println(s"big history: ${big.count()} edges, ${labelsBig.count()} labeled ids")
    val tMergeBig = time2(noop(Dedup.mergeComponents(labelsBig, newEdges)))
    val tRebuildBig = time2(noop(Dedup.connectedComponents(big.unionByName(newEdges))))
    println(f"| mergeComponents (fold 500 edges into 6M labels) | $tMergeBig%.2f s |")
    println(f"| full rebuild over 4M + 500 edges | $tRebuildBig%.2f s |")
    println(f"| incremental speedup (big history) | ${tRebuildBig / math.max(tMergeBig, 1e-9)}%.1fx |")
    println("== INCCC DONE ==")
    spark.stop()
  }
}
