package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming twin of the batch exact MAD outlier query (`ev_mad`,
  * SURVEY.md §2.1) — the q_sketch proof shape for NON-algebraic stats:
  * exact medians can't accumulate across micro-batches, so the
  * streaming state is a per-(type, 4-dp value) COUNT HISTOGRAM — an
  * algebraic aggregate that converges to the batch groupBy bit for bit
  * (complete mode, |types|·|distinct rounded values| rows of state,
  * never events) — and median/MAD/outlier-count are a finishing step
  * over that tiny table, replaying `percentile(…, 0.5)`'s exact
  * interpolation rule on the ROUNDED values.
  *
  * Error contract (spec-pinned): the histogram is lossless up to the
  * 4-dp value rounding, so every derived stat differs from the batch
  * exact entry only through that rounding — |med − med_exact| and
  * |mad − mad_exact| are bounded by the worst per-value perturbation
  * (5·10⁻⁵ on each input, hence ≤ 10⁻⁴ on med and ≤ 2·10⁻⁴ on mad),
  * not by a sketch's probabilistic rank error. The batch `ev_mad`
  * entry stays the CORRECTNESS anchor; StreamingSpec pins (a)
  * streamed-across-micro-batches == batch histogram bit-for-bit and
  * (b) the finishing stats within the rounding band of the exact ones
  * on the real corpus fixture.
  */
object MadStream {

  /** Stage 1 — the whole streaming state: per-type value histogram at
    * 4-dp resolution. Counts are algebraic; the streamed accumulation
    * equals the batch groupBy exactly.
    */
  def valueHistogram(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), round(col("value"), 4).as("v"))
      .agg(count(lit(1)).as("cnt"))

  /** Exact `percentile(v, 0.5)` interpolation over a (type, v, cnt)
    * histogram: h = (n−1)/2, the two straddling order statistics come
    * from the cumulative count, and the fractional part interpolates —
    * identical semantics to the batch percentile on the rounded values.
    * Output: (event_type, n, med).
    */
  private def medianByType(hist: DataFrame, vCol: String): DataFrame = {
    val n = hist.groupBy("event_type").agg(sum(col("cnt")).as("n"))
      .withColumn("h", (col("n") - 1).cast("double") / lit(2.0))
      .withColumn("lo", floor(col("h")).cast("long"))
      .withColumn("hi", ceil(col("h")).cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col(vCol))
    val cum = hist.withColumn("__cum", sum(col("cnt")).over(w))
      .join(broadcast(n.select("event_type", "lo", "hi")), "event_type")
    val vLo = cum.filter(col("__cum") > col("lo")).groupBy("event_type")
      .agg(min(col(vCol)).as("__vlo"))
    val vHi = cum.filter(col("__cum") > col("hi")).groupBy("event_type")
      .agg(min(col(vCol)).as("__vhi"))
    n.join(vLo, "event_type").join(vHi, "event_type")
      .select(col("event_type"), col("n"),
        (col("__vlo") +
          (col("h") - col("lo").cast("double")) * (col("__vhi") - col("__vlo")))
          .as("med"))
  }

  /** Stage 2 — finishing over the histogram: median, MAD (median of
    * |v − med| re-histogrammed by deviation), and the batch decision
    * rule's outlier count (|v − med| > 3·1.4826·mad), all on
    * |types|·|buckets|-sized frames. Output matches ev_mad's shape:
    * (event_type, n, med, mad, n_outliers).
    */
  def robustStats(hist: DataFrame): DataFrame = {
    val med = medianByType(hist, "v").select("event_type", "med")
    val dev = hist.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), abs(col("v") - col("med")).as("dev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = medianByType(dev, "dev")
      .select(col("event_type"), col("med").as("mad"))
    hist.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(sum(col("cnt")).as("n"),
        max(col("med")).as("__med"), max(col("mad")).as("__mad"),
        sum(when(abs(col("v") - col("med")) > lit(3) * lit(1.4826) * col("mad"),
          col("cnt")).otherwise(lit(0L))).as("n_outliers"))
      .select(col("event_type"), col("n"), col("__med").as("med"),
        col("__mad").as("mad"), col("n_outliers"))
  }
}
