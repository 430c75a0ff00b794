package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 second-wave scale probe (see BENCH_SCALE.md): volume
  * evidence for the two new operators whose scale story is a CLAIM in
  * their Scaladoc, measured on the 10× axis sf0.01 → sf0.1.
  *
  * 1. `q_ijoin` (event-time interval join) — the claim: one keyed
  *    equi-join whose cost tracks fact size + matched pairs, never a
  *    per-key cartesian. Evidence: rows_out and wall time at both SFs;
  *    a healthy ratio is ≈ the pair-count ratio (pairs grow with
  *    per-user event density × users), catastrophically superlinear
  *    time would mean the range residual degraded to a nested loop.
  *
  * 2. `gridResample` — the claim: grid volume = users × span/step,
  *    INDEPENDENT of fact density, and the ffill is one union + one
  *    window sort, zero joins. Evidence: grid rows and wall time at
  *    both SFs; time should track max(fact, grid) linearly.
  *
  * warmup + median-of-3 per timed leg, GC fences, noop sink.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbeR16b"
  */
object ScaleProbeR16b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def r3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med3(df: => DataFrame): Double = {
      time(df)
      (1 to 3).map(_ => { System.gc(); time(df) }).sorted.apply(1)
    }
    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val ij = graft.SparkEntry.queries("q_ijoin")(spark, dir)
      println(s"[probe] sf$sf q_ijoin rows=${ij.count()} " +
        s"sec=${r3(med3(graft.SparkEntry.queries("q_ijoin")(spark, dir)))}")
      val rs = graft.SparkEntry.queries("q_resample")(spark, dir)
      println(s"[probe] sf$sf q_resample grid_rows=${rs.count()} " +
        s"sec=${r3(med3(graft.SparkEntry.queries("q_resample")(spark, dir)))}")
    }
    spark.stop()
  }
}
