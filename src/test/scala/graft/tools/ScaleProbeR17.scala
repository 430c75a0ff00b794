package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-17 scale probe (see BENCH_SCALE.md): volume evidence for the
  * round's new relational shapes on the 10× axis sf0.01 → sf0.1.
  *
  * 1. `q2_min_cost` — claim: the correlated min decorrelates to a
  *    per-(part, supplier) aggregate whose output is dim-bounded; time
  *    tracks the fact scan linearly, never #parts × #suppliers probes.
  * 2. `q20_excess_stock` — claim: both aggregate layers are
  *    (part, supplier)-cell-bounded and the semi probe is a broadcast;
  *    output is supplier-bounded, time tracks the date-windowed scan.
  * 3. `q_multi_distinct` — claim: ONE Expand (3× replication) feeding
  *    one shuffled aggregate pair — time is ~3× a plain scan-agg and
  *    LINEAR in the fact, never one pass per distinct column.
  * 4. `q11_important_stock` — claim: AQE ReusedExchange makes the
  *    grand-total branch free (the per-part shuffle is read twice,
  *    written once); time tracks the single fact aggregation.
  *
  * warmup + median-of-3 per timed leg, GC fences, noop sink.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbeR17"
  */
object ScaleProbeR17 {
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
    val probes = Seq("q2_min_cost", "q20_excess_stock",
      "q_multi_distinct", "q11_important_stock")
    for (sf <- Seq("0.01", "0.1"); q <- probes) {
      val dir = s"/root/testdata/sf$sf"
      val rows = graft.SparkEntry.queries(q)(spark, dir).count()
      val sec = med3(graft.SparkEntry.queries(q)(spark, dir))
      println(s"[probe] sf$sf $q rows=$rows sec=${r3(sec)}")
    }
    spark.stop()
  }
}
