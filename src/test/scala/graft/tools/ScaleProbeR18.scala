package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 scale probe (see BENCH_SCALE.md): volume evidence for the
  * round's new shapes on the 10× axis sf0.01 → sf0.1.
  *
  * 1. `q9_product_profit` — claim: the hybrid skew join keeps BOTH
  *    branches populated at every SF (the >40-lines hot threshold
  *    sits above the ~30-line per-part mean, which is SF-invariant:
  *    parts and lineitem scale together), so the salted path is
  *    genuinely exercised, and time tracks the fact scans linearly.
  *    The probe prints the hot/cold part split as direct evidence.
  * 2. `q19_brackets` — claim: the pushed per-side relaxations make
  *    the scan the cost; the residual OR is map-side on broadcast
  *    part attributes. rows=1 always (global aggregate, non-null).
  * 3. `q15_top_supplier` — claim: ReusedExchange keeps it ONE fact
  *    map stage; output is the argmax row set (>=1 row at any SF).
  * 4. `q_rank_users_2l` — claim: no global row sort — the only
  *    ordered pass is over the distinct-count relation (bounded by
  *    max per-user count, not user count), so time tracks the user
  *    aggregate.
  * 5. `q_compact` — claim: the rewrite is one scan + one
  *    shuffle-free write; time tracks input bytes linearly.
  *
  * warmup + median-of-3 per timed leg, GC fences, noop sink.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbeR18"
  */
object ScaleProbeR18 {
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
    val probes = Seq("q9_product_profit", "q19_brackets",
      "q15_top_supplier", "q_rank_users_2l", "q_compact")
    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      // q9 hybrid-branch evidence: hot vs cold blue-part key counts
      // under the registered threshold (>40 lines)
      val blue = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_name").contains("blue")).select("p_partkey")
      val perPart = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(broadcast(blue), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey").count()
      val hot = perPart.filter(col("count") > 40).count()
      val cold = perPart.filter(col("count") <= 40).count()
      println(s"[probe] sf$sf q9 hot_parts=$hot cold_parts=$cold " +
        "(both must be > 0: the hybrid exercises BOTH branches)")
      for (q <- probes) {
        val rows = graft.SparkEntry.queries(q)(spark, dir).count()
        val sec = med3(graft.SparkEntry.queries(q)(spark, dir))
        println(s"[probe] sf$sf $q rows=$rows sec=${r3(sec)}")
      }
    }
    spark.stop()
  }
}
