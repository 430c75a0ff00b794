package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Series-LENGTH-axis scaling proof for the Theil–Sen pair (see
  * BENCH_SCALE.md): the exact form is O(n²) pairs per series, the
  * windowed form O(n·w) — and the length axis is the one the existing
  * series-count scale rows (10× series, core-absorbed) do NOT
  * exercise.
  *
  * Protocol: the SAME 100k sf0.1 events rows, re-keyed so only series
  * LENGTH changes — `user_id % 256` (~390 pts/series) vs `user_id %
  * 26` (~3.8k pts/series, ~10× length). Total exact-pair volume is
  * N²/(2k), so 10× length at constant rows = 10× exact pair volume;
  * windowed pair volume is N·w at both. warmup + median-of-3, GC
  * fences, noop sink.
  *
  *   sbt "Test/runMain graft.tools.TrendScaleProbe"
  */
object TrendScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
      time(df) // untimed warmup
      (1 to 3).map(_ => { System.gc(); time(df) }).sorted.apply(1)
    }
    val ev = graft.SparkEntry.readEvents(spark, "/root/testdata/sf0.1")
      .select(col("user_id").cast("long").as("uid"), col("ts"),
        col("value").cast("double").as("value"))
    def rekeyed(k: Int) =
      ev.select((col("uid") % k).as("user_id"), col("ts"), col("value"))
    // Long-length exact legs (k<=64: >=78M pairs with multi-million-
    // value exact-median buffers per group) OOM the default 8g test
    // heap — observed, and itself the length-axis point. Set
    // TREND_PROBE_EXACT_ALL=1 with SPARK_DRIVER_MEM=48g to measure
    // them anyway; the windowed form runs at every length on 8g.
    val exactAll = sys.env.contains("TREND_PROBE_EXACT_ALL")
    val out = for (k <- Seq(256, 64, 26)) yield {
      val df = rekeyed(k).cache()
      df.count()
      val exact = if (k >= 256 || exactAll)
        r3(med3(graft.models.Trend.theilSenMannKendall(
          df, "user_id", "ts", "value")))
      else "\"OOM-at-8g\""
      val win = med3(graft.models.Trend.theilSenWindowed(
        df, "user_id", "ts", "value", w = 24))
      df.unpersist()
      s""""k$k":{"len":${100000 / k},"exact":$exact,"windowed":${r3(win)}}"""
    }
    println(s"""{"op":"theilsen_length_axis(w=24)",${out.mkString(",")}}""")
    spark.stop()
  }
}
