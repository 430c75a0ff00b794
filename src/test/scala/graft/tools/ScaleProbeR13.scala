package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 scale probes (see BENCH_SCALE.md):
  *
  *  1. LOF on the series-LENGTH axis — the exact O(n²)-pair face vs
  *     `lofWindowed` (O(n·w) lag-bucket pairs), same protocol as
  *     TrendScaleProbe: identical 100k sf0.1 event rows re-keyed so
  *     only series length changes.
  *  2. DBSCAN on the same axis — naive per-series self-join candidates
  *     vs the ε-grid cell bucketing (output identical, DbscanSpec).
  *  3. PageRank on the SKEW axis — a synthetic 200k-node graph with a
  *     200k-in-link mega-hub + 128 mid hubs (3-tier power-law-ish
  *     in-degree) vs the uniform 3-regular control, and the one-level
  *     fold (saltBuckets=1, the pre-r13 shape whose hub buffer is the
  *     whole in-neighbor array) vs the two-level fold (saltBuckets=64,
  *     max buffer indeg/64).
  *
  * warmup + median-of-3, GC fences, noop sink.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbeR13"
  */
object ScaleProbeR13 {
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
    // warmup + ONE timed run — for the minutes-long dbscan legs where
    // med3 would burn half an hour on a curve-shape probe
    def once1(df: => DataFrame): Double = {
      time(df)
      System.gc(); time(df)
    }
    val ev = graft.SparkEntry.readEvents(spark, "/root/testdata/sf0.1")
      .select(col("user_id").cast("long").as("uid"), col("ts"),
        col("value").cast("double").as("value"))
    def rekeyed(k: Int) =
      ev.select((col("uid") % k).as("user_id"), col("ts"), col("value"))

    val which = if (args.isEmpty) Set("lof", "dbscan", "pagerank")
      else args.toSet

    // ---- 1. LOF length axis ----
    // Exact legs beyond k=256 share the Theil–Sen length-axis OOM
    // profile (pair volume + per-point window/join state); guard the
    // same way — LOF_PROBE_EXACT_ALL=1 + SPARK_DRIVER_MEM to force.
    if (which("lof")) {
      val exactAll = sys.env.contains("LOF_PROBE_EXACT_ALL")
      val out = for (k <- Seq(256, 64, 26)) yield {
        val df = rekeyed(k).cache()
        df.count()
        val exact = if (k >= 256 || exactAll)
          r3(med3(graft.models.Lof.lof(
            df, "user_id", "ts", "value", k = 5)))
        else "\"skipped-8g\""
        val win = med3(graft.models.Lof.lofWindowed(
          df, "user_id", "ts", "value", k = 5, w = 24))
        df.unpersist()
        s""""k$k":{"len":${100000 / k},"exact":$exact,"windowed":${r3(win)}}"""
      }
      println(s"""{"op":"lof_length_axis(k=5,w=24)",${out.mkString(",")}}""")
    }

    // ---- 2. DBSCAN length axis ----
    if (which("dbscan")) {
      val naiveAll = sys.env.contains("DBSCAN_PROBE_NAIVE_ALL")
      def leg(body: => Double): String =
        try r3(body)
        catch { case e: Throwable =>
          "\"" + e.getClass.getSimpleName + "\"" }
      val out = for (k <- Seq(256, 64, 26)) yield {
        val df = rekeyed(k).cache()
        df.count()
        val naive = if (k >= 256 || naiveAll)
          leg(once1(graft.models.Dbscan.dbscan(
            df, "user_id", "ts", "value", grid = false)))
        else "\"skipped-8g\""
        val grid = leg(once1(graft.models.Dbscan.dbscan(
          df, "user_id", "ts", "value", grid = true)))
        df.unpersist()
        s""""k$k":{"len":${100000 / k},"naive":$naive,"grid":$grid}"""
      }
      println(s"""{"op":"dbscan_length_axis(eps=1000,minPts=4)",${out.mkString(",")}}""")
    }

    // ---- 3. PageRank skew axis ----
    if (which("pagerank")) {
      val n = 200000L
      val nodes = spark.range(n).select(col("id"))
      def uniformEdges = nodes.select(col("id").as("src"),
          ((col("id") * 7 + 1) % n).as("dst"))
        .unionByName(nodes.select(col("id").as("src"),
          ((col("id") * 13 + 3) % n).as("dst")))
        .unionByName(nodes.select(col("id").as("src"),
          ((col("id") * 31 + 11) % n).as("dst")))
      // 3-tier skew: every node links the mega-hub (node 0), a mid
      // hub (id % 128), and one uniform target — hub indeg ≈ 200k,
      // mids ≈ 1.6k, rest ≈ 1
      def skewEdges = nodes.select(col("id").as("src"),
          lit(0L).as("dst"))
        .unionByName(nodes.select(col("id").as("src"),
          (col("id") % 128).as("dst")))
        .unionByName(nodes.select(col("id").as("src"),
          ((col("id") * 13 + 3) % n).as("dst")))
      def pr(e: DataFrame, s: Int) = graft.graph.PageRank.pageRank(
        nodes, "id", e, "src", "dst", iters = 10, saltBuckets = s)
      val uni64 = r3(med3(pr(uniformEdges, 64)))
      val skew64 = r3(med3(pr(skewEdges, 64)))
      val skew1 = r3(med3(pr(skewEdges, 1)))
      println(s"""{"op":"pagerank_skew_axis(n=200k,iters=10)","uniform_s64":$uni64,"hub_s64":$skew64,"hub_s1_onelevel":$skew1}""")
    }
    spark.stop()
  }
}
