package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is fully materialized through the
  * built-in `noop` datasource (every column computed and consumed — a
  * bare `.count()` would let Catalyst prune the projections away).
  * Failures are reported per-query as -1 with an error marker instead of
  * being silently folded into the total. */
object Bench {

  /** Headline subset: one per operator family, heaviest first. */
  val headline: Seq[String] = Seq(
    "q1_pricing", "q_join_agg", "q_rolling", "q_stl_lite", "q_sweep",
    "q_eventize", "q_event_metrics", "q_label_windows", "q_mad",
    "q_dedup_exact", "q_text_stats", "q_topk_orders",
    "q_kalman", "q_bocpd", "q_hybrid",
    "q_minhash", "q_ngram_jaccard", "q_dedup_resolve", "q_simhash",
    "q_cosine_topk",
    "q_ann_lsh", "q_ann_ivf", "q_embed_neardup", "q_quality", "q_langid",
    "q5_region_revenue", "q_kmeans", "q_session", "q_qq", "q_bsts")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = headline.filter(SparkEntry.queries.contains)
    // untimed warmup: absorb JVM/JIT/codegen startup so the first timed
    // query measures steady-state execution, not session bring-up
    try {
      SparkEntry.queries("q1_pricing")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val errors = scala.collection.mutable.ListBuffer[String]()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            errors += s"$name: ${e.getClass.getSimpleName}"
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errs = errors.map(e => "\"" + e.replace("\"", "'") + "\"")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
