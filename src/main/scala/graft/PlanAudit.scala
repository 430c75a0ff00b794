package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump physical-plan summaries for scale hygiene review. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false) and
      // defers codegen insertion to execution, so the static audit would
      // always report zero codegen spans; disable it here (the audit
      // inspects static shape — production sessions keep AQE on)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing", "q_rolling", "q_label_windows", "q_join_agg",
      "q_zscore", "q_eventize")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      val bcasts = "BroadcastExchange".r.findAllIn(plan).size
      val sorts = "Sort \\[".r.findAllIn(plan).size
      val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
      // executedPlan.toString marks codegen stages as "*(n)" prefixes;
      // count distinct stage ids
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      println(s"== $n: shuffles=$exchanges broadcasts=$bcasts sorts=$sorts " +
        s"pushedFilterScans=$pushed codegenSpans=$wsc bnlj=$bnlj")
    }
    spark.stop()
  }
}
