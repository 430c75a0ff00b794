package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump physical-plan summaries for scale hygiene review. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
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
      val wsc = "WholeStageCodegen".r.findAllIn(plan).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      println(s"== $n: shuffles=$exchanges broadcasts=$bcasts sorts=$sorts " +
        s"pushedFilterScans=$pushed codegenSpans=$wsc bnlj=$bnlj")
    }
    spark.stop()
  }
}
