package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan probe for the r15 PageRank loop shape: replicates a
  * single iteration against checkpointed eP/ndState (the partitioning
  * the real loop sees) and prints the physical plan, so the three
  * claims are checkable in the output: (1) the edges side re-enters
  * the contribution join with NO exchange, (2) ONE hash(__dst)
  * exchange feeds both fold levels, (3) the update join is
  * co-partitioned (no exchange on either side). AQE off so the static
  * plan shows the exchanges that would materialize. */
object PrPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val m = d.agg((max("doc_id") + 1).as("__m"))
    val withM = d.crossJoin(broadcast(m))
    val edges = withM.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 1) % col("__m")).as("dst"))
      .unionByName(withM.select(col("doc_id").as("src"),
        ((col("doc_id") * 13 + 3) % col("__m")).as("dst")))
    val e = edges.select(col("src").cast("long").as("__src"),
        col("dst").cast("long").as("__dst"))
      .filter(col("__src") =!= col("__dst")).distinct()
    val eP = e.repartition(col("__src")).localCheckpoint()
    val deg = eP.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val nd = d.select(col("doc_id").cast("long").as("__id")).distinct()
    val ndState = nd
      .join(deg.withColumnRenamed("__src", "__id"), Seq("__id"), "left")
      .repartition(col("__id")).localCheckpoint()
    val n = nd.count()
    val r0 = ndState.select(col("__id"),
      (lit(1.0) / lit(n)).as("__rank"), col("__deg"))
    // mimic Checkpoints.fresh: partitioning info is LOST on the state
    val cp = r0.localCheckpoint()
    val ranks = spark.createDataFrame(cp.rdd, cp.schema)
    val contrib = eP
      .join(ranks.hint("shuffle_hash"), eP("__src") === ranks("__id"))
      .select(col("__dst"), col("__src"),
        (col("__rank") / col("__deg")).as("__c"),
        pmod(col("__src"), lit(64L)).as("__sb"))
      .repartition(col("__dst"))
      .groupBy("__dst", "__sb")
      .agg(graft.core.Folds.orderedSum(col("__src"), col("__c")).as("__ps"))
      .groupBy("__dst")
      .agg(graft.core.Folds.orderedSum(col("__sb"), col("__ps")).as("__cs"))
    val update = ndState
      .join(contrib.hint("shuffle_hash"),
        ndState("__id") === contrib("__dst"), "left")
      .select(col("__id"),
        (lit(1.0 - 0.85) / lit(n) +
          lit(0.85) * coalesce(col("__cs"), lit(0.0))).as("__rank"),
        col("__deg"))
    println(update.queryExecution.executedPlan.toString)
    val nEx = update.queryExecution.executedPlan.collect {
      case x if x.nodeName.contains("Exchange") => x
    }.size
    println(s"EXCHANGES=$nEx")
    spark.stop()
  }
}
