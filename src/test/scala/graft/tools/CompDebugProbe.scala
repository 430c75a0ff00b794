package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off diagnostic: reproduce the DBSCAN ε-graph on the rekeyed
  * sf0.1 events (k=256 → 390-pt series) and run the resolveComponents
  * label loop with per-round change counts, to see why 20 rounds did
  * not converge. */
object CompDebugProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.SparkEntry.readEvents(spark, "/root/testdata/sf0.1")
      .select((col("user_id").cast("long") % 256).as("user_id"),
        col("ts"), col("value").cast("double").as("value"))
    // reproduce Dbscan's pts/nbrs/core/coreEdges (naive path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__sk").orderBy("__o")
    val pts = ev.select(col("user_id").cast("long").as("__sk"),
        col("ts").as("__o"),
        round(col("value") * 100).cast("long").as("__c"))
      .filter(col("__c").isNotNull && col("__sk").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__d",
        col("__c") - coalesce(lag("__c", 1).over(w), col("__c")))
      .withColumn("__nid", col("__sk") * lit(4294967296L) + col("__i"))
      .select("__sk", "__i", "__nid", "__c", "__d")
    val a = pts.select(col("__sk"), col("__nid").as("__na"),
      col("__c").as("__ca"), col("__d").as("__da"))
    val b = pts.select(col("__sk"), col("__nid").as("__nb"),
      col("__c").as("__cb"), col("__d").as("__db"))
    val dx = col("__ca") - col("__cb")
    val dy = col("__da") - col("__db")
    val nbrs = a.join(b, Seq("__sk"))
      .filter(col("__na") =!= col("__nb") &&
        dx * dx + dy * dy <= lit(1000000L))
      .select("__sk", "__na", "__nb")
      .localCheckpoint()
    println(s"== nbr rows: ${nbrs.count()}")
    val deg = nbrs.groupBy("__na").agg(count(lit(1)).as("__n"))
    val core = deg.filter(col("__n") + 1 >= 4).select("__na")
      .localCheckpoint()
    println(s"== core: ${core.count()}")
    val coreB = core.withColumnRenamed("__na", "__nb")
    val coreEdges = nbrs
      .join(core, Seq("__na"))
      .join(coreB, Seq("__nb"))
      .filter(col("__na") < col("__nb"))
      .select(col("__na").as("id_a"), col("__nb").as("id_b"))
    println(s"== core edges: ${coreEdges.count()}")
    // the resolveComponents loop with diagnostics
    val edges = coreEdges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(coreEdges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = core.select(col("__na").as("node"), col("__na").as("comp"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (!converged && i < 40) {
      val neighborMin = edges
        .join(labels, edges("src") === labels("node"))
        .groupBy(col("dst")).agg(min("comp").as("ncomp"))
      val prop = labels
        .join(neighborMin, labels("node") === neighborMin("dst"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp"),
          coalesce(col("ncomp") < col("comp"), lit(false)).as("__chg"))
      val jump = labels.select(col("node").as("__jn"), col("comp").as("__jc"))
      val updated = prop
        .join(jump, prop("comp") === jump("__jn"), "left")
        .select(col("node"),
          coalesce(col("__jc"), col("comp")).as("comp"),
          (col("__chg") || coalesce(col("__jc") < col("comp"), lit(false)))
            .as("__chg"))
        .localCheckpoint(false)
      val changed = updated.filter(col("__chg")).count()
      val ncomps = updated.select("comp").distinct().count()
      println(s"== round $i: changed=$changed comps=$ncomps")
      converged = changed == 0
      labels = updated.drop("__chg")
      i += 1
    }
    println(s"== converged=$converged after $i rounds")
    spark.stop()
  }
}
