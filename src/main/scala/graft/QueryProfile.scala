package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev tool (optimization rounds): run named queries with the bench
  * session shape and print (a) the full build+materialize wall time —
  * the quantity Bench times, including any eager checkpoints inside the
  * query lambda — and (b) the executed plan's per-operator metrics (rows
  * out, operator wall times, shuffle bytes): the local[] substitute for
  * the Spark UI SQL tab (spark.ui is off in this sandbox).
  * Materialization is `queryExecution.toRdd.foreachPartition` — every
  * column of every row computed, like the noop sink, but against the
  * SAME QueryExecution whose metrics we then read (a `.write` would
  * plan a fresh one and leave this one's metrics empty).
  * Usage: runMain graft.QueryProfile q1 q2 ...
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.EngineTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall times during the whole invocation (build + final
    // materialize): iterative queries do their work in DRIVER-ACTION
    // jobs during DataFrame construction, invisible to plan metrics
    val jobLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, String)]()
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time,
          js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse(""),
          js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) jobLog.add((je.jobId, s._1, je.time, s._3, s._2))
      }
    }
    args.foreach { name =>
      // warmup invocation (codegen, broadcasts, page cache)
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.gc()
      jobLog.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val qe = df.queryExecution
      qe.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val sec = (System.nanoTime() - t0) / 1e9
      // drain BEFORE removing: the listener bus is async, so the final
      // job's onJobEnd can post after removal and be silently dropped,
      // under-reporting the job-time sum (ADVICE r18)
      Thread.sleep(200)
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name%s: $sec%.2f s warm (build $tBuild%.2f s)")
      val jl = jobLog.toArray(Array.empty[(Int, Long, Long, Int, String)])
        .sortBy(_._1)
      println(s"  jobs: ${jl.length}, " +
        f"sum ${jl.map(j => j._3 - j._2).sum / 1e3}%.2f s")
      jl.filter(j => j._3 - j._2 >= 50).foreach { case (id, s, e, nt, nm) =>
        println(f"  job $id%4d ${(e - s) / 1e3}%6.2f s tasks=$nt%4d  $nm%s")
      }
      def dump(p: SparkPlan, depth: Int): Unit = {
        val m = p.metrics.toSeq
          .filter { case (_, v) => v.value != 0 && v.value != -1 }
          .sortBy(_._1)
          .map { case (k, v) => s"$k=${v.value}" }
          .mkString(" ")
        println("  " * depth + p.nodeName + (if (m.nonEmpty) s" [$m]" else ""))
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec => Seq(s.plan)
          case _ => p.children ++ p.subqueries
        }
        kids.foreach(dump(_, depth + 1))
      }
      dump(qe.executedPlan, 1)
    }
    spark.stop()
  }
}
