package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 scale probe (see BENCH_SCALE.md): evidence at volume for
  * the round's three structural changes.
  *
  * 1. `communities` — early-stop vs fixed-R min-label propagation on a
  *    200k-node expander (out-links i→7i+1, i→13i+3 mod n; undirected
  *    closure has small diameter, so a 64-round budget mostly burns
  *    no-change rounds). Claim: earlyStop detects the fixed point from
  *    the cached round state (one nodes-sized scan per round, no extra
  *    join), terminates in ~diameter rounds, and the output is
  *    IDENTICAL to the fixed-R read.
  *
  * 2. `hits` — the r16 fused loop at 200k nodes / 600k directed edges
  *    (3× the sf0.1 bench graph): jobs-per-invocation counted by a
  *    SparkListener. The r15 shape scheduled ~2 barriers per iteration
  *    + 2 maxDeg jobs + a 5-job end normalization; the fused loop cuts
  *    that roughly in half with identical exchanges — at volume the
  *    saving is bounded (it is fixed cost), so the claim to check is
  *    "no regression and fewer jobs", not a big speedup.
  *
  * 3. `bucketed` — the q_bucketed lever measured in SHUFFLE BYTES, not
  *    seconds: the same lineitem⋈orders SMJ (merge-hinted on both
  *    variants so test-scale broadcast doesn't fake the comparison)
  *    over plain parquet vs bucketBy(8)-written tables at sf0.1.
  *    Claim: the bucketed join's shuffle write collapses to the final
  *    aggregate's few KB — the fact-sized exchange is paid once at
  *    write time and never again, which is the whole point at 100 TB.
  *
  * warmup + median-of-3 per timed leg, GC fences, noop sink.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbeR16 [communities|hits|bucketed]"
  */
object ScaleProbeR16 {
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
    val jobs = new AtomicInteger(0)
    val shuffleBytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    /** (seconds, jobs, shuffle-write bytes) for ONE invocation, with a
      * listener-bus settle pause before reading the counters. */
    def instrumented(df: => DataFrame): (Double, Int, Long) = {
      jobs.set(0); shuffleBytes.set(0L)
      spark.sparkContext.addSparkListener(listener)
      val t = time(df)
      Thread.sleep(1500) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      (t, jobs.get, shuffleBytes.get)
    }

    val n = 200000L
    def nodes = spark.range(n).toDF("id")
    def edges = spark.range(n).select(col("id").as("src"),
        ((col("id") * 7 + 1) % n).as("dst"))
      .unionAll(spark.range(n).select(col("id").as("src"),
        ((col("id") * 13 + 3) % n).as("dst")))
      .unionAll(spark.range(n).select(col("id").as("src"),
        ((col("id") * 31 + 11) % n).as("dst")))

    if (args.isEmpty || args.contains("communities")) {
      val nd = nodes.localCheckpoint()
      val ed = edges.localCheckpoint()
      def run(es: Boolean) = graft.graph.Communities
        .minLabelPropagation(nd, "id", ed, "src", "dst", 64,
          earlyStop = es)
      val diff = run(es = true).withColumnRenamed("community", "c1")
        .join(run(es = false).withColumnRenamed("community", "c2"), "id")
        .filter(col("c1") =!= col("c2")).count()
      val tEarly = med3(run(es = true))
      val tFixed = time(run(es = false)) // 64 eager rounds — once is plenty
      println(s"""{"probe":"r16-communities-earlystop","nodes":$n,""" +
        s""""earlystop_sec":${r3(tEarly)},"fixed64_sec":${r3(tFixed)},""" +
        s""""speedup":${r3(tFixed / tEarly)},"labels_equal":${diff == 0}}""")
    }

    if (args.isEmpty || args.contains("hits")) {
      val nd = nodes.localCheckpoint()
      val ed = edges.localCheckpoint()
      def run = graft.graph.Hits.hits(nd, "id", ed, "src", "dst",
        iters = 5)
      val t = med3(run)
      val (t1, j1, _) = instrumented(run)
      println(s"""{"probe":"r16-hits-fused","nodes":$n,"edges":600000,""" +
        s""""median_sec":${r3(t)},"solo_sec":${r3(t1)},""" +
        s""""jobs_per_invocation":$j1}""")
    }

    if (args.isEmpty || args.contains("bucketed")) {
      val sf = "/root/testdata/sf0.1"
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
      def agg(lf: DataFrame, of: DataFrame): DataFrame =
        lf.hint("merge").join(of, lf("l_orderkey") === of("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"))
      graft.io.Bucketed.writeBucketed(l, "graft_probe_l",
        Seq("l_orderkey"), 8)
      graft.io.Bucketed.writeBucketed(o, "graft_probe_o",
        Seq("o_orderkey"), 8)
      val lb = spark.table("graft_probe_l")
      val ob = spark.table("graft_probe_o")
      // warmups, then one instrumented run per variant
      time(agg(l, o)); time(agg(lb, ob))
      val (tp, _, bp) = instrumented(agg(l, o))
      val (tb, _, bb) = instrumented(agg(lb, ob))
      println(s"""{"probe":"r16-bucketed-shuffle","sf":"sf0.1",""" +
        s""""plain_sec":${r3(tp)},"plain_shuffle_bytes":$bp,""" +
        s""""bucketed_sec":${r3(tb)},"bucketed_shuffle_bytes":$bb,""" +
        s""""shuffle_reduction":${r3(bp.toDouble /
          math.max(bb, 1L).toDouble)}}""")
    }
    spark.stop()
  }
}
