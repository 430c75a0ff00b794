package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scale probe (see BENCH_SCALE.md): min-label community
  * detection (q_communities' engine) on the SKEW axis, riding the
  * r14 triangle-probe graph recipe.
  *
  * Claim under test: the per-round message aggregate `min(label) GROUP
  * BY dst` is hub-safe WITHOUT salting, because integer min is a real
  * map-side combiner — a 200k-in-degree hub's messages collapse to ≤
  * one row per map partition before the exchange (unlike the ordered
  * float folds, which buffer per-group structs and need the two-level
  * salt). So a mega-hub graph should cost the SAME as a uniform graph
  * of identical edge count, with no salting anywhere in the operator.
  *
  * Graphs: 200k nodes. Uniform control: ring + two hash out-links
  * (~3-regular, same recipe as the r14 triangle probe). Skew variant:
  * SAME edge count, but one third of edges redirected onto node 0
  * (undirected degree ≈ 200k).
  *
  * warmup + median-of-3 per leg, GC fences, noop sink.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbeR15"
  */
object ScaleProbeR15 {
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
    if (args.isEmpty || args.contains("erblock")) {
      // ---- ER blocking: DEGENERATE-corpus axis ----
      // 5k distinct words engineered into ONE soundex mega-block
      // (identical consonant skeleton, vowel-run lengths 1..100 +
      // digit suffixes for distinctness — soundex strips both), so
      // the pure code block join is forced quadratic. lenBucket=2
      // composes the length sub-bucket into the key: the mega-block
      // splits by length and candidate volume collapses while the
      // CONFIRMED pair set stays identical (PhoneticSpec's losslessness
      // pin, here measured at volume).
      val nW = 20000L
      val words = spark.range(nW)
        .select(concat(lit("b"),
          repeat(lit("a"), pmod(col("id"), lit(100L)).cast("int") + 1),
          lit("kalam"), col("id").cast("string")).as("word"))
        .localCheckpoint()
      def run(b: Int) = graft.llm.Phonetic.soundexBlockedPairs(
        words, "word", "word", maxDist = 2, lenBucket = b)
      val t0b = med3(run(0))
      val t2b = med3(run(2))
      val pairs0 = run(0).count()
      val pairs2 = run(2).count()
      println(s"""{"probe":"r15-erblock-degenerate","words":$nW,""" +
        s""""unbucketed_sec":${r3(t0b)},"lenbucket2_sec":${r3(t2b)},""" +
        s""""speedup":${r3(t0b / t2b)},"confirmed_pairs_equal":""" +
        s"""${pairs0 == pairs2}}""")
    }

    if (args.nonEmpty && !args.contains("communities")) {
      spark.stop(); return
    }
    val n = 200000L
    import spark.implicits._
    val nodes = spark.range(n).toDF("id").localCheckpoint()
    // ring + two hash links, ~600k directed edges
    def uniformEdges: DataFrame = {
      val b = spark.range(n).toDF("src")
      b.select(col("src"), ((col("src") + 1) % n).as("dst"))
        .unionByName(b.select(col("src"),
          ((col("src") * 48271 + 11) % n).as("dst")))
        .unionByName(b.select(col("src"),
          ((col("src") * 16807 + 7) % n).as("dst")))
        .localCheckpoint()
    }
    // same edge count; the third leg all lands on node 0 (mega-hub)
    def skewEdges: DataFrame = {
      val b = spark.range(n).toDF("src")
      b.select(col("src"), ((col("src") + 1) % n).as("dst"))
        .unionByName(b.select(col("src"),
          ((col("src") * 48271 + 11) % n).as("dst")))
        .unionByName(b.select(col("src"), lit(0L).as("dst")))
        .localCheckpoint()
    }
    def communities(e: DataFrame): DataFrame =
      graft.graph.Communities.minLabelPropagation(
        nodes, "id", e, "src", "dst", rounds = 3)
    val eu = uniformEdges
    val es = skewEdges
    val tu = med3(communities(eu))
    val ts = med3(communities(es))
    println(s"""{"probe":"r15-communities-skew","nodes":$n,""" +
      s""""uniform_sec":${r3(tu)},"skew_sec":${r3(ts)},""" +
      s""""ratio":${r3(ts / tu)}}""")
    spark.stop()
  }
}
