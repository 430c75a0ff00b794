package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 scale probe (see BENCH_SCALE.md): blocked edit-distance
  * near-dup pairs on the DOC-COUNT axis.
  *
  * BENCH_NOTES r13 observed the (prefix, len-bucket) block join
  * BROADCASTS the emitted side at sf0.1 (5k docs) — fine there, but
  * the corpus-scale claim needs the join demonstrated SHUFFLING once
  * the emitted side exceeds the broadcast threshold, with candidate
  * volume staying block-bounded (≈ linear in docs, not quadratic).
  *
  * Corpus construction: c copies of the sf0.1 documents table, each
  * copy's text carrying a distinct 5-char version prefix, ids offset
  * per copy. Distinct prefixes keep copies in DISJOINT blocks — the
  * per-block pair density stays that of the original corpus, so the
  * honest expectation for a block-bounded join is ~linear runtime in
  * c, and a quadratic blow-up would be visible immediately.
  *
  * warmup + median-of-3 per leg, GC fences, noop sink; the final
  * (post-AQE) join operator is recorded per leg.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbeR14"
  */
object ScaleProbeR14 {
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
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)

    def corpus(c: Int): DataFrame =
      (0 until c).map { k =>
        docs.select(
          (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          concat(lit(f"v$k%03d-"), col("text")).as("text"))
      }.reduce(_.unionByName(_)).localCheckpoint()

    if (args.isEmpty || args.contains("triangles")) {
      // ---- triangles: SKEW axis ----
      // 200k nodes. Uniform control: ring + two hash out-links per
      // node (~3-regular). Skew variant: SAME edge count but every
      // node's first link goes to ONE mega-hub (undirected degree
      // 200k). An id-oriented wedge join would emit ~hub-deg² pairs
      // (2·10¹⁰ — dead); the (degree, id) orientation caps the hub's
      // out-degree so wedge volume stays arboricity-bounded and the
      // skewed graph must cost ~the uniform one.
      import spark.implicits._
      val n = 200000L
      val ids = spark.range(n).select(col("id"))
      def edgesOf(firstDst: org.apache.spark.sql.Column) =
        ids.select(col("id").as("src"), firstDst.as("dst"))
          .unionByName(ids.select(col("id").as("src"),
            ((col("id") * 7 + 3) % n).as("dst")))
          .unionByName(ids.select(col("id").as("src"),
            ((col("id") * 131 + 17) % n).as("dst")))
      val uniform = edgesOf((col("id") + 1) % n)
      val skewed = edgesOf(lit(0L))
      println("=== triangles: skew axis (200k nodes, 3 links/node) ===")
      for ((name, e) <- Seq("uniform" -> uniform, "mega-hub" -> skewed)) {
        val t = med3(graft.graph.Triangles.triangleCounts(
          ids, "id", e, "src", "dst"))
        println(s"triangles graph=$name t=${r3(t)}s")
      }
    }

    println("=== editDistancePairs: doc-count axis ===")
    for (c <- Seq(1, 4, 16, 64)) {
      val cp = corpus(c)
      val nDocs = cp.count()
      def pairsDf = graft.llm.Dedup.editDistancePairs(
        cp, "doc_id", "text", maxDist = 40)
      val pd = pairsDf
      val nPairs = pd.count()
      val joinOp = {
        val p = pd.queryExecution.executedPlan.toString
        val op =
          if (p.contains("SortMergeJoin")) "SortMergeJoin"
          else if (p.contains("ShuffledHashJoin")) "ShuffledHashJoin"
          else if (p.contains("BroadcastHashJoin")) "BroadcastHashJoin"
          else "OTHER"
        p.linesIterator.filter(l => l.contains("Join") ||
          l.contains("Exchange")).take(4).foreach(l =>
          println("  plan: " + l.trim.take(160)))
        op
      }
      val t = med3(pairsDf)
      println(s"editdist c=$c docs=$nDocs pairs=$nPairs " +
        s"join=$joinOp t=${r3(t)}s")
    }
    spark.stop()
  }
}
