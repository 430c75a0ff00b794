package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof companion to `Bench` (see BENCH_SCALE.md): times
  * OPERATOR CALLS (not registered queries) at sf0.1 and the GenScale
  * sf1 slice, for operators whose registered query deliberately runs a
  * small-corpus parameterization. Today that is embeddingNearDup:
  * `q_embed_neardup` pins 2-bit bands because the fixture corpus's
  * true pairs live at cosine 0.4-0.5, and 2-bit bands are
  * candidate-quadratic BY DESIGN (documented at the registration
  * site). The production near-dup regime (target cosine ≥ 0.8) is
  * wide bands — this probe measures that regime's scaling.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
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
    val dirs = Seq("/root/testdata/sf0.1" -> "sf0.1",
      "/tmp/graft_sf1" -> "sf1")
    def measure(dir: String, planes: Int, bands: Int): Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .repartition(32)
      def op = graft.llm.Dedup.embeddingNearDup(emb, "vec_id",
        "embedding", minCosine = 0.8, planes = planes, bands = bands)
      time(op) // untimed warmup
      (1 to 3).map(_ => { System.gc(); time(op) }).sorted.apply(1)
    }
    // 1. FIXED parameters at both scales: exposes the n²·P_rand random-
    //    collision floor any fixed LSH banding has (8-bit bands → 256
    //    keys/band; 10× docs = 10× occupancy = 100× random candidates)
    val fixedOut = dirs.map { case (dir, tag) =>
      s""""$tag":${r3(measure(dir, 64, 8))}"""
    }
    println(s"""{"op":"embed_neardup_fixed(64/8,min=0.8)",${fixedOut.mkString(",")}}""")
    // 2. SCALE-TUNED: more bits per band at the larger scale (16-bit
    //    bands → 65536 keys) drops bucket occupancy back below 1 —
    //    band width must grow ~log2(n) to hold occupancy constant,
    //    the documented 100 TB scaling law for banded LSH
    val tunedOut = Seq(
      s""""sf0.1":${r3(measure(dirs(0)._1, 64, 8))}""",
      s""""sf1":${r3(measure(dirs(1)._1, 64, 4))}""")
    println(s"""{"op":"embed_neardup_tuned(8bit -> 16bit bands,min=0.8)",${tunedOut.mkString(",")}}""")
    spark.stop()
  }
}
