package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Pq, Similarity}

/** Parameter-grid recall probe for [[graft.llm.Pq]] on the sf0.01
  * embeddings (diffuse corpus — the hard case): sweeps (m, ksub,
  * oversample) against the brute-force truth. The m=16/ksub=64
  * defaults come from this sweep (0.93 at oversample 8; m=8/ksub=16
  * measures 0.6 on the same corpus).
  *
  *   sbt "Test/runMain graft.tools.PqProbe"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 3
    val truth = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, ksub, os) <- Seq((8,16,8), (8,16,32), (16,16,8), (16,16,16), (8,64,8), (16,64,8))) {
      val pq = Pq.pqTopK(emb, queries, "vec_id", "embedding", k, m, ksub, os)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"PQPROBE m=$m ksub=$ksub os=$os recall=" + ((truth & pq).size.toDouble / truth.size))
    }
    spark.stop()
  }
}
