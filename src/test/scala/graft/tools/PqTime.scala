package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Pq

/** Phase-level wall-clock split of the one-shot q_ann_pq pipeline. */
object PqTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(sys.env.getOrElse("PQTIME_DIR", "/root/testdata/sf0.1") + "/embeddings.parquet")
    emb.count()
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val model = Pq.pqTrain(emb, "vec_id", "embedding")
      val tTrain = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      emb.write.format("noop").mode("overwrite").save()
      val tCal = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val codes = Pq.pqEncode(model, emb, "vec_id", "embedding")
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val cnt = codes.count()
      val tCount = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      codes.write.format("noop").mode("overwrite").save()
      val tEncode = (System.nanoTime() - t0) / 1e9
      println(f"PQTIME cal=$tCal%.2f build=$tBuild%.2f count=$tCount%.2f n=$cnt")
      t0 = System.nanoTime()
      Pq.pqSearch(model, codes, emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3).write.format("noop").mode("overwrite").save()
      val tSearch = (System.nanoTime() - t0) / 1e9
      println(f"PQTIME rep=$rep train=$tTrain%.2f encode=$tEncode%.2f search=$tSearch%.2f")
    }
    spark.stop()
  }
}
