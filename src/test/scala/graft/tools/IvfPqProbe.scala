package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.models.DetKMeans

/** Stage-timing probe for the IVF-PQ one-shot path — the measurement
  * behind `ivfPqBuild`'s localCheckpoint (see the comment there).
  *
  * Replicates the build stage-by-stage WITHOUT the checkpoint so the
  * rejected shape stays measurable: `search_lazy_codes` evaluates the
  * search over a codes frame whose lineage still contains assignExpr +
  * the codebook literals — project-collapse duplicates those trees
  * into every downstream operator (measured 8.8 s vs 0.7 s cached at
  * sf0.1, pure plan-analysis/duplicated-expression overhead on 2 000
  * rows). `search_cached_codes` is the shipped shape.
  *
  *   sbt "Test/runMain graft.tools.IvfPqProbe"
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet").repartition(32)
    emb.count()
    val u = emb.select(col("vec_id").as("__ord"),
        col("embedding").cast("array<double>").as("__dv0"))
      .withColumn("__n",
        sqrt(aggregate(col("__dv0"), lit(0.0), (a, x) => a + x * x)) +
          lit(1e-12))
      .select(col("__ord"),
        transform(col("__dv0"), x => x / col("__n")).as("__dv"))
    val km = t("ivf_fit") {
      DetKMeans.fit(u, "__dv", "__ord", 16, maxIter = 10, seed = 13L)
    }
    val cents = km.centroids.map(_.toSeq).toSeq
    val resid = u.withColumn("__cell", km.assignExpr(col("__dv")))
      .withColumn("__rv", zip_with(col("__dv"),
        element_at(typedlit(cents), col("__cell") + lit(1)),
        (x, c) => x - c))
    t("resid_pass") { resid.write.format("noop").mode("overwrite").save() }
    val sample = resid.select(col("__ord"), col("__rv").as("__dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sample_mat") { sample.count() }
    val books = t("pq_train_books") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence((0 until 16).toList.map { j =>
        Future {
          val sv = sample.select(col("__ord"),
            slice(col("__dv"), j * 4 + 1, 4).as("__sv"))
          DetKMeans.fit(sv, "__sv", "__ord", 64, maxIter = 5,
            seed = 1013L + j, buckets = 16).centroids.map(_.toSeq).toSeq
        }
      }), Duration.Inf)
    }
    val pm = graft.llm.Pq.PqModel(64, 16, 64, books)
    if (!spark.catalog.functionExists("pq_codes"))
      graft.functions.PqCodes.register(spark)
    val codes = resid.select(col("__ord").as("corpus_id"), col("__cell"),
      call_function("pq_codes", col("__rv"),
        typedlit(pm.codebooks)).as("__code"))
    t("encode_pass") { codes.write.format("noop").mode("overwrite").save() }
    val q = emb.filter(col("vec_id") < 5)
    val lazyIdx = graft.llm.Pq.IvfPqIndex(codes, cents, pm)
    t("search_lazy_codes") {
      graft.llm.Pq.ivfPqSearch(lazyIdx, emb, q, "vec_id", "embedding", 3)
        .write.format("noop").mode("overwrite").save()
    }
    val cachedIdx = graft.llm.Pq.IvfPqIndex(codes.localCheckpoint(true),
      cents, pm)
    t("search_cached_codes") {
      graft.llm.Pq.ivfPqSearch(cachedIdx, emb, q, "vec_id", "embedding", 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
