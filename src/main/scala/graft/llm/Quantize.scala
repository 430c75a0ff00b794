package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization and the two-stage re-ranked ANN
  * it enables (builder brief: similarity-search scale path).
  *
  * Why this matters at 100 TB: a float32 embedding column dominates the
  * storage, shuffle, and memory footprint of every ANN/dedup job. A
  * global-absmax int8 copy is 4× smaller EVERYWHERE it travels, and
  * because one global scale multiplies every component, it cancels in
  * the cosine — the coarse stage ranks on quantized vectors directly,
  * never dequantizing, losing only rounding noise. The standard
  * production recipe (coarse-quantized scan → exact float re-rank of a
  * small oversampled candidate set) composes with the IVF index for the
  * full FAISS-style stack — [[Similarity.ivfSearchQ8]] runs this
  * two-stage scheme within the probed cells only.
  */
object Quantize {

  /** Global absmax of a vector column — the quantization scale. One
    * aggregate pass; per-row absmax folds inside the scan, the global
    * max is a tiny all-reduce. */
  def fitScale(df: DataFrame, vec: String): Double = {
    val row = df.agg(max(aggregate(col(vec), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double")))))).head()
    // max() over an empty corpus (or all-null vectors) aggregates to
    // null — fold that into the require instead of NPE-ing on getDouble
    require(!row.isNullAt(0) && row.getDouble(0) > 0,
      "cannot quantize an empty, all-null, or all-zero corpus")
    row.getDouble(0)
  }

  /** `array<tinyint>` quantized copy of `vec`: round(v / scale * 127),
    * clamped to ±127 so a query vector slightly OUTSIDE the corpus's
    * fitted range saturates instead of tripping the ANSI overflow check
    * on the tinyint cast. */
  def quantized(vec: Column, scale: Double): Column =
    transform(vec, x =>
      greatest(least(round(x.cast("double") / scale * 127), lit(127.0)),
        lit(-127.0)).cast("tinyint"))

  /** Two-stage quantized top-k:
    *
    *  1. COARSE — int8 cosine ([[graft.functions.VecDot]] runs a
    *     primitive byte loop under codegen) over the quantized corpus
    *     against the broadcast quantized queries; keep `k × oversample`
    *     candidates per query. Float vectors never enter this stage —
    *     its shuffle and scan footprint is the 4×-smaller int8 column.
    *  2. EXACT — join the survivors' float vectors back (linear in the
    *     candidate set, not the corpus) and re-rank for the final k.
    *
    * Oversampling covers coarse-stage rounding inversions near the
    * boundary; AnnRecallSpec pins recall ≥ 0.95 vs [[Similarity
    * .bruteForceTopK]] at the default oversample on the sf0.01
    * embeddings. Ties break by corpus id in both stages, so the result
    * is deterministic for any partitioning (fixture-oracle safe). */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, id: String,
                    vec: String, k: Int, oversample: Int = 4): DataFrame = {
    require(k > 0 && oversample > 0, s"k=$k, oversample=$oversample")
    val scale = fitScale(corpus, vec)
    val cq = corpus.select(col(id).as("corpus_id"),
      quantized(col(vec), scale).as("__cq"))
    val qq = queries.select(col(id).as("query_id"),
      quantized(col(vec), scale).as("__qq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__coarse").desc, col("corpus_id").asc)
    val survivors = cq
      .join(broadcast(qq), col("query_id") =!= col("corpus_id"))
      .withColumn("__coarse",
        Similarity.cosineNative(col("__qq"), col("__cq")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k * oversample)
      .select("query_id", "corpus_id")
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    survivors
      .join(corpus.select(col(id).as("corpus_id"), col(vec).as("__cv")),
        "corpus_id")
      .join(broadcast(queries.select(col(id).as("query_id"),
        col(vec).as("__qv"))), "query_id")
      .withColumn("cosine", Similarity.cosineNative(col("__qv"), col("__cv")))
      .withColumn("__r", row_number().over(wx))
      .filter(col("__r") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("__r").cast("long").as("rank"))
  }
}
