package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 ranked retrieval (Robertson et al., TREC-3 1994; the
  * `ln(1 + ...)` idf floor is Lucene's non-negative variant) — the
  * lexical search face of the corpus: decontamination triage
  * ("which training docs does this benchmark question retrieve?"),
  * nearest-neighbor text lookup next to the embedding ANN tier, and
  * the standard sparse baseline any retrieval eval needs.
  *
  *   score(q,d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *   idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))
  *
  * Architecture is the inverted-index shape: one explode+aggregate
  * builds the postings (term → doc, tf) and per-doc lengths, the
  * 1-row corpus stats (N, avgdl) ride a broadcast, the query terms
  * join the postings on the term key (broadcast when the query set is
  * small — the planner sees its size), and the per-(query,doc) sum
  * folds the per-term contributions IN TERM ORDER
  * (`sort_array(collect_list(struct(term, contrib)))` + `aggregate`),
  * so the float sum is engine-reproducible bit-for-bit — the
  * q_perplexity convention, mirrored in the oracle's
  * `list_reduce(list(... ORDER BY term))`.
  *
  * At 100 TB: postings and lengths are one shuffle each on keys with
  * natural cardinality (term, doc); the candidate fan-out is bounded
  * by Σ_t df(t) over QUERY terms only — never a corpus cross
  * product; the final top-k window partitions by query. */
object Bm25 {

  /** Top-k docs per query by BM25. `queries` is (queryId, textCol);
    * scores are rounded to 6 digits and ranked (score desc, doc_id
    * asc) on the ROUNDED value — the q_tfidf ranking convention. */
  def topK(docs: DataFrame, queries: DataFrame, docId: String,
           queryId: String, textCol: String, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val words = docs.select(col(docId).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val qterms = queries.select(col(queryId).as("query_id"),
        explode(split(col(textCol), " ")).as("term"))
      .distinct()
    val idf: Column = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfPart: Column =
      col("tf").cast("double") * (lit(k1) + lit(1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl").cast("double") / col("avgdl")))
    val contribs = qterms.join(tf, "term")
      .join(dl, "doc_id")
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("term"),
        (idf * tfPart).as("contrib"))
    val scored = contribs.groupBy("query_id", "doc_id")
      .agg(round(aggregate(
        sort_array(collect_list(struct(col("term"), col("contrib")))),
        lit(0.0), (acc, x) => acc + x.getField("contrib")), 6)
        .as("bm25"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
