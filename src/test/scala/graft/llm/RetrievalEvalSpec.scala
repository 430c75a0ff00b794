package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalEvalSpec extends SparkSpec {

  private def ranks(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "rank")
  }

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("hand-computed recall/MRR/nDCG on a known ranking") {
    // truth for q0: docs {1, 2, 3}; result order: 5, 2, 7, 1, 9, 3
    val truth = ranks(Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
    val result = ranks(Seq((0L, 5L, 1L), (0L, 2L, 2L), (0L, 7L, 3L),
      (0L, 1L, 4L), (0L, 9L, 5L), (0L, 3L, 6L)))
    val r = RetrievalEval.evalRanking(result, truth, k = 5)
      .collect().head
    assert(r.getAs[Long]("n_rel") == 3L)
    // relevant positions: 2, 4, 6 -> within k=5: {2, 4}
    assert(math.abs(r.getAs[Double]("recall_at_k") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("mrr") - 0.5) < 1e-12)
    val dcg = 1 / log2(3) + 1 / log2(5)
    val idcg = 1 / log2(2) + 1 / log2(3) + 1 / log2(4)
    assert(math.abs(r.getAs[Double]("ndcg_at_k") - dcg / idcg) < 1e-12)
  }

  test("perfect ranking scores 1.0 everywhere") {
    val truth = ranks(Seq((0L, 10L, 1L), (0L, 11L, 2L)))
    val result = ranks(Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L)))
    val r = RetrievalEval.evalRanking(result, truth, k = 5)
      .collect().head
    assert(r.getAs[Double]("recall_at_k") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(math.abs(r.getAs[Double]("ndcg_at_k") - 1.0) < 1e-12)
  }

  test("ranking that misses everything scores 0 (and MRR=0 with no hit)") {
    val truth = ranks(Seq((0L, 1L, 1L)))
    val result = ranks(Seq((0L, 8L, 1L), (0L, 9L, 2L)))
    val r = RetrievalEval.evalRanking(result, truth, k = 5)
      .collect().head
    assert(r.getAs[Double]("recall_at_k") == 0.0)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("hit beyond k counts for MRR but not recall@k or nDCG@k") {
    val truth = ranks(Seq((0L, 1L, 1L)))
    val result = ranks(Seq((0L, 7L, 1L), (0L, 8L, 2L), (0L, 9L, 3L),
      (0L, 4L, 4L), (0L, 5L, 5L), (0L, 1L, 6L)))
    val r = RetrievalEval.evalRanking(result, truth, k = 5)
      .collect().head
    assert(r.getAs[Double]("recall_at_k") == 0.0)
    assert(math.abs(r.getAs[Double]("mrr") - 1.0 / 6) < 1e-12)
    assert(r.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("per-query independence over multiple queries") {
    val truth = ranks(Seq((0L, 1L, 1L), (1L, 2L, 1L)))
    val result = ranks(Seq((0L, 1L, 1L), (1L, 9L, 1L), (1L, 2L, 2L)))
    val out = RetrievalEval.evalRanking(result, truth, k = 5)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Double]("mrr")).toMap
    assert(out(0L) == 1.0 && out(1L) == 0.5)
  }
}
