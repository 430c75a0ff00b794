package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashingTfSpec extends SparkSpec {

  private def corpus(docs: Seq[String]) = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  /** The portable polynomial hash, recomputed longhand. */
  private def polyHash(term: String): Long =
    term.foldLeft(0L)((a, c) => (a * 1000003L + c.toLong) % 2147483647L)

  test("vectorize: buckets counts by the portable hash, dense dim-vector") {
    val dim = 16
    val out = HashingTf.vectorize(corpus(Seq("cat dog cat", "bird")),
        "doc_id", "text", dim)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    assert(out(0L).length == dim && out(1L).length == dim)
    assert(out(0L).sum == 3.0, "three tokens in doc 0")
    assert(out(1L).sum == 1.0)
    val catB = (polyHash("cat") % dim).toInt
    val dogB = (polyHash("dog") % dim).toInt
    val birdB = (polyHash("bird") % dim).toInt
    assert(out(0L)(catB) >= 2.0, "cat counted twice in its bucket")
    assert(out(0L)(dogB) >= 1.0)
    assert(out(1L)(birdB) == 1.0)
    // no vocabulary leakage: buckets not hit stay exactly zero
    val hit0 = Set(catB, dogB)
    assert(out(0L).zipWithIndex.collect {
      case (v, i) if !hit0.contains(i) => v }.forall(_ == 0.0))
  }

  test("hashedCosineTopK: self-similarity 1.0, duplicates found, orthogonal text low") {
    val docs = corpus(Seq(
      "alpha beta gamma delta",
      "alpha beta gamma delta",      // exact duplicate of doc 0
      "epsilon zeta eta theta",
      "alpha beta other words here"))
    val queries = docs.filter(col("doc_id") === 0)
    val out = HashingTf.hashedCosineTopK(docs, queries, "doc_id",
        "text", dim = 64, k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("cosine"), r.getAs[Long]("rank"))).toMap
    assert(out(0L)._1 == 1.0 && out(1L)._1 == 1.0,
      "self and exact duplicate at cosine 1")
    assert(Set(out(0L)._2, out(1L)._2) == Set(1L, 2L))
    assert(out(3L)._1 > out(2L)._1,
      "partial overlap beats (likely-)disjoint text")
  }

  test("rrfFuse: hand-computed fusion incl. single-list docs") {
    import spark.implicits._
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 13L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = HashingTf.rrfFuse(a, b, k = 4, c = 60)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("rrf"), r.getAs[Long]("rank"))).toMap
    def rr(r: Long) = 1.0 / (60.0 + r)
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    assert(out(11L)._1 == r9(rr(2) + rr(1)), "doc in both lists sums")
    assert(out(10L)._1 == r9(rr(1)))
    assert(out(13L)._1 == r9(rr(2)))
    assert(out(12L)._1 == r9(rr(3)))
    // 11 (two contributions) must outrank every single-list doc
    assert(out(11L)._2 == 1L)
    assert(out(10L)._2 == 2L) // rr(1) > rr(2) > rr(3)
    assert(out(13L)._2 == 3L && out(12L)._2 == 4L)
  }

  test("hybrid: rrf surfaces a doc that each single ranker underranks") {
    // doc X is rank 2 in both lists; docs A/B are rank 1 in exactly
    // one list each — RRF puts X first (2/(60+2) > 1/(60+1) + 0)
    import spark.implicits._
    val a = Seq((0L, 1L, 1L), (0L, 9L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 2L, 1L), (0L, 9L, 2L)).toDF("query_id", "doc_id", "rank")
    val top = HashingTf.rrfFuse(a, b, k = 1).collect().head
    assert(top.getAs[Long]("doc_id") == 9L)
  }

  test("deterministic under repartition") {
    val docs = corpus(Seq.tabulate(30)(i =>
      Seq.tabulate(10)(j => s"t${(i * 5 + j * 7) % 23}").mkString(" ")))
    val q = docs.filter(col("doc_id") < 3)
    val f = HashingTf.hashedCosineTopK(docs, q, "doc_id", "text",
      dim = 32, k = 5).orderBy("query_id", "rank").collect().toSeq
    val g = HashingTf.hashedCosineTopK(docs.repartition(9),
      q.repartition(2), "doc_id", "text", dim = 32, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(f == g)
  }
}
