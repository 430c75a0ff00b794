package graft.llm

import graft.SparkSpec

/** MMR diversified re-ranking vs an independent driver recompute. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def vecsDf(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)) + 1e-12)

  /** Literal greedy MMR over a given candidate list. */
  private def brute(q: Array[Float],
                    cands: Seq[(Long, Array[Float])], k: Int,
                    lam: Double): Seq[(Long, Double)] = {
    val rel = cands.map { case (id, v) => (id, cos(q, v), v) }
    var remaining = rel.sortBy(x => (-x._2, x._1)).toVector
    var selected = Vector.empty[(Long, Double, Array[Float])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, r, v) =>
        val ms = if (selected.isEmpty) 0.0
          else selected.map(s => cos(v, s._3)).max
        (id, lam * r - (1.0 - lam) * ms, r, v)
      }
      val best = scored.minBy(x => (-x._2, x._1))
      out += ((best._1, best._2))
      selected :+= ((best._1, best._3, best._4))
      remaining = remaining.filterNot(_._1 == best._1)
    }
    out.toSeq
  }

  test("diversity beats pure relevance: near-dup runner-up is demoted") {
    // q at 0°; A at 2° (top), B at 3° (near-dup of A), C at 25°
    // (farther but diverse). Pure top-2 = A, B; diversity-weighted
    // MMR (λ=0.3) = A, C: 0.3·0.9986 − 0.7·cos(1°) = −0.4003 for B
    // vs 0.3·0.9063 − 0.7·cos(23°) = −0.3725 for C.
    def at(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val corpus = vecsDf(Seq((100L, at(2)), (101L, at(3)), (102L, at(25)),
      (0L, at(0))))
    val queries = vecsDf(Seq((0L, at(0))))
    val got = Similarity.mmrTopK(queries, corpus, "vec_id", "embedding",
        k = 2, candidates = 3, lambda = 0.3)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 100L), (2L, 102L)))
    // and the plain cosine ranking would have picked the near-dup
    val rel = Similarity.bruteForceTopK(queries, corpus, "vec_id",
        "embedding", 2).collect().sortBy(_.getLong(3))
      .map(_.getLong(1))
    assert(rel.toSeq === Seq(100L, 101L))
  }

  test("matches the independent greedy recompute exactly") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val queries = Seq((1000L, Array.fill(8)(rnd.nextFloat() * 2f - 1f)),
      (1001L, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val got = Similarity.mmrTopK(vecsDf(queries), vecsDf(corpus),
        "vec_id", "embedding", k = 6, candidates = 15, lambda = 0.7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
      .groupBy(_._1)
    queries.foreach { case (qid, qv) =>
      // candidate set = top-15 by (cosine desc, id asc), self excluded
      val cands = corpus
        .map { case (id, v) => (id, cos(qv, v), v) }
        .sortBy(x => (-x._2, x._1)).take(15).map(x => (x._1, x._3))
      val exp = brute(qv, cands, 6, 0.7)
      val g = got(qid).sortBy(_._2).map(x => (x._3, x._4)).toSeq
      assert(g.map(_._1) === exp.map(_._1), s"query $qid ids")
      g.zip(exp).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-12) }
    }
  }

  test("lambda = 1 reduces to the pure relevance ranking") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 30L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat())))
    val queries = Seq((500L, Array.fill(6)(rnd.nextFloat())))
    val mmr = Similarity.mmrTopK(vecsDf(queries), vecsDf(corpus),
        "vec_id", "embedding", k = 5, candidates = 10, lambda = 1.0)
      .collect().sortBy(_.getLong(1)).map(_.getLong(2))
    val rel = Similarity.bruteForceTopK(vecsDf(queries), vecsDf(corpus),
        "vec_id", "embedding", 5)
      .collect().sortBy(_.getLong(3)).map(_.getLong(1))
    assert(mmr.toSeq === rel.toSeq)
  }

  test("hardNegatives: nearest different-label vectors only") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      // anchor 0 label 1; same-label near-dup 1 must be EXCLUDED
      (0L, Array(1f, 0f, 0f), 1),
      (1L, Array(0.99f, 0.1f, 0f), 1),
      (2L, Array(0.9f, 0.2f, 0f), 2), // nearest cross-label
      (3L, Array(0.5f, 0.5f, 0f), 2),
      (4L, Array(0f, 1f, 0f), 3),
      (5L, Array(0f, 0f, 1f), 3)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
        rows.filter(col("vec_id") === 0L), rows, "vec_id", "embedding",
        "label", k = 3)
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Int]("neg_label")))
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 4L),
      s"expected boundary-ordered cross-label negatives, got ${got.toSeq}")
    assert(got.forall(_._2 != 1), "no same-label vector may appear")
  }

  test("k capped by candidate count; output is repartition-invariant") {
    val rnd = new scala.util.Random(3)
    val corpus = (0L until 12L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat())))
    val queries = Seq((99L, Array.fill(4)(rnd.nextFloat())))
    val out = Similarity.mmrTopK(vecsDf(queries), vecsDf(corpus),
        "vec_id", "embedding", k = 8, candidates = 8, lambda = 0.5)
    assert(out.count() === 8)
    val a = out.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val b = Similarity.mmrTopK(vecsDf(queries),
        vecsDf(corpus).repartition(5), "vec_id", "embedding",
        k = 8, candidates = 8, lambda = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
