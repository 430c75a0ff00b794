package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  private def corpus(docs: Seq[String]) = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("hand-computed example matches the Robertson/Lucene formula") {
    // 3 docs; query = "cat". df(cat)=2, N=3.
    val docs = corpus(Seq(
      "cat sat on mat",          // dl=4, tf(cat)=1
      "cat cat chased the cat",  // dl=5, tf(cat)=3
      "dog barked all night"))   // dl=4
    val queries = corpus(Seq("cat")).withColumnRenamed("doc_id", "qid")
    val out = Bm25.topK(docs, queries, "doc_id", "qid", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("rank"))).toMap
    val avgdl = 13.0 / 3.0
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def score(tf: Double, dl: Double) =
      idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
    assert(out.keySet == Set(0L, 1L)) // dog doc has no query term
    assert(math.abs(out(1L)._1 - score(3, 5)) < 1e-6)
    assert(math.abs(out(0L)._1 - score(1, 4)) < 1e-6)
    assert(out(1L)._2 == 1L && out(0L)._2 == 2L) // higher tf ranks first
  }

  test("idf dampens common terms: rare-term doc outranks common-term doc") {
    val docs = corpus(Seq(
      "alpha shared shared shared",
      "beta shared shared shared",
      "gamma shared shared shared",
      "alpha unique",
      "needle unique"))
    val queries = corpus(Seq("needle shared"))
      .withColumnRenamed("doc_id", "qid")
    val top = Bm25.topK(docs, queries, "doc_id", "qid", "text", k = 1)
      .collect().head
    assert(top.getAs[Long]("doc_id") == 4L,
      "the doc with the rare term must win over common-term stuffing")
  }

  test("self-retrieval: querying with a doc's own text ranks it first") {
    val docs = corpus(Seq(
      "spark shuffles partition the keyspace",
      "catalyst optimizes logical plans",
      "parquet stores columns with statistics",
      "watermarks bound streaming state"))
    val queries = docs.filter(col("doc_id") < 4)
    val out = Bm25.topK(docs, queries, "doc_id", "doc_id", "text", k = 2)
      .filter(col("rank") === 1).collect()
    assert(out.length == 4)
    assert(out.forall(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("doc_id")))
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val docs = corpus(Seq(
      "term one two",
      "term one two three four five six seven eight nine"))
    val queries = corpus(Seq("term")).withColumnRenamed("doc_id", "qid")
    val out = Bm25.topK(docs, queries, "doc_id", "qid", "text", k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("bm25")).toMap
    assert(out(0L) > out(1L))
  }

  test("NULL-text docs are outside the corpus population (n_docs/avgdl)") {
    import spark.implicits._
    val clean = corpus(Seq(
      "cat sat on mat",
      "cat cat chased the cat",
      "dog barked all night"))
    val withNulls = clean.union(
      Seq((90L, Option.empty[String]), (91L, Option.empty[String]))
        .toDF("doc_id", "text"))
    val queries = corpus(Seq("cat")).withColumnRenamed("doc_id", "qid")
    val a = Bm25.topK(clean, queries, "doc_id", "qid", "text", k = 3)
      .orderBy("rank").collect().toSeq
    val b = Bm25.topK(withNulls, queries, "doc_id", "qid", "text", k = 3)
      .orderBy("rank").collect().toSeq
    assert(a == b, "null-text docs must not inflate n_docs or skew idf")
  }

  test("deterministic under repartition (ordered contribution fold)") {
    val docs = corpus(Seq.tabulate(40)(i =>
      Seq.tabulate(12)(j => s"w${(i * 7 + j * 3) % 17}").mkString(" ")))
    val queries = docs.filter(col("doc_id") < 3)
    val a = Bm25.topK(docs, queries, "doc_id", "doc_id", "text", k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Bm25.topK(docs.repartition(8), queries.repartition(3),
        "doc_id", "doc_id", "text", k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
  }
}
