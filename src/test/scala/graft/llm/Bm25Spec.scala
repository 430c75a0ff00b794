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

  test("RM3 expansion bridges the vocabulary gap plain BM25 cannot") {
    import spark.implicits._
    // doc 10 pairs 'apple' with 'banana'; doc 11 is banana-only.
    // query 'apple' can never reach doc 11 under plain BM25, but the
    // feedback pass lifts 'banana' from doc 10 and finds it.
    val docs = Seq(
      (10L, "apple banana banana"),
      (11L, "banana cherry plum"),
      (12L, "kiwi melon grape"),
      (13L, "pear fig date")).toDF("doc_id", "text")
    val q = Seq((0L, "apple")).toDF("doc_id", "text")
    val plain = Bm25.topK(docs, q, "doc_id", "doc_id", "text", k = 4)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(plain === Set(10L), "plain BM25 only reaches the apple doc")
    val rm3 = Bm25.rm3TopK(docs, q, "doc_id", "doc_id", "text", k = 4,
        fbDocs = 1, fbTerms = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("rank")).toMap
    assert(rm3.contains(11L), s"expansion must reach the banana doc: $rm3")
    assert(rm3(10L) === 1L, "the original match still ranks first")
  }

  test("RM3 with no expandable terms degenerates to plain BM25") {
    import spark.implicits._
    // the only feedback doc contains nothing but the query term
    val docs = Seq(
      (20L, "solo solo solo"),
      (21L, "alpha beta gamma"),
      (22L, "delta epsilon zeta")).toDF("doc_id", "text")
    val q = Seq((0L, "solo")).toDF("doc_id", "text")
    val plain = Bm25.topK(docs, q, "doc_id", "doc_id", "text", k = 3)
      .orderBy("rank").collect().toSeq
    val rm3 = Bm25.rm3TopK(docs, q, "doc_id", "doc_id", "text", k = 3,
        fbDocs = 1, fbTerms = 5)
      .orderBy("rank").collect().toSeq
    assert(rm3 === plain)
  }

  test("RM3 term weights follow sum tf/dl and exclude query terms") {
    import spark.implicits._
    // feedback docs (top-2 for 'x'): doc 0 'x a a b', doc 1 'x a c'.
    // weights: a = 2/4 + 1/3, b = 1/4, c = 1/3; fbTerms=2 -> {a, c};
    // 'x' itself is excluded. Verify via the expanded ranking reaching
    // the c-doc but not the b-doc's unique term.
    val docs = Seq(
      (0L, "x a a b"),
      (1L, "x a c"),
      (2L, "c c c"),
      (3L, "b b b"),
      (4L, "q r s")).toDF("doc_id", "text")
    val q = Seq((9L, "x")).toDF("doc_id", "text")
    val rm3 = Bm25.rm3TopK(docs, q, "doc_id", "doc_id", "text", k = 5,
        fbDocs = 2, fbTerms = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(rm3.contains(2L), "c (w=1/3) expands in and reaches doc 2")
    assert(!rm3.contains(3L), "b (w=1/4) is cut by fbTerms=2")
    assert(!rm3.contains(4L), "unrelated doc stays out")
  }
}
