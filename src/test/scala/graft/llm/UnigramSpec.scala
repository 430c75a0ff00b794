package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {

  test("Viterbi segmentation picks the max-likelihood path (hand case)") {
    val lp = Map("ab" -> math.log(0.5), "a" -> math.log(0.2),
      "b" -> math.log(0.2), "c" -> math.log(0.1))
    // 2·log(.5) = -1.386 beats a,b,a,b at 4·log(.2) = -6.44 and
    // ab,a,b at log(.5)+2·log(.2) = -3.91
    assert(Unigram.segmentWord("abab", lp) == Seq("ab", "ab"))
    assert(Unigram.segmentWord("cab", lp) == Seq("c", "ab"))
    assert(Unigram.segmentWord("", lp).isEmpty)
  }

  test("unknown characters fall back to single-char floor pieces") {
    val lp = Map("a" -> math.log(0.5))
    assert(Unigram.segmentWord("axa", lp) == Seq("a", "x", "a"))
  }

  test("EM concentrates mass on the true building block") {
    val counts = Array(("abab", 50L), ("ab", 20L), ("ba", 1L))
    val model = Unigram.train(counts, vocabSize = 8,
      maxPieceLen = 4, seedSize = 64).toMap
    // "ab" must dominate the single chars it competes with
    assert(model.contains("ab"))
    assert(model("ab") > model("a"))
    assert(model("ab") > model("b"))
    val seg = Unigram.segmentWord("abab", model)
    assert(seg == Seq("abab") || seg == Seq("ab", "ab"),
      s"expected whole-word or ab+ab, got $seg")
  }

  test("every single character survives pruning (coverage invariant)") {
    val counts = Array(("hello", 5L), ("world", 3L), ("xq", 1L))
    val model = Unigram.train(counts, vocabSize = 4, maxPieceLen = 3,
      seedSize = 32)
    val pieces = model.map(_._1).toSet
    "helowrdxq".foreach(c =>
      assert(pieces.contains(c.toString), s"char $c missing"))
    // vocab is sorted and log-probs are non-positive
    assert(model.map(_._1).toSeq == model.map(_._1).toSeq.sorted)
    assert(model.forall(_._2 <= 0.0))
  }

  test("train is deterministic (pure function of the count table)") {
    val counts = Array(("spark", 7L), ("sparse", 5L), ("park", 4L),
      ("spa", 2L))
    val a = Unigram.train(counts, vocabSize = 16).toSeq
    val b = Unigram.train(counts.clone(), vocabSize = 16).toSeq
    assert(a == b)
  }

  test("tokenize: per-doc counts line up; repartition-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab aa"), (2L, "ab"), (3L, "zz aa"))
      .toDF("doc_id", "text")
    val model = Unigram.train(
      Bpe.wordCounts(docs, "text", 1000), vocabSize = 16,
      maxPieceLen = 2)
    val out = Unigram.tokenize(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_unigram_tokens")))
      .toMap
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L && out(3L)._1 == 2L)
    assert(out.values.forall { case (w, t) => t >= w })
    val out2 = Unigram.tokenize(docs.repartition(5), "doc_id", "text",
        model).collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_unigram_tokens")))
      .toMap
    assert(out == out2)
  }
}
