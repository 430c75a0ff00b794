package graft.llm

import graft.SparkSpec

/** BPE trainer/encoder contracts, pinned against a hand-computed run of
  * the Sennrich 2016 worked example (low/lower/newest/widest). Every
  * merge below was derived by hand: pair counts summed over word
  * frequencies, ties broken lexicographic (left, right).
  */
class BpeSpec extends SparkSpec {

  private val counts: Array[(String, Long)] = Array(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the hand-computed merge sequence") {
    val m = Bpe.learnMerges(counts, numMerges = 7)
    val got = m.map(x => (x.rank, x.left, x.right, x.pairFreq))
    assert(got === Seq(
      (0, "e", "s", 9L),        // es,t,t</w> tie at 9 -> lexicographic
      (1, "es", "t", 9L),
      (2, "est", "</w>", 9L),
      (3, "l", "o", 7L),        // l,o vs o,w tie at 7
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L),        // e,w vs n,e vs w,est</w> tie at 6
      (6, "ew", "est</w>", 6L)))
  }

  test("learnMerges stops early when the vocabulary is fully merged") {
    val m = Bpe.learnMerges(Array(("ab", 3L)), numMerges = 100)
    // a b </w> -> at most 2 merges then nothing adjacent remains
    assert(m.size === 2)
    assert(m.last.left + m.last.right === "ab</w>")
  }

  test("encodeWord replays ranks greedily, including unseen words") {
    val ranks = Bpe.learnMerges(counts, 7)
      .map(x => (x.left, x.right) -> x.rank).toMap
    assert(Bpe.encodeWord("newest", ranks) === Seq("n", "ewest</w>"))
    assert(Bpe.encodeWord("low", ranks) === Seq("low", "</w>"))
    assert(Bpe.encodeWord("lowest", ranks) === Seq("low", "est</w>"))
    // unseen word: only applicable merges fire
    assert(Bpe.encodeWord("west", ranks) === Seq("w", "est</w>"))
    assert(Bpe.encodeWord("x", ranks) === Seq("x", "</w>"))
  }

  test("tokenize counts subword pieces per document via the piece table") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low lower newest"),
      (2L, "widest newest newest"),
      (3L, "low")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(Bpe.wordCounts(docs, "text", 1000), 7)
    val out = Bpe.tokenize(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    // NOTE: merges learned from THIS corpus (freqs differ from the
    // fixture array) — assert via independent re-encode
    val ranks = merges.map(x => (x.left, x.right) -> x.rank).toMap
    def n(t: String): Long =
      t.split(" ").map(w => Bpe.encodeWord(w, ranks).size.toLong).sum
    assert(out(1L) === (4L, n("low low lower newest")))
    assert(out(2L) === (3L, n("widest newest newest")))
    assert(out(3L) === (1L, n("low")))
  }

  test("wordCounts caps the trainer working set deterministically") {
    import spark.implicits._
    val docs = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    assert(Bpe.wordCounts(docs, "text", 2).toSeq ===
      Seq(("b", 3L), ("a", 2L)))
  }
}
