package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** BPE tokenizer training and application (Sennrich, Haddow, Birch:
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) — the tokenizer-prep step of a pretraining pipeline.
  *
  * Architecture is the one production trainers (HuggingFace tokenizers,
  * SentencePiece-BPE) use, which is exactly the split a 100 TB corpus
  * needs:
  *
  *  - DISTRIBUTED: one word-frequency aggregate over the corpus
  *    (map-side combinable; the exchange carries word TYPES, not
  *    tokens) and, at apply time, tokenization of the DISTINCT-word
  *    table with the merge ranks broadcast, joined back to the corpus
  *    broadcast-style. The corpus itself is never driver-side.
  *  - DRIVER: the merge loop runs over the word-frequency table —
  *    bounded by `maxWordTypes` (the trainer's vocabulary cap), NOT by
  *    corpus size. Merge work is O(types × word length × numMerges),
  *    the same as every published trainer.
  *
  * Words are char sequences with a terminal `</w>` marker (the paper's
  * end-of-word symbol), so merges distinguish word-final units. Tie
  * break on equal pair frequency is lexicographic (left, right) —
  * fully deterministic, so the learned table is fixture-oracle-able.
  */
object Bpe {

  /** End-of-word marker (Sennrich §3.2). Corpus words containing this
    * literal string would alias with the marker — callers with such
    * corpora pre-escape; the standard pre-tokenizers never emit it. */
  val EndOfWord = "</w>"

  /** One learned merge: rank (0-based application order), the two
    * merged symbols, and the pair frequency at merge time. */
  final case class Merge(rank: Int, left: String, right: String,
                         pairFreq: Long)

  /** Word-frequency table: `(word, freq)` for the top `maxWordTypes`
    * types by (freq desc, word asc) — the trainer's working set. */
  def wordCounts(df: DataFrame, text: String,
                 maxWordTypes: Int): Array[(String, Long)] =
    df.select(explode(split(col(text), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Learn `numMerges` merges from the word-frequency table. Stops
    * early when no adjacent pair remains (fully merged vocabulary).
    * Pure driver math over the bounded table — deterministic: pair
    * counts are sums over types, best-pair ties break lexicographic. */
  def learnMerges(counts: Array[(String, Long)],
                  numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    // each word type as its symbol sequence, with the end marker
    var words: Array[(Array[String], Long)] = counts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    while (rank < numMerges) {
      val pairFreq = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairFreq.update(k, pairFreq.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairFreq.isEmpty) return merges.toSeq
      val ((l, r), f) = pairFreq.minBy { case ((a, b), c) =>
        (-c, a, b) // max freq, then lexicographic smallest pair
      }
      merges += Merge(rank, l, r, f)
      val lr = l + r
      words = words.map { case (syms, c) =>
        if (syms.length < 2) (syms, c)
        else {
          val out = new mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += lr; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
      rank += 1
    }
    merges.toSeq
  }

  /** Convenience: corpus → learned merge table as a DataFrame
    * `(rank, left, right, pair_freq)`. */
  def learnMergesDf(df: DataFrame, text: String, numMerges: Int,
                    maxWordTypes: Int = 65536): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    learnMerges(wordCounts(df, text, maxWordTypes), numMerges)
      .map(m => (m.rank.toLong, m.left, m.right, m.pairFreq))
      .toDF("rank", "left", "right", "pair_freq")
  }

  /** Tokenize ONE word with learned merges: replay ranks greedily —
    * repeatedly merge the lowest-rank adjacent pair present (the
    * standard BPE apply; equivalent to replaying merges in order). */
  def encodeWord(word: String,
                 ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) done = true
      else {
        // merge ALL occurrences of this pair, left to right
        val (l, r) = (syms(at), syms(at + 1))
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Piece table for every DISTINCT word of the corpus: `(word,
    * pieces array, n_pieces)`. The merge ranks are broadcast; the
    * distinct-word table is vocabulary-sized, so the imperative
    * per-word encode (mapPartitions — genuine per-row loop work) runs
    * over types, never over the token stream. */
  def pieceTable(df: DataFrame, text: String,
                 merges: Seq[Merge]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = s.sparkContext.broadcast(ranks)
    val words = df.select(explode(split(col(text), " ")).as("__w"))
      .filter(col("__w") =!= "").distinct().as[String]
    words.mapPartitions { it =>
      val r = bc.value
      it.map(w => (w, encodeWord(w, r)))
    }.toDF("word", "pieces")
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }

  /** Per-document BPE token counts: explode words, broadcast-join the
    * piece table, sum. Output `(id, n_words, n_bpe_tokens)`. */
  def tokenize(df: DataFrame, id: String, text: String,
               merges: Seq[Merge]): DataFrame = {
    val pieces = pieceTable(df, text, merges)
      .select(col("word"), col("n_pieces"))
    df.select(col(id), explode(split(col(text), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(pieces), Seq("word"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_bpe_tokens"))
  }
}
