package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram-LM tokenizer (Kudo, ACL 2018 — the SentencePiece unigram
  * model), the OTHER major subword family next to BPE (L37): instead
  * of greedy merges, a probabilistic piece vocabulary fit by EM and
  * applied by Viterbi maximum-likelihood segmentation.
  *
  * Same scale split as the BPE trainer (the production architecture):
  * the corpus contributes ONE word-type frequency aggregate; seeding,
  * EM, pruning, and the final piece probabilities are driver math
  * bounded by the type cap — corpus size never enters the loop. At
  * apply time the DISTINCT-word table is Viterbi-segmented in
  * `mapPartitions` with the piece log-probs broadcast, then
  * broadcast-joined back to the corpus (the L37 shape).
  *
  * Determinism (fixture-oracle contract): word types are processed in
  * the wordCounts order (freq desc, word asc), pieces live in sorted
  * arrays (never hash-iteration order), E-step accumulation and the
  * log-sum-exp folds run in those fixed orders, and every tie —
  * seed-vocab cut, prune cut, Viterbi path — breaks lexicographically.
  */
object Unigram {

  /** Seed vocabulary: all substrings (length ≤ maxPieceLen) of the
    * word types weighted by word frequency, cut to the top `seedSize`
    * by (count desc, piece asc); every single character is always
    * kept (segmentation coverage). Returns sorted piece array. */
  def seedVocab(counts: Array[(String, Long)], maxPieceLen: Int,
                seedSize: Int): Array[String] = {
    val sub = mutable.HashMap.empty[String, Long]
    counts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          sub.update(p, sub.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars = sub.keysIterator.filter(_.length == 1).toArray
    val multi = sub.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.length)).map(_._1)
    (chars ++ multi).sorted
  }

  /** One EM round over the word types: returns the re-estimated piece
    * log-probs (same piece order). Lattice forward-backward in log
    * space with fixed fold order. */
  def emRound(counts: Array[(String, Long)], pieces: Array[String],
              logProb: Array[Double], maxPieceLen: Int)
      : Array[Double] = {
    val idx = pieces.zipWithIndex.toMap
    val expected = new Array[Double](pieces.length)
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) +
        math.exp(b - m)) }
    counts.foreach { case (w, c) =>
      val n = w.length
      // alpha(i) = log sum of all segmentations of w[0..i)
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0
      var i = 1
      while (i <= n) {
        var l = 1
        while (l <= maxPieceLen && l <= i) {
          idx.get(w.substring(i - l, i)).foreach { pid =>
            alpha(i) = lse(alpha(i), alpha(i - l) + logProb(pid))
          }
          l += 1
        }
        i += 1
      }
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      beta(n) = 0.0
      var j = n - 1
      while (j >= 0) {
        var l = 1
        while (l <= maxPieceLen && j + l <= n) {
          idx.get(w.substring(j, j + l)).foreach { pid =>
            beta(j) = lse(beta(j), logProb(pid) + beta(j + l))
          }
          l += 1
        }
        j -= 1
      }
      val z = alpha(n)
      if (z != Double.NegativeInfinity) {
        var s = 0
        while (s < n) {
          var l = 1
          while (l <= maxPieceLen && s + l <= n) {
            idx.get(w.substring(s, s + l)).foreach { pid =>
              val post = alpha(s) + logProb(pid) + beta(s + l) - z
              expected(pid) += c * math.exp(post)
            }
            l += 1
          }
          s += 1
        }
      }
    }
    val total = expected.sum
    expected.map(e =>
      if (e > 0 && total > 0) math.log(e / total)
      else -1e9) // effectively removed, but kept for coverage pieces
  }

  /** Train: seed → EM → prune to vocabSize (keep all single chars) →
    * EM → final (piece, logProb), sorted by piece. */
  def train(counts: Array[(String, Long)], vocabSize: Int,
            maxPieceLen: Int = 6, seedSize: Int = 4096,
            emIters: Int = 2): Array[(String, Double)] = {
    require(vocabSize >= 2, s"vocabSize=$vocabSize must be >= 2")
    var pieces = seedVocab(counts, maxPieceLen, seedSize)
    var lp = Array.fill(pieces.length)(-math.log(pieces.length.toDouble))
    for (_ <- 0 until emIters) lp = emRound(counts, pieces, lp, maxPieceLen)
    // prune: keep single chars + the best multi-char pieces
    val keep = pieces.indices
      .filter(i => pieces(i).length == 1)
      .toSet ++ pieces.indices
      .filter(i => pieces(i).length > 1)
      .sortBy(i => (-lp(i), pieces(i)))
      .take(math.max(0, vocabSize -
        pieces.count(_.length == 1)))
    val kept = pieces.indices.filter(keep).map(pieces).toArray.sorted
    var lp2 = {
      val prev = pieces.zip(lp).toMap
      kept.map(prev)
    }
    pieces = kept
    for (_ <- 0 until emIters) lp2 = emRound(counts, pieces, lp2, maxPieceLen)
    pieces.zip(lp2)
  }

  /** Viterbi max-likelihood segmentation of one word. Ties break
    * toward the LONGER final piece, then lexicographically — fully
    * deterministic. Unknown characters fall back to themselves at a
    * floor penalty (coverage). */
  def segmentWord(word: String, logProb: Map[String, Double],
                  maxPieceLen: Int = 6): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val floor = -1e6
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bestLen = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        val p = word.substring(i - l, i)
        val sc = logProb.get(p) match {
          case Some(v) => v
          case None => if (l == 1) floor else Double.NegativeInfinity
        }
        if (sc != Double.NegativeInfinity &&
            best(i - l) != Double.NegativeInfinity) {
          val v = best(i - l) + sc
          if (v > best(i) || (v == best(i) && l > bestLen(i))) {
            best(i) = v; bestLen(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var cur = n
    while (cur > 0) {
      val l = bestLen(cur)
      out = word.substring(cur - l, cur) :: out
      cur -= l
    }
    out
  }

  /** Trained vocabulary as a DataFrame: (piece, log_prob). */
  def vocabDf(df: DataFrame, text: String, vocabSize: Int,
              maxWordTypes: Int = 65536): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    train(Bpe.wordCounts(df, text, maxWordTypes), vocabSize)
      .toSeq.toDF("piece", "log_prob")
  }

  /** Per-document unigram token counts (the L37 tokenize shape):
    * distinct words Viterbi-segmented with the model broadcast,
    * broadcast-joined back. Output (id, n_words, n_unigram_tokens). */
  def tokenize(df: DataFrame, id: String, text: String,
               model: Array[(String, Double)]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(model.toMap)
    val words = df.select(explode(split(col(text), " ")).as("__w"))
      .filter(col("__w") =!= "").distinct().as[String]
    val pieces = words.mapPartitions { it =>
      val m = bc.value
      it.map(w => (w, segmentWord(w, m).length.toLong))
    }.toDF("word", "n_pieces")
    df.select(col(id), explode(split(col(text), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(pieces), Seq("word"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_unigram_tokens"))
  }
}
