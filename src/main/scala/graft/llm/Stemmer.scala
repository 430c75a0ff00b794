package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 — the public-domain algorithm, implemented from
  * the paper's rule tables) — the classic IR normalization: index and
  * query terms collapse to a shared stem, and in a data pipeline the
  * stemmed vocabulary drives dedup/quality features that shouldn't
  * distinguish "connect/connected/connection".
  *
  * Distributed shape is the [[Bpe]] one: stemming is imperative
  * per-word string work, so it runs over the DISTINCT-word table
  * (vocabulary-sized mapPartitions) and broadcast-joins back to the
  * corpus — the token stream itself never sees a JVM loop. */
object Stemmer {

  private def isVowel(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Porter's measure m: the number of VC sequences in the word. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // a vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def hasVowel(w: String): Boolean =
    w.indices.exists(isVowel(w, _))

  private def doubleC(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) &&
      !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def cvc(w: String): Boolean =
    w.length >= 3 && !isVowel(w, w.length - 3) &&
      isVowel(w, w.length - 2) && !isVowel(w, w.length - 1) &&
      !"wxy".contains(w.last)

  // rule tables, pre-sorted longest-suffix-first ONCE (stem() is
  // called per distinct word — per-call sorts were pure waste)
  private val step2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able",
    "alli" -> "al", "entli" -> "ent", "eli" -> "e", "ousli" -> "ous",
    "ization" -> "ize", "ation" -> "ate", "ator" -> "ate",
    "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive",
    "biliti" -> "ble").sortBy(-_._1.length)
  private val step3: Seq[(String, String)] = Seq("icate" -> "ic",
    "ative" -> "", "alize" -> "al", "iciti" -> "ic", "ical" -> "ic",
    "ful" -> "", "ness" -> "").sortBy(-_._1.length)
  private val step4: Seq[String] = Seq("ement", "ance", "ence", "able",
    "ible", "ment", "ant", "ent", "ion", "ism", "ate", "iti", "ous",
    "ive", "ize", "al", "er", "ic", "ou").sortBy(-_.length)

  /** Stem one lowercase word. Words shorter than 3 chars pass
    * through (the reference implementation's guard). */
  def stem(word: String): String = {
    if (word.length < 3) return word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    var touched1b = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) {
      w = w.dropRight(2); touched1b = true
    } else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) {
      w = w.dropRight(3); touched1b = true
    }
    if (touched1b) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
        w = w + "e"
      else if (doubleC(w) && !"lsz".contains(w.last))
        w = w.dropRight(1)
      else if (measure(w) == 1 && cvc(w)) w = w + "e"
    }

    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1)))
      w = w.dropRight(1) + "i"

    // step 2 (longest match wins — tables pre-sorted once on the
    // object, not per word: stem() runs once per distinct corpus word)
    step2.collectFirst {
      case (s, r) if w.endsWith(s) =>
        val stem = w.dropRight(s.length)
        if (measure(stem) > 0) stem + r else w
    }.foreach(w = _)

    // step 3
    step3.collectFirst {
      case (s, r) if w.endsWith(s) =>
        val stem = w.dropRight(s.length)
        if (measure(stem) > 0) stem + r else w
    }.foreach(w = _)

    // step 4
    step4.collectFirst {
      case s if w.endsWith(s) =>
        val stem = w.dropRight(s.length)
        val ok = measure(stem) > 1 &&
          (s != "ion" || (stem.nonEmpty && "st".contains(stem.last)))
        if (ok) stem else w
    }.foreach(w = _)

    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !cvc(stem))) w = stem
    }
    // step 5b
    if (measure(w) > 1 && doubleC(w) && w.endsWith("l"))
      w = w.dropRight(1)
    w
  }

  /** Stem table for every distinct word of the corpus:
    * `(word, stem)` — vocabulary-sized. */
  def stemTable(df: DataFrame, text: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(split(lower(col(text)), " ")).as("__w"))
      .filter(col("__w") =!= "").distinct().as[String]
      .mapPartitions(_.map(w => (w, stem(w))))
      .toDF("word", "stem")
  }

  /** Per-doc stemmed-vocabulary stats via the broadcast stem table:
    * `(id, n_words, n_distinct_stems)` — the collapse a stemmed index
    * sees. */
  def stemStats(df: DataFrame, id: String, text: String): DataFrame = {
    val table = stemTable(df, text)
    df.select(col(id),
        explode(split(lower(col(text)), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(table), Seq("word"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"),
        count_distinct(col("stem")).as("n_distinct_stems"))
  }
}
