package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * All pure column expressions (codegen'd — no UDFs).
  */
object TextAnalysis {

  /** Whitespace token count via length arithmetic (robust across SQL
    * dialects; single-spaced corpora). */
  def tokenCountWs(text: Column): Column =
    length(text) - length(regexp_replace(text, " ", "")) + lit(1)

  /** BPE-ish token count: word pieces + digits + punctuation runs — the
    * standard `\w+|[^\w\s]` pre-tokenizer cardinality. */
  def tokenCountBpe(text: Column): Column = {
    val words = size(filter(split(text, "[^\\p{L}\\p{N}]+"), t => t =!= ""))
    val punct = size(filter(split(text, "[\\p{L}\\p{N}\\s]+"), t => t =!= ""))
    words + punct
  }

  /** Quality heuristics (length / punctuation / stopword ratios) and a
    * composite [0,1] score — the capability of a C4/Gopher-style filter
    * expressed relationally. */
  def withQuality(df: DataFrame, text: String,
                  stopwords: Seq[String] = Seq("the", "a", "and", "of",
                    "to", "in", "is", "it")): DataFrame = {
    val t = col(text)
    val nTok = tokenCountWs(t)
    val toks = split(t, " ")
    val stopHits = size(filter(toks, w => w.isin(stopwords: _*)))
    val punct = length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val d = df
      .withColumn("n_chars_ta", length(t).cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("avg_token_len",
        (length(t) - nTok + 1).cast("double") / nTok)
      .withColumn("stop_ratio", stopHits.cast("double") / nTok)
      .withColumn("punct_ratio", punct.cast("double") / length(t))
    d.withColumn("quality_score",
      (when(col("n_tokens").between(10, 1000), lit(0.4)).otherwise(lit(0.0))
        + when(col("avg_token_len").between(2.0, 12.0), lit(0.3))
          .otherwise(lit(0.0))
        + least(col("stop_ratio") * lit(3.0), lit(0.3))))
  }

  /** Language-ID by stopword-hit voting over small built-in profiles
    * (public-knowledge closed-class words) + a CJK character-ratio rule.
    * Heuristic n-gram-free variant; returns the argmax language code. */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit",
      "auf", "für"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de", "un",
      "para"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "un", "une", "dans",
      "pour"))

  def withLangId(df: DataFrame, text: String,
                 out: String = "lang_pred"): DataFrame = {
    val toks = split(lower(col(text)), " ")
    val nTok = greatest(size(toks), lit(1))
    val scores = profiles.map { case (lang, words) =>
      struct(
        (size(filter(toks, w => w.isin(words: _*))).cast("double") / nTok)
          .as("score"),
        lit(lang).as("lang"))
    }
    val cjkRatio = (length(col(text)) -
      length(regexp_replace(col(text), "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("double") / greatest(length(col(text)), lit(1))
    val best = array_max(array(scores: _*))
    df.withColumn(out,
      when(cjkRatio > 0.2, lit("zh"))
        .when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("und")))
  }

  /** Polynomial rolling-hash fingerprint of the whole document (mod a
    * Mersenne-ish prime, codegen'd via the `aggregate` higher-order
    * function — no UDF). */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * lit(1000003L) + x, lit(2147483647L)))

  /** Winnowing-style shingle fingerprints: k-char shingles hashed, the
    * minimum hash per window of w shingles — a document sketch for
    * near-dup lookup. Returns (id, fingerprint) rows.
    *
    * Fully relational formulation: one row per shingle position
    * (posexplode), `substring` for the shingle (O(k), no char arrays),
    * and a w-row sliding window min — codegen'd and linear in document
    * length, where nested array HOFs would re-evaluate the inner array
    * per element (quadratic). */
  def winnowing(df: DataFrame, id: String, text: String, k: Int = 8,
                w: Int = 4): DataFrame = {
    val positions = df
      .filter(length(col(text)) >= k + w - 1)
      .select(col(id), col(text),
        posexplode(sequence(lit(0), length(col(text)) - k))
          .as(Seq("__i", "__dummy")))
      .select(col(id), col("__i"),
        xxhash64(col(text).substr(col("__i") + 1, lit(k))).as("__h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy("__i").rowsBetween(0, w - 1)
    positions
      .withColumn("__n", max(col("__i")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(id)))
      .withColumn("fingerprint", min(col("__h")).over(win))
      .filter(col("__i") <= col("__n") - w + 1)
      .select(col(id), col("fingerprint")).distinct()
  }
}
