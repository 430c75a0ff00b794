package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TextAnalysis operator contracts. Winnowing gets a brute-force
  * reference check because its array-expression formulation dodges two
  * optimizer traps (see the operator's Scaladoc) — the spec pins the
  * semantics independently of the plan shape that happens to survive
  * optimization.
  */
class TextAnalysisSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Brute-force winnowing reference: hash every k-shingle THROUGH THE
    * SAME ENGINE HASH (one xxhash64 column per position — no window, no
    * arrays), then slide the w-min in plain Scala. */
  private def winnowReference(rows: Seq[(Long, String)], k: Int,
                              w: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val shingles = rows.flatMap { case (id, t) =>
      (0 to t.length - k).map(i => (id, i, t.substring(i, i + k)))
    }
    val hashed = shingles.toDF("doc_id", "pos", "shingle")
      .select(col("doc_id"), col("pos"), xxhash64(col("shingle")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    hashed.groupBy(_._1).toSeq.flatMap { case (id, hs) =>
      val byPos = hs.sortBy(_._2).map(_._3)
      if (byPos.length < w) Seq.empty
      else byPos.sliding(w).map(win => (id, win.min)).toSeq
    }.toSet
  }

  test("winnowing matches the brute-force sliding-min reference") {
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "completely different content with other words here",
      4L -> "aaaaaaaaaaaaaaaa", // constant doc: all shingles equal
      5L -> "exactly11ch") // length k+w-1 = 11: exactly one window
    val k = 8; val w = 4
    val got = TextAnalysis.winnowing(docs(rows), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = winnowReference(rows, k, w)
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("winnowing drops documents shorter than k + w - 1") {
    val got = TextAnalysis.winnowing(
      docs(Seq(1L -> "too short", 2L -> "this one is long enough to sketch")),
      "doc_id", "text", 8, 4)
    assert(got.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      === Set(2L))
  }

  test("winnowing emits each (doc, fingerprint) at most once") {
    val got = TextAnalysis.winnowing(
      docs(Seq(1L -> ("ab" * 40))), "doc_id", "text", 8, 4)
    val rows = got.collect()
    assert(rows.length === rows.distinct.length)
    // a periodic doc repeats shingles, so dedup must actually bite:
    // 80 chars -> 70 windows but only 2 distinct shingle hashes
    assert(rows.length <= 2)
  }

  test("token counts: whitespace and BPE-ish pre-tokenizer") {
    val d = docs(Seq(1L -> "Hello, world! It's 2024.", 2L -> "one two"))
      .select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("bpe"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(d(1L)._1 === 4) // 3 spaces + 1
    // pieces: Hello , world ! It ' s 2024 .  -> words=5 (Hello world It
    // s 2024), punct runs = , ! ' . = 4  -> 9
    assert(d(1L)._2 === 9)
    assert(d(2L) === ((2, 2)))
  }

  test("quality ratios on a crafted document") {
    val text = "the cat sat on the mat" // 6 tokens, 2 stopwords ("the" x2)
    val row = TextAnalysis.withQuality(docs(Seq(1L -> text)), "text")
      .select("n_tokens", "avg_token_len", "stop_ratio", "punct_ratio")
      .head()
    assert(row.getLong(0) === 6L)
    // 22 chars - 6 tokens + 1 = 17 / 6
    assert(math.abs(row.getDouble(1) - 17.0 / 6) < 1e-12)
    assert(math.abs(row.getDouble(2) - 2.0 / 6) < 1e-12)
    assert(row.getDouble(3) === 0.0)
  }

  test("quality is total on an empty document (NULL punct_ratio, no crash)") {
    // empty text → length 0 → an unguarded ratio division THROWS under
    // ANSI; the operator must stay total over any legal corpus
    val row = TextAnalysis.withQuality(docs(Seq(1L -> "")), "text")
      .select("n_tokens", "punct_ratio", "quality_score").head()
    assert(row.getLong(0) === 1L)
    assert(row.isNullAt(1))
    assert(!row.isNullAt(2))
  }

  test("language id picks the profile with the most stopword hits") {
    val samples = Seq(
      1L -> "the cat is in the house and it was good",
      2L -> "der hund ist nicht mit der katze auf dem dach",
      3L -> "el perro es un animal que vive en la casa",
      4L -> "le chat est dans la maison et il est content",
      5L -> "zzz qqq xxx www") // no hits anywhere
    val got = TextAnalysis.withLangId(docs(samples), "text")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "de")
    assert(got(3L) === "es")
    assert(got(4L) === "fr")
    assert(got(5L) === "und")
  }

  test("rolling hash matches a driver-side polynomial evaluation") {
    val text = "hash me"
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) =>
        java.lang.Math.floorMod(acc * 1000003L + c.toLong, 2147483647L))
    val got = docs(Seq(1L -> text))
      .select(TextAnalysis.rollingHash(col("text"))).head().getLong(0)
    assert(got === ref(text))
  }

  test("rolling hash folds per CODE POINT on non-BMP text (the " +
      "portable-hash contract shared with the DuckDB oracles)") {
    // a surrogate pair must contribute ONE term (its code point),
    // never two UTF-16 halves: Spark's split(text, '') is
    // UTF8String-based and per-code-point (unlike java.lang.String
    // .split), and DuckDB's string_split(s, '')/ascii agree — this
    // pins the engine side of that equality so a future rewrite
    // through Java String semantics fails loudly
    val text = "a" + new String(Character.toChars(0x1F600)) + "b"
    def ref(s: String): Long = {
      var acc = 0L
      s.codePoints().forEach { cp =>
        acc = java.lang.Math.floorMod(acc * 1000003L + cp, 2147483647L)
      }
      acc
    }
    val got = docs(Seq(1L -> text))
      .select(TextAnalysis.rollingHash(col("text"))).head().getLong(0)
    assert(got === ref(text))
    // and the UTF-16-unit fold would differ — the test discriminates
    val utf16 = text.foldLeft(0L)((acc, c) =>
      java.lang.Math.floorMod(acc * 1000003L + c.toLong, 2147483647L))
    assert(got !== utf16)
  }

  test("collocations: hand-computed PMI, minCount filter, (pmi, pair) " +
      "ordering") {
    // corpus: "new york" appears 4x; "the the" 4x but from a frequent
    // word (low PMI); "rare pair" only once (killed by minCount=2)
    val corpus = Seq(
      1L -> "new york is big and the the cat sat",
      2L -> "new york has the the subway",
      3L -> "i love new york and rare pair",
      4L -> "new york the the end")
    val rows = TextAnalysis.collocations(docs(corpus), "text",
        minCount = 2, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(!rows.contains(("rare", "pair")), "minCount must filter")
    // reference counts computed from the corpus, not by hand
    val toks = corpus.flatMap(_._2.split(" "))
    val c = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bg = corpus.flatMap(_._2.split(" ").sliding(2).map(p =>
      (p(0), p(1)))).groupBy(identity).view.mapValues(_.size.toLong)
    val n = toks.size.toDouble
    def pmi(b: Long, c1: Long, c2: Long) =
      BigDecimal(math.log(b * n / (c1.toDouble * c2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def exp(w1: String, w2: String) = {
      val b = bg((w1, w2)); (b, pmi(b, c(w1), c(w2)))
    }
    assert(rows(("new", "york")) === exp("new", "york"))
    assert(rows(("the", "the")) === exp("the", "the"))
    // PMI separates the phrase from the frequent-word repeat
    assert(rows(("new", "york"))._2 > rows(("the", "the"))._2)
  }

  test("repetitionStats separates loopy from diverse text") {
    val loopy = Seq.fill(10)("spam ham").mkString(" ")  // 20 tokens, 2 distinct
    val diverse = (1 to 20).map(i => s"w$i").mkString(" ")
    val rows = TextAnalysis.repetitionStats(
      docs(Seq(1L -> loopy, 2L -> diverse)), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val l = rows(1L); val d = rows(2L)
    assert(l.getAs[Long]("n_tokens") === 20L)
    assert(l.getAs[Double]("uniq_word_frac") === 0.1)
    // bigrams of loopy: "spam ham" x10, "ham spam" x9 -> top = 10
    assert(l.getAs[Double]("top2gram_frac") === 10 * 2.0 / 20)
    // all 16 5-grams repeat (only 2 distinct) -> full coverage
    assert(l.getAs[Double]("dup5gram_frac") === 16 * 5.0 / 20)
    assert(d.getAs[Double]("uniq_word_frac") === 1.0)
    assert(d.getAs[Double]("top2gram_frac") === 2.0 / 20)
    assert(d.getAs[Double]("dup5gram_frac") === 0.0)
  }

  test("perplexityScore: common transitions score lower nll than rare ones") {
    // corpus dominated by the "spam ham" transition; one doc walks the
    // common path, one doc is all first-occurrence transitions
    val common = Seq.fill(8)("spam ham").mkString(" ")
    val rare = (1 to 16).map(i => s"u$i").mkString(" ")
    val corpus = Seq(1L -> common, 2L -> common, 3L -> rare)
    val rows = TextAnalysis.perplexityScore(docs(corpus), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    assert(rows(1L).getAs[Long]("n_bigrams") === 15L)
    assert(rows(3L).getAs[Long]("n_bigrams") === 15L)
    val commonNll = rows(1L).getAs[Double]("avg_nll")
    val rareNll = rows(3L).getAs[Double]("avg_nll")
    assert(commonNll < rareNll,
      s"common-path doc must score lower nll: $commonNll vs $rareNll")
    // identical docs score identically (deterministic fold)
    assert(commonNll === rows(2L).getAs[Double]("avg_nll"))
  }

  test("perplexityScore drops sub-bigram docs") {
    val rows = TextAnalysis.perplexityScore(
      docs(Seq(1L -> "solo", 2L -> "two words")), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(rows === Set(2L))
  }

  test("repetitionStats short-doc edges: no 5-grams, no bigrams") {
    val rows = TextAnalysis.repetitionStats(
      docs(Seq(1L -> "solo", 2L -> "two words")), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Double]("top2gram_frac") === 0.0)
    assert(rows(1L).getAs[Double]("dup5gram_frac") === 0.0)
    assert(rows(2L).getAs[Double]("top2gram_frac") === 1.0) // 1 bigram / 2 tokens * 2
    assert(rows(2L).getAs[Double]("uniq_word_frac") === 1.0)
  }

  test("containment: an excerpt is contained in its host, not vice versa") {
    import spark.implicits._
    val excerpt = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val host = "unrelated preamble text first " + excerpt +
      " and then a long unrelated tail continues for quite a while longer here"
    val other = "completely different content with no overlap whatsoever in it"
    val df = Seq((1L, excerpt), (2L, host), (3L, other))
      .toDF("doc_id", "text")
    val out = TextAnalysis.containment(df, "doc_id", "text",
        minContainment = 0.1, maxDocFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("containment")).toMap
    // (id_a=1 in id_b=2): nearly all of the excerpt's fingerprints
    // appear in the host; the reverse direction is diluted by the
    // host's extra text
    val fwd = out.getOrElse((1L, 2L), 0.0)
    val rev = out.getOrElse((2L, 1L), 0.0)
    assert(fwd >= 0.8, s"excerpt-in-host containment $fwd < 0.8")
    assert(rev < fwd, s"host-in-excerpt $rev should be < $fwd")
    // the unrelated doc pairs with nothing
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must produce no containment pair")
  }

  test("containment ratios stay over the capped universe (denominator consistency)") {
    import spark.implicits._
    // two identical docs: containment 1.0 both ways, shared == fps_a == fps_b
    val t = "some reasonably long shared text that winnows to several fingerprints"
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val rows = TextAnalysis.containment(df, "doc_id", "text",
      minContainment = 0.5, maxDocFreq = 10).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("containment") === 1.0)
      assert(r.getAs[Long]("shared_fps") === r.getAs[Long]("fps_a"))
      assert(r.getAs[Long]("fps_a") === r.getAs[Long]("fps_b"))
    }
    // with maxDocFreq = 1 every shared fingerprint is "hot": no pairs,
    // not a crash — the cap degrades recall, never correctness
    assert(TextAnalysis.containment(df, "doc_id", "text",
      minContainment = 0.1, maxDocFreq = 1).count() === 0L)
  }

  test("stupid backoff: hand-computed scores at every backoff level") {
    import spark.implicits._
    // MCG half-split: odd-bucket ids 1, 3 train; 0, 2 are held out.
    // Model from doc 1 "a b c a b c": f(abc)=2, f(bca)=1, f(cab)=1,
    // f(ab)=f(bc)=2, f(ca)=1, f(a)=f(b)=f(c)=2, N=6.
    val df = Seq(
      (1L, "a b c a b c"), // in-model: nll (0, ln2, 0, 0)/4
      (0L, "a b c x y z"), // trigram hit + 3 double-backoff OOV terms
      (2L, "x a b")        // single-backoff: s = 0.4 * f(ab)/f(a) = 0.4
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.stupidBackoffScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_trigrams") === 4L)
    assert(rows(1L).getAs[Double]("avg_nll") === 0.173287)
    assert(rows(1L).getAs[Double]("backoff_rate") === 0.0)
    assert(rows(0L).getAs[Double]("avg_nll") === 3.238116)
    assert(rows(0L).getAs[Double]("backoff_rate") === 0.75)
    assert(rows(2L).getAs[Double]("avg_nll") === 0.916291)
    assert(rows(2L).getAs[Double]("backoff_rate") === 1.0)
  }

  test("stupid backoff on the fixture corpus: train docs never back off, held-out docs do") {
    val path = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(path).exists())
    val docs = spark.read.parquet(path)
    val out = TextAnalysis.stupidBackoffScore(docs, "doc_id", "text")
    val trainIds = Sampling.hashSample(docs, "doc_id", 1, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (trainIds.contains(r.getLong(0)))
        assert(r.getAs[Double]("backoff_rate") === 0.0,
          s"train doc ${r.getLong(0)} backed off")
    }
    val held = rows.filter(r => !trainIds.contains(r.getLong(0)))
    assert(held.nonEmpty)
    assert(held.exists(_.getAs[Double]("backoff_rate") > 0.0),
      "no held-out doc exercised backoff - the split is not doing its job")
  }

  test("ngramLangId classifies by rank-profile out-of-place distance") {
    import spark.implicits._
    // two "languages" with disjoint character inventories; every doc
    // must classify to its own label, including the lexically novel
    // doc 20 (same characters, unseen word)
    val rows =
      (0L until 10L).map(i => (i, s"abba cabb bac${i % 3} abc cab", "aa")) ++
      (10L until 20L).map(i => (i, s"xyz zyx yzz${i % 3} zxy xyz", "zz")) ++
      Seq((20L, "ccba abba bbac", "aa"))
    val out = TextAnalysis.ngramLangId(
        rows.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang",
        profileSize = 30, docProfile = 15)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, lang) =>
      assert(out(id) === lang, s"doc $id misclassified as ${out(id)}")
    }
  }

  test("ngramLangId is invariant to input partitioning (integer ranks, pinned ties)") {
    // NOTE: the driver testdata's lang labels are decorative (every
    // label draws from one shared vocabulary), so ACCURACY there is
    // meaningless for any classifier — what the oracle gate and this
    // spec pin is exact determinism of the rank/argmin math
    import spark.implicits._
    val rows = (0L until 40L)
      .map(i => (i, s"w${i % 7} common text w${i % 5} tail", s"L${i % 3}"))
    val a = TextAnalysis.ngramLangId(
        rows.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.ngramLangId(
        rows.toDF("doc_id", "text", "lang").repartition(7),
        "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("vocabDriftKl flags the stratum whose vocabulary diverges") {
    import spark.implicits._
    // srcA/srcB share a vocabulary; srcC speaks different words
    val rows =
      (0L until 30L).map(i => (i, "alpha beta gamma delta", "srcA")) ++
      (30L until 60L).map(i => (i, "beta gamma delta alpha", "srcB")) ++
      (60L until 90L).map(i => (i, "omega psi chi phi", "srcC"))
    val out = TextAnalysis.vocabDriftKl(
        rows.toDF("doc_id", "text", "source"), "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("kl_vs_rest"))).toMap
    assert(out.keySet === Set("srcA", "srcB", "srcC"))
    assert(out("srcA")._1 === 120L)
    // the divergent stratum dominates; the twin strata sit near zero
    // and, speaking the SAME distribution, nearly tie
    assert(out("srcC")._2 > 5 * out("srcA")._2,
      s"divergent stratum not flagged: $out")
    assert(math.abs(out("srcA")._2 - out("srcB")._2) < 0.05,
      s"twin strata should have near-equal drift: $out")
  }

  test("piiStats counts each PII kind; redactPii masks with typed placeholders") {
    val d = docs(Seq(
      1L -> ("reach me at jane.doe+x@corp-mail.co.uk or 555-867-5309, " +
        "ssn 123-45-6789, server 192.168.0.1 ok"),
      2L -> "no pii here at all",
      3L -> "two mails a@b.io c@d.org and ip 10.0.0.255"))
    val out = TextAnalysis.piiStats(d, "text")
      .withColumn("redacted", TextAnalysis.redactPii(col("text")))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_email") === 1L)
    assert(out(1L).getAs[Long]("n_phone") === 1L)
    assert(out(1L).getAs[Long]("n_ssn") === 1L)
    assert(out(1L).getAs[Long]("n_ipv4") === 1L)
    assert(out(1L).getAs[Long]("pii_total") === 4L)
    assert(out(1L).getAs[String]("redacted") ===
      "reach me at <EMAIL> or <PHONE>, ssn <ID>, server <IP> ok")
    assert(out(2L).getAs[Long]("pii_total") === 0L)
    assert(out(2L).getAs[String]("redacted") === "no pii here at all")
    assert(out(3L).getAs[Long]("n_email") === 2L)
    assert(out(3L).getAs[Long]("n_ipv4") === 1L)
  }

  test("normalizeText folds typography, strips controls, collapses whitespace") {
    val d = docs(Seq(
      1L -> "“Hello’s” — a b\t\tc  d…!",
      2L -> "  already clean  "))
    val out = d.select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("n"),
        TextAnalysis.normalizeText(col("text"), lowercase = true)
          .as("nl"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 === "\"Hello's\" - a b c d...!")
    assert(out(1L)._2 === "\"hello's\" - a b c d...!")
    assert(out(2L)._1 === "already clean")
  }

  test("withCodeScore separates code from prose") {
    val d = docs(Seq(
      1L -> ("function add(a, b) { return a + b; }\n" +
        "  var x = add(1, 2);\n  if (x) { return x; }"),
      2L -> "the quick brown fox jumps over the lazy dog and runs away"))
    val out = TextAnalysis.withCodeScore(d, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val code = out(1L).getAs[Double]("code_score")
    val prose = out(2L).getAs[Double]("code_score")
    assert(code > 0.6, s"code scored $code")
    assert(prose < 0.05, s"prose scored $prose")
    assert(out(1L).getAs[Long]("keyword_hits") >= 4L)
    assert(out(2L).getAs[Long]("keyword_hits") === 0L)
    assert(out(1L).getAs[Double]("indent_frac") > 0.5)
  }

  test("card PII: only Luhn-valid card shapes are counted and redacted") {
    val d = docs(Seq(
      1L -> "pay 4111 1111 1111 1111 or amex 378282246310005 thanks",
      2L -> "order 1234-5678-9012-3456 is just a reference number",
      3L -> "short digits 1234 5678 here"))
    val out = TextAnalysis.withCardPii(d, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_card") === 2L)
    assert(out(1L).getAs[String]("card_redacted") ===
      "pay <CARD> or amex <CARD> thanks")
    // checksum-failing shape: untouched
    assert(out(2L).getAs[Long]("n_card") === 0L)
    assert(out(2L).getAs[String]("card_redacted") ===
      "order 1234-5678-9012-3456 is just a reference number")
    assert(out(3L).getAs[Long]("n_card") === 0L)
  }

  test("luhnValid agrees with the checksum definition") {
    val d = docs(Seq(1L -> "x"))
    def check(s: String): Boolean =
      d.select(TextAnalysis.luhnValid(lit(s))).head().getBoolean(0)
    assert(check("4111111111111111"))
    assert(check("378282246310005"))
    assert(!check("4111111111111112"))
    assert(!check("1234567890123456"))
  }

  test("pii rule interplay: a phone number is not double-counted as an SSN") {
    // 555-123-4567 must match ONLY the phone rule: the SSN regex needs
    // \d{2} between the dashes and \b stops it starting mid-number
    val d = docs(Seq(1L -> "call 555-123-4567 now"))
    val r = TextAnalysis.piiStats(d, "text")
      .withColumn("redacted", TextAnalysis.redactPii(col("text")))
      .collect().head
    assert(r.getAs[Long]("n_phone") === 1L)
    assert(r.getAs[Long]("n_ssn") === 0L)
    assert(r.getAs[String]("redacted") === "call <PHONE> now")
  }

  test("c4LineFilter applies all four line rules and the min-kept-lines doc drop") {
    val d = docs(Seq(
      1L -> ("this line is kept fine.\nshort.\nno terminal punct here\n" +
        "Lorem Ipsum filler text here.\ncode block { inside.\n" +
        "another good line stays!"),
      2L -> "every line bad\nalso bad"))
    val out = TextAnalysis.c4LineFilter(d, "text")
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    // doc 2 has no surviving line -> dropped entirely
    assert(!rows.contains(2L))
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_lines") === 6L)
    assert(r1.getAs[Long]("n_kept") === 2L)
    assert(r1.getAs[String]("clean_text") ===
      "this line is kept fine.\nanother good line stays!")
  }

  test("c4LineFilter honors minWordsPerLine and minKeptLines knobs") {
    val d = docs(Seq(1L -> "one two.\nthree four five six."))
    // default minWords=3: only the 4-word line survives
    assert(TextAnalysis.c4LineFilter(d, "text")
      .collect().head.getAs[Long]("n_kept") === 1L)
    // minWords=2: both survive
    assert(TextAnalysis.c4LineFilter(d, "text",
      minWordsPerLine = 2).collect().head.getAs[Long]("n_kept") === 2L)
    // minKeptLines=2 with default minWords: the doc drops
    assert(TextAnalysis.c4LineFilter(d, "text",
      minKeptLines = 2).count() === 0L)
  }

  test("charEntropy: hand-computed values, degenerate and null cases") {
    import spark.implicits._
    def ent(s: String): Option[Double] =
      Seq(Option(s)).toDF("text")
        .select(TextAnalysis.charEntropy(col("text")))
        .collect().head match {
          case r if r.isNullAt(0) => None
          case r => Some(r.getDouble(0))
        }
    // uniform 2-char alphabet: H = ln 2
    assert(math.abs(ent("abab").get - math.log(2)) < 1e-12)
    // single repeated char: H = 0 (up to the (n·ln n)/n rounding ulp)
    assert(math.abs(ent("aaaaaa").get) < 1e-12)
    // "aab": H = ln 3 - (2 ln 2 + 1 ln 1)/3
    val exp = math.log(3) - 2 * math.log(2) / 3
    assert(math.abs(ent("aab").get - exp) < 1e-12)
    // empty and null are NULL, not 0 or NaN
    assert(ent("") === None)
    assert(ent(null) === None)
    // at MATCHED length (43 chars): padding < prose < all-distinct
    // noise (entropy compares only at comparable lengths)
    val pad = ent("x" * 43).get
    val prose = ent("the quick brown fox jumps over the lazy dog").get
    val noisy = ent(('!' to 'Z').take(43).mkString).get
    assert(pad < prose && prose < noisy, s"$pad $prose $noisy")
    // non-BMP characters count as ONE code point each (the oracle's
    // string_split convention), not two surrogate halves: "a😀b" is a
    // uniform 3-symbol alphabet → H = ln 3 exactly
    val emoji = new String(Character.toChars(0x1F600))
    assert(math.abs(ent("a" + emoji + "b").get - math.log(3)) < 1e-12)
    // and a repeated non-BMP char is zero-entropy, not ln 2 over the
    // alternating high/low surrogate pattern
    assert(math.abs(ent(emoji * 5).get) < 1e-12)
  }

  test("readability: hand-counted Flesch signals and band ordering") {
    import spark.implicits._
    def read(s: String) =
      Seq(s).toDF("text")
        .select(TextAnalysis.readability(col("text")).as("r"))
        .select("r.n_sentences", "r.n_words", "r.n_syllables",
          "r.flesch_ease", "r.fk_grade")
        .collect().head
    // "The cat sat. It purred!" -> 2 sentences, 5 words,
    // vowel groups: e/a/a/I(+u+e in purred: u, e) -> count by hand:
    // The(e) cat(a) sat(a) It(I) purred(u, e) = 6
    val r = read("The cat sat. It purred!")
    assert(r.getLong(0) === 2L && r.getLong(1) === 5L &&
      r.getLong(2) === 6L)
    val wps = 5.0 / 2.0; val ypw = 6.0 / 5.0
    assert(r.getDouble(3) === 206.835 - 1.015 * wps - 84.6 * ypw)
    assert(r.getDouble(4) === 0.39 * wps + 11.8 * ypw - 15.59)
    // no terminal punctuation -> sentence floor of 1
    assert(read("headline with no period").getLong(0) === 1L)
    // simple prose scores EASIER (higher ease, lower grade) than
    // long-winded polysyllabic prose
    val simple = read("The dog ran. The dog sat. It was fun.")
    val dense = read("Notwithstanding considerable organizational " +
      "heterogeneity, multidimensional evaluation methodologies " +
      "necessitate comprehensive interdisciplinary collaboration.")
    assert(simple.getDouble(3) > dense.getDouble(3))
    assert(simple.getDouble(4) < dense.getDouble(4))
  }
}
