package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Dedup operator contracts, including the SimHash pigeonhole recall
  * guarantee: banding derived from maxDist must never miss a pair whose
  * hamming distance is within maxDist.
  */
class DedupSpec extends SparkSpec {

  /** Exhaustive hamming ground truth for a corpus, via the fingerprints
    * the operator itself computes (the contract under test is the
    * CANDIDATE GENERATION, given those fingerprints). */
  private def exhaustivePairs(docs: org.apache.spark.sql.DataFrame,
                              maxDist: Int): Set[(Long, Long)] = {
    val fps = Dedup.simhash(docs, "doc_id", "text")
    val a = fps.select(col("doc_id").as("id_a"), col("simhash").as("fa"))
    val b = fps.select(col("doc_id").as("id_b"), col("simhash").as("fb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= maxDist)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Documents built from a small vocabulary so hamming distances spread
    * over 0..64 and several pairs land within each tested radius. */
  private def corpus() = {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(11)
    val base = (0 until 30).map { i =>
      (i.toLong, Seq.fill(20)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    // jittered copies: swap one word -> small hamming distance
    val dups = (0 until 10).map { i =>
      val (bid, text) = base(i)
      val words = text.split(" ")
      words(rng.nextInt(words.length)) = vocab(rng.nextInt(vocab.size))
      (100L + bid, words.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("simhashCandidates misses no pair within maxDist (pigeonhole)") {
    val docs = corpus()
    for (maxDist <- Seq(3, 7, 10)) {
      val truth = exhaustivePairs(docs, maxDist)
      val cand = Dedup.simhashCandidates(docs, "doc_id", "text", maxDist)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truth.nonEmpty, s"test corpus has no pairs within $maxDist")
      assert(truth.subsetOf(cand),
        s"maxDist=$maxDist missed ${(truth -- cand).size}/${truth.size} pairs")
    }
  }

  test("simhashCandidatesMulti misses no pair within radius 10 (pigeonhole)") {
    val docs = corpus()
    for (maxDist <- Seq(10, 12)) {
      val truth = exhaustivePairs(docs, maxDist)
      val cand = Dedup.simhashCandidatesMulti(docs, "doc_id", "text", maxDist)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truth.nonEmpty, s"test corpus has no pairs within $maxDist")
      assert(truth.subsetOf(cand),
        s"maxDist=$maxDist missed ${(truth -- cand).size}/${truth.size} pairs")
      // and nothing beyond the radius leaks through the hamming filter
      assert(cand.subsetOf(exhaustivePairs(docs, maxDist)))
    }
  }

  test("multi-index buckets stay cool on an adversarial near-constant corpus") {
    import spark.implicits._
    // 400 synthetic fingerprints sharing a base pattern, each with up to
    // 16 bits flipped at scattered positions — the bulk of pairs sit at
    // hamming ~20-32, yet in the single-block scheme (radius 10 → 16
    // chunks of 4 bits) the 16-value key space makes near-all-pairs
    // collide. The 66-table multi-index must (a) emit EXACTLY the pairs
    // within radius 10 (the handful of coincidentally-close ones; exact
    // recall by pigeonhole, exact precision by the hamming filter),
    // (b) keep every bucket far below corpus size.
    val rng = new scala.util.Random(13)
    val base = rng.nextLong()
    val fps = (0 until 400).map { i =>
      var f = base
      (0 until 16).foreach(_ => f ^= 1L << rng.nextInt(64))
      (i.toLong, f)
    }.toDF("doc", "fp")
    val a = fps.select(col("doc").as("id_a"), col("fp").as("fa"))
    val b = fps.select(col("doc").as("id_b"), col("fp").as("fb"))
    val truth = a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= 10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Dedup.simhashCandidatesFromFps(fps, maxDist = 10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === truth,
      s"missed ${(truth -- out).size}, leaked ${(out -- truth).size}")
    // bucket histogram: with ~11-bit keys over 400 docs no table bucket
    // should exceed a small fraction of the corpus (the 4-bit chunk
    // scheme puts ~25 docs in EVERY bucket and hundreds in hot ones)
    // expected hottest bucket: the all-clean-blocks key holds ~400 ×
    // (48/64)^10 ≈ 23 docs (two 5-bit blocks), tail-bounded well under
    // 60; the 4-bit chunk scheme's base bucket holds ~126 and EVERY
    // bucket ~25 (16-value key space)
    val maxBucket = Dedup.simhashBucketStats(fps, maxDist = 10)
      .agg(max("bucket_size")).collect().head.getLong(0)
    assert(maxBucket <= 60, s"hot bucket of $maxBucket/400 docs")
  }

  test("simhashCandidates emits only pairs within maxDist") {
    val docs = corpus()
    val out = Dedup.simhashCandidates(docs, "doc_id", "text", maxDist = 7)
      .collect()
    assert(out.nonEmpty)
    out.foreach(r =>
      assert(r.getAs[Number]("hamming").longValue() <= 7))
  }

  test("resolveComponents finds transitive components and keeps min ids") {
    import spark.implicits._
    // components: {1,2,3,7} via chain 1-2, 2-3, 3-7; {4,5}; {6} isolated
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (4L, 5L))
      .toDF("id_a", "id_b")
    val out = Dedup.resolveComponents(docs, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L) === ((1L, true)))
    assert(out(2L) === ((1L, false)))
    assert(out(3L) === ((1L, false)))
    assert(out(7L) === ((1L, false)))
    assert(out(4L) === ((4L, true)))
    assert(out(5L) === ((4L, false)))
    assert(out(6L) === ((6L, true)))
  }

  test("resolveComponents converges logarithmically on a deep chain") {
    import spark.implicits._
    // a 200-node chain has diameter 199: plain min-label propagation
    // needs ~200 rounds, pointer jumping needs ~log2(200)+slack. maxIters
    // = 12 passes ONLY if the doubling works; non-convergence now throws
    // instead of silently returning a partial labeling.
    val n = 200
    val docs = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.resolveComponents(docs, pairs, "doc_id", maxIters = 12)
      .collect()
    assert(out.length === n)
    assert(out.forall(_.getLong(1) === 0L), "all nodes label to the chain head")
    assert(out.count(_.getBoolean(2)) === 1)
  }

  test("resolveComponents throws instead of returning partial labels") {
    import spark.implicits._
    val n = 64
    val docs = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.resolveComponents(docs, pairs, "doc_id", maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("exact dedup groups identical fingerprints") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", Seq("text")).collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_dups") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("decontaminateBloom output is identical to exact decontaminate") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val rng = new scala.util.Random(7)
    val bench = (0 until 12).map { i =>
      (i.toLong, Seq.fill(15)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    // half the train docs embed a bench 6-gram (contaminated), half don't
    val train = (0 until 40).map { i =>
      val own = Seq.fill(15)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val text = if (i % 2 == 0) {
        val src = bench(i % bench.size)._2.split(" ").take(6).mkString(" ")
        s"$own $src"
      } else own
      (100L + i, text)
    }
    val benchDf = bench.toDF("doc_id", "text")
    val trainDf = train.toDF("doc_id", "text")
    val exact = Dedup.decontaminate(trainDf, benchDf, "doc_id", "text",
      n = 3, minShared = 2, maxDocFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Dedup.decontaminateBloom(trainDf, benchDf, "doc_id",
      "text", n = 3, minShared = 2, maxDocFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must actually contaminate")
    assert(bloom === exact)
  }

  test("decontaminateBloom survives a tiny (collision-heavy) filter") {
    import spark.implicits._
    // 2^6 bits: false-positive rate near 1 — output must STILL be exact
    // because the equi-join removes every false positive
    val benchDf = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val trainDf = Seq((1L, "a b c d x y"), (2L, "p q r s t u"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminateBloom(trainDf, benchDf, "doc_id",
      "text", n = 3, minShared = 2, maxDocFreq = 100, numBits = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // train doc 1 shares shingles "a b c", "b c d" -> n_shared = 2
    assert(out === Set((1L, 2L)))
  }

  test("spanDedup keeps first occurrence, edits docs, drops full dups") {
    import spark.implicits._
    val spanA = (1 to 4).map(i => s"a$i").mkString(" ")  // 4-word span
    val spanB = (1 to 4).map(i => s"b$i").mkString(" ")
    val spanC = (1 to 4).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, s"$spanA $spanB"),   // first occurrence of A and B
      (2L, s"$spanA $spanC"),   // A is a repeat -> only C survives
      (3L, s"$spanB $spanA")    // every span seen -> doc vanishes
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", span = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((s"$spanA $spanB", 2L, 2L)))
    assert(out(2L) === ((spanC, 2L, 1L)))
  }

  test("spanDedup within-doc repeats dedup too, and order is preserved") {
    import spark.implicits._
    val s1 = "w1 w2 w3"
    val s2 = "x1 x2 x3"
    // doc = s1 s2 s1 (three 3-word spans; third repeats the first)
    val df = Seq((5L, s"$s1 $s2 $s1")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", span = 3).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === s"$s1 $s2")
    assert(out.head.getLong(2) === 3L && out.head.getLong(3) === 2L)
  }

  test("spanDedup ragged tail spans are distinct from full spans") {
    import spark.implicits._
    // "a b c d e" with span=2 -> "a b", "c d", "e"; a second doc ending
    // in "e f" must NOT collide with the bare-"e" tail
    val df = Seq((1L, "a b c d e"), (2L, "z z e f"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", span = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a b c d e")
    assert(out(2L) === "z z e f")
  }

  test("substringDedup: match_len is exactly the longest shared run") {
    import spark.implicits._
    val run10 = (1 to 10).map(i => s"r$i").mkString(" ")  // planted 10-word run
    val pad = (1 to 6).map(i => s"p$i").mkString(" ")
    val qad = (1 to 6).map(i => s"q$i").mkString(" ")
    val df = Seq(
      (1L, s"$pad $run10"),          // shares run10 with 2
      (2L, s"$run10 $qad"),
      (3L, s"$pad x1 x2 x3 $qad"))   // shares only <4-word runs
    .toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", minLen = 4,
        maxAnchorFreq = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("n_anchor_hits"), r.getAs[Long]("match_len")))
      .toMap
    // pair (1,2): longest shared run is exactly the planted 10 words ->
    // 7 consecutive 4-gram anchors on one diagonal, match_len 10
    assert(out((1L, 2L)) === ((7L, 10L)))
    // pair (1,3) shares pad (6 words -> 3 anchors, run 3 -> len 6);
    // pair (2,3) shares qad the same way
    assert(out((1L, 3L)) === ((3L, 6L)))
    assert(out((2L, 3L)) === ((3L, 6L)))
  }

  test("substringDedup: scattered shared grams do not chain into a long match") {
    import spark.implicits._
    val g1 = "a1 a2 a3 a4"
    val g2 = "b1 b2 b3 b4"
    // shared 4-grams at NON-adjacent, diagonal-breaking offsets: two
    // islands of run 1 each -> match_len stays 4
    val df = Seq(
      (1L, s"$g1 z1 z2 z3 $g2"),
      (2L, s"$g2 y1 $g1"))
    .toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", minLen = 4,
      maxAnchorFreq = 10).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_anchor_hits") === 2L)
    assert(out.head.getAs[Long]("match_len") === 4L)
  }

  test("substringDedup hot-anchor cap drops flooded anchors, never invents") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"h$i").mkString(" ")
    // the boilerplate run appears in 6 docs -> 6 occurrences of each
    // anchor; cap 5 drops them all -> no pairs at all
    val df = (1L to 6L).map(i => (i, s"u${i}a u${i}b $boiler"))
      .toDF("doc_id", "text")
    val none = Dedup.substringDedup(df, "doc_id", "text", minLen = 8,
      maxAnchorFreq = 5).collect()
    assert(none.isEmpty)
    // cap 6 admits them: every pair reports the full 8-word match
    val all = Dedup.substringDedup(df, "doc_id", "text", minLen = 8,
      maxAnchorFreq = 6).collect()
    assert(all.length === 15) // C(6,2)
    assert(all.forall(_.getAs[Long]("match_len") == 8L))
  }

  test("substringDedup within-doc repeated anchors keep diagonals separate") {
    import spark.implicits._
    val r = "m1 m2 m3 m4"
    // doc 1 contains the run twice; doc 2 once -> two (pa, pb) hits on
    // two diagonals, each an island of 1 -> match_len 4, hits 2
    val df = Seq((1L, s"$r x0 $r"), (2L, s"$r"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", minLen = 4,
      maxAnchorFreq = 10).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_anchor_hits") === 2L)
    assert(out.head.getAs[Long]("match_len") === 4L)
  }

  test("lshErrorProfile matches a driver-side midpoint integration exactly") {
    val out = Dedup.lshErrorProfile(spark, numHashes = 32,
        threshold = 0.4, steps = 500)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    def expect(b: Int, r: Int): (Double, Double) = {
      var fp = 0.0; var fn = 0.0
      (0 until 500).foreach { i =>
        val s = (i + 0.5) / 500
        val p = 1.0 - math.pow(1.0 - math.pow(s, r), b)
        if (s < 0.4) fp += p / 500 else fn += (1.0 - p) / 500
      }
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r6(fp), r6(fn))
    }
    assert(out.keySet === Set(1, 2, 4, 8, 16, 32).map(b => (b, 32 / b)))
    out.keys.foreach { case (b, r) =>
      val (efp, efn) = expect(b, r)
      assert(math.abs(out((b, r))._1 - efp) < 2e-6, s"fp at ($b,$r)")
      assert(math.abs(out((b, r))._2 - efn) < 2e-6, s"fn at ($b,$r)")
    }
    // the endpoints are the known degenerate regimes: one wide band is
    // all false negatives, all-singleton bands are all false positives
    assert(out((1, 32))._2 > 0.4 && out((1, 32))._1 < 0.01)
    assert(out((32, 1))._1 > 0.3 && out((32, 1))._2 < 0.05)
    // and the tuned optimum is strictly interior
    val best = out.minBy { case (_, (fp, fn)) => fp + fn }._1
    assert(best._1 > 1 && best._1 < 32, s"optimum $best not interior")
  }

  test("noveltyScore: shared-shingle fractions, no pair join semantics") {
    import spark.implicits._
    // doc 1 and 2 share one exact 5-gram run; doc 3 is fully original;
    // doc 4 is a verbatim copy of doc 1 (novelty 0); doc 5 too short
    val docs = Seq(
      (1L, "a b c d e f g"),          // 3 shingles
      (2L, "x a b c d e y z w q"),    // 6 shingles, 1 shared (a b c d e)
      (3L, "p q r s t u v"),          // 3 shingles, none shared
      (4L, "a b c d e f g"),          // copy of doc 1
      (5L, "too short here")          // < 5 words -> omitted
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScore(docs, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("novelty")))).toMap
    assert(!out.contains(5L))
    // docs 1 and 4 are identical: every shingle shared -> novelty 0
    assert(out(1L) === ((3L, 3L, 0.0)))
    assert(out(4L) === ((3L, 3L, 0.0)))
    // doc 2 shares exactly the 'a b c d e' shingle with docs 1/4
    assert(out(2L)._1 === 6L && out(2L)._2 === 1L)
    assert(math.abs(out(2L)._3 - (1.0 - 1.0 / 6)) < 1e-6) // round-6 output
    // doc 3 is fully novel
    assert(out(3L) === ((3L, 0L, 1.0)))
    // repartition invariance
    val again = Dedup.noveltyScore(docs.repartition(5), "doc_id",
      "text", n = 5).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("novelty")).toMap
    assert(again === out.map { case (k, v) => k -> v._3 })
  }

  /** Driver Levenshtein for the edit-distance blocking tests. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs: exact distances inside blocks; a < b once") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 3
    val docs = Seq(
      (1L, base),                               // original
      (2L, base.replace("lazy", "hazy")),       // 1 edit
      (3L, base + "tail words appended here"),  // same prefix, longer
      (4L, "completely different text that shares no prefix at all"),
      (5L, base.replace("lazy", "very sleepy")) // several edits
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 30, lenBucket = 50, prefixLen = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // every pair appears once, ordered id_a < id_b
    assert(got.keys.forall { case (a, b) => a < b })
    // distances match the driver recompute
    val texts = Map(1L -> base, 2L -> base.replace("lazy", "hazy"),
      3L -> (base + "tail words appended here"),
      5L -> base.replace("lazy", "very sleepy"))
    got.foreach { case ((a, b), (d, sim)) =>
      val exp = lev(texts(a), texts(b))
      assert(d === exp.toLong, s"pair ($a,$b)")
      val mx = math.max(texts(a).length, texts(b).length)
      assert(sim === 1.0 - d.toDouble / mx)
    }
    // (1,2) found (one edit per repeat of the base phrase = 3);
    // doc 4 shares no prefix -> blocked out
    assert(got.contains((1L, 2L)) && got((1L, 2L))._1 === 3L)
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("editDistancePairs: adjacent length buckets bridge the boundary") {
    import spark.implicits._
    // two docs sharing a 16-char prefix whose lengths straddle a
    // bucket edge (len 49 vs 53, bucket 0 vs 1) but differ by <= 50
    val t1 = "shared-prefix-16." + ("a" * 32)   // len 49
    val t2 = "shared-prefix-16." + ("a" * 36)   // len 53
    val got = Dedup.editDistancePairs(
        Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"),
        "doc_id", "text", maxDist = 10)
      .collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 4L) // 4 appended chars
  }

  test("editDistancePairs: maxDist prunes, repartition-invariant") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, "prefix-shared-xx " + ("w" * 40) + ("z" * (i % 3).toInt)))
      .toDF("doc_id", "text")
    val one = Dedup.editDistancePairs(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = Dedup.editDistancePairs(docs.repartition(7), "doc_id",
        "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one === two && one.nonEmpty)
    // distance 0/1/2 kept only
    val far = Dedup.editDistancePairs(docs, "doc_id", "text", 0)
      .collect()
    assert(far.forall(_.getLong(2) == 0L))
  }
}
