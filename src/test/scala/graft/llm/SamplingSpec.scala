package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus-assembly operators: reproducible sampling and sequence
  * packing. */
class SamplingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    (0 until n).map { i =>
      val lang = Seq("en", "de", "zh")(i % 3)
      val words = 3 + rng.nextInt(40)
      (i.toLong, lang, (0 until words).map(w => s"w${rng.nextInt(50)}")
        .mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  test("hashSample keeps an exact-rate-ish, nested, reproducible subset") {
    val df = docs(2000)
    val half = Sampling.hashSample(df, "doc_id", 500000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // rate within a loose binomial band
    assert(half.size > 850 && half.size < 1150, s"kept ${half.size}/2000")
    // reproducible: same subset on a second run
    val again = Sampling.hashSample(df, "doc_id", 500000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === half)
    // MONOTONE NESTING: a smaller rate is a subset of a larger one —
    // the property that lets a pipeline dial a mixture up or down
    // without resampling the world
    val tenth = Sampling.hashSample(df, "doc_id", 100000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tenth.subsetOf(half))
    assert(tenth.size > 120 && tenth.size < 280, s"kept ${tenth.size}/2000")
  }

  test("stratifiedSample applies per-stratum rates; unmapped strata drop") {
    val df = docs(3000)
    val kept = Sampling.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.25))
    val by = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.getOrElse("zh", 0L) === 0L, "unmapped stratum must drop")
    assert(by("en") === 1000L, "rate 1.0 keeps every doc")
    assert(by("de") > 150 && by("de") < 350, s"de kept ${by("de")}/1000")
  }

  test("packSequences chunks each shard's id-ordered token stream exactly") {
    val df = docs(500)
    val budget = 64
    val packed = Sampling.packSequences(df, "doc_id",
        size(split(col("text"), " ")), budget,
        Sampling.idBucket(col("doc_id"), 4))
      .select(col("doc_id"), col("shard"), col("seq_id"),
        col("seq_offset"), size(split(col("text"), " ")).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(packed.length === 500)
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var start = 0L
      rows.sortBy(_._1).foreach { case (id, _, seqId, off, toks) =>
        assert(seqId === start / budget, s"doc $id seq_id")
        assert(off === start % budget, s"doc $id offset")
        start += toks
      }
    }
    // offsets stay inside the budget, sequences are dense per shard
    assert(packed.forall(r => r._4 >= 0 && r._4 < budget))
    packed.groupBy(_._2).foreach { case (shard, rows) =>
      val seqs = rows.map(_._3).toSet
      assert(seqs === (0L to seqs.max).toSet,
        s"shard $shard has sequence-id gaps")
    }
  }

  test("packSequences is invariant to input partitioning") {
    val df = docs(300)
    def run(parts: Int) = Sampling.packSequences(df.repartition(parts),
        "doc_id", size(split(col("text"), " ")), 64,
        Sampling.idBucket(col("doc_id"), 4))
      .select("doc_id", "shard", "seq_id", "seq_offset")
      .collect().map(_.toString).sorted.toSeq
    assert(run(2) === run(13))
  }

  test("idBucket has no fixed point at id 0") {
    import spark.implicits._
    // pre-fix, id ≡ 0 mod 2^31−1 always mapped to bucket 0 and was
    // kept by EVERY nonzero rate; the +1 domain map sends 0 → 48271
    val b = Seq(0L, 2147483646L).toDF("id")
      .select(Sampling.idBucket(col("id"), 1000000).as("b"))
      .collect().map(_.getLong(0))
    assert(b.forall(_ === 48271L))
  }

  test("stratifiedUpsample replicates by floor(rate) + fractional bucket") {
    val df = docs(3000) // 1000 each of en/de/zh
    val up = Sampling.stratifiedUpsample(df, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 2.5, "zh" -> 0.25))
    val rows = up.select("doc_id", "lang", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val by = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(by("en") === 1000, "rate 1.0 keeps each doc exactly once")
    // de ×2.5: every doc twice, ~half a third time
    assert(by("de") > 2350 && by("de") < 2650, s"de got ${by("de")}/1000")
    val deCopies = rows.filter(_._2 == "de").groupBy(_._1)
      .view.mapValues(_.length).toMap
    assert(deCopies.values.forall(c => c == 2 || c == 3))
    assert(by.getOrElse("zh", 0) > 150 && by("zh") < 350)
    // epochs are dense 0..copies-1 per doc → (id, epoch) unique
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, copies) =>
      val es = copies.map(_._3).sorted
      assert(es === (0L until es.length).toSeq)
    }
    // rates ≤ 1 reduce exactly to stratifiedSample's kept set
    val zhUp = rows.filter(_._2 == "zh").map(_._1).toSet
    val zhFlat = Sampling.stratifiedSample(df, "doc_id", "lang",
        Map("zh" -> 0.25)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(zhUp === zhFlat)
  }

  test("upsample composes with packing via a composite (id, epoch) key") {
    // packSequences requires a unique id per shard; upsampling emits
    // (id, epoch) copies, so the composition derives a packing key
    // id·K + epoch (exact for epoch < K) — the documented pattern for
    // feeding an upsampled mixture into the packer
    val df = docs(300)
    val up = Sampling.stratifiedUpsample(df, "doc_id", "lang",
      Map("en" -> 2.0, "de" -> 1.5, "zh" -> 1.0))
      .withColumn("pack_id", col("doc_id") * 8 + col("epoch"))
    val packed = Sampling.packSequences(up, "pack_id",
        size(split(col("text"), " ")), 64,
        Sampling.idBucket(col("pack_id"), 4))
      .select(col("pack_id"), col("shard"), col("seq_id"),
        col("seq_offset"), size(split(col("text"), " ")).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    // every upsampled copy packs exactly once, chunks reconstruct
    assert(packed.length === packed.map(_._1).distinct.length)
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var start = 0L
      rows.sortBy(_._1).foreach { case (id, _, seqId, off, toks) =>
        assert(seqId === start / 64, s"copy $id seq_id")
        assert(off === start % 64, s"copy $id offset")
        start += toks
      }
    }
    // en docs appear exactly twice (rate 2.0) under distinct pack ids
    val enCopies = packed.map(_._1 / 8).groupBy(identity)
      .view.mapValues(_.length).toMap
    val enIds = df.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0))
    enIds.foreach(id => assert(enCopies(id) === 2, s"doc $id copies"))
  }

  test("packSlices: per-doc slices reassemble the token count exactly") {
    val df = docs(400)
    val budget = 32 // small budget → plenty of docs span sequences
    val toks = size(split(col("text"), " "))
    val slices = Sampling.packSlices(df, "doc_id", toks, budget,
        Sampling.idBucket(col("doc_id"), 4))
      .select(col("doc_id"), col("shard"), col("seq_id"),
        col("slice_start"), col("slice_len"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val expected = df.select(col("doc_id"), toks.as("t")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    // every slice is non-empty and fits the budget
    assert(slices.forall(s => s._5 >= 1 && s._5 <= budget))
    // per-doc: slices cover [0, toks) contiguously, in seq order
    slices.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.map(_._5).sum === expected(id), s"doc $id total")
      assert(sorted.head._4 === 0L, s"doc $id first slice offset")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + 1, s"doc $id seq gap")
          assert(b._4 === a._4 + a._5, s"doc $id slice contiguity")
        case _ => ()
      }
    }
    // consistency with packSequences: a doc's FIRST slice lands at the
    // (seq_id, seq_offset) the scalar form reports
    val packed = Sampling.packSequences(df, "doc_id", toks, budget,
        Sampling.idBucket(col("doc_id"), 4))
      .select("doc_id", "seq_id", "seq_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    slices.groupBy(_._1).foreach { case (id, ss) =>
      val first = ss.minBy(_._3)
      val (seqId, off) = packed(id)
      assert(first._3 === seqId, s"doc $id first seq")
      // slice_start 0 at in-sequence offset `off`: a doc starting at
      // offset off has budget-off tokens in its first slice (or all)
      assert(first._5 === math.min(expected(id), budget - off),
        s"doc $id first slice len")
    }
  }

  test("packSlices is invariant to input partitioning") {
    val df = docs(300)
    def run(parts: Int) = Sampling.packSlices(df.repartition(parts),
        "doc_id", size(split(col("text"), " ")), 32,
        Sampling.idBucket(col("doc_id"), 4))
      .select("doc_id", "shard", "seq_id", "slice_start", "slice_len")
      .collect().map(_.toString).sorted.toSeq
    assert(run(2) === run(13))
  }

  test("decontaminate flags exactly the train docs sharing benchmark shingles") {
    import spark.implicits._
    val bench = Seq(
      (1000L, "the secret benchmark answer is forty two exactly"),
      (1001L, "another held out evaluation question text here"))
      .toDF("doc_id", "text")
    val train = Seq(
      // contains two 3-gram shingles of bench 1000 → contaminated
      (1L, "we think the secret benchmark answer is hidden"),
      // one shared shingle only → below minShared=2
      (2L, "another held out thing entirely unrelated words"),
      // nothing shared
      (3L, "completely fresh training text with no overlap at all"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench, "doc_id", "text",
        n = 3, minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L))
    assert(out(1L) >= 2L)
  }

  test("decontaminate ignores hot benchmark shingles past the cap") {
    import spark.implicits._
    // the same boilerplate shingle sits in MANY benchmark docs: with a
    // cap below that count it must stop contaminating the corpus
    val bench = (0 until 30).map(i =>
      (2000L + i, s"common boiler plate prefix unique$i tail"))
      .toDF("doc_id", "text")
    val train = Seq((1L, "common boiler plate prefix something else here"))
      .toDF("doc_id", "text")
    val flagged = Dedup.decontaminate(train, bench, "doc_id", "text",
      n = 3, minShared = 1, maxDocFreq = 10)
    assert(flagged.count() === 0L,
      "capped hot shingles must not contaminate")
    val uncapped = Dedup.decontaminate(train, bench, "doc_id", "text",
      n = 3, minShared = 1, maxDocFreq = 100)
    assert(uncapped.count() === 1L)
  }

  test("globalOrdinal is exactly the single-sort global rank") {
    import spark.implicits._
    val n = 500
    val df = (0L until n).map(i => (i, s"payload$i")).toDF("doc_id", "txt")
    val got = Sampling.globalOrdinal(df, "doc_id", nShards = 7)
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the naive global ORDER BY (bucket, id) row_number
    val naive = df
      .withColumn("__b", Sampling.idBucket(col("doc_id"), 1000000))
      .orderBy(col("__b"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got === naive)
    // contiguous permutation 0..n-1
    assert(got.values.toSeq.sorted === (0L until n))
  }

  test("globalOrdinal shard boundaries respect the global order") {
    import spark.implicits._
    val df = (0L until 300).toDF("doc_id")
    val rows = Sampling.globalOrdinal(df, "doc_id", nShards = 5)
      .select("shard", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // positions within a shard form one contiguous run, and runs are
    // ordered by shard id — required for `pos` to be a global rank
    val byShard = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, xs) => (s, xs.map(_._2).sorted.toSeq) }
    var expectNext = 0L
    byShard.foreach { case (_, ps) =>
      assert(ps.head === expectNext)
      assert(ps === (ps.head until ps.head + ps.size).toSeq)
      expectNext = ps.last + 1
    }
  }

  test("dsirLogWeights matches a driver-side recomputation exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha", "tgt"),
      (1L, "alpha beta", "tgt"),
      (2L, "gamma delta gamma delta", "raw"),
      (3L, "alpha delta", "raw")).toDF("doc_id", "text", "src")
    val buckets = 64
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 1000003L + c.toLong) % 2147483647L)
    def grams(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val all = Seq((0L, "tgt"), (1L, "tgt"), (2L, "raw"), (3L, "raw"))
      .zip(Seq("alpha beta alpha", "alpha beta",
        "gamma delta gamma delta", "alpha delta"))
      .map { case ((id, s), t) => (id, s, grams(t).map(g =>
        polyHash(g) % buckets)) }
    val ac = all.flatMap(_._3).groupBy(identity).view.mapValues(_.size)
    val tc = all.filter(_._2 == "tgt").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size).toMap
    val na = all.map(_._3.size).sum
    val nt = all.filter(_._2 == "tgt").map(_._3.size).sum
    def lr(b: Long): Double =
      math.log((tc.getOrElse(b, 0) + 1).toDouble / (nt + buckets)) -
        math.log((ac(b) + 1).toDouble / (na + buckets))
    val expected = all.map { case (id, _, bs) =>
      val perB = bs.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy(_._1)
      id -> (bs.size.toLong,
        BigDecimal(perB.map { case (b, c) => c * lr(b) }.sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = Sampling.dsirLogWeights(docs, "doc_id", "text",
        col("src") === "tgt", buckets)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("dsir_logw"))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, w)) =>
      assert(got(id)._1 === n, s"n_grams for doc $id")
      assert(math.abs(got(id)._2 - w) < 2e-6, s"dsir_logw for doc $id")
    }
  }

  test("dsirResample is the exact Gumbel-top-k of the weight table") {
    import spark.implicits._
    val M = 2147483647L
    val den = 1000000
    val weights = (0L until 50L).map(i => (i, (i % 9).toDouble - 4.0))
      .toDF("doc_id", "lw")
    val got = Sampling.dsirResample(weights, "doc_id", "lw", k = 10,
        den = den)
      .select("doc_id", "sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._2)
    def key(id: Long, lw: Double): Double = {
      val bucket = ((id % (M - 1)) + 1) * 48271L % M % den
      val u = (bucket + 0.5) / den
      BigDecimal(lw + -math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (0L until 50L).map(i => (i, key(i, (i % 9).toDouble - 4.0)))
      .sortBy { case (id, k) => (-k, id) }.take(10)
      .zipWithIndex.map { case ((id, _), r) => (id, r + 1L) }
    assert(got === expect)
  }

  test("dropBottomByScore drops floor(n*p) per stratum with id tie-breaks") {
    import spark.implicits._
    // stratum a: 7 docs, drop floor(7*3/10)=2 lowest; ties on score 1.0
    // broken by doc_id so exactly ids 0,1 drop
    val df = (
      (0L until 7L).map(i => (i, "a", if (i < 4) 1.0 else 2.0)) ++
      (10L until 13L).map(i => (i, "b", i.toDouble))).toDF(
      "doc_id", "stratum", "score")
    val kept = Sampling.dropBottomByScore(df, "doc_id", "stratum",
        col("score"), 3, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // a: drop 0,1 (lowest by (score, id)); b: drop floor(3*3/10)=0
    assert(kept === Set(2L, 3L, 4L, 5L, 6L, 10L, 11L, 12L))
    // dropNum=0 keeps everything
    assert(Sampling.dropBottomByScore(df, "doc_id", "stratum",
      col("score"), 0, 10).count() === 10L)
  }

  test("dsirLogWeights ranks target-vocabulary docs above off-target docs") {
    import spark.implicits._
    // target domain speaks vocab A, raw web speaks vocab B; a held-out
    // vocab-A doc must outscore every vocab-B doc
    val docs = (
      (0L until 20).map(i => (i, "alpha beta gamma delta", "tgt")) ++
      (20L until 80).map(i => (i, "zeta eta theta iota", "web")) ++
      Seq((99L, "alpha beta gamma delta", "web"))).toDF(
      "doc_id", "text", "src")
    val out = Sampling.dsirLogWeights(docs, "doc_id", "text",
        col("src") === "tgt", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_logw"))
      .toMap
    val heldOut = out(99L)
    (20L until 80).foreach { i =>
      assert(heldOut > out(i),
        s"held-out target-like doc scored ${heldOut} <= web doc ${out(i)}")
    }
  }
}
