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
}
