package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: reproducible
  * subsampling, per-stratum mixture weighting, and GPT-style sequence
  * packing. These are the steps between "deduplicated corpus" and
  * "training batches", and at 100 TB all three must be deterministic
  * pure column/window work — no RNG state, no driver-side shuffling.
  */
object Sampling {

  private val M = 2147483647L // 2^31 − 1

  /** Portable pseudo-random bucket of a numeric id: Park–Miller
    * multiplicative congruential `(id mod M)·48271 mod M`, reduced to
    * `buckets`. Chosen over xxhash64 DELIBERATELY: every engine
    * (Spark, DuckDB, any warehouse) computes it exactly with plain
    * 64-bit integer ops — no overflow (48271·(M−1) < 2^63 keeps ANSI
    * happy), no engine-specific hash — so a sample drawn here is
    * reproducible bit-for-bit by the DuckDB oracle or any downstream
    * system. Full-period MCG: id-sequential corpora still spread
    * uniformly. */
  def idBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0)
    pmod(pmod(id.cast("long"), lit(M)) * lit(48271L), lit(M)) % buckets
  }

  /** Deterministic Bernoulli-style subsample: keep a row iff its id
    * bucket (out of `den`) falls below `num` — an exact `num/den`
    * rate on a uniform id spread, the same subset on every run and
    * every engine. Pure filter: evaluates inside the scan's codegen
    * stage, no shuffle. */
  def hashSample(df: DataFrame, id: String, num: Int,
                 den: Int = 1000000): DataFrame = {
    require(num >= 0 && num <= den, s"num=$num must be in [0, den=$den]")
    df.filter(idBucket(col(id), den) < num)
  }

  /** Mixture sampling: per-stratum keep rates (the "sample web at 50%,
    * books at 100%" language/domain-weighting step). Strata absent
    * from `fractions` are dropped — the mixture is explicit. Rates are
    * fixed-denominator integers (`floor(rate·den)`) so the oracle can
    * reproduce the exact threshold arithmetic. Pure filter, as above;
    * the per-stratum threshold is a broadcast-free literal CASE. */
  def stratifiedSample(df: DataFrame, id: String, stratum: String,
                       fractions: Map[String, Double],
                       den: Int = 1000000): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1))
    val threshold = fractions.foldLeft(lit(0)) { case (acc, (s, f)) =>
      when(col(stratum) === s, lit((f * den).toInt)).otherwise(acc)
    }
    df.filter(idBucket(col(id), den) < threshold)
  }

  /** GPT-style greedy sequence packing: within each shard, documents
    * are concatenated in id order and the token stream is chunked
    * every `budget` tokens; each document reports the training
    * sequence its first token lands in (`seq_id`) and its offset in
    * that sequence. One window pass (running token sum) per shard.
    *
    * `shard` bounds the window sort — a global unpartitioned
    * cumulative sum would serialize 100 TB through one task, and real
    * pipelines pack per shard/worker anyway ([[idBucket]] of the doc
    * id gives deterministic shards; a domain column works too). */
  def packSequences(df: DataFrame, id: String, tokens: Column,
                    budget: Int, shard: Column): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(shard).orderBy(col(id))
    df.withColumn("__shard", shard)
      .withColumn("__start", sum(tokens).over(w) - tokens)
      // integral `div`, not floor(double /): exact past 2^53 tokens
      .withColumn("seq_id", expr(s"__start div ${budget}L"))
      .withColumn("seq_offset", pmod(col("__start"), lit(budget.toLong)))
      .drop("__start")
      .withColumnRenamed("__shard", "shard")
  }
}
