package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental deduplication for a continuously-ingested corpus (the
  * streaming face of [[graft.llm.Dedup]] — a training-data pipeline
  * ingests forever; batch-only dedup would force periodic full
  * recompaction of 100 TB).
  *
  * Both operators ride `dropDuplicatesWithinWatermark`: state is keyed by
  * the dedup key only (fingerprint / signature hash), and the watermark
  * bounds how long a key is remembered — the knob that makes dedup state
  * finite on an infinite stream. Exactly the semantics a continuous
  * ingestion wants: "drop re-crawls arriving within N hours"; docs
  * recurring after the horizon re-enter (periodic batch compaction with
  * [[graft.llm.Dedup.exact]] reconciles the long tail).
  *
  * The minhash path computes the signature as a PURE COLUMN EXPRESSION
  * ([[rowMinhash]]) rather than reusing the groupBy form of
  * `Dedup.minhashSignatures`: a streaming aggregation cannot precede
  * `dropDuplicatesWithinWatermark` in one plan (stateful-after-stateful
  * restriction), and the shingle set of a document lives within its own
  * row anyway — no cross-row state is needed. StreamingSpec pins
  * bit-parity of the two forms and batch≡stream keep/drop parity.
  */
object StreamingDedup {

  import graft.functions.ColumnLet.bind

  /** Per-row minhash signature: struct of `numHashes` minima, each the
    * min over the shingle set of xxhash64 seeded by the hash index —
    * value-identical to `Dedup.minhashSignatures` (same shingling, same
    * seeded hash, same min) for any document with >= shingleN words. A
    * shorter document has an EMPTY shingle set: the batch groupBy form
    * drops it from the signature relation entirely, this row form yields
    * an all-null struct (all such docs mutually collide — [[minhashDedup]]
    * routes them around its key for exactly this reason; any other caller
    * keying on the signature must do the same).
    *
    * The word and shingle arrays are [[bind]]-bound so the whole
    * signature costs one split + one shingle pass + numHashes×|shingles|
    * hashes per row; naive nesting re-splits the text for every shingle
    * and re-shingles for every hash function — quadratic per document
    * (measured 30 s on 5,000 sf0.1 docs vs ~1 s bound). */
  def rowMinhash(text: Column, shingleN: Int = 3,
                 numHashes: Int = 32): Column =
    bind(split(text, " "), words =>
      bind(
        // guard: sequence(0, -1) yields a DESCENDING [0,-1], not empty
        when(size(words) >= shingleN,
          array_distinct(transform(sequence(lit(0), size(words) - shingleN),
            i => concat_ws(" ", slice(words, i + 1, lit(shingleN))))))
          .otherwise(array().cast("array<string>")),
        sh => struct((0 until numHashes).map(i =>
          array_min(transform(sh, s => xxhash64(lit(i), s))).as(s"mh$i")): _*)))

  /** Exact streaming dedup: keep the FIRST arrival per `fingerprintCols`
    * key within the watermark horizon, drop later re-arrivals. Batch
    * `Dedup.exact` keeps min(id) per key; the streaming analogue keeps
    * the earliest-SEEN — the only order an unbounded stream has. On a
    * batch frame this degrades to `dropDuplicates` (same kept-key set,
    * arbitrary representative). */
  def exactDedup(df: DataFrame, ts: String, fingerprintCols: Seq[String],
                 watermark: String = "1 hour"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(fingerprintCols)
    else df.dropDuplicates(fingerprintCols)

  /** Streaming minhash dedup: drop documents whose FULL minhash signature
    * matches one already seen within the watermark (signature equality =
    * estimated Jaccard 1.0 — re-crawls, boilerplate clones, trivial
    * re-encodings). State per remembered doc is one 64-bit key
    * (xxhash64 of the signature struct), not the 256-byte signature:
    * 8 GB of state per 10⁹ remembered docs instead of 256 GB, at a
    * birthday-bound false-drop risk of ~n²/2⁶⁵ (≈3% chance of ONE
    * spurious drop across 10⁹ docs) — the right trade for a dedup
    * operator that is probabilistic at the minhash layer anyway.
    *
    * Semantic delta vs the batch banded-LSH pipeline (minhashCandidates →
    * resolveComponents), documented by design: banded candidates at
    * est_jaccard < 1 need a PAIR join and component resolution — cross-row
    * state Structured Streaming cannot bound; the incremental path
    * catches exact-signature dups online and the periodic batch
    * compaction sweeps the near-dup tail. */
  def minhashDedup(df: DataFrame, ts: String, text: String,
                   shingleN: Int = 3, numHashes: Int = 32,
                   watermark: String = "1 hour"): DataFrame = {
    // Documents shorter than shingleN words have an EMPTY shingle set and
    // share the one all-null signature — keying them would silently drop
    // every short doc after the first. They bypass dedup instead (the
    // word-count filter is cheap; the signature is only computed on the
    // dedup branch, so short docs never pay the minhash loop either).
    val isShort = size(split(col(text), " ")) < shingleN
    val keyed = df.filter(!isShort).withColumn("__sig_key",
      xxhash64(rowMinhash(col(text), shingleN, numHashes)))
    val kept =
      if (keyed.isStreaming)
        keyed.withWatermark(ts, watermark)
          .dropDuplicatesWithinWatermark(Seq("__sig_key"))
      else keyed.dropDuplicates(Seq("__sig_key"))
    kept.drop("__sig_key").unionByName(df.filter(isShort))
  }
}
