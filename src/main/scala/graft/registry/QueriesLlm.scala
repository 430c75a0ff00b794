package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry.{ev, tbl, docs, emb, spread, synthLines,
  withZ, predEvents, truthEvents, predFlag, truthFlag}
import graft.{core, ensemble, events, graph, io, llm, metrics,
  models, streaming}
import graft.core.SeriesOps
import graft.events.Events
import graft.metrics.Metrics
import graft.models.StlLite

/** Query registry, part 2 of 2: the SURVEY §2.12 LLM-data-pipeline
  * surface — dedup tiers, ANN/retrieval, text quality and tokenizers,
  * sampling/packing/corpus assemblies, sketches, and the multimodal
  * plumbing. Same conventions and oracle home as part 1.
  */
object QueriesLlm {

  /** The non-BMP probe text: CJK (multi-byte BMP), an emoji and a
    * CJK-ext-B ideograph (both SURROGATE PAIRS in UTF-16), glued
    * ASCII. One row of this flows through the portable-hash queries
    * (q_fingerprint/q_cms/q_kmv/q_dsir) so the per-CODE-POINT split
    * parity claim (llm/TextAnalysis rollingHash contract: Spark
    * `split(s, "")` ≡ DuckDB `string_split(s, '')`, `ascii` = full
    * code point) is proven in the LIVE DuckDB gate, not only by a
    * ScalaTest pin — the driver fixture itself is ASCII. The oracle
    * side embeds the IDENTICAL literal (OracleSql.uniDocCte reads
    * this constant). */
  private[graft] val uniProbeText: String =
    "汉字 👋 𠀀x ok"

  /** documents ∪ the one non-BMP probe row (doc_id far beyond any
    * fixture id; its own source so per-source reads stay clean). */
  private def docsUni(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"), col("text"), col("source"))
      .unionByName(Seq((900000001L, uniProbeText, "srcU"))
        .toDF("doc_id", "text", "source"))
  }

  val map: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LLM-pipeline: exact dedup groups (hash-groupBy)
    "q_dedup_exact" -> ((s, dir) =>
      docs(s, dir)
        .groupBy("lang", "n_chars")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))),

    // LLM-pipeline: content fingerprint (md5)
    "q_fingerprint" -> ((s, dir) =>
      docsUni(s, dir)
        .select(col("doc_id"), md5(col("text")).as("fp"))),

    // LLM-pipeline: corpus-mixture sampling — per-language keep rates
    // over a portable Park-Miller id bucket, so the exact subset is
    // reproducible by the oracle (and any other engine) with plain
    // 64-bit integer arithmetic. Pure pushed-down filter.
    "q_sample" -> ((s, dir) =>
      llm.Sampling.stratifiedSample(docs(s, dir), "doc_id", "lang",
        Map("en" -> 1.0, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.25,
          "zh" -> 0.125))
        .select(col("doc_id"), col("lang"), col("source"))),

    // LLM-pipeline: epoch-style mixture UPSAMPLING — de ×2.5, zh ×0.5;
    // integer replication + MCG-bucket fractional remainder, each copy
    // tagged with a distinct epoch. Same portable integer arithmetic
    // as q_sample (the oracle reproduces it in plain SQL).
    "q_sample_up" -> ((s, dir) =>
      llm.Sampling.stratifiedUpsample(docs(s, dir), "doc_id", "lang",
        Map("en" -> 1.0, "de" -> 2.5, "zh" -> 0.5))
        .select(col("doc_id"), col("lang"), col("source"),
          col("epoch"))),

    // LLM-pipeline: GPT-style sequence packing — deterministic id-bucket
    // shards, docs concatenated in id order within each shard, token
    // stream chunked into 256-token training sequences. One window pass
    // per shard; shards bound the sort (no global single-task window).
    "q_pack" -> ((s, dir) =>
      llm.Sampling.packSequences(docs(s, dir), "doc_id",
        size(split(col("text"), " ")), 256,
        llm.Sampling.idBucket(col("doc_id"), 8))
        .select(col("doc_id"), col("shard"), col("seq_id"),
          col("seq_offset"))),

    // LLM-pipeline: doc-spanning pack slices — one row per
    // (doc, sequence) piece with in-doc offset and length, the exploded
    // form a training loader consumes when documents cross the
    // 256-token sequence boundary. Sum of slice_len per doc ≡ its
    // token count (property-tested in SamplingSpec).
    "q_pack_slices" -> ((s, dir) =>
      llm.Sampling.packSlices(docs(s, dir), "doc_id",
        size(split(col("text"), " ")), 256,
        llm.Sampling.idBucket(col("doc_id"), 8))
        .select(col("doc_id"), col("shard"), col("seq_id"),
          col("slice_start"), col("slice_len"))),

    // LLM-pipeline: RAG/embedding chunk prep — fixed 64-token chunks
    // with 16-token overlap (stride 48), whitespace-token convention;
    // pure scan-stage slices + posexplode, no shuffle (q_entropy plan
    // shape). No float anywhere: strings + exact counts.
    "q_chunks" -> ((s, dir) =>
      llm.Chunking.chunkText(docs(s, dir), "doc_id", "text",
          chunkTokens = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_id"),
          col("n_chunk_tokens"), col("chunk_text"))),

    // LLM-pipeline: top-25 PMI collocations (Church–Hanks) — phrase
    // mining for tokenizer/vocab construction; two keyed aggregates +
    // word-keyed joins + TakeOrdered, round-6 ln pin.
    "q_colloc" -> ((s, dir) =>
      llm.TextAnalysis.collocations(docs(s, dir), "text",
          minCount = 20, k = 25)
        .select(col("w1"), col("w2"), col("pair_count"), col("pmi"))),

    // LLM-pipeline: pretraining decontamination — train docs sharing
    // >= 2 distinct 3-gram shingles with the held-out benchmark slice
    // (doc_id % 20 == 0), hot benchmark shingles capped at df 100.
    "q_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      llm.Dedup.decontaminate(d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0), "doc_id", "text",
        n = 3, minShared = 2, maxDocFreq = 100)
        .select(col("doc_id"), col("n_shared"))
    }),

    // LLM-pipeline: decontamination at the 100 TB shape — identical
    // OUTPUT to q_decontam (same oracle SQL), but the train-side shingle
    // stream is prefiltered inside its scan stage by a broadcast bloom
    // sketch of the benchmark shingles (Spark's own
    // BloomFilterAggregate/MightContain pair, registry-exposed); the
    // exact equi-join then removes bloom false positives, so the
    // approximation never reaches the result — it only shrinks the
    // exchange.
    "q_decontam_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      llm.Dedup.decontaminateBloom(d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0), "doc_id", "text",
        n = 3, minShared = 2, maxDocFreq = 100)
        .select(col("doc_id"), col("n_shared"))
    }),

    // LLM-pipeline: C4/CCNet-style span-level exact dedup — only the
    // globally first occurrence of each distinct 16-word span survives,
    // documents are reassembled from their kept spans (fully-duplicate
    // docs vanish). ONE exchange keyed by md5(span) — fixed-width key,
    // the exact-dedup tier that runs before any fuzzy matching.
    "q_span_dedup" -> ((s, dir) =>
      llm.Dedup.spanDedup(docs(s, dir), "doc_id", "text", span = 16)
        .select(col("doc_id"), col("clean_text"), col("n_spans"),
          col("n_kept"))),

    // LLM-pipeline: exact-substring duplicate detection (Lee et al.
    // 2022 ExactSubstr, relational form) — pairs sharing a verbatim
    // ≥8-word run, with the LONGEST shared run length from
    // gaps-and-islands over anchor diagonals; hot-anchor cap 50.
    "q_substr_dedup" -> ((s, dir) =>
      llm.Dedup.substringDedup(docs(s, dir), "doc_id", "text",
          minLen = 8, maxAnchorFreq = 50)
        .select(col("id_a"), col("id_b"), col("n_anchor_hits"),
          col("match_len"))),

    // LLM-pipeline: exact n-gram Jaccard near-dup (shingle-bucketed join)
    "q_ngram_jaccard" -> ((s, dir) =>
      llm.Dedup.ngramJaccard(docs(s, dir), "doc_id", "text",
        n = 3, minJaccard = 0.2, maxDocFreq = 100)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard"))),

    // LLM-pipeline: MinHash LSH near-dup candidates (banded, no crossJoin)
    "q_minhash" -> ((s, dir) =>
      llm.Dedup.minhashCandidates(docs(s, dir), "doc_id",
        "text", shingleN = 3, numHashes = 32, bands = 8, minEst = 0.4)
        .select(col("id_a"), col("id_b"),
          round(col("est_jaccard"), 6).as("est_jaccard"))),

    // LLM-pipeline: dedup RESOLUTION — near-dup candidate pairs →
    // connected components (iterative min-label propagation) → keep/drop
    // decision per document (minimum id of each component kept)
    "q_dedup_resolve" -> ((s, dir) => {
      val docsDf = docs(s, dir)
      val pairs = llm.Dedup.ngramJaccard(docsDf, "doc_id", "text", n = 3,
        minJaccard = 0.2, maxDocFreq = 100)
      llm.Dedup.resolveComponents(docsDf, pairs, "doc_id")
    }),

    // LLM-pipeline: SimHash near-dup at the classic 64-bit radius 3
    // (4×16-bit chunks). Banding derives from maxDist, so recall within
    // the radius is exact — DedupSpec proves the contract at 3/7/10;
    // radius>7 trades 16× candidate volume for the wider net.
    "q_simhash" -> ((s, dir) =>
      llm.Dedup.simhashCandidates(docs(s, dir), "doc_id",
        "text", maxDist = 3)
        .select(col("id_a"), col("id_b"), col("hamming"))),

    // LLM-pipeline: multi-index SimHash (Manku-style q-of-b block
    // tables) — the wide-radius scheme whose buckets stay cool where the
    // single-block chunking degenerates to 4-bit keys (see
    // Dedup.simhashCandidatesMulti Scaladoc). Same exact-recall
    // pigeonhole contract, proven at radius 10/12 in DedupSpec.
    //
    // Bench context: the synthetic template-generated docs are DENSE at
    // radius 10 — 364k true pairs (2.9% of all pairs) at sf0.1, 28.6M
    // bucket-join occurrences — so this query's cost tracks genuine
    // output volume, not plan waste: the join stays a codegen'd bucket
    // equi-join and the emit-once predicate dedups without an exchange.
    // blocks=13 (3-block keys) was measured WORSE here: true pairs
    // multiply occurrences (C(clean,3) tables each) faster than wider
    // keys split the hot buckets.
    "q_simhash_multi" -> ((s, dir) =>
      llm.Dedup.simhashCandidatesMulti(docs(s, dir), "doc_id",
        "text", maxDist = 10)
        .select(col("id_a"), col("id_b"), col("hamming"))),

    // LLM-pipeline: batch face of the streaming minhash dedup — the
    // per-row signature expression (StreamingDedup.rowMinhash, proven
    // value-identical to the groupBy signatures in StreamingSpec) keyed
    // to one 64-bit state word, resolved keep/drop by min id. The
    // streaming twin rides dropDuplicatesWithinWatermark on the same
    // key; StreamingSpec pins batch≡stream keep-set parity.
    "q_sig_dedup" -> ((s, dir) =>
      llm.Dedup.exact(
        docs(s, dir).select(col("doc_id"), xxhash64(
          streaming.StreamingDedup.rowMinhash(col("text"), 3, 16))
          .as("sig_key")),
        "doc_id", Seq("sig_key"))
        .select(col("sig_key"), col("keep_id"), col("n_dups"))),

    // LLM-pipeline: brute-force cosine top-k (the ANN correctness baseline)
    "q_cosine_topk" -> ((s, dir) => {
      val embDf = emb(s, dir)
      val queries = embDf.filter(col("vec_id") < 5)
      llm.Similarity.bruteForceTopK(queries, embDf, "vec_id", "embedding", 3)
        .select(col("query_id"), col("corpus_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LLM-pipeline: hyperplane-LSH ANN top-k (bucketed scale path)
    "q_ann_lsh" -> ((s, dir) => {
      val embDf = emb(s, dir)
      // planes=16, bands=8 (2-bit bands): the synthetic embeddings are
      // diffuse (top neighbors at cosine 0.26-0.40), so recall needs
      // narrow bands; AnnRecallSpec pins recall >= 0.8 vs brute force.
      llm.Similarity.lshTopK(embDf, embDf.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, planes = 16, bands = 8)
        .select(col("query_id"), col("corpus_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LLM-pipeline: IVF ANN top-k (k-means cells + nProbe probing, the
    // FAISS-style scale path; AnnRecallSpec pins recall vs brute
    // force). Fixture-oracled since r8: DetKMeans clustering is
    // deterministic for any partitioning.
    "q_ann_ivf" -> ((s, dir) => {
      val embDf = emb(s, dir)
      llm.Similarity.ivfTopK(embDf, embDf.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, nList = 16, nProbe = 8)
        .select(col("query_id"), col("corpus_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LLM-pipeline: the full FAISS-style stack — IVF cells, int8 coarse
    // scan WITHIN the probed cells (4×-smaller byte column, floats never
    // enter the coarse read), float re-rank of the oversampled
    // survivors. Fixture-oracled since r8 (deterministic DetKMeans
    // cells); AnnRecallSpec pins recall vs brute force.
    "q_ann_ivf_q8" -> ((s, dir) => {
      val embDf = emb(s, dir)
      llm.Similarity.ivfTopKQ8(embDf, embDf.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, nList = 16, nProbe = 8)
        .select(col("query_id"), col("corpus_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LLM-pipeline: int8-quantized two-stage top-k — coarse rank on
    // 4×-smaller byte vectors (native vec_dot byte loop), exact float
    // re-rank of the oversampled survivors. AnnRecallSpec pins recall
    // >= 0.95 vs brute force; deterministic (global absmax scale +
    // id tie-breaks), so fixture-oracled.
    "q_ann_q8" -> ((s, dir) => {
      val embDf = emb(s, dir)
      llm.Quantize.quantizedTopK(embDf.filter(col("vec_id") < 5), embDf,
        "vec_id", "embedding", 3)
        .select(col("query_id"), col("corpus_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LLM-pipeline: product-quantized ANN (the FAISS IndexPQ tier) —
    // the corpus scans as m-byte codes (32x smaller than the float
    // column at dim 64 / m 8), each query scores codes via a
    // precomputed ADC lookup table, exact float re-rank of the
    // oversampled survivors. Codebooks from DetKMeans -> deterministic
    // -> fixture-oracled.
    "q_ann_pq" -> ((s, dir) => {
      val embDf = emb(s, dir)
      llm.Pq.pqTopK(embDf, embDf.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3)
        .select(col("query_id"), col("corpus_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LLM-pipeline: IVF-PQ ANN — the full FAISS IVFADC stack (coarse
    // cells × product-quantized RESIDUALS × float re-rank). The coarse
    // scan reads only the probed cells' m-byte codes; residual
    // codebooks spend the byte budget on a cell diameter instead of
    // the whole space. DetKMeans cells + codebooks -> deterministic ->
    // fixture-oracled; AnnRecallSpec pins recall vs brute force.
    "q_ann_ivfpq" -> ((s, dir) => {
      val embDf = emb(s, dir)
      llm.Pq.ivfPqTopK(embDf, embDf.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3)
        .select(col("query_id"), col("corpus_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LLM-pipeline: SemDeDup (arXiv:2303.09540) — cluster-tier semantic
    // dedup: k-means cells over the embeddings, EXACT pairwise cosine
    // within each cell (the clustering is the only recall
    // approximation), duplicate groups resolved to components, keep
    // the group member LEAST similar to its centroid (the paper's
    // diversity-preserving rule). Threshold 0.4 per the q_embed_neardup
    // rationale above — the top of this corpus's cosine range.
    "q_semdedup" -> ((s, dir) =>
      llm.SemDedup.semDedup(emb(s, dir), "vec_id", "embedding",
        k = 8, minCosine = 0.4)),

    // LLM-pipeline: embedding cosine near-dup via LSH buckets
    "q_embed_neardup" -> ((s, dir) =>
      // threshold 0.4 sits at the top of this corpus's cosine range (59
      // true pairs at sf0.01; the max pairwise cosine is 0.51, so 0.8
      // would be vacuously empty regardless of recall).
      //
      // (planes=16, bands=8) = 2-bit bands, and the hyperplane S-curve
      // P[band match] = (1 - acos(cos)/π)^(planes/bands) at 2 bits keeps
      // collision probability high even for unrelated pairs (~0.44 at
      // cosine 0.2) — DELIBERATE here, because recall at this corpus's
      // diffuse 0.4-0.51 target range needs it, and it is why this
      // query's bench cost tracks near-all-pairs candidate volume on
      // synthetic data. A production near-dup corpus (target cosine
      // ≥0.9) uses the WIDE-band setting (planes=64, bands=8 → 8-bit
      // bands): per-band collision drops to 0.5^8 ≈ 0.004 at cosine 0
      // and ~0.01 at cosine 0.2 (vs 0.77 per band at 2 bits), while a
      // true pair at cosine 0.9 still collides with prob ≈ 1-(1-0.76)^8
      // ≈ 1.0 after OR-amplification — AnnRecallSpec pins candidate
      // volume <5% of all-pairs at that setting on these embeddings. Do
      // not read this bench number as the operator's scale behavior.
      llm.Dedup.embeddingNearDup(emb(s, dir), "vec_id",
        "embedding", minCosine = 0.4, planes = 16, bands = 8)
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 6).as("cosine"))),

    // LLM-pipeline: quality scoring (C4/Gopher-style heuristics)
    "q_quality" -> ((s, dir) =>
      llm.TextAnalysis.withQuality(docs(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_token_len"), 6).as("avg_token_len"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("quality_score"), 6).as("quality_score"))),

    // LLM-pipeline: Gopher-style repetition signals — the published
    // boilerplate/loop-catching filters (unique-word fraction, top
    // 2-gram coverage, duplicated 5-gram coverage), one tagged-union
    // pass + two keyed aggregations.
    "q_repetition" -> ((s, dir) =>
      llm.TextAnalysis.repetitionStats(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("uniq_word_frac"), 6).as("uniq_word_frac"),
          round(col("top2gram_frac"), 6).as("top2gram_frac"),
          round(col("dup5gram_frac"), 6).as("dup5gram_frac"))),

    // LLM-pipeline: corpus-mixture composition report — per
    // (lang, source) doc/token counts and each cell's share of corpus
    // tokens; the audit table a mixture-weighting step reads and
    // writes. The share's global window runs over the ALREADY-AGGREGATED
    // (tiny) frame, never the corpus.
    "q_mixture" -> ((s, dir) => {
      val t = llm.TextAnalysis.tokenCountWs(col("text")).cast("long")
      docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(t).as("n_tokens"))
        .withColumn("token_share",
          round(col("n_tokens") /
            sum("n_tokens").over(Window.partitionBy()), 6))
    }),

    // LLM-pipeline: deterministic corpus shuffle — reproducible
    // pseudo-random training order with a CONTIGUOUS global position,
    // computed without a single-task global sort (contiguous bucket
    // shards, per-shard rank, prefix-summed shard offsets).
    "q_shuffle" -> ((s, dir) =>
      llm.Sampling.globalOrdinal(docs(s, dir), "doc_id", nShards = 64)
        .select(col("doc_id"), col("shard"), col("pos"))),

    // LLM-pipeline: SHUFFLED sequence packing — the composition a real
    // pretraining pipeline runs: deterministic global shuffle first
    // (training order), then pack the token stream in shuffled order.
    // globalOrdinal's shards are contiguous pos ranges, so packing
    // within them in pos order IS packing the global shuffled stream
    // per shard.
    "q_shuffle_pack" -> ((s, dir) => {
      val ord = llm.Sampling.globalOrdinal(docs(s, dir), "doc_id",
          nShards = 64)
        .withColumnRenamed("shard", "__sh")
      llm.Sampling.packSequences(ord, "pos",
        size(split(col("text"), " ")), 256, col("__sh"))
        .select(col("doc_id"), col("shard"), col("seq_id"),
          col("seq_offset"))
    }),

    // LLM-pipeline: corpus vocabulary — top-100 terms by occurrence
    // with document frequency; the table every tokenizer/quality
    // investigation starts from.
    "q_vocab" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("term").asc)
        .limit(100)),

    // LLM-pipeline: per-document top-3 TF-IDF terms. Ranking uses the
    // ROUNDED score (round 6) so cross-engine ln() ulp differences
    // cannot flip near-tie orderings — ties break by term.
    "q_tfidf" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = words.groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
      val toks = tf.groupBy("doc_id").agg(sum("tf").as("__toks"))
      val idf = words.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("__n"))
      val scored = tf.join(toks, "doc_id").join(idf, "term")
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          round((col("tf") / col("__toks")) *
            log(col("__n") / col("df")), 6))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
    }),

    // LLM-pipeline: Okapi BM25 ranked retrieval (Robertson TREC-3;
    // Lucene's ln(1+..) idf) — the lexical search face next to the
    // ANN tier; inverted-index join, term-ordered contribution fold
    // (engine-reproducible), top-5 per query on the rounded score.
    // Queries = the doc_id < 5 documents (the q_cosine_topk shape).
    "q_bm25" -> ((s, dir) => {
      val d = docs(s, dir)
      llm.Bm25.topK(d, d.filter(col("doc_id") < 5), "doc_id", "doc_id",
        "text", k = 5)
    }),

    // LLM-pipeline: RM3 pseudo-relevance feedback (Lavrenko–Croft) —
    // BM25, lift the top-3 docs' best 5 non-query terms (Σ tf/dl,
    // doc-ordered fold), expand, score again. The Anserini/Indri
    // default recall lever on top of the sparse leg.
    "q_rm3" -> ((s, dir) => {
      val d = docs(s, dir)
      llm.Bm25.rm3TopK(d, d.filter(col("doc_id") < 5), "doc_id",
        "doc_id", "text", k = 5, fbDocs = 3, fbTerms = 5)
    }),

    // LLM-pipeline: exact cosine top-k in hashed-TF space (feature
    // hashing, Weinberger 2009 — no vocabulary table, the portable
    // q_rollhash polynomial as the bucket hash) — the dense leg of
    // the hybrid search stack.
    "q_hashcos" -> ((s, dir) => {
      val d = docs(s, dir)
      llm.HashingTf.hashedCosineTopK(d, d.filter(col("doc_id") < 5),
        "doc_id", "text", dim = 64, k = 10)
    }),

    // LLM-pipeline: KMV distinct-count sketch (Bar-Yossef 2002; Beyer
    // 2007 estimator) — per-source distinct-token estimates from the
    // k smallest portable hash values; deterministic hash → the
    // ESTIMATE itself is oracle-checked, exact reference rides along.
    "q_kmv" -> ((s, dir) => {
      val words = docsUni(s, dir).select(col("source"),
        explode(split(col("text"), " ")).as("term"))
      llm.Kmv.distinctSketch(words, "source", "term", k = 256)
        .select(col("source"), col("n_sketch"),
          round(col("kth_frac"), 9).as("kth_frac"),
          round(col("est_distinct"), 6).as("est_distinct"),
          col("exact_distinct"))
    }),

    // LLM-pipeline: GPT-3-style quality classifier (Brown 2020 §A) —
    // hashed-unigram Naive Bayes trained to separate the curated
    // slice (src0-src4) from the rest, every doc scored by mean
    // log-likelihood ratio with a position-ordered fold. The
    // deterministic member of the fasttext-filter family: integer
    // counts → the SCORE itself is oracle-checked.
    "q_nbquality" -> ((s, dir) =>
      llm.NbQuality.nbQualityScore(docs(s, dir), "doc_id", "text",
          substring(col("source"), 4, 10).cast("int") < 5,
          buckets = 1024)
        .select(col("doc_id"), col("n_tokens"),
          round(col("nb_llr_mean"), 6).as("nb_llr_mean"),
          col("is_quality"))),

    // Sketch tier: Count-Min heavy-hitter estimates — top-20 corpus
    // tokens by exact count with the CMS point estimate riding along
    // (d=4 salted portable hashes × w=1024 buckets: real collisions at
    // this vocab, so est > exact is exercised, and the deterministic
    // hash makes the ESTIMATE itself oracle-checked).
    "q_cms" -> ((s, dir) => {
      val words = docsUni(s, dir).select(
        explode(split(col("text"), " ")).as("term"))
      val exact = words.groupBy("term")
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("term").asc).limit(20)
      val sk = llm.Cms.sketch(words, "term", depth = 4, width = 1024)
      llm.Cms.estimate(sk, exact, "term", depth = 4, width = 1024)
        .select(col("term"), col("exact_cnt"), col("cms_est"))
    }),

    // Sketch tier: mergeable histogram-quantile sketch — per-series
    // p50/p90/p99 of `value` from a fixed-range equi-width histogram
    // (bins=1000 over [0, 500), width 0.5). The (group, bin) count
    // aggregate IS the sketch (map-side combinable, merge = addition),
    // and the all-integer bin arithmetic makes the ESTIMATE itself
    // oracle-checkable — the q_kmv convention for sketches.
    "q_histq" -> ((s, dir) =>
      graft.core.Quantiles.histogramQuantiles(ev(s, dir), "user_id",
          "value", lo = 0.0, hi = 500.0, bins = 1000,
          qs = Seq(0.5, 0.9, 0.99))
        .select(col("user_id"), col("q"), col("n"), col("qbin"),
          round(col("est"), 6).as("est"))),

    // LLM-pipeline: unigram-LM tokenizer (Kudo 2018, the SentencePiece
    // unigram model) — the OTHER subword family next to BPE: EM-fit
    // piece probabilities on the word-type table (driver loop bounded
    // by the type cap), Viterbi apply over distinct words. Vocab and
    // per-doc token counts; fixture oracles (driver float EM).
    "q_unigram" -> ((s, dir) =>
      llm.Unigram.vocabDf(docs(s, dir), "text", vocabSize = 512)
        .select(col("piece"), round(col("log_prob"), 9).as("log_prob"))),

    "q_unigram_tokens" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = llm.Unigram.train(
        llm.Bpe.wordCounts(d, "text", 65536), vocabSize = 512)
      llm.Unigram.tokenize(d, "doc_id", "text", model)
        .select(col("doc_id"), col("n_words"), col("n_unigram_tokens"))
    }),

    // LLM-pipeline: ranking-quality metrics (recall@5 / MRR / binary
    // nDCG@5) of the BM25 ranker against the exact hashed-cosine
    // top-5 as the relevant set — the evaluation face of the
    // retrieval tier, as a relation. Position-ordered DCG folds →
    // full chain re-expressed in the SQL oracle.
    "q_retrieval_eval" -> ((s, dir) => {
      val d = docs(s, dir)
      val q = d.filter(col("doc_id") < 5)
      val bm = llm.Bm25.topK(d, q, "doc_id", "doc_id", "text", k = 20)
      val truth = llm.HashingTf.hashedCosineTopK(d, q, "doc_id",
        "text", dim = 64, k = 5)
      llm.RetrievalEval.evalRanking(bm, truth, k = 5)
        .select(col("query_id"), col("n_rel"),
          round(col("recall_at_k"), 6).as("recall_at_k"),
          round(col("mrr"), 6).as("mrr"),
          round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
    }),

    // LLM-pipeline: hybrid search — BM25 (sparse) and hashed-TF
    // cosine (dense) top-20s fused by reciprocal-rank fusion
    // (Cormack 2009, c=60); rank-only fusion needs no cross-ranker
    // score calibration. Full chain re-expressed in the SQL oracle.
    "q_hybrid_search" -> ((s, dir) => {
      val d = docs(s, dir)
      val q = d.filter(col("doc_id") < 5)
      val bm = llm.Bm25.topK(d, q, "doc_id", "doc_id", "text", k = 20)
      val cs = llm.HashingTf.hashedCosineTopK(d, q, "doc_id", "text",
        dim = 64, k = 20)
      llm.HashingTf.rrfFuse(bm, cs, k = 5)
    }),

    // LLM-pipeline: CCNet-style LM quality score — per-doc average
    // negative log-likelihood under a Laplace-smoothed bigram model
    // trained on the corpus itself; the per-doc fold is position-
    // ordered so the float sum is engine-reproducible.
    "q_perplexity" -> ((s, dir) =>
      llm.TextAnalysis.perplexityScore(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll"))),

    // LLM-pipeline: stupid-backoff trigram LM score (Brants et al.
    // EMNLP 2007) — the distributed-estimation smoothing: raw count
    // ratios with a fixed 0.4 penalty per backoff level. Trains on the
    // deterministic MCG half-split, scores everything; held-out docs
    // exercise real backoff (backoff_rate > 0), in-model docs score
    // backoff-free.
    "q_backoff" -> ((s, dir) =>
      llm.TextAnalysis.stupidBackoffScore(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_trigrams"), col("avg_nll"),
          col("backoff_rate"))),

    // LLM-pipeline: PII detection + typed-placeholder redaction (the
    // Dolma/ROOTS release tier). The corpus is synthetic word soup, so
    // the query PLANTS deterministic PII derived from doc_id (email /
    // phone / SSN-shaped id / IPv4) — the oracle reproduces the same
    // construction in SQL, and the patterns are written in the
    // Java-regex ∩ RE2 subset so both engines scan the same rules.
    "q_pii" -> ((s, dir) => {
      val id = col("doc_id")
      val planted = concat(col("text"),
        when(id % 7 === 0,
          concat(lit(" contact user"), id.cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(id % 5 === 0,
          concat(lit(" call 555-"), (id % 900 + 100).cast("string"),
            lit("-"), (id % 9000 + 1000).cast("string")))
          .otherwise(lit("")),
        when(id % 3 === 0,
          concat(lit(" host 10."), (id % 256).cast("string"),
            lit("."), ((id * 7) % 256).cast("string"),
            lit("."), ((id * 13) % 256).cast("string")))
          .otherwise(lit("")),
        when(id % 11 === 0,
          concat(lit(" id 987-65-"), (id % 9000 + 1000).cast("string")))
          .otherwise(lit("")))
      val d = docs(s, dir).withColumn("__pt", planted)
      llm.TextAnalysis.piiStats(d, "__pt")
        .select(col("doc_id"), col("n_email"), col("n_phone"),
          col("n_ssn"), col("n_ipv4"), col("pii_total"),
          llm.TextAnalysis.redactPii(col("__pt")).as("redacted"))
    }),

    // LLM-pipeline: pre-tokenization text normalization — typographic
    // quote/dash folding, control-char strip, whitespace collapse.
    // Messy text planted deterministically (curly quotes, em-dash,
    // NBSP, tab, ellipsis, a bell char on even ids); oracle mirrors
    // with chr() codepoints and the same RE2-compatible rules.
    "q_normalize" -> ((s, dir) => {
      val messy = concat(lit("\u201c"), col("text").substr(1, 40),
        lit("\u201d \u2014 x\u00a0y\tz  tail\u2026"),
        when(col("doc_id") % 2 === 0, lit("\u0007bell"))
          .otherwise(lit("")))
      docs(s, dir).withColumn("__m", messy)
        .select(col("doc_id"), length(col("__m")).as("n_chars_raw"),
          llm.TextAnalysis.normalizeText(col("__m")).as("normalized"))
        .withColumn("n_chars_norm", length(col("normalized")))
    }),

    // LLM-pipeline: code-vs-prose routing score — symbol density +
    // keyword hits + indent fraction; code planted deterministically
    // on doc_id%9 docs, oracle mirrors the construction.
    "q_code" -> ((s, dir) => {
      val snippet = "\nfunction foo(x) { return x + 1; }\n" +
        "  var y = foo(2);"
      val planted = concat(col("text"),
        when(col("doc_id") % 9 === 0, lit(snippet)).otherwise(lit("")))
      llm.TextAnalysis.withCodeScore(
          docs(s, dir).withColumn("__cs", planted), "__cs")
        .select(col("doc_id"), col("symbol_density"),
          col("keyword_hits"), col("indent_frac"), col("code_score"))
    }),

    // LLM-pipeline: Porter stemming (1980, implemented from the
    // paper's rule tables) — per-doc stemmed-vocabulary collapse via
    // the vocab-sized stem table broadcast back to the corpus.
    "q_stem" -> ((s, dir) =>
      llm.Stemmer.stemStats(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_words"),
          col("n_distinct_stems"))),

    // LLM-pipeline: Luhn-validated credit-card PII — card-shaped
    // tokens are only counted/redacted when the ISO 7812 checksum
    // passes (the precision move every published pipeline makes).
    // Plants the canonical Visa/Amex test numbers (valid) and one
    // checksum-failing shape (must be left alone).
    "q_pii_card" -> ((s, dir) => {
      val id = col("doc_id")
      val planted = concat(col("text"),
        when(id % 13 === 0, lit(" card 4111 1111 1111 1111 ok"))
          .otherwise(lit("")),
        when(id % 7 === 0, lit(" amex 378282246310005 bill"))
          .otherwise(lit("")),
        when(id % 5 === 0, lit(" ref 1234-5678-9012-3456 code"))
          .otherwise(lit("")))
      llm.TextAnalysis.withCardPii(
          docs(s, dir).withColumn("__ct", planted), "__ct")
        .select(col("doc_id"), col("n_card"), col("card_redacted"))
    }),

    // LLM-pipeline: C4 line-level cleaning (Raffel et al. 2020 §2.2).
    // The corpus has no line structure, so the query synthesizes it
    // deterministically: 8-word lines, terminal '.' only when
    // (doc_id + line) % 3 != 0, a "lorem ipsum" prefix on line 0 of
    // doc_id%11 docs, a trailing '{' on line 1 of doc_id%13 docs —
    // exercising every published rule. The filter itself is one
    // map-only array-expression chain in the scan stage.
    "q_c4_filter" -> ((s, dir) => {
      val lined = docs(s, dir)
        .withColumn("__lt", array_join(synthLines, "\n"))
      llm.TextAnalysis.c4LineFilter(lined, "__lt")
        .select(col("doc_id"), col("clean_text"), col("n_lines"),
          col("n_kept"))
    }),

    // LLM-pipeline: round-10 END-TO-END assembly v2 — the FineWeb-ish
    // hygiene chain COMPOSED: synthesized line structure → C4 line
    // cleaning (scan stage) → quality scoring on the CLEANED text →
    // per-source rank calibration (drop bottom 30%) → exact dedup of
    // clean_text → sequence packing. The oracle replays the whole
    // chain as one SQL CTE pipeline. Exchanges: calibration windows,
    // dedup aggregate + broadcast keep join, pack shard window.
    "q_corpus2" -> ((s, dir) => {
      val lined = docs(s, dir)
        .withColumn("__lt", array_join(synthLines, "\n"))
      val cleaned = llm.TextAnalysis
        .c4LineFilter(lined, "__lt")
        .select(col("doc_id"), col("lang"), col("source"),
          col("clean_text").as("ctext"))
      val scored = llm.TextAnalysis.withQuality(cleaned, "ctext")
        .select(col("doc_id"), col("lang"), col("source"), col("ctext"),
          round(col("quality_score"), 6).as("qs"))
      val calibrated = llm.Sampling.dropBottomByScore(scored, "doc_id",
        "source", col("qs"), 3, 10)
      val dd = calibrated.withColumn("__fp", md5(col("ctext")))
      val keep = llm.Dedup.exact(dd, "doc_id", Seq("__fp"))
        .select(col("keep_id").as("doc_id"))
      llm.Sampling.packSequences(dd.join(keep, "doc_id"), "doc_id",
          size(split(col("ctext"), " ")), 128,
          llm.Sampling.idBucket(col("doc_id"), 8))
        .select(col("doc_id"), col("lang"), col("source"), col("qs"),
          col("shard"), col("seq_id"), col("seq_offset"))
    }),

    // LLM-pipeline: corpus assembly v3 — the round-11 NB quality
    // classifier composed into the assembly chain: C4 clean → NB
    // score against a PRE-TRAINED persisted model (the map-only
    // scorer — zero added exchanges, PlanSpec-pinned) → per-source
    // rank calibration → SPAN dedup (edits docs instead of dropping
    // them — the C4/CCNet boilerplate remover as the dedup tier) →
    // shard + pack. One composed job, full-chain SQL-CTE oracle.
    "q_corpus3" -> ((s, dir) => {
      val lined = docs(s, dir)
        .withColumn("__lt", array_join(synthLines, "\n"))
      val cleaned = llm.TextAnalysis
        .c4LineFilter(lined, "__lt")
        .select(col("doc_id"), col("lang"), col("source"),
          col("clean_text").as("ctext"))
      // train once on the cleaned corpus (curated sources positive),
      // collect the ≤1024-row model — the persisted-artifact shape;
      // the assembly chain below never re-aggregates it
      val model = llm.NbQuality.collectModel(llm.NbQuality.train(
        cleaned, "ctext",
        substring(col("source"), 4, 10).cast("int") < 5,
        buckets = 1024))
      val scored = llm.NbQuality
        .withScoreMapOnly(cleaned, "ctext", model, buckets = 1024)
        .select(col("doc_id"), col("lang"), col("source"), col("ctext"),
          round(col("nb_llr_mean"), 6).as("nbq"))
      val calibrated = llm.Sampling.dropBottomByScore(scored, "doc_id",
        "source", col("nbq"), 3, 10)
      val dd = llm.Dedup.spanDedup(calibrated, "doc_id", "ctext",
        span = 16)
      val kept = calibrated.drop("ctext")
        .join(dd.select(col("doc_id"), col("clean_text"),
          col("n_kept")), "doc_id")
      llm.Sampling.packSequences(kept, "doc_id",
          size(split(col("clean_text"), " ")), 128,
          llm.Sampling.idBucket(col("doc_id"), 8))
        .select(col("doc_id"), col("lang"), col("source"), col("nbq"),
          col("n_kept"), col("shard"), col("seq_id"),
          col("seq_offset"))
    }),

    // LLM-pipeline: Johnson–Lindenstrauss sign-projection compression
    // (Achlioptas 2003) — dim 64 → 16 with the sign matrix DERIVED
    // from the portable Park–Miller map (never stored or shipped);
    // exploded to scalar rows so the oracle compare is exact.
    "q_randproj" -> ((s, dir) =>
      emb(s, dir)
        .select(col("vec_id"), posexplode(
          llm.Similarity.randomProject(col("embedding"), 64, 16)))
        .select(col("vec_id"), col("pos").cast("long").as("out_dim"),
          round(col("col"), 6).as("component"))),

    // LLM-pipeline: BPE tokenizer training (Sennrich 2016) — the
    // word-count trainer architecture: one distributed word-frequency
    // aggregate, driver-side merge loop bounded by the type cap.
    // Deterministic (lexicographic pair tie-break) → fixture oracle.
    "q_bpe_merges" -> ((s, dir) =>
      llm.Bpe.learnMergesDf(docs(s, dir), "text", numMerges = 40)),

    // LLM-pipeline: BPE application — distinct words tokenized with
    // the broadcast merge ranks (vocab-sized mapPartitions), joined
    // back per doc for exact subword token counts.
    "q_bpe_tokens" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = llm.Bpe.learnMerges(
        llm.Bpe.wordCounts(d, "text", 65536), 40)
      llm.Bpe.tokenize(d, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
    }),

    // LLM-pipeline: DSIR importance weights (Xie et al. 2023) — every
    // doc scored by how target-like its hashed unigram+bigram profile
    // is, target = the src0 domain. Engine-portable polynomial gram
    // hash, bucket-ordered float fold; the oracle reproduces bucket
    // ids, Laplace ratios, and the fold in plain SQL.
    "q_dsir" -> ((s, dir) =>
      llm.Sampling.dsirLogWeights(docsUni(s, dir), "doc_id", "text",
        col("source") === "src0", buckets = 256)
        .select(col("doc_id"), col("n_grams"), col("dsir_logw"))),

    // LLM-pipeline: DSIR selection — Gumbel-top-k resampling over the
    // importance weights (sampling w/o replacement ∝ exp(logw) via
    // the Gumbel trick); Gumbel derived from the portable MCG bucket,
    // key rounded before ranking (the q_tfidf near-tie contract).
    "q_dsir_resample" -> ((s, dir) =>
      llm.Sampling.dsirResample(
        llm.Sampling.dsirLogWeights(docs(s, dir), "doc_id", "text",
          col("source") === "src0", buckets = 256),
        "doc_id", "dsir_logw", k = 100)
        .select(col("doc_id"), col("dsir_logw"), col("gumbel_key"),
          col("sel_rank"))),

    // LLM-pipeline: quality-threshold calibration — drop the lowest
    // 30% of each source by quality score via EXACT integer ranks (no
    // interpolated percentile, no threshold-equality hazard); report
    // the per-source realized threshold and keep count.
    "q_quality_calibrate" -> ((s, dir) => {
      val q = llm.TextAnalysis.withQuality(docs(s, dir), "text")
        .select(col("doc_id"), col("source"),
          round(col("quality_score"), 6).as("qs"))
      llm.Sampling.dropBottomByScore(q, "doc_id", "source", col("qs"),
          3, 10)
        .groupBy("source")
        .agg(round(min("qs"), 6).as("threshold"),
          count(lit(1)).as("n_kept"))
    }),

    // LLM-pipeline: the ATTRIBUTES table (the Dolma recipe: curation
    // signals materialized per doc, decisions deferred to downstream
    // filters) — quality heuristics + repetition signals + PII counts
    // + langid joined into one wide frame. Two aggregate exchanges
    // (repetition's) + broadcast-free doc_id joins; everything else
    // rides the scan stage.
    "q_attributes" -> ((s, dir) => {
      val d = docs(s, dir)
      val q = llm.TextAnalysis.withQuality(d, "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("quality_score"), 6).as("quality_score"))
      val rep = llm.TextAnalysis.repetitionStats(d, "doc_id", "text")
        .select(col("doc_id"),
          round(col("uniq_word_frac"), 6).as("uniq_word_frac"),
          round(col("dup5gram_frac"), 6).as("dup5gram_frac"))
      val pii = llm.TextAnalysis.piiStats(d, "text")
        .select(col("doc_id"), col("pii_total"))
      val lid = llm.TextAnalysis.withLangId(d, "text")
        .select(col("doc_id"), col("lang_pred"))
      q.join(rep, "doc_id").join(pii, "doc_id").join(lid, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("quality_score"),
          col("uniq_word_frac"), col("dup5gram_frac"),
          col("pii_total"), col("lang_pred"))
    }),

    // LLM-pipeline: LSH banding auto-tuner — S-curve FP/FN mass per
    // (bands, rows) factorization of the hash budget at the target
    // Jaccard threshold; shuffle-free per-row integration.
    "q_lsh_tune" -> ((s, dir) =>
      llm.Dedup.lshErrorProfile(s, numHashes = 128, threshold = 0.5)),

    // LLM-pipeline: TRAINED language ID — Cavnar-Trenkle rank-ordered
    // char-n-gram profiles with the out-of-place distance; all-integer
    // math, exact SQL oracle (no fixture needed, unlike the stopword
    // voter's q_langid).
    "q_langid_ngram" -> ((s, dir) => {
      val d = docs(s, dir)
      llm.TextAnalysis.ngramLangId(d, "doc_id", "text", "lang")
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("lang_pred_ngram"),
          col("oop_dist"))
    }),

    // LLM-pipeline: corpus drift monitor — hashed-unigram KL of each
    // source against the rest of the mixture (composition monitoring);
    // full-grid Laplace smoothing, bucket-ordered fold.
    "q_drift" -> ((s, dir) =>
      llm.TextAnalysis.vocabDriftKl(docs(s, dir), "text", "source",
        buckets = 256)
        .select(col("source"), col("n_tokens"), col("kl_vs_rest"))),

    // LLM-pipeline: language id (stopword voting + CJK ratio)
    "q_langid" -> ((s, dir) =>
      llm.TextAnalysis.withLangId(docs(s, dir), "text")
        .select(col("doc_id"), col("lang"), col("lang_pred"))),

    // LLM-pipeline: polynomial rolling-hash document fingerprint
    "q_rollhash" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          llm.TextAnalysis.rollingHash(col("text")).as("rollhash"))),

    // LLM-pipeline: winnowing fingerprint sketch
    "q_winnow" -> ((s, dir) =>
      llm.TextAnalysis.winnowing(docs(s, dir), "doc_id",
        "text", k = 8, w = 4)
        .groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints"),
          min("fingerprint").as("min_fp"))),

    // LLM-pipeline: directional containment (quote/excerpt dedup tier) —
    // Broder containment over the winnowing sketch; a doc pasted inside
    // a larger one has low Jaccard but containment ≈ 1. Exact integer
    // counts over the capped fingerprint universe -> fixture-oracled.
    "q_containment" -> ((s, dir) =>
      llm.TextAnalysis.containment(docs(s, dir), "doc_id", "text",
        k = 8, w = 4, minContainment = 0.3, maxDocFreq = 100)),

    // LLM-pipeline: multimodal plumbing (binary payload → stub features)
    "q_multimodal" -> ((s, dir) => {
      val media = llm.Multimodal.synthesize(docs(s, dir),
        "doc_id", "text")
      llm.Multimodal.extractFeatures(media)
        .select(col("media_id"), col("byte_len"),
          round(col("byte_mean"), 6).as("byte_mean"),
          round(col("byte_std"), 6).as("byte_std"), col("head_byte"))
    }),

    // LLM-pipeline: resize plumbing — payload resampled to a target
    // resolution with the new dims in meta (non-image payloads take the
    // stride-subsample fallback; the batch shape and schema contract are
    // the operator)
    "q_mm_resize" -> ((s, dir) => {
      val media = llm.Multimodal.synthesize(docs(s, dir),
        "doc_id", "text")
      llm.Multimodal.resize(media, 8, 4)
        .select(col("media_id"), length(col("payload")).as("new_len"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.mime").as("mime"))
    }),

    // LLM-pipeline: REAL image decode — render each doc's text into a
    // deterministic PNG in the executors, then decode it back with
    // javax.imageio and emit pixel dims + luma stats. End-to-end proof
    // the decode path is a working codec, not plumbing around a stub.
    "q_mm_decode" -> ((s, dir) => {
      val media = llm.Multimodal.synthesizeImages(docs(s, dir),
        "doc_id", "text")
      llm.Multimodal.extractFeatures(media)
        .select(col("media_id"), col("width"), col("height"),
          round(col("px_mean"), 6).as("px_mean"),
          round(col("px_std"), 6).as("px_std"), col("decoded"))
    }),

    // LLM-pipeline: REAL video decode — deterministic MJPEG streams
    // (concatenated baseline JPEGs, the codec-free video container the
    // JDK can actually demux + decode) synthesized in the executors,
    // then per-media frame count / dims / luma / motion-proxy features
    // from genuinely decoded frames.
    "q_mm_video" -> ((s, dir) => {
      val media = llm.Multimodal.synthesizeVideo(docs(s, dir),
        "doc_id", "text")
      llm.Multimodal.extractVideoFeatures(media)
        .select(col("media_id"), col("n_frames"), col("width"),
          col("height"), round(col("luma_mean"), 6).as("luma_mean"),
          round(col("motion"), 6).as("motion"), col("decoded"))
    }),

    // LLM-pipeline: END-TO-END corpus assembly — the composition a real
    // pretraining pipeline runs as one job: quality-score filter →
    // exact dedup (min-id keep per content fingerprint) → per-language
    // mixture sample → sequence packing. Every stage is an operator
    // with its own oracle-checked query; this query proves they
    // COMPOSE (the oracle replays the whole chain as one SQL CTE
    // pipeline). Plan: scan-stage quality filter, one dedup aggregate
    // exchange, a broadcast keep-set join, scan-stage sample filter,
    // one shard-window exchange — TWO shuffles end to end (PlanSpec),
    // nothing driver-side.
    "q_corpus" -> ((s, dir) => {
      val scored = llm.TextAnalysis.withQuality(docs(s, dir), "text")
        .filter(col("quality_score") >= 0.5)
        .withColumn("__fp", md5(col("text")))
      val keep = llm.Dedup.exact(scored, "doc_id", Seq("__fp"))
        .select(col("keep_id").as("doc_id"))
      val sampled = llm.Sampling.stratifiedSample(
        scored.join(keep, "doc_id"), "doc_id", "lang",
        Map("en" -> 1.0, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.25,
          "zh" -> 0.125))
      llm.Sampling.packSequences(sampled, "doc_id",
          size(split(col("text"), " ")), 256,
          llm.Sampling.idBucket(col("doc_id"), 8))
        .select(col("doc_id"), col("lang"),
          round(col("quality_score"), 6).as("quality_score"),
          col("shard"), col("seq_id"), col("seq_offset"))
    }),

    // LLM-pipeline: frame-sampling plumbing — fixed-stride windows over
    // the payload, one row per (media, frame). Over the synthesized
    // UTF-8 payloads the byte arithmetic is SQL-expressible, so the
    // operator joins the oracle gate (the text is pure ASCII, making
    // byte-substr and char-substr coincide).
    "q_mm_frames" -> ((s, dir) => {
      // the byte-substr ⇔ char-substr equivalence the oracle relies on
      // holds ONLY for ASCII payloads — enforce it loudly (octet_length
      // == length iff pure ASCII) instead of silently diverging
      val ascii = docs(s, dir).withColumn("text",
        when(octet_length(col("text")) === length(col("text")),
          col("text"))
          .otherwise(raise_error(concat(
            lit("q_mm_frames requires ASCII text; non-ASCII doc_id="),
            col("doc_id")))))
      val media = llm.Multimodal.synthesize(ascii, "doc_id",
        "text")
      llm.Multimodal.sampleFrames(media, frames = 4)
        .select(col("media_id"), col("frame_idx"),
          decode(col("frame_bytes"), "UTF-8").as("frame_str"))
    }),

    // LLM-pipeline: REAL audio decode — synthesize a deterministic
    // PCM-16 WAV per doc (pure integer waveform formula on doc_id) in
    // the executors, then decode it back with javax.sound.sampled and
    // emit sample rate / duration / RMS / zero-crossing rate. The
    // oracle recomputes the features from the FORMULA in plain SQL, so
    // the hash-match proves the container round-trip is faithful.
    "q_mm_audio" -> ((s, dir) => {
      val media = llm.Multimodal.synthesizeAudio(docs(s, dir), "doc_id")
      llm.Multimodal.extractAudioFeatures(media)
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("duration_ms"),
          round(col("rms"), 6).as("rms"), col("zcr"), col("decoded"))
    }),

    // LLM-pipeline: token counting through the TextAnalysis operators —
    // whitespace count plus the BPE-ish `\w+|[^\w\s]` pre-tokenizer
    // cardinality (stop/punct ratios live in q_quality via withQuality)
    "q_text_stats" -> ((s, dir) => {
      val d = docs(s, dir)
      val nTok = llm.TextAnalysis.tokenCountWs(col("text"))
      d.select(col("doc_id"),
        length(col("text")).cast("long").as("len"),
        nTok.cast("long").as("n_tokens"),
        llm.TextAnalysis.tokenCountBpe(col("text")).cast("long")
          .as("n_tokens_bpe"),
        round((length(col("text")) - nTok + lit(1)).cast("double") / nTok,
          6).as("avg_token_len"))
    })
  )
}
