package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping token chunking — the retrieval/embedding
  * prep step (RAG pipelines embed ~fixed-token windows with overlap so
  * a passage split mid-thought still lands whole in some chunk).
  *
  * Conventions (engine-reproducible, no float anywhere):
  *  - tokens are whitespace splits (the corpus-wide convention shared
  *    with tokenCountWs/packSequences);
  *  - stride = chunkTokens − overlap; chunk i covers token positions
  *    [i·stride, i·stride + chunkTokens);
  *  - chunk count = 1 for docs of ≤ chunkTokens tokens, else
  *    ⌈(n − overlap)/stride⌉ as floor((n − overlap + stride − 1)/s)
  *    through double division — exact for any token count < 2^53
  *    (IEEE division of exactly-representable ints is correctly
  *    rounded, so an integer quotient comes back exactly and a
  *    fractional one cannot floor across a boundary); the last chunk
  *    may be short but always covers the tail;
  *  - chunk text re-joins with single spaces.
  *
  * Pure scan-stage work: the token array, per-chunk slices, and the
  * posexplode all evaluate in the scan's codegen stage — no shuffle,
  * the q_entropy plan shape. At 100 TB this is the map side of the
  * embed pipeline; downstream batching is the caller's packing step.
  */
object Chunking {

  /** Output: (id, chunk_id, n_chunk_tokens, chunk_text). */
  def chunkText(df: DataFrame, id: String, text: String,
                chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens=$chunkTokens must be >= 1")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap=$overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = split(col(text), " ")
    val n = size(toks)
    val nc = when(n <= chunkTokens, lit(1L)).otherwise(
      floor((n - lit(overlap) + lit(stride) - 1).cast("double") /
        lit(stride.toDouble)).cast("long"))
    df.filter(col(text).isNotNull && length(col(text)) > 0)
      .select(col(id), toks.as("__toks"), n.as("__n"),
        nc.cast("long").as("__nc"))
      .select(col(id), col("__n"),
        posexplode(transform(sequence(lit(0L), col("__nc") - 1),
          i => struct(
            array_join(slice(col("__toks"),
              (i * stride + 1).cast("int"), lit(chunkTokens)), " ")
              .as("__text"),
            least(lit(chunkTokens.toLong), col("__n") - i * stride)
              .as("__len")))))
      .select(col(id), col("pos").cast("long").as("chunk_id"),
        col("col.__len").as("n_chunk_tokens"),
        col("col.__text").as("chunk_text"))
  }
}
