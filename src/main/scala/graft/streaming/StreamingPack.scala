package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of GPT-style sequence packing
  * ([[graft.llm.Sampling.packSequences]]): documents arrive as an
  * append-only stream and each is assigned its training sequence and
  * offset INCREMENTALLY — the packing a continuously-ingesting data
  * pipeline runs, where re-packing the whole corpus per increment is
  * off the table.
  *
  * State per shard is ONE long (the running token count) — bounded,
  * tiny, never grows with history. Within a micro-batch, docs are
  * packed in id order; across micro-batches, arrival order IS the
  * packing order. When ingest delivers batches in id order per shard
  * (the append-only contract — ids are assigned monotonically by the
  * producer), the streamed assignment is bit-identical to the batch
  * packer's on the same corpus (StreamingSpec pins this parity,
  * including the batch-boundary carry).
  *
  * 100 TB posture: keyed state scales with shard count, not data;
  * every shard's fold is O(its docs); no shuffle beyond the state
  * exchange. Sequence ids use integral div on longs — exact past 2^53
  * tokens (the [[graft.llm.Sampling.packSequences]] contract).
  */
object StreamingPack {

  case class PackDoc(doc_id: Long, shard: Int, tokens: Long)
  case class PackState(nextStart: Long)
  case class PackOut(doc_id: Long, shard: Int, seq_id: Long,
                     seq_offset: Long)

  def packStream(docs: Dataset[PackDoc], budget: Int): Dataset[PackOut] = {
    require(budget > 0, s"budget=$budget must be positive")
    import docs.sparkSession.implicits._
    val b = budget.toLong
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[PackDoc], state: GroupState[PackState]) =>
          var start = state.getOption.map(_.nextStart).getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            require(d.tokens >= 0, s"doc ${d.doc_id}: negative tokens")
            val o = PackOut(d.doc_id, shard, start / b, start % b)
            start += d.tokens
            o
          }
          state.update(PackState(start))
          out.iterator
      }
  }
}
