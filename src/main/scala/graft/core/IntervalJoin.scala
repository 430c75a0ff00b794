package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval join: every left row pairs with EVERY same-key
  * right row whose timestamp lands in `(lts + lower, lts + upper]` —
  * the all-matches sibling of [[AsofJoin]] (which keeps only the
  * newest single match at-or-before the probe). Reference behavior:
  * the event scorer pairs a predicted event with every true event it
  * overlaps in time (/root/reference/src/evaluate.py:68-90); this is
  * that time-bounded pairing as a first-class keyed relational
  * operator over arbitrary streams.
  *
  * ONE declarative equi+range join, shared verbatim by batch and
  * streaming:
  *  - batch: Catalyst plans a keyed equi-join (broadcast or shuffle
  *    hash/merge by size) with the range as a residual INSIDE the
  *    join — the fact never duplicates and nothing is windowed or
  *    exploded;
  *  - streaming: with BOTH sides event-time watermarked, this exact
  *    condition is Spark's canonical stream-stream inner join. The
  *    range bound is not an optimization hint but the STATE EVICTION
  *    contract: the upper bound tells the state store when a buffered
  *    left row can never match again (watermark past `lts + upper`)
  *    and the lower bound the same for right rows, so state is bounded
  *    by (watermark delay + interval width) × arrival rate per key —
  *    the 100 TB/day streaming shape. An unbounded-time join would
  *    grow state forever; Spark rejects it in append mode, by design.
  *
  * Key columns are equality-matched null-dropping (proper equi-join
  * semantics on both engines — pinned by the NullKeyAudit
  * classification of the registered face). The right side's key
  * columns are renamed internally so self-joins on one lineage stay
  * unambiguous; timestamp and payload column names must differ across
  * sides (pre-select/alias at the call site).
  */
object IntervalJoin {

  /** @param lower exclusive lower bound as a SQL interval literal body
    *              (e.g. "0 SECONDS": right strictly after left)
    * @param upper inclusive upper bound (e.g. "30 MINUTES")
    * @param watermark event-time lateness bound, applied to BOTH sides
    *                  when the inputs are streaming (ignored in batch:
    *                  batch has no watermark and needs no eviction)
    * @param joinType "inner" (all matches) or "left_outer" — the
    *                 drop-off read: a left row with NO in-window match
    *                 emits once with null right fields. In streaming
    *                 the null row can only emit when the WATERMARK
    *                 passes `lts + upper` (before that a match could
    *                 still arrive), so outer results trail the
    *                 watermark by the interval width — the documented
    *                 Structured Streaming outer-join latency, not a
    *                 defect. Null-keyed LEFT rows pass through
    *                 unmatched (outer semantics, both engines); null
    *                 keys never match (equi semantics). */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   lts: String, rts: String,
                   lower: String, upper: String,
                   watermark: Option[String] = None,
                   joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "interval join requires at least one key")
    // the key columns are renamed on the right side; any OTHER shared
    // name (a timestamp or payload column) would emit ambiguous
    // duplicate output columns — fail fast instead of letting the
    // caller discover it at resolution time
    val shared =
      left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"non-key column names must be disjoint across the two inputs " +
        s"(rename before joining): ${shared.toSeq.sorted.mkString(", ")}")
    val l = watermark match {
      case Some(w) if left.isStreaming => left.withWatermark(lts, w)
      case _ => left
    }
    val r0 = watermark match {
      case Some(w) if right.isStreaming => right.withWatermark(rts, w)
      case _ => right
    }
    val r = keys.foldLeft(r0)((d, k) => d.withColumnRenamed(k, "__r_" + k))
    val keyEq = keys.map(k => col(k) === col("__r_" + k)).reduce(_ && _)
    val range = col(rts) > col(lts) + expr(s"INTERVAL $lower") &&
      col(rts) <= col(lts) + expr(s"INTERVAL $upper")
    l.join(r, keyEq && range, joinType)
      .drop(keys.map("__r_" + _): _*)
  }
}
