package graft.core

import org.apache.spark.sql.DataFrame

/** Stats-safe checkpointing for ITERATIVE DataFrame loops.
  *
  * `Dataset.localCheckpoint` truncates LINEAGE but carries the
  * original plan's `Statistics` onto the resulting `LogicalRDD`
  * (`originalStats`) — so in a loop where round t's plan joins round
  * t−1's checkpoint with itself (components, PageRank, HITS), the
  * carried `sizeInBytes` MULTIPLIES through Catalyst's
  * `SizeInBytesOnlyStatsPlanVisitor` every round: measured, the
  * bit-length of sizeInBytes DOUBLES per round (23 bits → 237,000
  * bits in 14 rounds on a 10-row toy), and around round ~25 any stats
  * consumer (`InjectRuntimeFilter.canBroadcastBySize`, join
  * selection) dies with `java.lang.ArithmeticException: BigInteger
  * would overflow supported range`. This took down the round-13
  * DBSCAN scale probe at maxIters 64 — an unbounded-rounds loop with
  * plain localCheckpoint is a latent crash, not just bad estimates.
  *
  * [[fresh]] checkpoints and then REBUILDS the frame from the
  * checkpointed RDD via the public `createDataFrame(RDD[Row],
  * schema)`, which constructs a `LogicalRDD` with NO carried stats —
  * every round restarts from the default size estimate, so nothing
  * compounds. The rebuilt frame is PERSISTED (MEMORY_AND_DISK): the
  * InternalRow→Row→InternalRow conversion runs once per round, not
  * once per consumer scan (resolveComponents reads its labels three
  * times per round, PageRank/HITS twice per iteration). Loop state is
  * the small (nodes-sized) relation, never the fact table, so the
  * cache is bounded; callers MUST unpersist the previous round's
  * frame once the new round is materialized (the eager checkpoint, or
  * the convergence count for a lazy one) — otherwise iters× node-set
  * copies pile up in the storage pool. Physical join choices for the
  * next round fall to AQE, which replans from RUNTIME sizes and
  * re-derives broadcasts where they are genuinely safe.
  */
object Checkpoints {

  /** localCheckpoint with the carried statistics dropped and the
    * rebuilt frame persisted — use for any round state that re-enters
    * the next iteration's plan. Pair with [[release]] on the previous
    * round's state after the new round is materialized. */
  def fresh(df: DataFrame, eager: Boolean = true): DataFrame = {
    val cp = df.localCheckpoint(eager)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist a superseded round's state (non-blocking). A no-op on
    * frames that were never persisted (e.g. the loop's initial plain
    * localCheckpoint), so loops can call it unconditionally. */
  def release(df: DataFrame): Unit = { df.unpersist(false); () }
}
