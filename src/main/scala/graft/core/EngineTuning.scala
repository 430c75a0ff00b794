package graft.core

import org.apache.spark.sql.SparkSession

/** Engine session tuning — scale-adaptive AQE behavior for sessions that
  * run this library's query surface (Bench, Verify, or any production
  * session).
  *
  * The one conf here fixes a measured parallelism collapse
  * (OPTIMIZATION_r18.md §1): Spark's AQE partition coalescing picks the
  * post-shuffle partition count from SHUFFLE BYTES — with
  * `parallelismFirst=true` (default) the target size is
  * `max(totalShuffleBytes / defaultParallelism, minPartitionSize)` and
  * the `minPartitionSize` floor defaults to 1 MB. Bytes are a fine proxy
  * when downstream cost is byte-proportional, but this engine's heavy
  * operators are exactly the other case: a kilobytes-sized shuffle of
  * keys/fingerprints/series feeds CPU-dominated work — pair-exploding
  * bucket joins (SimHash/Theil–Sen/LOF), per-group model fits (GP MLE,
  * BSTS, S-H-ESD in `mapGroups`). At sf0.1 the 1.8 MB events shuffle
  * coalesced to 1–3 partitions and ran the GP fit of 1500 series on TWO
  * cores (measured: `AQEShuffleRead numCoalescedPartitions=2`,
  * MapGroups pipeline 28 s across 2 tasks).
  *
  * Lowering the FLOOR (not the advisory target) is scale-neutral by
  * construction: whenever `totalShuffleBytes / defaultParallelism`
  * exceeds the floor — i.e. on any shuffle big enough that bytes, not
  * scheduling, dominate — the floor is inert and AQE behaves exactly as
  * stock. It only bites where the byte heuristic starves the CPU: small
  * shuffles keep up to `defaultParallelism` partitions at the cost of a
  * few extra ~ms-scheduling tasks. The value is conf-parameterised
  * (`SPARK_GRAFT_MIN_COALESCE`); production clusters that want the
  * stock behavior set it to 1m. The 256k default was picked by A/B
  * over a 16-query mixed subset at sf0.1 (OPTIMIZATION_r18.md §1):
  * 64k maximized the CPU-heavy wins but taxed many-stage queries with
  * ~29 tasks per tiny shuffle (q_sweep_curve +1.3 s); 256k keeps ~90%
  * of the wins (events' 1.8 MB shuffle → 8 partitions) with the
  * many-stage tax near zero.
  *
  * This is a session default, not per-query magic: it applies uniformly
  * to every query in the registry, and the explicit repartitions at
  * known explosion sites (e.g. `Dedup.simhashCandidatesFromFps`) remain
  * the structural fix where a SINGLE aggregate output fans out by 100×+
  * regardless of conf.
  */
object EngineTuning {

  def conf: Map[String, String] = Map(
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
      sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "256k"))

  /** Apply the tuning confs to a builder (chainable). */
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    conf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
