package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous MIN-LABEL propagation ("hash-min"
  * LPA — the deterministic variant of Raghavan 2007's label
  * propagation, and the per-round step of the Rastogi 2013 hash-min
  * connected-components family): every node starts as its own label,
  * and each round adopts the minimum label in its closed undirected
  * neighborhood:
  *
  *   l_0(v) = v;  l_{t+1}(v) = min(l_t(v), min_{u ~ v} l_t(u))
  *
  * After R rounds l(v) is EXACTLY the minimum node id within
  * undirected distance R of v — bounded rounds give distance-R
  * community cores (what a dedup/link-farm triage actually wants:
  * tight rings collapse onto one label in 1–2 rounds while a long
  * chain stays split), and R ≥ diameter converges to connected
  * components, the [[graft.llm.Dedup.resolveComponents]] answer by a
  * different route (that one pointer-jumps in O(log d) rounds; this
  * one is the bounded-radius read). All-integer min — associative,
  * commutative, partition-order-independent: no float-fold convention
  * needed anywhere.
  *
  * Distribution shape (the r15 PageRank loop discipline): the
  * symmetric adjacency is checkpointed ONCE, hash-partitioned on src,
  * so per round only the nodes-sized label state shuffles into the
  * message join; messages take ONE hash(dst) exchange with map-side
  * partial min (a real combiner — unlike the ordered float folds, min
  * collapses on the map side); the label update is a nodes-sized
  * self-join. Round state rides [[graft.core.Checkpoints.fresh]] so
  * lineage and carried stats never compound.
  */
object Communities {

  /** Run `rounds` min-label steps over the undirected closure of
    * `edges` (self-loops dropped, duplicates collapsed). Output:
    * (id, community) — community = min id within distance `rounds`.
    *
    * `earlyStop = true` terminates as soon as a round changes ZERO
    * labels (one nodes-sized scan of the already-cached round state —
    * no extra join), which at `rounds ≥ diameter + 1` yields the
    * fixed-point: bit-identical to the fixed-R output for any larger
    * R, and equal to [[graft.llm.Dedup.resolveComponents]]'s
    * components (CommunitiesSpec pins both equalities). The default
    * stays fixed-R so bounded-radius reads are reproducible.
    *
    * The output is materialized (eager final checkpoint) before the
    * loop's cached round state is released, so repeated invocations in
    * one session leave nothing in the CacheManager — the edge-sized
    * `adj` checkpoint is RDD-cached only (no CacheManager entry) and
    * is reclaimed by the ContextCleaner once the invocation's frames
    * go out of scope. */
  def minLabelPropagation(nodes: DataFrame, id: String,
                          edges: DataFrame, src: String, dst: String,
                          rounds: Int,
                          earlyStop: Boolean = false): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val nd = nodes.select(col(id).cast("long").as("__id")).distinct()
    val und = edges.select(col(src).cast("long").as("__a"),
        col(dst).cast("long").as("__b"))
      .filter(col("__a") =!= col("__b") &&
        col("__a").isNotNull && col("__b").isNotNull)
      .select(least(col("__a"), col("__b")).as("__u"),
        greatest(col("__a"), col("__b")).as("__v"))
      .distinct()
    val adj = und.select(col("__u").as("__src"), col("__v").as("__dst"))
      .unionAll(und.select(col("__v").as("__src"),
        col("__u").as("__dst")))
      .repartition(col("__src")).localCheckpoint()
    // round state carries (__id, __lbl, __chg): __chg marks whether
    // THIS round lowered the label, so convergence is a filter over
    // the cached state, not a self-join against the previous round
    var state = nd.select(col("__id"), col("__id").as("__lbl"),
        lit(true).as("__chg"))
      .repartition(col("__id")).localCheckpoint()
    var t = 0
    var converged = false
    while (t < rounds && !converged) {
      val labels = state.select("__id", "__lbl")
      // groupBy DIRECTLY (no explicit repartition): min partially
      // aggregates map-side, so the one hash(dst) exchange moves
      // per-partition minima, not raw messages — the opposite call
      // from the PageRank fold, whose collect_list has no map-side
      // reduction to preserve
      val msgs = adj
        .join(labels.hint("shuffle_hash"),
          adj("__src") === labels("__id"))
        .select(col("__dst"), col("__lbl").as("__in"))
        .groupBy("__dst").agg(min("__in").as("__nm"))
      val prev = state
      state = graft.core.Checkpoints.fresh(
        labels.join(msgs.hint("shuffle_hash"),
            labels("__id") === msgs("__dst"), "left")
          .select(col("__id"),
            least(col("__lbl"), coalesce(col("__nm"), col("__lbl")))
              .as("__lbl"),
            (coalesce(col("__nm"), col("__lbl")) < col("__lbl"))
              .as("__chg")))
      graft.core.Checkpoints.release(prev)
      if (earlyStop) converged = state.filter(col("__chg")).isEmpty
      t += 1
    }
    val out = state
      .select(col("__id").as(id), col("__lbl").as("community"))
      .localCheckpoint()
    graft.core.Checkpoints.release(state)
    out
  }
}
