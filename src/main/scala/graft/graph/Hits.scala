package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HITS — hubs & authorities (Kleinberg, JACM 1999) as a DataFrame
  * power iteration: the query-independent companion to PageRank for
  * link-graph curation (an authority is pointed to by good hubs; a hub
  * points to good authorities — crawl seeding wants hubs, quality
  * weighting wants authorities).
  *
  * Per iteration: auth(v) = Σ_{u→v} hub(u), then hub(u) = Σ_{u→v}
  * auth(v) using the UPDATED authorities (the standard sequential
  * update). Normalization happens ONCE at the end, by the MAXIMUM
  * score: every pass is a linear map, so per-pass scalar
  * normalization only rescales the vector — the end-normalized result
  * is exactly proportional (HitsSpec pins it against a per-pass-
  * normalized recompute) — and skipping it saves an action + global
  * aggregate per pass. Unnormalized scores grow like
  * (max degree)^(2·iters) — fine at the default iters=5 for any
  * physical graph (d^10 > 1e308 needs d > 1e30), but iters is
  * caller-controlled, so [[hits]] measures the max degree and
  * REQUIRES 2·iters·ln(maxDeg) < 600, failing loudly instead of
  * silently normalizing Inf/Inf to NaN. Max (not an L2 norm) because
  * max is an order-independent exact aggregate — a float-sum norm
  * would need a GLOBAL ordered fold, a single-partition collect of
  * the whole node set. Scores land in [0, 1] with the top
  * hub/authority pinned at exactly 1.0.
  *
  * Determinism + skew safety (shared with [[PageRank]]): both
  * contribution sums are TWO-LEVEL ordered folds — salt-bucketed
  * partial sums in neighbor order, then the ≤ `saltBuckets` subtotals
  * merged in bucket order — so the result is independent of
  * partitioning and no aggregation buffer ever holds more than
  * max(degree/S, S) entries even on a power-law hub. Mid-iteration
  * score relations carry only nodes with a NONZERO score (absent =
  * 0.0; a zero contribution is exact under IEEE addition, so the
  * folds are unchanged) — the full node set joins back once at the
  * end, zero-coalesced.
  *
  * Edge hygiene matches PageRank: duplicates and self-loops dropped.
  * Isolated or un-pointed-to nodes keep score 0 (no damping mass in
  * HITS).
  */
object Hits {

  private def orderedSum(ord: Column, v: Column) =
    graft.core.Folds.orderedSum(ord, v)

  /** Run `iters` HITS iterations. Output: (id, authority, hub). */
  def hits(nodes: DataFrame, id: String, edges: DataFrame,
           src: String, dst: String, iters: Int,
           saltBuckets: Int = 64): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(saltBuckets >= 1, s"saltBuckets=$saltBuckets must be >= 1")
    val nd = nodes.select(col(id).cast("long").as("__id")).distinct()
      .localCheckpoint()
    // TWO checkpointed edge copies, hash-partitioned on the pass key
    // (the relational analogue of keeping src- and dst-sorted
    // adjacency lists): the auth pass joins on __src, the hub pass on
    // __dst, and with localCheckpoint preserving the physical
    // partitioning NEITHER pass ever re-shuffles the edges — only the
    // nodes-sized score relation moves (r15 PageRank loop discipline).
    // eD derives from the materialized eS, so the distinct runs once.
    val eS = edges.select(col(src).cast("long").as("__src"),
        col(dst).cast("long").as("__dst"))
      .filter(col("__src") =!= col("__dst") &&
        col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .repartition(col("__src"))
      .localCheckpoint()
    val eD = eS.repartition(col("__dst")).localCheckpoint()
    // overflow guard for the no-per-pass-normalization design:
    // unnormalized scores grow at most like (max degree)^(2·iters)
    // (each pass multiplies the max score by at most the max in/out
    // degree), so require 2·iters·ln(maxDeg) under ln(DoubleMax) with
    // margin — beyond it scores reach Infinity and the end
    // normalization silently yields NaN (Inf/Inf). maxDeg costs one
    // bounded aggregate on the already-checkpointed edge set. Callers
    // hitting this need per-pass rescaling semantics, which would
    // change the float contract — fail loudly instead.
    val maxDeg = math.max(
      eS.groupBy("__src").count()
        .agg(coalesce(max("count"), lit(0L))).head().getLong(0),
      eD.groupBy("__dst").count()
        .agg(coalesce(max("count"), lit(0L))).head().getLong(0))
    require(2.0 * iters * math.log(math.max(maxDeg, 2L).toDouble) < 600.0,
      s"iters=$iters with max degree $maxDeg can overflow the " +
        "unnormalized double scores (bound: 2*iters*ln(maxDeg) < 600); " +
        "reduce iters")
    // one two-level-fold pass: scores keyed `fromCol` fold into
    // `toCol` groups in from-order (only nonzero-score nodes present)
    // stats-safe checkpoint per pass: plain localCheckpoint carries
    // multiplied sizeInBytes forward and compounds across passes
    // (core/Checkpoints.scala)
    // the explicit toCol repartition feeds BOTH fold levels (hash(to)
    // satisfies the (to, salt) and (to) groupings — one exchange, not
    // two); shuffle_hash keeps the edges side unsorted
    def pass(scores: DataFrame, eDir: DataFrame, fromCol: String,
             toCol: String): DataFrame =
      graft.core.Checkpoints.fresh(
        eDir.join(scores.hint("shuffle_hash"),
            eDir(fromCol) === scores("__id"))
          .select(col(toCol), col(fromCol),
            pmod(col(fromCol), lit(saltBuckets.toLong)).as("__sb"),
            col("__score").as("__s"))
          .repartition(col(toCol))
          .groupBy(col(toCol), col("__sb"))
          .agg(orderedSum(col(fromCol), col("__s")).as("__ps"))
          .groupBy(col(toCol))
          .agg(orderedSum(col("__sb"), col("__ps")).as("__score"))
          .withColumnRenamed(toCol, "__id"))
    var auth = nd.select(col("__id"), lit(1.0).as("__score"))
      .localCheckpoint()
    var hub = auth
    var t = 0
    while (t < iters) {
      val (prevAuth, prevHub) = (auth, hub)
      auth = pass(hub, eS, "__src", "__dst")  // auth(v) = Σ hub(u), u→v
      hub = pass(auth, eD, "__dst", "__src")  // hub(u) = Σ auth(v), u→v
      // both passes are eagerly materialized above; release the
      // superseded round (no-op at t=0, where both are the initial
      // unpersisted localCheckpoint)
      graft.core.Checkpoints.release(prevAuth)
      graft.core.Checkpoints.release(prevHub)
      t += 1
    }
    // end normalization over the full node set, zero-coalesced
    def normalized(scores: DataFrame, out: String): DataFrame = {
      val full = nd.join(scores, Seq("__id"), "left")
        .select(col("__id"),
          coalesce(col("__score"), lit(0.0)).as("__raw"))
      val mx = full.agg(max("__raw").as("__mx"))
      full.crossJoin(broadcast(mx))
        .select(col("__id"),
          when(col("__mx") > 0.0, col("__raw") / col("__mx"))
            .otherwise(lit(0.0)).as(out))
    }
    // materialize the result, then release the final round's cached
    // scores — repeated invocations in one session leave no
    // CacheManager entries behind (eS/eD are RDD-cached only and
    // reclaimed by the ContextCleaner on scope exit)
    val out = normalized(auth, "authority")
      .join(normalized(hub, "hub"), Seq("__id"))
      .select(col("__id").as(id), col("authority"), col("hub"))
      .localCheckpoint()
    graft.core.Checkpoints.release(auth)
    graft.core.Checkpoints.release(hub)
    out
  }
}
