package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN (Ester et al., KDD 1996) over per-series (value, Δvalue)
  * features — the density-based CLUSTERING complement to LOF's
  * density-based SCORING: recurring operating regimes come out as
  * clusters, isolated behavior as noise, with no cluster count chosen
  * up front.
  *
  * Determinism by construction: features are fixed-pointed to cents,
  * the ε-test is `dx² + dy² ≤ eps²` in LONG arithmetic (no sqrt, no
  * float anywhere), the neighborhood count is tie-free integer math,
  * cluster labels are component MINIMUM node ids (via the L6
  * pointer-jumping components), and a border point joins the smallest
  * cluster label among its core neighbors (the classic
  * order-dependence of DBSCAN border assignment pinned to a total
  * order both engines share).
  *
  * Distribution shape — candidate generation is ε-GRID CELL BUCKETING
  * (the default, `grid = true`): each point lands in the eps×eps cell
  * `(⌊c/eps⌋, ⌊d/eps⌋)` of the integer feature plane; one side is
  * keyed by its own cell, the other is emitted into the 3×3 cell
  * neighborhood, and the equi-join on (series, cell) followed by the
  * exact ε-test finds every qualifying pair exactly once (a pair
  * within radius eps differs by ≤ 1 in each cell coordinate; the 9
  * emitted cells are distinct). Candidate volume is linear in points
  * for bounded density (≤ 9·|cell| candidates per point) instead of
  * the naive form's O(n²) per series — the ε-filter itself is
  * unchanged, so the output is IDENTICAL to the naive self-join
  * (`grid = false`, kept for the DbscanSpec equivalence pin).
  * Everything downstream is keyed aggregates plus the logarithmic
  * pointer-jumping rounds.
  *
  * Node identity: `series.cast(long) * 2^32 + ordinal` — series keys
  * must be numeric non-negative below 2^31 and ordinals below 2^32
  * (4.3 B rows per series — far beyond any per-series window the
  * naive pair join could run on anyway).
  *
  * Per-series SIZE CONTRACT (the cogroup union-find): one series' CORE
  * point ids plus its core-core edges are materialized into a single
  * task's LongMap — bounded by the same monitoring window that bounds
  * the candidate join itself (the module-wide per-series contract; at
  * ~16 bytes per entry a 10⁷-point series costs ~160 MB of task heap).
  * A series beyond that budget should not reach this operator at all —
  * its ε-candidate join is the earlier wall — but callers clustering
  * genuinely unbounded keys must pre-segment the series (or swap the
  * component step for the distributed `Dedup.resolveComponents` loop,
  * which scales past task memory at ~10× the scheduling cost).
  *
  * Output: (series, ord, role ∈ core|border|noise, cluster — the
  * component's min composite id, or −1 for noise).
  */
object Dbscan {

  def dbscan(df: DataFrame, series: String, order: String,
             value: String, scale: Int = 100, eps: Long = 1000L,
             minPts: Int = 4, grid: Boolean = true): DataFrame = {
    require(eps >= 1, s"eps=$eps must be >= 1")
    require(minPts >= 2, s"minPts=$minPts must be >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__sk").orderBy("__o")
    // deliberately NOT Grouped.pin'ned: the grid-bucketed candidate
    // join keeps pair volume LINEAR in points, so no stage here is
    // CPU-starved — the query is dominated by its ~8 sequential
    // stage barriers, and pinning every one of them to 32 tasks was
    // measured 1.1 s SLOWER than stock AQE coalescing
    // (OPTIMIZATION_r19.md §3)
    val pts = df.select(col(series).cast("long").as("__sk"),
        col(order).as("__o"),
        round(col(value) * scale).cast("long").as("__c"))
      .filter(col("__c").isNotNull && col("__sk").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__d",
        col("__c") - coalesce(lag("__c", 1).over(w), col("__c")))
      .withColumn("__nid", col("__sk") * lit(4294967296L) + col("__i"))
      .select("__sk", "__i", "__nid", "__c", "__d")
    val dx = col("__ca") - col("__cb")
    val dy = col("__da") - col("__db")
    val epsTest = dx * dx + dy * dy <= lit(eps * eps)
    val candidates =
      if (grid) {
        // EXACT integer floor-division cell ids: `c - pmod(c, eps)`
        // is the largest multiple of eps <= c (exact long arithmetic,
        // correct for negative coordinates), and `div` on an exactly-
        // divisible numerator is the exact floor quotient. The double
        // route (floor(c.cast(double)/eps)) loses ulps for |c| > 2^53
        // and can land a boundary point in the WRONG cell, silently
        // dropping a true ε-neighbor — violating the documented
        // grid ≡ naive equivalence.
        def cell(name: String) =
          expr(s"(($name - pmod($name, ${eps}L)) div ${eps}L)")
        val a = pts.select(col("__sk"), col("__nid").as("__na"),
          col("__c").as("__ca"), col("__d").as("__da"),
          cell("__c").as("__cx"), cell("__d").as("__cy"))
        val off = array((-1 to 1).flatMap(i => (-1 to 1).map(j =>
          struct(lit(i.toLong).as("__ox"), lit(j.toLong).as("__oy")))): _*)
        val b = pts.select(col("__sk"), col("__nid").as("__nb"),
          col("__c").as("__cb"), col("__d").as("__db"),
          explode(off).as("__off"))
          .select(col("__sk"), col("__nb"), col("__cb"), col("__db"),
            (cell("__cb") + col("__off.__ox")).as("__cx"),
            (cell("__db") + col("__off.__oy")).as("__cy"))
        a.join(b, Seq("__sk", "__cx", "__cy"))
      } else {
        val a = pts.select(col("__sk"), col("__nid").as("__na"),
          col("__c").as("__ca"), col("__d").as("__da"))
        val b = pts.select(col("__sk"), col("__nid").as("__nb"),
          col("__c").as("__cb"), col("__d").as("__db"))
        a.join(b, Seq("__sk"))
      }
    val nbrs = candidates
      .filter(col("__na") =!= col("__nb") && epsTest)
      .select("__sk", "__na", "__nb")
      .localCheckpoint() // bounded ε-graph shared by 4 consumers
    val deg = nbrs.groupBy("__na").agg(count(lit(1)).as("__n"))
    val core = deg.filter(col("__n") + 1 >= minPts).select("__na")
      .localCheckpoint()
    val coreB = core.withColumnRenamed("__na", "__nb")
    val coreEdges = nbrs
      .join(core, Seq("__na"))
      .join(coreB, Seq("__nb"))
      .filter(col("__na") < col("__nb"))
      .select(col("__na").as("id_a"), col("__nb").as("id_b"))
    // Connected components of the core-core graph. The ε-graph is
    // PER-SERIES by construction (candidates join on __sk; composite
    // node ids embed the series key), so components never span series
    // and the generic distributed fixpoint loop
    // (Dedup.resolveComponents) is structural overkill: its per-ROUND
    // fixed cost (message join + checkpoint + convergence count,
    // ~0.4 s each at bench scale) × the ε-chain's hop-bounded ~10-12
    // rounds was 5+ s of q_dbscan's 8 s (r18 profile). Per-series
    // min-id union-find inside one cogroup pass computes the SAME
    // labels (component minimum — union always roots the smaller id,
    // so the root IS the min) in a single job, and is the same
    // bounded-per-series distribution shape as every M-row model here:
    // the group is one series' CORE points, bounded by the monitoring
    // window that bounds the candidate join itself. Cross-series
    // graphs (document dedup) keep the distributed loop.
    val comp = {
      val spark = df.sparkSession
      import spark.implicits._
      val nodesK = core.select(col("__na"))
        .withColumn("__g", expr("__na div 4294967296L"))
        .as[(Long, Long)]
      val edgesK = coreEdges
        .withColumn("__g", expr("id_a div 4294967296L"))
        .select(col("__g"), col("id_a"), col("id_b"))
        .as[(Long, Long, Long)]
      // plain groupByKey — deliberately NOT Grouped.pinned: the
      // union-find input is the nodes-sized core set (tiny vs the pair
      // volume) and the per-series fold is microseconds, so AQE's
      // coalescing of this exchange is the RIGHT call; pinning it was
      // measured 0.5-1 s SLOWER (32 tasks × 2 extra exchanges of
      // scheduling for no compute win — OPTIMIZATION_r19.md §3)
      nodesK.groupByKey(_._2).cogroup(edgesK.groupByKey(_._1)) {
        (_, nodes, edges) =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != r) {
              val n = parent(c); parent(c) = r; c = n
            }
            r
          }
          val ns = nodes.map(_._1).toArray
          ns.foreach(n => parent(n) = n)
          edges.foreach { case (_, a, b) =>
            val ra = find(a); val rb = find(b)
            // root the smaller id: the final root of every tree is the
            // component MINIMUM, matching resolveComponents' labels
            if (ra < rb) parent(rb) = ra
            else if (rb < ra) parent(ra) = rb
          }
          ns.iterator.map(n => (n, find(n)))
      }.toDF("__na", "__cl")
        // comp fans out to TWO consumers (the border min-label join and
        // the core-role union): without this barrier the whole cogroup
        // subtree — union-find pass plus its upstream exchanges — is
        // planned and executed twice (r19 plan dump showed 2 CoGroup
        // nodes; the q_ensemble2 multi-consumer pattern)
        .localCheckpoint()
    }
    // border: non-core points take the SMALLEST cluster label among
    // their core neighbors (deterministic total order)
    val borders = nbrs
      .join(core, Seq("__na"), "left_anti")
      .join(comp.select(col("__na").as("__nb"),
        col("__cl").as("__ncl")), Seq("__nb"))
      .groupBy("__na").agg(min("__ncl").as("__cl"))
    val coreOut = comp.withColumn("role", lit("core"))
    val borderOut = borders.withColumn("role", lit("border"))
    val roles = coreOut.unionByName(borderOut)
      .withColumnRenamed("__na", "__nid")
    pts.join(roles, Seq("__nid"), "left")
      .select(col("__sk").as(series), col("__i").as("ord"),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("__cl"), lit(-1L)).as("cluster"))
  }
}
