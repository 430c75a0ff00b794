package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting — the classic link-graph cohesion signal (spam
  * farms and boilerplate link rings are triangle-dense; organic link
  * neighborhoods are sparse), via the DEGREE-ORIENTED two-path join
  * (Schank & Wagner 2005 "forward"; the node-iterator family every
  * distributed implementation uses).
  *
  * Algorithm, all exact integer relational steps:
  *  1. undirect + dedup: each edge becomes (u, v) with u < v, distinct;
  *     self-loops dropped;
  *  2. orient every edge from its LOWER endpoint under the total order
  *     (degree, id) — the skew move: a hub with indegree d contributes
  *     wedges only through its ≤ √-bounded LOW-degree incident edges,
  *     so wedge volume is Σ out-deg² with out-degrees bounded by
  *     O(√m) (graph arboricity), NOT Σ deg² which a naive id-oriented
  *     join pays on a power-law graph (a 10⁶-degree hub would emit
  *     10¹² wedges; degree orientation caps its out-degree at ~√m);
  *  3. wedges: self-join oriented edges on the shared LOW endpoint,
  *     keeping (b, c) ordered by the same (degree, id) key — each
  *     unordered wedge appears exactly once;
  *  4. close: a wedge (a; b, c) is a triangle iff oriented edge b→c
  *     exists (it is oriented b→c precisely because key(b) < key(c)).
  *
  * Every join is an equi-join on node keys (wedge close is keyed by
  * the (b, c) pair); no cartesian anywhere. Output: one row per node
  * in `nodes` with its triangle count (nodes in no triangle get 0)
  * — the global count is Σ/3.
  */
object Triangles {

  /** Local clustering coefficient — triangles around a node over the
    * wedges it could close: cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)),
    * 0.0 for degree < 2; degree counted on the same undirected
    * deduped edge set the triangles use. The per-node cohesion read
    * (a link ring scores ~1, a broadcast hub ~0) next to the raw
    * count. Output: (id, degree, n_triangles, clustering). */
  def clusteringCoefficient(nodes: DataFrame, id: String,
                            edges: DataFrame, src: String,
                            dst: String): DataFrame = {
    // ONE undirect+dedup shuffle AND one degree aggregate shared by
    // the cc ratio and the triangle chain (both checkpointed — the
    // chain scans und thrice and deg twice, plus this join)
    val und = undirected(edges, src, dst).localCheckpoint()
    val deg = degrees(und).localCheckpoint()
    trianglesFromUnd(nodes, id, und, deg)
      .join(deg, col(id) === col("__n"), "left")
      .select(col(id),
        coalesce(col("__d"), lit(0L)).as("degree"),
        col("n_triangles"),
        when(coalesce(col("__d"), lit(0L)) >= 2,
          round(lit(2.0) * col("n_triangles").cast("double") /
            (col("__d") * (col("__d") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Node degrees over the undirected deduped edge set: (__n, __d). */
  private def degrees(und: DataFrame): DataFrame =
    und.select(col("__u").as("__n"))
      .unionAll(und.select(col("__v").as("__n")))
      .groupBy("__n").agg(count(lit(1)).as("__d"))

  /** Undirected deduped self-loop-free edge set: (__u, __v), u < v. */
  private def undirected(edges: DataFrame, src: String,
                         dst: String): DataFrame =
    edges.select(col(src).cast("long").as("__a"),
        col(dst).cast("long").as("__b"))
      .filter(col("__a") =!= col("__b") &&
        col("__a").isNotNull && col("__b").isNotNull)
      .select(least(col("__a"), col("__b")).as("__u"),
        greatest(col("__a"), col("__b")).as("__v"))
      .distinct()

  /** Per-node triangle counts. Output: (id, n_triangles). */
  def triangleCounts(nodes: DataFrame, id: String, edges: DataFrame,
                     src: String, dst: String): DataFrame = {
    val und = undirected(edges, src, dst).localCheckpoint()
    trianglesFromUnd(nodes, id, und, degrees(und))
  }

  private def trianglesFromUnd(nodes: DataFrame, id: String,
                               und: DataFrame,
                               deg: DataFrame): DataFrame = {
    val nd = nodes.select(col(id).cast("long").as("__id")).distinct()
    // (degree, id) lexicographic order — the orientation key
    def keyLt(d1: Column, n1: Column, d2: Column, n2: Column): Column =
      d1 < d2 || (d1 === d2 && n1 < n2)
    val ed = und
      .join(deg.select(col("__n").as("__u"), col("__d").as("__du")),
        Seq("__u"))
      .join(deg.select(col("__n").as("__v"), col("__d").as("__dv")),
        Seq("__v"))
      .select(
        when(keyLt(col("__du"), col("__u"), col("__dv"), col("__v")),
          col("__u")).otherwise(col("__v")).as("__s"),
        when(keyLt(col("__du"), col("__u"), col("__dv"), col("__v")),
          col("__v")).otherwise(col("__u")).as("__t"),
        when(keyLt(col("__du"), col("__u"), col("__dv"), col("__v")),
          col("__dv")).otherwise(col("__du")).as("__dt"))
      .localCheckpoint()
    // wedges at the shared low endpoint, (b, c) ordered by (deg, id)
    val e1 = ed.select(col("__s"), col("__t").as("__b"),
      col("__dt").as("__db"))
    val e2 = ed.select(col("__s"), col("__t").as("__c"),
      col("__dt").as("__dc"))
    val wedges = e1.join(e2, Seq("__s"))
      .filter(keyLt(col("__db"), col("__b"), col("__dc"), col("__c")))
      .select(col("__s").as("__ta"), col("__b"), col("__c"))
    // close the wedge with the oriented (b -> c) edge
    val closing = ed.select(col("__s").as("__b"), col("__t").as("__c"))
    val tri = wedges.join(closing, Seq("__b", "__c"))
    val corner = tri.select(col("__ta").as("__n"))
      .unionAll(tri.select(col("__b").as("__n")))
      .unionAll(tri.select(col("__c").as("__n")))
      .groupBy("__n").agg(count(lit(1)).as("__t"))
    nd.join(corner, nd("__id") === corner("__n"), "left")
      .select(col("__id").as(id),
        coalesce(col("__t"), lit(0L)).as("n_triangles"))
  }
}
