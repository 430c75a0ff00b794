package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.models.DetKMeans

/** Semantic deduplication — the cluster-tier embedding dedup
  * (Abbas, Tirumala, Simig, Ganguli, Morcos: "SemDeDup:
  * Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540), built from the public method
  * description.
  *
  * Where [[Dedup.embeddingNearDup]] finds near-dups by PROBABILISTIC
  * hyperplane-LSH buckets, SemDeDup partitions the corpus into k-means
  * clusters and does EXACT pairwise cosine within each cluster — the
  * recall approximation is the clustering itself (cross-cluster dups
  * are missed by design; the paper accepts this because semantic dups
  * cluster together by construction). The keep rule is the paper's:
  * within each duplicate group, keep the example with the LOWEST
  * cosine similarity to its cluster centroid — the most atypical
  * member — to preserve diversity; everything closer to the centroid
  * is redundant with it.
  *
  * 100 TB posture: the only super-linear step is the intra-cluster
  * self-join, O(Σ sᵢ²) over cluster sizes sᵢ. The paper's operating
  * procedure (k grows with the corpus — they run 50 000 clusters at
  * web scale) keeps sᵢ bounded, and `maxClusterSize` is the hot-bucket
  * guard with the same graceful-degrade contract as
  * `Similarity.capBuckets`: an over-sized cluster contributes no PAIRS
  * (its members are all kept) instead of an sᵢ² explosion. Everything
  * is one cluster-keyed exchange + the O(log d) pointer-jumping rounds
  * of [[Dedup.resolveComponents]]. Deterministic end to end
  * ([[graft.models.DetKMeans]] + fixed tie rules), so the registered
  * query carries a fixture oracle.
  */
object SemDedup {

  /** Unit-normalized double copy (the [[Pq]] convention: norm
    * materialized as its own column so the aggregate is not re-run per
    * element inside the transform lambda). */
  private def unitized(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id).as("__id"), col(vec).cast("array<double>").as("__dv0"))
      .withColumn("__n",
        sqrt(aggregate(col("__dv0"), lit(0.0), (a, x) => a + x * x)) +
          lit(1e-12))
      .select(col("__id"), transform(col("__dv0"), x => x / col("__n"))
        .as("__dv"))

  /** Cosine of a unit vector to ITS assigned centroid, as a literal
    * CASE over the k centroids (no join — same posture as
    * `DetKMeans.Model.dist2Expr`). */
  private def centroidCos(cents: Seq[Seq[Double]])(u: Column,
                                                   cluster: Column): Column =
    cents.zipWithIndex.foldLeft(lit(Double.NaN)) { case (acc, (c, i)) =>
      when(cluster === i, Similarity.cosineNative(u, typedlit(c)))
        .otherwise(acc)
    }

  /** SemDeDup over an embedding column. One output row per input row:
    * `(id, cluster, centroid_cos, keep_id, is_kept)` — `keep_id` is the
    * kept representative of the row's duplicate group (itself for
    * non-duplicated rows), chosen as the group member with the lowest
    * centroid cosine (ties by id, ascending).
    *
    * `minCosine` is the paper's 1−ε duplicate threshold: pairs at or
    * above it (within a cluster) are semantic duplicates. */
  def semDedup(df: DataFrame, id: String, vec: String, k: Int = 16,
               minCosine: Double = 0.9, maxClusterSize: Int = 100000,
               seed: Long = 29L): DataFrame = {
    require(k > 0 && minCosine > 0 && maxClusterSize > 1,
      s"k=$k, minCosine=$minCosine, maxClusterSize=$maxClusterSize")
    val u = unitized(df, id, vec)
    val km = DetKMeans.fit(u, "__dv", "__id", k, maxIter = 10, seed = seed)
    val cents = km.centroids.map(_.toSeq).toSeq
    // checkpoint: `assigned` fans out four ways below (size guard, both
    // pair-join sides, the final labeling) — without lineage truncation
    // each consumer re-derives the k-literal assignExpr/centroidCos
    // trees and the self-join duplicates them again (the Pq one-shot
    // measured this pattern at >10× the materialized cost)
    val assigned = u
      .withColumn("__cluster", km.assignExpr(col("__dv")))
      .withColumn("__ccos", centroidCos(cents)(col("__dv"), col("__cluster")))
      .localCheckpoint(false)
    // Intra-cluster exact pairwise — the cluster id IS the bucket key,
    // and each pair appears exactly once (no OR-amplification), so no
    // distinct() exchange is needed. The size guard drops over-sized
    // clusters from PAIR GENERATION only; their members stay in the
    // output as singletons (kept).
    val cool = assigned.groupBy("__cluster")
      .agg(count(lit(1)).as("__csz"))
      .filter(col("__csz") <= maxClusterSize)
      .select("__cluster")
    val joinable = assigned.join(cool, Seq("__cluster"))
    val a = joinable.select(col("__cluster"), col("__id").as("id_a"),
      col("__dv").as("__va"))
    val b = joinable.select(col("__cluster"), col("__id").as("id_b"),
      col("__dv").as("__vb"))
    val pairs = a.join(b, Seq("__cluster"))
      .filter(col("id_a") < col("id_b"))
      // unit vectors: the dot IS the cosine, but cosineNative's norm
      // terms are ~1 and keep the arithmetic identical to every other
      // cosine in this module (bit-reproducibility over micro-cost)
      .withColumn("cosine", Similarity.cosineNative(col("__va"), col("__vb")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b")
    // duplicate groups = connected components of the threshold graph
    // (components never span clusters — every edge is intra-cluster)
    val comps = Dedup.resolveComponents(df.select(col(id)), pairs, id)
      .select(col(id), col("keep_id").as("__comp"))
    val labeled = comps.join(
      assigned.select(col("__id").as(id), col("__cluster").as("cluster"),
        col("__ccos")),
      Seq(id))
    // the paper's keep rule: lowest centroid cosine wins, ties by id
    val winners = labeled.groupBy("__comp")
      .agg(min_by(col(id), struct(col("__ccos"), col(id))).as("keep_id"))
    labeled.join(winners, Seq("__comp"))
      .select(col(id), col("cluster"),
        round(col("__ccos"), 6).as("centroid_cos"),
        col("keep_id"), (col(id) === col("keep_id")).as("is_kept"))
  }
}
