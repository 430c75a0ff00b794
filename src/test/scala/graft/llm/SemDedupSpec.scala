package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract tests for [[SemDedup.semDedup]] (the cluster-tier semantic
  * dedup). Rather than reimplementing k-means, the tests take the
  * output's own cluster labels as ground truth and verify every layer
  * ABOVE the clustering independently: pair soundness/completeness
  * (within-cluster pairwise is EXACT — the only approximation SemDeDup
  * makes is the clustering itself), component consistency, the paper's
  * lowest-centroid-cosine keep rule, and determinism.
  */
class SemDedupSpec extends SparkSpec {

  private val embPath = "/root/testdata/sf0.01/embeddings.parquet"
  private def haveData = new java.io.File(embPath).exists()

  private val tau = 0.4 // top of the sf0.01 corpus's cosine range (max 0.51)

  private def run() = {
    val emb = spark.read.parquet(embPath)
    SemDedup.semDedup(emb, "vec_id", "embedding", k = 8, minCosine = tau)
  }

  test("semDedup output covers every doc once; keep rule is the paper's") {
    assume(haveData)
    val emb = spark.read.parquet(embPath)
    val out = run().collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4))))
      .toMap
    assert(out.size.toLong === emb.count(), "one output row per input row")
    // is_kept <=> id == keep_id; keep_id closed under itself
    out.foreach { case (id, (_, _, keepId, isKept)) =>
      assert(isKept === (id == keepId))
      assert(out(keepId)._3 === keepId, "keep_id must itself be kept")
    }
    // exact within-cluster pairs >= tau, from the raw vectors (driver
    // recomputation, unit-norm doubles — independent of the operator)
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum) + 1e-12
        (r.getLong(0), v.map(_ / n))
      }.toMap
    def cos(a: Long, b: Long): Double =
      vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
    val ids = vecs.keys.toSeq.sorted
    val pairs = for {
      i <- ids; j <- ids if i < j
      if out(i)._1 == out(j)._1 // co-clustered
      if cos(i, j) >= tau
    } yield (i, j)
    assert(pairs.nonEmpty, "fixture corpus must exercise dup groups")
    // completeness: every within-cluster pair >= tau landed in ONE group
    pairs.foreach { case (a, b) =>
      assert(out(a)._3 === out(b)._3,
        s"pair ($a,$b) cos=${cos(a, b)} split across groups")
    }
    // soundness: every dropped doc has a co-cluster partner >= tau
    val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.foreach { case (id, (_, _, _, isKept)) =>
      if (!isKept) assert(inPair.contains(id),
        s"doc $id dropped without any within-cluster pair >= $tau")
    }
    // keep rule: within each group the kept member minimizes
    // (centroid_cos, id)
    out.groupBy(_._2._3).foreach { case (keepId, members) =>
      val best = members.toSeq
        .map { case (id, (_, ccos, _, _)) => (ccos, id) }.min
      assert(best._2 === keepId,
        s"group $keepId kept the wrong member (expected ${best._2})")
    }
  }

  test("semDedup is deterministic across runs") {
    assume(haveData)
    val a = run().collect().map(_.toSeq).toSet
    val b = run().collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("maxClusterSize degrades a hot cluster to all-kept, not an explosion") {
    import spark.implicits._
    // 60 identical vectors one cluster: pair generation must be skipped
    // (cap 50) and every member kept as a singleton
    val v = Array.fill(16)(1.0f)
    val df = (0 until 60).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(df, "vec_id", "embedding", k = 2,
      minCosine = 0.9, maxClusterSize = 50)
    assert(out.filter(col("is_kept")).count() === 60L)
    // and with a permissive cap the same corpus collapses to one keeper
    val out2 = SemDedup.semDedup(df, "vec_id", "embedding", k = 2,
      minCosine = 0.9, maxClusterSize = 1000)
    assert(out2.filter(col("is_kept")).count() === 1L)
  }
}
