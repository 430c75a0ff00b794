package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isolation Forest (Liu, Ting & Zhou, ICDM 2008) — the standard
  * model-free multivariate outlier scorer, made DETERMINISTIC so it
  * can sit behind the fixture-oracle gate like every other model
  * here:
  *
  *  - the training subsample is selected by the engine-portable MCG
  *    id hash (the L19 sampling primitive), not a seeded shuffle —
  *    the same rows are chosen on any partitioning / any engine;
  *  - each tree's split choices come from a per-tree Park–Miller
  *    (MINSTD) stream, so the whole forest is a pure function of the
  *    input ids and the hyperparameters;
  *  - scoring is the closed-form anomaly score
  *    s(x) = 2^(−E[h(x)]/c(ψ)) with the textbook average-path
  *    normalizer c(m) = 2·H(m−1) − 2(m−1)/m.
  *
  * Features per event: (value, one-step delta) per series — the
  * minimal shape that separates level outliers from jump outliers.
  *
  * Scale posture (the DetKMeans posture): ONE bounded driver-side
  * collect — a TakeOrdered of `sampleCap` rows by hash (default 4096,
  * the same bound as DetKMeans' init sample) — then the forest
  * (≤ trees·2ψ tiny nodes) rides the task closure into a MAP-ONLY
  * scoring pass. No per-row UDF, no iterative job: one window for the
  * delta feature, one broadcast-sized collect, one map. */
object IsolationForest {

  /** Binary isolation tree; leaves carry the node size for the c(m)
    * path-length adjustment. */
  sealed trait Tree
  final case class Split(feat: Int, at: Double, lo: Tree, hi: Tree)
    extends Tree
  final case class Leaf(size: Int) extends Tree

  /** Average unsuccessful-search path length in a BST of m nodes
    * (paper eq. 1; sklearn's convention for m ≤ 2). */
  def cFactor(m: Int): Double =
    if (m <= 1) 0.0
    else if (m == 2) 1.0
    else 2.0 * (math.log(m - 1.0) + 0.5772156649015329) -
      2.0 * (m - 1.0) / m

  /** Engine-portable MCG id hash (the q_sample primitive). */
  private def mcg(id: Long): Long =
    ((id % 2147483646L) + 1L) * 48271L % 2147483647L

  /** Park–Miller MINSTD stream for split choices. */
  private final class Minstd(seed: Long) {
    private var s: Long = (seed % 2147483646L) + 1L
    def nextDouble(): Double = {
      s = s * 48271L % 2147483647L
      s.toDouble / 2147483647.0
    }
    def nextInt(n: Int): Int = (nextDouble() * n).toInt min (n - 1)
  }

  private def buildTree(pts: Array[Array[Double]], rng: Minstd,
                        depth: Int, maxDepth: Int): Tree = {
    if (pts.length <= 1 || depth >= maxDepth) Leaf(pts.length)
    else {
      val d = pts(0).length
      // try features in a rotated deterministic order until one has
      // spread (an all-constant node is a leaf)
      val start = rng.nextInt(d)
      var feat = -1
      var lo = 0.0; var hi = 0.0
      var k = 0
      while (k < d && feat < 0) {
        val f = (start + k) % d
        var mn = pts(0)(f); var mx = pts(0)(f)
        var i = 1
        while (i < pts.length) {
          val v = pts(i)(f)
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        if (mx > mn) { feat = f; lo = mn; hi = mx }
        k += 1
      }
      if (feat < 0) Leaf(pts.length)
      else {
        val at = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = pts.partition(_(feat) < at)
        if (l.isEmpty || r.isEmpty) Leaf(pts.length)
        else Split(feat, at,
          buildTree(l, rng, depth + 1, maxDepth),
          buildTree(r, rng, depth + 1, maxDepth))
      }
    }
  }

  /** Path length of x in one tree (leaf depth + c(leaf size)). */
  def pathLength(t: Tree, x: Array[Double]): Double = {
    var node = t
    var depth = 0.0
    while (true) {
      node match {
        case Leaf(sz) => return depth + cFactor(sz)
        case Split(f, at, lo, hi) =>
          node = if (x(f) < at) lo else hi
          depth += 1.0
      }
    }
    depth // unreachable
  }

  /** Deterministic forest over (id, features) rows. Exposed for the
    * spec's independent path-length recompute. */
  def buildForest(sample: Array[(Long, Array[Double])], trees: Int,
                  psi: Int): Array[Tree] = {
    val maxDepth = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
    Array.tabulate(trees) { t =>
      // per-tree subsample: rotate the hash with the tree index so the
      // trees see (deterministically) different ψ-subsets
      val sub = sample
        .sortBy { case (id, _) => (mcg(id * 31L + t + 1L), id) }
        .take(psi).map(_._2)
      buildTree(sub, new Minstd(1000003L * (t + 1L)), 0, maxDepth)
    }
  }

  /** Returns (series, ts, value, if_score, is_anomaly). `idCol` must
    * be a unique long id (the sampling + per-tree rotation basis). */
  def score(df: DataFrame, idCol: String, series: String, ts: String,
            value: String, trees: Int = 100, psi: Int = 256,
            sampleCap: Int = 4096, threshold: Double = 0.6): DataFrame = {
    require(trees > 0 && psi > 1, "need trees > 0 and psi > 1")
    val spark = df.sparkSession
    import spark.implicits._
    // Grouped.pin BEFORE the Δ-feature window: the pinned exchange
    // serves the window AND keeps the per-row forest scoring map (100
    // tree traversals per row, CPU-bound over tiny shuffle bytes) at
    // full core parallelism
    val feat = graft.core.Grouped.pin(
        df.select(col(idCol).cast("long").as("id"),
          col(series).cast("string").as("sk"),
          col(ts).cast("timestamp").as("ts"),
          col(value).cast("double").as("value")), Seq("sk"))
      .withColumn("delta",
        col("value") - coalesce(lag(col("value"), 1).over(
          Window.partitionBy("sk").orderBy("ts")), col("value")))
    // ONE bounded driver collect: TakeOrdered by the portable hash
    val sample = feat
      .withColumn("__h", ((col("id") % 2147483646L) + 1L) * 48271L
        % 2147483647L)
      .orderBy(col("__h"), col("id"))
      .limit(sampleCap)
      .select(col("id"), col("value"), col("delta"))
      .collect()
      .map(r => (r.getLong(0), Array(r.getDouble(1), r.getDouble(2))))
    // guard the EFFECTIVE psi, not just the parameter: with <= 1
    // sampled rows cFactor(psi) = 0 and every score would be
    // 2^(-e/0) = NaN — fail loudly instead
    require(sample.length >= 2,
      s"isolation forest needs >= 2 rows to sample, got ${sample.length}")
    val forest = buildForest(sample, trees, math.min(psi, sample.length))
    val cPsi = cFactor(math.min(psi, sample.length))
    val nTrees = forest.length
    feat.select(col("sk"), col("ts"), col("value"), col("delta"))
      .as[(String, java.sql.Timestamp, Double, Double)]
      .map { case (sk, t, v, dlt) =>
        val x = Array(v, dlt)
        var sum = 0.0
        var i = 0
        while (i < nTrees) { sum += pathLength(forest(i), x); i += 1 }
        val e = sum / nTrees
        val s = math.pow(2.0, -e / cPsi)
        (sk, t, v, s, if (s >= threshold) 1 else 0)
      }
      .toDF("sk", "ts", "value", "if_score", "is_anomaly")
      .withColumnRenamed("sk", series)
  }
}
