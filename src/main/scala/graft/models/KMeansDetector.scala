package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SeriesOps

/** Clustering-based anomaly scorer (the BASELINE north-star's "MLlib
  * clustering" approach): embed each point as (value, lag_1..lag_m),
  * standardize on the train split, fit k-means on it, score every
  * point by the Euclidean distance to its nearest centroid — large
  * distance = anomalous.
  *
  * Deterministic since round 8: both the standardization moments and
  * the k-means fit ride [[DetKMeans]]' fixed-shape reductions, so the
  * output (including the discrete `cluster` column) is bit-identical
  * for any partitioning and `q_kmeans` carries a fixture oracle —
  * MLlib's StandardScaler+KMeans merged float partials in
  * shuffle-arrival order and could flip near-boundary assignments
  * between runs. Scoring is a codegen'd column expression
  * (d² = v·v − 2·v·c + c·c over literal centroids, native `vec_dot`).
  */
object KMeansDetector {

  def run(df: DataFrame, series: String, ts: String, value: String,
          lags: Int = 4, k: Int = 8, trainFrac: Double = 0.5,
          seed: Long = 42L): DataFrame = {
    // Grouped.pin: lag/split windows and the per-row centroid scoring
    // all ride one pinned series exchange (moments/fit are fixed-shape
    // ordered reductions — partitioning cannot change the floats)
    val lagged = SeriesOps.withLags(
      graft.core.Grouped.pin(df, Seq(series)), series, ts, value, 1 to lags)
    val lagCols = (1 to lags).map(i => s"${value}_lag$i")
    val complete = lagged.na.drop(lagCols)
    val split = SeriesOps.withSplit(complete, series, ts, trainFrac)
    val featCols = (value +: lagCols).map(c => col(c).cast("double"))
    val withVec = split
      .withColumn("__rawf", array(featCols: _*))
      .withColumn("__ord", xxhash64(col(series).cast("string"), col(ts)))
    val train = withVec.filter(col("split") === "Train")
    // standardize with train moments (sample std, zero-variance → 0)
    val (n, sums, sqs) = DetKMeans.moments(train, "__rawf", "__ord")
    val mu = sums.map(_ / n)
    val inv = mu.indices.map { j =>
      val v = (sqs(j) - n * mu(j) * mu(j)) / (n - 1)
      if (v > 0) 1.0 / math.sqrt(v) else 0.0
    }
    val scaled = array(mu.indices.map(j =>
      (element_at(col("__rawf"), j + 1) - lit(mu(j))) * lit(inv(j))): _*)
    val withScaled = withVec.withColumn("__scaled", scaled)
    val model = DetKMeans.fit(
      withScaled.filter(col("split") === "Train"), "__scaled", "__ord",
      k, maxIter = 10, seed = seed)
    withScaled
      .withColumn("cluster", model.assignExpr(col("__scaled")))
      .withColumn("km_score", sqrt(greatest(
        model.dist2Expr(col("__scaled"), col("cluster")), lit(0.0))))
      .drop("__rawf", "__scaled", "__ord")
      .drop(lagCols: _*)
  }
}
