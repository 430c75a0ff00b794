package graft.models

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SeriesOps

/** Clustering-based anomaly scorer (the BASELINE north-star's "MLlib
  * clustering" approach): embed each point as (value, lag_1..lag_m),
  * fit KMeans on the train split, score every point by the Euclidean
  * distance to its nearest centroid — large distance = anomalous.
  *
  * Fully distributed: lag features are one window pass, KMeans is
  * MLlib's parallel Lloyd's, scoring is a deterministic model transform.
  * Seeded for reproducibility.
  */
object KMeansDetector {

  def run(df: DataFrame, series: String, ts: String, value: String,
          lags: Int = 4, k: Int = 8, trainFrac: Double = 0.5,
          seed: Long = 42L): DataFrame = {
    val lagged = SeriesOps.withLags(df, series, ts, value, 1 to lags)
    val lagCols = (1 to lags).map(i => s"${value}_lag$i")
    val complete = lagged.na.drop(lagCols)
    val split = SeriesOps.withSplit(complete, series, ts, trainFrac)
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols((value +: lagCols).toArray)
        .setOutputCol("__feat"),
      new StandardScaler().setInputCol("__feat").setOutputCol("__scaled")
        .setWithMean(true).setWithStd(true),
      new KMeans().setK(k).setSeed(seed).setFeaturesCol("__scaled")
        .setMaxIter(10).setTol(1e-3)
        .setPredictionCol("cluster")))
    val model = pipeline.fit(split.filter(col("split") === "Train"))
    val kmeans = model.stages.last
      .asInstanceOf[org.apache.spark.ml.clustering.KMeansModel]
    val centers = kmeans.clusterCenters
    // UDF-free distance: d^2 = v.v - 2 v.c + c.c with the centroid as a
    // literal array and the native vec_dot expression (codegen'd)
    if (!df.sparkSession.catalog.functionExists("vec_dot"))
      graft.functions.VecDot.register(df.sparkSession)
    import org.apache.spark.ml.functions.vector_to_array
    val varr = vector_to_array(col("__scaled"))
    val vv = call_function("vec_dot", varr, varr)
    val d2 = centers.zipWithIndex.map { case (c, i) =>
      val cArr = typedlit(c.toArray)
      val vc = call_function("vec_dot", varr, cArr)
      val cc = c.toArray.map(x => x * x).sum
      (i, vv - lit(2.0) * vc + lit(cc))
    }.foldLeft(lit(Double.NaN)) { case (acc, (i, expr)) =>
      when(col("cluster") === i, expr).otherwise(acc)
    }
    model.transform(split)
      .withColumn("km_score", sqrt(greatest(d2, lit(0.0))))
      .drop("__feat", "__scaled")
      .drop(lagCols: _*)
  }
}
