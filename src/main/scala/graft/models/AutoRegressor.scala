package graft.models

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SeriesOps

/** M5: learned autoregressor on a trailing lag window — the capability
  * mapping of the reference's LSTM point forecaster
  * (`src/lstm_model.py:18-91`: seq_len-lag window → next-value forecast →
  * residual scoring). MLlib has no LSTM; the query semantics ("nonlinear
  * autoregressor on 48 lags") is served by an ML Pipeline
  * (VectorAssembler → ridge `LinearRegression` ARX, or `GBTRegressor`
  * for the nonlinear capability per SURVEY §2.9). Documented
  * substitution per SURVEY §2.9 M5. The reference trains on STL
  * residuals, not raw values (`run_lstm.py:31-44`) — callers compose
  * that via `Pipelines.runAutoRegressor(onStlResiduals = true)`.
  *
  * Scale: lag features are one window pass (W4); fit is a distributed
  * MLlib solve; scoring is a codegen'd transform. One GLOBAL model over
  * all series (per-series models at 100 TB would be a mapGroups fit like
  * M2 — both paths share this feature layout).
  */
object AutoRegressor {

  /** If `df` already carries a `split` column it is REUSED (so the
    * train boundary is the caller's full-series fraction, matching the
    * reference's `int(n * train_frac)` over the undropped series);
    * otherwise a fractional split over the lag-complete rows is made. */
  def run(df: DataFrame, series: String, ts: String, value: String,
          seqLen: Int = 48, trainFrac: Double = 0.5,
          regressor: String = "ridge"): DataFrame = {
    val lags = 1 to seqLen
    val withLags = SeriesOps.withLags(df, series, ts, value, lags)
    val lagCols = lags.map(k => s"${value}_lag$k")
    val complete = withLags.na.drop(lagCols)
    val split =
      if (complete.columns.contains("split")) complete
      else SeriesOps.withSplit(complete, series, ts, trainFrac)
    val assembler = new VectorAssembler()
      .setInputCols(lagCols.toArray).setOutputCol("features")
    val reg = regressor match {
      case "gbt" => new GBTRegressor()
        .setFeaturesCol("features").setLabelCol(value)
        .setPredictionCol("pred_mean")
        .setMaxIter(20).setMaxDepth(5).setSeed(7)
      case _ => new LinearRegression()
        .setFeaturesCol("features").setLabelCol(value)
        .setPredictionCol("pred_mean")
        .setRegParam(1e-3).setElasticNetParam(0.0).setSolver("normal")
    }
    val pipeline = new Pipeline().setStages(Array(assembler, reg))
    val model = pipeline.fit(split.filter(col("split") === "Train"))
    model.transform(split)
      .withColumn("resid", col(value) - col("pred_mean"))
      .drop("features")
      .drop(lagCols: _*)
  }
}
