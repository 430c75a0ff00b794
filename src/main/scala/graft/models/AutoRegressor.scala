package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SeriesOps

/** M5: learned autoregressor on a trailing lag window — the capability
  * mapping of the reference's LSTM point forecaster
  * (`src/lstm_model.py:18-91`: seq_len-lag window → next-value forecast →
  * residual scoring). MLlib has no LSTM; the query semantics ("nonlinear
  * autoregressor on 48 lags") is served by a ridge ARX on the lag
  * features (default), or `GBTRegressor` for the nonlinear capability
  * per SURVEY §2.9. Documented substitution per SURVEY §2.9 M5. The
  * reference trains on STL residuals, not raw values
  * (`run_lstm.py:31-44`) — callers compose that via
  * `Pipelines.runAutoRegressor(onStlResiduals = true)`.
  *
  * The ridge fit is PER SERIES — the reference trains one model per
  * `file_key` (`run_lstm.py:21`), and a per-series fit is what makes the
  * result deterministic: each series' normal equations are accumulated
  * in timestamp order inside one `mapGroups` task, so the solution is
  * identical for any partitioning (MLlib's distributed solve reduces
  * float partials in partition order and hash-mismatched the fixture
  * oracle — the round-7 `no_oracle` gap this closes). The objective is
  * glmnet-style ridge on standardized features:
  * `1/(2n)·||y − Xβ||² + λ/2·||γ||²` with γ the standardized-space
  * coefficients and λ = `regParam`; zero-variance lags drop out (γ=0).
  *
  * Scale: lag features are one window pass (W4); each fit is
  * O(n·p² + p³) on its own executor, parallel ACROSS series — the same
  * shape as M2-M6 (a 100 TB corpus is many series, not one giant one).
  * Scoring joins the tiny (series → p+1 doubles) fit table back
  * broadcast and evaluates the dot product as a codegen'd column
  * expression. `regressor = "gbt"` keeps the MLlib Pipeline (one global
  * tree ensemble; nondeterministic reduction order documented there).
  */
object AutoRegressor {

  // public: Catalyst's generated (de)serializers instantiate these
  case class ArRow(sk: String, ord: Long, y: Double,
                   lags: Seq[Double], train: Boolean)
  case class ArFit(sk: String, __ar_coefs: Seq[Double],
                   __ar_intercept: Double)

  /** If `df` already carries a `split` column it is REUSED (so the
    * train boundary is the caller's full-series fraction, matching the
    * reference's `int(n * train_frac)` over the undropped series);
    * otherwise a fractional split over the lag-complete rows is made. */
  def run(df: DataFrame, series: String, ts: String, value: String,
          seqLen: Int = 48, trainFrac: Double = 0.5,
          regressor: String = "ridge"): DataFrame = {
    val lags = 1 to seqLen
    // Grouped.pin: one pinned exchange serves the lag windows, the
    // split window, and the broadcast-scored projection — all
    // series-clustered, CPU-heavy over tiny shuffle bytes
    val withLags = SeriesOps.withLags(
      graft.core.Grouped.pin(df, Seq(series)), series, ts, value, lags)
    val lagCols = lags.map(k => s"${value}_lag$k")
    val complete = withLags.na.drop(lagCols)
    val split =
      if (complete.columns.contains("split")) complete
      else SeriesOps.withSplit(complete, series, ts, trainFrac)
    val scored = regressor match {
      case "gbt" => runGbt(split, value, lagCols)
      case _     => runRidge(split, series, ts, value, lagCols)
    }
    scored
      .withColumn("resid", col(value) - col("pred_mean"))
      .drop(lagCols: _*)
  }

  /** Per-series closed-form ridge: group → sort by timestamp →
    * accumulate X'X, X'y in that fixed order → Breeze solve. */
  private def runRidge(split: DataFrame, series: String, ts: String,
                       value: String, lagCols: Seq[String],
                       regParam: Double = 1e-3): DataFrame = {
    val spark = split.sparkSession
    import spark.implicits._
    val lagArr = array(lagCols.map(col): _*)
    val rows = split.select(
        col(series).cast("string").as("sk"),
        unix_micros(col(ts).cast("timestamp")).as("ord"),
        col(value).cast("double").as("y"),
        lagArr.as("lags"),
        (col("split") === "Train").as("train"))
      .as[ArRow]
    val fits = graft.core.Grouped.pinned[String, ArRow](rows, col("sk"))
      .mapGroups { (k, it) =>
      // content-total order: duplicate (timestamp, value) rows with
      // different lag vectors would otherwise leave the normal-equation
      // accumulation order partition-dependent, voiding bit-determinism
      val train = it.filter(_.train).toArray.sortWith { (a, b) =>
        if (a.ord != b.ord) a.ord < b.ord
        else if (a.y != b.y) a.y < b.y
        else lexLt(a.lags, b.lags)
      }
      if (train.isEmpty) ArFit(k, Nil, Double.NaN)
      else { val cs = fitOne(train); ArFit(k, cs.init, cs.last) }
    }.toDF()
    // fit table is |series| rows of p+1 doubles — always broadcast-able
    split.withColumn("__sk", col(series).cast("string"))
      .join(broadcast(fits), col("__sk") === fits("sk"), "left")
      .withColumn("pred_mean",
        when(col("__ar_intercept").isNotNull &&
             !isnan(col("__ar_intercept")),
          col("__ar_intercept") +
            aggregate(zip_with(lagArr, col("__ar_coefs"), (a, b) => a * b),
              lit(0.0), (acc, x) => acc + x)))
      .drop("__sk", "sk", "__ar_coefs", "__ar_intercept")
  }

  /** Ridge on one series' training rows (already in timestamp order):
    * standardize features, center the label, solve
    * `(Xs'Xs/n + λI)γ = Xs'yc/n`, map back to raw-space coefficients.
    * Returns p coefficients :+ intercept. */
  private def fitOne(train: Array[ArRow],
                     regParam: Double = 1e-3): Seq[Double] = {
    val n = train.length
    val p = train(0).lags.length
    val mu = new Array[Double](p)
    val m2 = new Array[Double](p)
    var ySum = 0.0
    train.foreach { r =>
      ySum += r.y
      var j = 0
      while (j < p) { mu(j) += r.lags(j); m2(j) += r.lags(j) * r.lags(j); j += 1 }
    }
    val yBar = ySum / n
    val sInv = new Array[Double](p)
    var j = 0
    while (j < p) {
      mu(j) /= n
      val v = m2(j) / n - mu(j) * mu(j)
      sInv(j) = if (v > 0) 1.0 / math.sqrt(v) else 0.0 // constant lag → γ=0
      j += 1
    }
    val xtx = DenseMatrix.zeros[Double](p, p)
    val xty = DenseVector.zeros[Double](p)
    val xs = new Array[Double](p)
    train.foreach { r =>
      var a = 0
      while (a < p) { xs(a) = (r.lags(a) - mu(a)) * sInv(a); a += 1 }
      val yc = r.y - yBar
      a = 0
      while (a < p) {
        xty(a) += xs(a) * yc
        var b = a
        while (b < p) { xtx(a, b) += xs(a) * xs(b); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < p) {
      var b = a
      while (b < p) {
        val v = xtx(a, b) / n + (if (a == b) regParam else 0.0)
        xtx(a, b) = v; xtx(b, a) = v; b += 1
      }
      xty(a) /= n; a += 1
    }
    val gamma = xtx \ xty
    val beta = (0 until p).map(i => gamma(i) * sInv(i))
    val intercept = yBar - (0 until p).map(i => beta(i) * mu(i)).sum
    beta :+ intercept
  }

  /** Nonlinear option: one global MLlib tree ensemble (capability twin
    * of the LSTM's nonlinearity). Tree split-finding reduces float
    * partials in partition order — deliberately NOT fixture-oracled. */
  private def runGbt(split: DataFrame, value: String,
                     lagCols: Seq[String]): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(lagCols.toArray).setOutputCol("features")
    val reg = new GBTRegressor()
      .setFeaturesCol("features").setLabelCol(value)
      .setPredictionCol("pred_mean")
      .setMaxIter(20).setMaxDepth(5).setSeed(7)
    val pipeline = new Pipeline().setStages(Array(assembler, reg))
    val model = pipeline.fit(split.filter(col("split") === "Train"))
    model.transform(split).drop("features")
  }

  private def lexLt(a: Seq[Double], b: Seq[Double]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }
}
