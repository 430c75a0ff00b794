package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecast-accuracy metrics (Hyndman & Koehler 2006, "Another look
  * at measures of forecast accuracy") — the evaluation face of the
  * forecasting tier (Holt–Winters / Kalman / AR), sibling to the
  * detection metrics (A5-A11): a detector suite that ships forecasts
  * needs the scale-free accuracy scores next to the F1s.
  *
  * Per series over a (value, pred, resid) frame:
  *  - RMSE  = sqrt(mean(resid²))
  *  - sMAPE = mean(2·|resid| / (|y| + |ŷ|))  (the symmetric MAPE, as
  *    a fraction; the |y|+|ŷ|=0 points are excluded as undefined)
  *  - MASE  = mean(|resid|) / mean(|y_t − y_{t−m}|): the in-sample
  *    seasonal-naive denominator makes it scale-free AND defined when
  *    y crosses zero (the failure mode MAPE is famous for)
  *
  * One window pass for the seasonal-naive lag + one aggregate — both
  * keyed on the series, so the whole operator is two exchanges that
  * Catalyst co-partitions. */
object Forecast {

  /** Returns (series, n, rmse, smape, mase); metrics NOT rounded here
    * (callers round at the query boundary). `m` is the seasonal-naive
    * lag for the MASE denominator. Series whose naive denominator is
    * empty or zero (shorter than m+1, or m-periodic-constant) get a
    * null MASE rather than a division artifact. */
  def accuracy(df: DataFrame, series: String, ts: String, value: String,
               pred: String, resid: String, m: Int): DataFrame = {
    require(m >= 1, s"m=$m must be >= 1")
    val w = Window.partitionBy(series).orderBy(ts)
    val base = df.withColumn("__naive",
      abs(col(value) - lag(col(value), m).over(w)))
    base.groupBy(series)
      .agg(
        count(lit(1)).as("n"),
        sqrt(avg(col(resid) * col(resid))).as("rmse"),
        avg(when(abs(col(value)) + abs(col(pred)) > 0,
          lit(2.0) * abs(col(resid)) /
            (abs(col(value)) + abs(col(pred))))).as("smape"),
        (avg(abs(col(resid))) /
          when(avg(col("__naive")) > 0, avg(col("__naive")))).as("mase"))
  }
}
