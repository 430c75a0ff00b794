package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.SeriesOps

/** M1 `stl_lite`: fully-relational seasonal-trend decomposition
  * (SURVEY.md §2.9 M1 Option B). The reference uses statsmodels' loess
  * STL (`src/utils.py:5-29`, robust=True, period=48); this variant is the
  * classical-decomposition analogue that stays inside Catalyst and scales
  * horizontally:
  *
  *   trend_t    = centered mean of value over ±(period/2) rows
  *   seasonal_p = mean(value - trend) per phase p = (rn-1) % period,
  *                centered so the seasonal component sums to ~0
  *   resid_t    = value - trend_t - seasonal_t
  *
  * `robust = true` swaps means for medians (the loess-robustness
  * capability mapped to relational primitives). The exact loess STL lives
  * in `StlExact` (per-series mapGroups) for golden parity.
  */
object StlLite {

  def decompose(df: DataFrame, series: String, ts: String, value: String,
                period: Int, robust: Boolean = false): DataFrame = {
    val half = period / 2
    val frame = SeriesOps.bySeries(series, ts).rowsBetween(-half, half)
    // rolling MEDIAN: Spark rejects a window frame on median() itself
    // (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC — a latent bug in this
    // path until S-H-ESD exercised it), so the robust trend collects
    // the frame and takes the array median
    val trendAgg =
      if (robust) {
        val w = array_sort(collect_list(col(value)).over(frame))
        val n = size(w)
        val mid = floor((n + lit(1)) / lit(2)).cast("int")
        val lo = floor(n / lit(2)).cast("int")
        when(n % 2 === 1, element_at(w, mid))
          .otherwise((element_at(w, lo) +
            element_at(w, lo + 1)) / lit(2.0))
      } else avg(col(value)).over(frame)
    // pin the series partitioning up front (Grouped.pin): the rolling
    // trend windows below are CPU-heavy per row (robust mode sorts a
    // ±half frame per point) over a BYTE-tiny shuffle, exactly the
    // shape AQE's byte-based coalescing starves; the one pinned
    // exchange serves every window and the phase aggregate
    val base = SeriesOps.withRowNumber(
        graft.core.Grouped.pin(df, Seq(series)), series, ts)
      .withColumn("trend", trendAgg)
      .withColumn("__phase", (col("rn") - 1) % period)
      .withColumn("__detr", col(value) - col("trend"))
    val seasAgg = if (robust) median(col("__detr")) else avg(col("__detr"))
    val seas = base.groupBy(col(series), col("__phase"))
      .agg(seasAgg.as("__sraw"))
    val seasCentered = seas
      .withColumn("seasonal",
        col("__sraw") - avg("__sraw").over(Window.partitionBy(series)))
      .drop("__sraw")
    base.join(broadcast(seasCentered), Seq(series, "__phase"))
      .withColumn("resid", col(value) - col("trend") - col("seasonal"))
      .drop("__phase", "__detr")
  }
}
