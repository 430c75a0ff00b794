package graft.models

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1 exact mode: per-series STL (Cleveland et al. 1990) with loess
  * smoothers — the reference uses statsmodels `STL(series, period,
  * robust=True)` (`src/utils.py:5-29`). This is an independent Scala
  * implementation of the published algorithm: cycle-subseries loess for
  * the seasonal, loess of the deseasonalized series for the trend, inner
  * loop iterations, optional bisquare robustness weights.
  *
  * Exactness note (SURVEY §7.4(3)): statsmodels parity is to published-
  * algorithm tolerance, not bit-for-bit (loess span defaults differ);
  * `StlLite` remains the fully-relational scale path.
  *
  * Scale: mapGroups per series like M2/M3 — bounded series, parallel
  * across series.
  */
object StlExact {

  case class Out(series_id: String, ts: Timestamp, value: Double,
                 trend: Double, seasonal: Double, resid: Double)

  /** Local linear loess at every index of a regular grid. `span` is the
    * window size in points; `rw` robustness weights (null = none). */
  private[models] def loess(ys: Array[Double], span: Int,
                            rw: Array[Double] = null): Array[Double] = {
    val n = ys.length
    val q = math.max(math.min(span, n), 2)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = math.max(0, math.min(i - q / 2, n - q))
      val hi = lo + q - 1
      val dMax = math.max(math.abs(i - lo), math.abs(hi - i)).toDouble
      // weighted linear regression on [lo, hi]; if every robustness
      // weight in the window is zero (a fully-downweighted subseries),
      // retry with plain tricube — falling back to the RAW value would
      // pass outliers straight through the smoother
      var useRw = rw != null
      var fitted = 0.0
      var done = false
      while (!done) {
        var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0
        var swxy = 0.0
        var j = lo
        while (j <= hi) {
          val d = math.abs(j - i) / math.max(dMax, 1e-9)
          var wgt = if (d >= 1) 0.0 else math.pow(1 - d * d * d, 3)
          if (useRw) wgt *= rw(j)
          if (wgt > 0) {
            val x = (j - i).toDouble
            sw += wgt; swx += wgt * x; swy += wgt * ys(j)
            swxx += wgt * x * x; swxy += wgt * x * ys(j)
          }
          j += 1
        }
        if (sw <= 0 && useRw) { useRw = false } // retry unweighted
        else {
          val det = sw * swxx - swx * swx
          fitted =
            if (sw <= 0) ys(i)
            else if (math.abs(det) < 1e-12) swy / sw
            else {
              val b = (sw * swxy - swx * swy) / det
              (swy - b * swx) / sw // x = 0 at the target point
            }
          done = true
        }
      }
      out(i) = fitted
      i += 1
    }
    out
  }

  /** STL decomposition of one series. */
  private[models] def stl(ys: Array[Double], period: Int,
                          seasonalSpan: Int = 7, innerIters: Int = 2,
                          robustIters: Int = 1): (Array[Double],
      Array[Double]) = {
    val n = ys.length
    var trend = Array.fill(n)(0.0)
    var seasonal = Array.fill(n)(0.0)
    var rw: Array[Double] = null
    val trendSpan = (1.5 * period / (1 - 1.5 / seasonalSpan)).toInt | 1
    var outer = 0
    while (outer <= robustIters) {
      var inner = 0
      while (inner < innerIters) {
        // 1. detrend
        val detr = Array.tabulate(n)(i => ys(i) - trend(i))
        // 2. cycle-subseries loess smoothing
        val newSeasonal = new Array[Double](n)
        var ph = 0
        while (ph < period) {
          val idx = (ph until n by period).toArray
          val sub = idx.map(detr)
          val subRw = if (rw == null) null else idx.map(rw)
          val smooth = loess(sub, seasonalSpan, subRw)
          var k = 0
          while (k < idx.length) { newSeasonal(idx(k)) = smooth(k); k += 1 }
          ph += 1
        }
        // 3. center the seasonal with a moving-average low-pass
        val lp = movingAvg(movingAvg(movingAvg(newSeasonal, period),
          period), 3)
        var i = 0
        while (i < n) { seasonal(i) = newSeasonal(i) - lp(i); i += 1 }
        // 4. trend from deseasonalized
        val deseas = Array.tabulate(n)(i => ys(i) - seasonal(i))
        trend = loess(deseas, trendSpan, rw)
        inner += 1
      }
      // robustness weights from residuals (bisquare)
      if (outer < robustIters) {
        val resid = Array.tabulate(n)(i => ys(i) - trend(i) - seasonal(i))
        val absR = resid.map(math.abs).sorted
        val h = 6 * (absR(n / 2) max 1e-9)
        rw = resid.map { r =>
          val u = math.abs(r) / h
          if (u >= 1) 0.0 else math.pow(1 - u * u, 2)
        }
      }
      outer += 1
    }
    (trend, seasonal)
  }

  private def movingAvg(xs: Array[Double], w: Int): Array[Double] = {
    val n = xs.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - w / 2)
      val hi = math.min(n - 1, i + w / 2)
      var s = 0.0
      var j = lo
      while (j <= hi) { s += xs(j); j += 1 }
      out(i) = s / (hi - lo + 1)
      i += 1
    }
    out
  }

  def decompose(df: DataFrame, series: String, ts: String, value: String,
                period: Int, robust: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(series).cast("string"), col(ts), col(value))
      .as[(String, Timestamp, Double)]
    typed.groupByKey(_._1).flatMapGroups { (sid, it) =>
      val rows = it.toArray.sortBy(_._2.getTime)
      val ys = rows.map(_._3)
      if (ys.length < 2 * period) Iterator.empty
      else {
        val (trend, seasonal) = stl(ys, period,
          robustIters = if (robust) 1 else 0)
        rows.indices.iterator.map { i =>
          Out(sid, rows(i)._2, ys(i), trend(i), seasonal(i),
            ys(i) - trend(i) - seasonal(i))
        }
      }
    }.toDF()
  }
}
