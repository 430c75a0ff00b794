package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Additive Holt–Winters (triple exponential smoothing, Winters 1960)
  * one-step-ahead forecaster — the classic cheap seasonal baseline a
  * detector suite carries next to STL/Kalman/BSTS: O(1) state per
  * step, no fitting pass, residual = value − forecast feeds the same
  * threshold/persistence tail as every other detector here.
  *
  *   ŷ_t = l + b + s_{t mod m}
  *   l' = α(y − s) + (1−α)(l + b)
  *   b' = β(l' − l) + (1−β) b
  *   s' = γ(y − l') + (1−γ) s
  *
  * Initialization is the standard two-cycle recipe: l₀ = mean of the
  * first season, b₀ = (mean of season 2 − mean of season 1)/m,
  * s_i = y_i − l₀ over the first season; the first 2m points emit
  * their forecasts from this warm-up state. Series shorter than 2m
  * are DROPPED from the output (the S-H-ESD / matrix-profile
  * short-series convention in this module — callers needing them
  * length-filter upstream). The recursion runs PER SERIES in ts order
  * inside `mapGroups` — deterministic for any partitioning, fixture-
  * oracle-safe, parallel across series (the M2-M6 scale shape). */
object HoltWinters {

  case class HwRow(sk: String, ord: Long, ts: java.sql.Timestamp,
                   value: Double)
  case class HwOut(sk: String, ts: java.sql.Timestamp, value: Double,
                   hw_pred: Double, hw_resid: Double)

  /** Driver-free per-series recursion; returns (series, ts, value,
    * hw_pred, hw_resid). */
  def forecast(df: DataFrame, series: String, ts: String, value: String,
               period: Int, alpha: Double = 0.2, beta: Double = 0.1,
               gamma: Double = 0.3): DataFrame = {
    require(period >= 2, s"period=$period must be >= 2")
    require(Seq(alpha, beta, gamma).forall(p => p > 0 && p < 1),
      "smoothing parameters must be in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    // Grouped.pin BEFORE the ordinal window: the one pinned exchange
    // serves the window AND the column-keyed grouping below (zero
    // further exchanges), so the per-series fit keeps full parallelism
    // however small the shuffle bytes are
    val typed = graft.core.SeriesOps.withRowNumber(
        graft.core.Grouped.pin(
          df.select(col(series).cast("string").as("sk"),
            col(ts).cast("timestamp").as("ts"),
            col(value).cast("double").as("value")), Seq("sk")),
        "sk", "ts", "ord")
      .withColumn("ord", col("ord").cast("long"))
      .select(col("sk"), col("ord"), col("ts"), col("value"))
      .as[HwRow]
    graft.core.Grouped.keyed[String, HwRow](typed, col("sk"))
      .flatMapGroups { (sk: String, it: Iterator[HwRow]) =>
        val rows = it.toArray.sortBy(_.ord)
        val n = rows.length
        val m = period
        if (n < 2 * m) Iterator.empty
        else {
          val y = rows.map(_.value)
          val mean1 = y.slice(0, m).sum / m
          val mean2 = y.slice(m, 2 * m).sum / m
          var l = mean1
          var b = (mean2 - mean1) / m
          val s = Array.tabulate(m)(i => y(i) - mean1)
          rows.iterator.zipWithIndex.map { case (r, t) =>
            val si = t % m
            val pred = l + b + s(si)
            val resid = r.value - pred
            val lNew = alpha * (r.value - s(si)) + (1 - alpha) * (l + b)
            b = beta * (lNew - l) + (1 - beta) * b
            s(si) = gamma * (r.value - lNew) + (1 - gamma) * s(si)
            l = lNew
            HwOut(sk, r.ts, r.value, pred, resid)
          }
        }
      }
      .toDF("sk", "ts", "value", "hw_pred", "hw_resid")
      .withColumnRenamed("sk", series)
  }
}
