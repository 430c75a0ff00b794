package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the detector DAG (SURVEY §2.10 —
  * additive capability; the reference is batch-only but BOCPD/Kalman are
  * algorithmically online).
  *
  * Documented semantic delta: the reference's windows are ROW-count
  * frames; streaming windows are TIME-based. On the regular NAB grids
  * 48 rows ≡ 24 h (README.md:31), so the translation is exact there.
  */
object StreamingDetect {

  /** W7 streaming analogue: collapse flagged points into anomaly events
    * with `session_window` — events close when no flagged point arrives
    * within `gapDuration`. Works identically on batch DataFrames. */
  def sessionEvents(flagged: DataFrame, series: String, ts: String,
                    flag: String, gapDuration: String,
                    watermark: String = "1 hour"): DataFrame = {
    val src =
      if (flagged.isStreaming) flagged.withWatermark(ts, watermark)
      else flagged
    src.filter(col(flag) === 1)
      .groupBy(col(series), session_window(col(ts), gapDuration))
      .agg(count(lit(1)).as("n_points"),
        min(ts).as("start_ts"), max(ts).as("end_ts"))
      .select(col(series), col("start_ts"), col("end_ts"), col("n_points"))
  }

  /** W1 streaming analogue: sliding time-window mean/std per series with
    * a watermark for state cleanup. */
  def rollingStats(df: DataFrame, series: String, ts: String, value: String,
                   windowDuration: String, slideDuration: String,
                   watermark: String = "1 hour"): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(ts, watermark) else df
    src.groupBy(col(series), window(col(ts), windowDuration, slideDuration))
      .agg(avg(col(value)).as("roll_mean"),
        stddev_samp(col(value)).as("roll_std"),
        count(lit(1)).as("n"))
      .select(col(series), col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("roll_mean"), col("roll_std"), col("n"))
  }

  // ---- M2 streaming: Kalman local level with explicit state ----------

  case class Point(series_id: String, ts: Timestamp, value: Double)
  case class KalmanState(level: Double, p: Double, initialized: Boolean)
  case class KalmanOut(series_id: String, ts: Timestamp, value: Double,
                       pred_mean: Double, pred_std: Double, resid: Double)

  /** Stateful one-step-ahead Kalman filter: state = (level, variance)
    * carried across micro-batches; q/h are fixed (fit offline via
    * KalmanLocalLevel.fit — the batch/stream split of SURVEY M2). */
  def statefulKalman(points: Dataset[Point], q: Double, h: Double)
      : Dataset[KalmanOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.series_id)
      .flatMapGroupsWithState[KalmanState, KalmanOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sid: String, it: Iterator[Point], state: GroupState[KalmanState]) =>
          var s = state.getOption.getOrElse(KalmanState(0.0, 1e7, false))
          val out = it.toSeq.sortBy(_.ts.getTime).map { pt =>
            val (pm, pv, ns) =
              if (!s.initialized)
                (pt.value, s.p + q + h,
                  KalmanState(pt.value, 1e7, initialized = true))
              else {
                val pPred = s.p + q
                val f = pPred + h
                val k = pPred / f
                (s.level, f,
                  KalmanState(s.level + k * (pt.value - s.level),
                    (1 - k) * pPred, initialized = true))
              }
            s = ns
            KalmanOut(sid, pt.ts, pt.value, pm, math.sqrt(pv),
              pt.value - pm)
          }
          state.update(s)
          out.iterator
      }
  }

  // ---- M6 streaming: BOCPD with bounded run-length state --------------

  case class BocpdState(r: Array[Double], mu: Array[Double],
                        kappa: Array[Double], alpha: Array[Double],
                        beta: Array[Double])
  case class BocpdOut(series_id: String, ts: Timestamp, value: Double,
                      cp_prob: Double, map_run_length: Int)

  /** Stateful BOCPD: the run-length posterior + NIG suffstats are the
    * carried state (bounded by truncation — the reason the batch
    * recursion truncates tails at all). Values must arrive normalized
    * (stream-side normalization needs a prior pass or running stats). */
  def statefulBocpd(points: Dataset[Point], hazard: Double = 1.0 / 100)
      : Dataset[BocpdOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.series_id)
      .flatMapGroupsWithState[BocpdState, BocpdOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sid: String, it: Iterator[Point], state: GroupState[BocpdState]) =>
          var s = state.getOption.getOrElse(
            BocpdState(Array(1.0), Array(0.0), Array(1.0), Array(1.0),
              Array(1.0)))
          val out = it.toSeq.sortBy(_.ts.getTime).map { pt =>
            val (ns, cp, mapRun) = graft.models.Bocpd.step(
              s.r, s.mu, s.kappa, s.alpha, s.beta, pt.value, hazard)
            s = BocpdState(ns._1, ns._2, ns._3, ns._4, ns._5)
            BocpdOut(sid, pt.ts, pt.value, cp, mapRun)
          }
          state.update(s)
          out.iterator
      }
  }
}
