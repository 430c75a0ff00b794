package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.SeriesOps

/** Event-level operators: gaps-and-islands run collapsing (W7),
  * persistence filtering (W8), and interval-overlap joins (J3/J4).
  *
  * Semantics from the reference's `src/evaluate.py`:
  *  - runs of 1-flags collapse to inclusive (start,end) index events;
  *    two events merge iff `start - prev_end <= gap + 1` (evaluate.py:57);
  *  - persistence zeroes runs shorter than p (evaluate.py:125-146);
  *  - events overlap iff NOT (pred_end < true_start OR pred_start >
  *    true_end) (evaluate.py:78).
  *
  * Everything is window + groupBy — no driver-side loops, so it scales
  * with the number of series; event tables are tiny relative to points.
  */
object Events {

  /** W7: collapse consecutive flag=1 runs per series into events,
    * bridging runs separated by <= gap zeros. Output:
    * (series, event_id, start_rn, end_rn, start_ts, end_ts, n_points).
    */
  def eventize(df: DataFrame, series: String, ts: String, flag: String,
               gap: Int): DataFrame = {
    val withRn =
      if (df.columns.contains("rn")) df
      else SeriesOps.withRowNumber(df, series, ts)
    val flagged = withRn.filter(col(flag) === 1)
    val wf = Window.partitionBy(series).orderBy("rn")
    // consecutive rns share (rn - row_number) — the classic islands key
    val runs = flagged
      .withColumn("__isl", col("rn") - row_number().over(wf))
      .groupBy(col(series), col("__isl"))
      .agg(min("rn").as("start_rn"), max("rn").as("end_rn"),
        min(ts).as("start_ts"), max(ts).as("end_ts"))
    // second islands pass over the (small) run set: bridge gaps
    val we = Window.partitionBy(series).orderBy("start_rn")
    val bridged = runs
      .withColumn("__new",
        when(col("start_rn") - lag("end_rn", 1).over(we) <= gap + 1, 0)
          .otherwise(1))
      .withColumn("__grp", sum("__new").over(
        we.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(series), col("__grp"))
      .agg(min("start_rn").as("start_rn"), max("end_rn").as("end_rn"),
        min("start_ts").as("start_ts"), max("end_ts").as("end_ts"))
    bridged
      .withColumn("event_id",
        row_number().over(Window.partitionBy(series).orderBy("start_rn")))
      .select(col(series), col("event_id"), col("start_rn"), col("end_rn"),
        col("start_ts"), col("end_ts"),
        (col("end_rn") - col("start_rn") + 1).as("n_points"))
  }

  /** W8: persistence filter — zero out 1-runs shorter than p rows.
    * Stays fully windowed (no join back): run length is a count over the
    * islands key, broadcast to every member row by a second window.
    */
  def persistFilter(df: DataFrame, series: String, ts: String, flag: String,
                    p: Int, out: String): DataFrame = {
    val withRn =
      if (df.columns.contains("rn")) df
      else SeriesOps.withRowNumber(df, series, ts)
    val wf = Window.partitionBy(col(series), col(flag)).orderBy("rn")
    val isl = col("rn") - row_number().over(wf)
    val runLen = count(lit(1)).over(
      Window.partitionBy(col(series), col(flag), isl))
    withRn.withColumn(out,
      when(col(flag) === 1 && runLen >= p, 1).otherwise(0))
  }

  /** J3: event-level confusion via interval-overlap joins.
    * Precision counts predicted events that overlap ANY true event
    * (pred-side TP); recall counts true events overlapped by ANY
    * prediction (true-side TP) — the asymmetry documented at
    * evaluate.py:83-109. Inputs are eventize() outputs.
    * Output: one row per series with tp/fp/fn/precision/recall/f1 and
    * event counts. `eps` matches the reference's 1e-9 guards.
    */
  def eventLevelMetrics(pred: DataFrame, truth: DataFrame, series: String,
                        eps: Double = 1e-9): DataFrame = {
    val p = pred.select(col(series).as("__s"), col("start_rn").as("ps"),
      col("end_rn").as("pe"))
    val t = truth.select(col(series).as("__s"), col("start_rn").as("ts_"),
      col("end_rn").as("te"))
    val overlap = col("ps") <= col("te") && col("pe") >= col("ts_")
    val predHit = p.join(t, p("__s") === t("__s") && overlap, "left_semi")
    val truthHit = t.join(p, p("__s") === t("__s") && overlap, "left_semi")
    val nPred = p.groupBy("__s").agg(count(lit(1)).as("n_pred_events"))
    val nTrue = t.groupBy("__s").agg(count(lit(1)).as("n_true_events"))
    val tpP = predHit.groupBy("__s").agg(count(lit(1)).as("tp"))
    val tpT = truthHit.groupBy("__s").agg(count(lit(1)).as("tp_true"))
    val allSeries = nPred.select("__s").unionByName(nTrue.select("__s")).distinct()
    val j = allSeries
      .join(nPred, Seq("__s"), "left").join(nTrue, Seq("__s"), "left")
      .join(tpP, Seq("__s"), "left").join(tpT, Seq("__s"), "left")
      .na.fill(0, Seq("n_pred_events", "n_true_events", "tp", "tp_true"))
    j.select(col("__s").as(series),
        col("tp"), (col("n_pred_events") - col("tp")).as("fp"),
        (col("n_true_events") - col("tp_true")).as("fn"),
        col("n_pred_events"), col("n_true_events"),
        (col("tp") / (col("n_pred_events") + lit(eps))).as("precision"),
        (col("tp_true") / (col("n_true_events") + lit(eps))).as("recall"))
      .withColumn("f1",
        lit(2) * col("precision") * col("recall") /
          (col("precision") + col("recall") + lit(eps)))
  }

  /** J4: per true event, minutes from true start to the EARLIEST
    * overlapping predicted event's start (negative = early detection,
    * evaluate.py:189-198). One row per detected true event.
    */
  def detectionLatency(pred: DataFrame, truth: DataFrame,
                       series: String): DataFrame = {
    val p = pred.select(col(series).as("__s"), col("start_rn").as("ps"),
      col("end_rn").as("pe"), col("start_ts").as("pst"))
    val t = truth.select(col(series).as("__s"), col("start_rn").as("ts_"),
      col("end_rn").as("te"), col("start_ts").as("tst"))
    val overlap = col("ps") <= col("te") && col("pe") >= col("ts_")
    t.join(p, p("__s") === t("__s") && overlap, "inner")
      .groupBy(col("__s").as(series), col("ts_").as("true_start_rn"),
        col("tst"))
      .agg(min("pst").as("first_pred_ts"))
      .withColumn("latency_minutes",
        (unix_micros(col("first_pred_ts")) - unix_micros(col("tst")))
          / lit(60e6))
      .drop("tst")
  }
}
