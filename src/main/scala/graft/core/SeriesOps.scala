package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Core relational time-series operators (SURVEY.md §2.2 / §2.5).
  *
  * Semantics derive from the reference's pandas pipelines
  * (`src/utils.py:40-72`, `src/kalman_model.py:55-97`,
  * `src/load_nab.py:46-61`, `src/run_bsts.py:31-35`) but every operator
  * here is a declarative DataFrame transform: row-count window frames
  * partitioned by the series key, so Catalyst plans one sort per series
  * partition and the whole surface scales horizontally across series.
  *
  * All reference windows are ROW-count frames (never time ranges), so
  * every frame below uses `rowsBetween` — see SURVEY.md §7.4(4).
  */
object SeriesOps {

  /** Ordered per-series window: the one sort every op shares. */
  def bySeries(series: String, ts: String): WindowSpec =
    Window.partitionBy(series).orderBy(ts)

  /** P3/W5: 1-based ordinal per series (time-as-ordinal feature, split basis). */
  def withRowNumber(df: DataFrame, series: String, ts: String,
                    out: String = "rn"): DataFrame =
    df.withColumn(out, row_number().over(bySeries(series, ts)))

  /** P3: fractional train/val/test split as a `split` column.
    * Reference: `iloc[:int(n*frac)]` (kalman_model.py:168-171) and the
    * 3-way variant (run_bsts.py:31-35). valFrac=0 gives 2-way splits.
    */
  def withSplit(df: DataFrame, series: String, ts: String,
                trainFrac: Double, valFrac: Double = 0.0,
                out: String = "split"): DataFrame = {
    val w = bySeries(series, ts)
    val n = count(lit(1)).over(Window.partitionBy(series))
    val rn = row_number().over(w)
    val trainEnd = floor(n * lit(trainFrac))
    val valEnd = floor(n * lit(trainFrac + valFrac))
    df.withColumn(out,
      when(rn <= trainEnd, lit("Train"))
        .when(rn <= valEnd, lit("Validation"))
        .otherwise(lit("Test")))
  }

  /** W1/W2/W3: trailing rolling mean + sample-std over `window` rows with
    * pandas `min_periods` semantics (null below minPeriods), then
    * backfilled (P7/W6) and floored by `eps` like `utils.py:63-68`.
    * pandas `rolling(...).std()` is sample std → `stddev_samp`.
    */
  def withRollingStats(df: DataFrame, series: String, ts: String,
                       value: String, window: Int, minPeriods: Int,
                       meanOut: String, stdOut: String,
                       eps: Double = 1e-6): DataFrame = {
    val frame = bySeries(series, ts).rowsBetween(-(window - 1), 0)
    val cnt = count(col(value)).over(frame)
    val mu = when(cnt >= minPeriods, avg(col(value)).over(frame))
    val sd = when(cnt >= minPeriods, stddev_samp(col(value)).over(frame))
    val bfill = bySeries(series, ts).rowsBetween(0, Window.unboundedFollowing)
    df.withColumn(meanOut, mu).withColumn(stdOut, sd)
      .withColumn(meanOut, first(col(meanOut), ignoreNulls = true).over(bfill))
      .withColumn(stdOut,
        first(col(stdOut), ignoreNulls = true).over(bfill) + lit(eps))
  }

  /** W6: backfill nulls with the next non-null value (pandas bfill). */
  def backfill(df: DataFrame, series: String, ts: String,
               c: String, out: String): DataFrame =
    df.withColumn(out, first(col(c), ignoreNulls = true)
      .over(bySeries(series, ts).rowsBetween(0, Window.unboundedFollowing)))

  /** A4: MAD sigma `1.4826 * median(|x - median(x)|)` per series
    * (`utils.py:31-38`). Two exact-median aggregations, grouped by the
    * series key so both passes are one shuffle each.
    */
  def madSigma(df: DataFrame, series: String, value: String,
               out: String = "mad_sigma"): DataFrame = {
    val med = df.groupBy(series).agg(median(col(value)).as("__med"))
    df.join(med, series)
      .groupBy(series)
      .agg((lit(1.4826) * median(abs(col(value) - col("__med")))).as(out))
  }

  /** W4: trailing lag features for autoregression (`lstm_model.py:18-30`
    * capability mapping — each row gets value at t-1..t-k).
    */
  def withLags(df: DataFrame, series: String, ts: String, value: String,
               lags: Seq[Int]): DataFrame =
    lags.foldLeft(df) { (d, k) =>
      d.withColumn(s"${value}_lag$k", lag(col(value), k).over(bySeries(series, ts)))
    }

  /** W4 variant: the full trailing window as an array column (the LSTM
    * sequence extractor `create_sequences`, lstm_model.py:18-30): for each
    * row, values at [t-seqLen, t-1]; null until seqLen history exists.
    */
  def withLagWindow(df: DataFrame, series: String, ts: String, value: String,
                    seqLen: Int, out: String = "lag_window"): DataFrame = {
    val frame = bySeries(series, ts).rowsBetween(-seqLen, -1)
    df.withColumn(out, collect_list(col(value)).over(frame))
      .withColumn(out, when(size(col(out)) === seqLen, col(out)))
  }

  /** J2: as-of label-window marking (`load_nab.py:46-61`): each label
    * timestamp is matched to the NEAREST series row (searchsorted
    * semantics), and rows within ±windowRows row positions of the match
    * are flagged 1.
    *
    * Scale design: the nearest-row match is a sort-based as-of join —
    * labels are unioned into the series stream, the previous/next series
    * row propagates via one per-series window, and the nearer side wins.
    * No crossJoin; the final ±window marking is a broadcast range join
    * against the (small) matched-label set.
    */
  def markLabelWindows(seriesDf: DataFrame, labels: DataFrame,
                       series: String, ts: String, labelTs: String,
                       windowRows: Int, out: String = "is_anomaly"): DataFrame = {
    val s = withRowNumber(seriesDf, series, ts)
    val sTagged = s.select(col(series), col(ts).as("__t"), col("rn"),
      lit(0).as("__is_label"))
    val lTagged = labels.select(col(series), col(labelTs).as("__t"),
      lit(null).cast("int").as("rn"), lit(1).as("__is_label"))
    // searchsorted: order labels among series rows; a label sorts AFTER a
    // series row with the same timestamp so prev = the exact-match row.
    val w = Window.partitionBy(series).orderBy(col("__t"), col("__is_label"))
    val prev = last(when(col("__is_label") === 0, col("rn")), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val prevT = last(when(col("__is_label") === 0, col("__t")), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val nxt = first(when(col("__is_label") === 0, col("rn")), ignoreNulls = true)
      .over(w.rowsBetween(0, Window.unboundedFollowing))
    val nxtT = first(when(col("__is_label") === 0, col("__t")), ignoreNulls = true)
      .over(w.rowsBetween(0, Window.unboundedFollowing))
    val matched = sTagged.unionByName(lTagged)
      .withColumn("__prn", prev).withColumn("__pts", prevT)
      .withColumn("__nrn", nxt).withColumn("__nts", nxtT)
      .filter(col("__is_label") === 1)
      .select(col(series),
        // nearest row: exact/next match from searchsorted, else whichever
        // neighbor is closer in time; ties go to the earlier row.
        when(col("__nrn").isNull, col("__prn"))
          .when(col("__prn").isNull, col("__nrn"))
          .when(unix_micros(col("__t")) - unix_micros(col("__pts"))
            <= unix_micros(col("__nts")) - unix_micros(col("__t")), col("__prn"))
          .otherwise(col("__nrn")).as("__lrn"))
      .filter(col("__lrn").isNotNull)
      .distinct()
    s.join(broadcast(matched),
        s(series) === matched(series) &&
          col("rn") >= col("__lrn") - windowRows &&
          col("rn") <= col("__lrn") + windowRows,
        "left_semi")
      .withColumn(out, lit(1))
      .unionByName(
        s.join(broadcast(matched),
          s(series) === matched(series) &&
            col("rn") >= col("__lrn") - windowRows &&
            col("rn") <= col("__lrn") + windowRows,
          "left_anti").withColumn(out, lit(0)))
  }

  /** M7: residual z-score `|x - mu| / sigma` (`kalman_model.py:55-97`). */
  def zscore(resid: Column, sigma: Column): Column = abs(resid) / sigma

  /** P5: threshold flag `z > k` as 0/1 int. */
  def thresholdFlag(z: Column, k: Column): Column =
    when(z > k, 1).otherwise(0)
}
