package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust trend estimation + significance — the nonparametric pair
  * every long-horizon monitoring pipeline runs before trusting a
  * drift alarm:
  *
  *  - Theil–Sen estimator (Theil 1950, Sen 1968): slope = exact median
  *    of all pairwise slopes (y_j − y_i)/(j − i) over the 1-based time
  *    ordinal, intercept = median(y_i − slope·i). 29% breakdown point
  *    vs OLS's 0 — one outlier spike cannot bend the trend line.
  *  - Mann–Kendall test (Mann 1945, Kendall 1975): S = Σ_{i<j}
  *    sign(y_j − y_i) with the tie-corrected variance
  *    Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18 and the
  *    continuity-corrected normal statistic z = (S∓1)/√Var(S); τ_a =
  *    2S/(n(n−1)).
  *
  * Declared as a per-series PAIR SELF-JOIN rather than a mapGroups
  * loop: the join key is the series, so pair explosion is bounded by
  * the per-series length (n·(n−1)/2 pairs for n ≈ tens-hundreds —
  * the events grid), every aggregate afterwards is grouped on the
  * SAME key (Catalyst reuses the hash partitioning — one exchange per
  * side, no re-shuffle), and the exact `median` aggregate is the
  * engine-portable A3 primitive the oracle gate already pins (q_mad).
  * S and the tie term are INTEGER sums — exact in any engine. At
  * scale the axis that grows is series count, which lands as
  * core-parallel work; per-series length is bounded by the
  * monitoring window. For UNBOUNDED series length the production
  * form is [[theilSenWindowed]] — lag-capped pairs, O(n·w) instead
  * of O(n²).
  */
object Trend {

  /** Returns one row per series:
    * (series, n, ts_slope, ts_intercept, mk_s, mk_var, mk_z, mk_tau).
    * Series with fewer than 2 points are dropped (no pairs). */
  def theilSenMannKendall(df: DataFrame, series: String, ts: String,
                          value: String): DataFrame = {
    // pinned series partitioning (Grouped.pin): the ONE exchange the
    // ordinal window needs, and the n²-per-series pair self-join below
    // joins two projections of it — both sides co-partitioned, so the
    // pair EXPLOSION (output bytes >> input bytes, the case AQE's
    // input-byte coalescing starves) runs at full core parallelism
    val base = graft.core.SeriesOps.withRowNumber(
        graft.core.Grouped.pin(
          df.select(col(series).cast("string").as("sk"),
            col(ts).cast("timestamp").as("ts"),
            col(value).cast("double").as("y")), Seq("sk")), "sk", "ts", "i")
      .select(col("sk"), col("i").cast("long").as("i"), col("y"))
    val a = base.select(col("sk"), col("i").as("ia"), col("y").as("ya"))
    val b = base.select(col("sk"), col("i").as("ib"), col("y").as("yb"))
    val pairs = a.join(b, Seq("sk")).filter(col("ia") < col("ib"))
      .select(col("sk"),
        ((col("yb") - col("ya")) /
          (col("ib") - col("ia")).cast("double")).as("pslope"),
        signum(col("yb") - col("ya")).cast("long").as("sgn"))
    // slope + S in one agg over the pair frame (same key → no extra
    // exchange after the join)
    val perPair = pairs.groupBy("sk")
      .agg(median(col("pslope")).as("ts_slope"), sum(col("sgn")).as("mk_s"))
    // intercept needs the slope joined back onto the points
    val inter = base.join(perPair.select("sk", "ts_slope"), "sk")
      .groupBy("sk")
      .agg(median(col("y") - col("ts_slope") * col("i").cast("double"))
        .as("ts_intercept"))
    val nTab = base.groupBy("sk").agg(count(lit(1)).as("n"))
    // tie-group correction: Σ t(t−1)(2t+5) over runs of equal y
    val ties = base.groupBy("sk", "y").agg(count(lit(1)).as("t"))
      .groupBy("sk")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .as("tie_term"))
    perPair.join(inter, "sk").join(nTab, "sk").join(ties, "sk")
      .filter(col("n") >= 2)
      .withColumn("mk_var",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
          col("tie_term")).cast("double") / 18.0)
      .withColumn("mk_z",
        when(col("mk_var") <= 0, 0.0)
          .when(col("mk_s") > 0,
            (col("mk_s") - 1).cast("double") / sqrt(col("mk_var")))
          .when(col("mk_s") < 0,
            (col("mk_s") + 1).cast("double") / sqrt(col("mk_var")))
          .otherwise(0.0))
      .withColumn("mk_tau",
        lit(2.0) * col("mk_s").cast("double") /
          (col("n") * (col("n") - 1)).cast("double"))
      .select(col("sk").as(series), col("n"), col("ts_slope"),
        col("ts_intercept"), col("mk_s"), col("mk_var"), col("mk_z"),
        col("mk_tau"))
  }

  /** Bounded-window Theil–Sen — the production form at scale: pairwise
    * slopes restricted to lag ≤ `w` (the standard bounded-memory
    * monitoring variant; cf. Siegel's repeated-median family), so pair
    * volume is O(n·w) per series instead of the exact form's O(n²) —
    * the difference between "fine on a bounded monitoring window" and
    * "works on an unbounded series history".
    *
    * Pairs are generated WITHOUT an n² self-join: each point gets a
    * lag-bucket `⌊i/w⌋`, the right-hand side is emitted into its own
    * bucket AND the previous one, and the equi-join on (series,
    * bucket) finds every lag ≤ w pair exactly once (ia ∈ [ib−w, ib)
    * implies ⌊ia/w⌋ ∈ {⌊ib/w⌋−1, ⌊ib/w⌋}) — each side carries ≤ 2
    * rows per point across one keyed exchange, and no group ever
    * materializes more than O(n·w) candidates.
    *
    * Returns (series, n, n_pairs, ts_slope, ts_intercept, s_w) —
    * `s_w` is the windowed sign sum (the lag-bounded analogue of
    * Mann–Kendall S; its exact-form variance formula does not apply
    * under a lag cap, so no z/τ columns are emitted). When w ≥ n−1
    * every pair is included and (ts_slope, ts_intercept, s_w) equal
    * [[theilSenMannKendall]]'s exactly (TrendSpec pins it). */
  def theilSenWindowed(df: DataFrame, series: String, ts: String,
                      value: String, w: Int): DataFrame = {
    require(w >= 1, s"w=$w must be >= 1")
    // same pinned-input shape as the exact face (see there); the
    // (sk, bk) equi-join is satisfied by hash(sk) on both sides
    val base = graft.core.SeriesOps.withRowNumber(
        graft.core.Grouped.pin(
          df.select(col(series).cast("string").as("sk"),
            col(ts).cast("timestamp").as("ts"),
            col(value).cast("double").as("y")), Seq("sk")), "sk", "ts", "i")
      .select(col("sk"), col("i").cast("long").as("i"), col("y"))
    val a = base.select(col("sk"), col("i").as("ia"), col("y").as("ya"),
      floor(col("i") / w).as("bk"))
    val b = base.select(col("sk"), col("i").as("ib"), col("y").as("yb"),
      explode(array(floor(col("i") / w), floor(col("i") / w) - 1))
        .as("bk"))
    val pairs = a.join(b, Seq("sk", "bk"))
      .filter(col("ia") < col("ib") && col("ib") - col("ia") <= w)
      .select(col("sk"),
        ((col("yb") - col("ya")) /
          (col("ib") - col("ia")).cast("double")).as("pslope"),
        signum(col("yb") - col("ya")).cast("long").as("sgn"))
    val perPair = pairs.groupBy("sk")
      .agg(median(col("pslope")).as("ts_slope"),
        sum(col("sgn")).as("s_w"), count(lit(1)).as("n_pairs"))
    val inter = base.join(perPair.select("sk", "ts_slope"), "sk")
      .groupBy("sk")
      .agg(median(col("y") - col("ts_slope") * col("i").cast("double"))
        .as("ts_intercept"))
    val nTab = base.groupBy("sk").agg(count(lit(1)).as("n"))
    perPair.join(inter, "sk").join(nTab, "sk")
      .filter(col("n") >= 2)
      .select(col("sk").as(series), col("n"), col("n_pairs"),
        col("ts_slope"), col("ts_intercept"), col("s_w"))
  }
}
