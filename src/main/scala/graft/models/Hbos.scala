package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HBOS — Histogram-Based Outlier Score (Goldstein & Dengel, KI 2012)
  * over the per-series (value, Δvalue) feature convention shared with
  * [[IsolationForest]] and [[Lof]]: assume feature independence, bin
  * each feature into an equal-width histogram, and score a point by
  * the summed log-inverse bin density,
  *
  *   hbos(p) = Σ_f  −ln( count(bin_f(p)) / n )
  *
  * — the cheapest member of the outlier-detector tier (two histogram
  * aggregates, no pairs, no trees), the one to run FIRST at 100 TB.
  *
  * Conventions (engine-reproducible):
  *  - per-series per-feature equal-width bins over [min, max], the
  *    shared `Quantiles.binExpr` arithmetic (`floor((x − lo)/w)`
  *    clamped to [0, bins−1], w = (hi − lo)/bins computed in doubles
  *    the same way on both engines);
  *  - a constant feature (hi = lo) puts every point in bin 0 —
  *    density 1, contribution 0 (never a divide-by-zero);
  *  - density is count/n (exact integer ratio in double), score uses
  *    the natural log.
  *
  * Distribution shape: ONE per-series window builds the Δ feature and
  * the per-series (lo, hi, n) come from ONE keyed aggregate; each
  * feature's (series, bin) count relation is bounded by series × bins.
  * The stats/count joins are all keyed by the series (± bin) — they
  * ride the window's partitioning or broadcast when AQE measures them
  * small. Deliberately NO broadcast() hints: the relations scale with
  * SERIES CARDINALITY, and a forced broadcast of a series-sized
  * relation is exactly the 8 GB-limit / driver-OOM trap at the 10⁸-
  * series scale this detector is pitched at. Fact rows shuffle only
  * for the series window.
  */
object Hbos {

  /** Output: (series, ord, value, hbos). */
  def hbos(df: DataFrame, series: String, order: String, value: String,
           bins: Int = 16): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    val w = Window.partitionBy("__sk").orderBy("__o")
    val pts = df.select(col(series).cast("string").as("__sk"),
        col(order).as("__o"), col(value).cast("double").as("__x"))
      .filter(col("__x").isNotNull && col("__sk").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__y",
        col("__x") - coalesce(lag("__x", 1).over(w), col("__x")))
      .select("__sk", "__i", "__x", "__y")
    val stats = pts.groupBy("__sk").agg(
      min("__x").as("__xlo"), max("__x").as("__xhi"),
      min("__y").as("__ylo"), max("__y").as("__yhi"),
      count(lit(1)).as("__n"))
    def binOf(f: org.apache.spark.sql.Column,
              lo: org.apache.spark.sql.Column,
              hi: org.apache.spark.sql.Column) = {
      val bw = (hi - lo) / lit(bins.toDouble)
      when(hi === lo, lit(0L)).otherwise(
        least(greatest(floor((f - lo) / bw), lit(0.0)),
          lit((bins - 1).toDouble)).cast("long"))
    }
    val binned = pts.join(stats, Seq("__sk"))
      .withColumn("__bx", binOf(col("__x"), col("__xlo"), col("__xhi")))
      .withColumn("__by", binOf(col("__y"), col("__ylo"), col("__yhi")))
      .select("__sk", "__i", "__x", "__bx", "__by", "__n")
    val cx = binned.groupBy("__sk", "__bx")
      .agg(count(lit(1)).as("__cx"))
    val cy = binned.groupBy("__sk", "__by")
      .agg(count(lit(1)).as("__cy"))
    binned
      .join(cx, Seq("__sk", "__bx"))
      .join(cy, Seq("__sk", "__by"))
      .select(col("__sk").as(series), col("__i").as("ord"),
        col("__x").as(value),
        (-log(col("__cx").cast("double") / col("__n").cast("double"))
          - log(col("__cy").cast("double") / col("__n").cast("double")))
          .as("hbos"))
  }
}
