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

  /** Equal-width bin id with the HBOS conventions: clamped
    * floor((f−lo)/w), w = (hi−lo)/bins in doubles; hi = lo ⇒ bin 0.
    * Shared verbatim by the batch scorer, the fixed-edge finisher,
    * and the streaming increment face so their bins are bit-equal. */
  private[graft] def binOf(f: org.apache.spark.sql.Column,
                           lo: org.apache.spark.sql.Column,
                           hi: org.apache.spark.sql.Column,
                           bins: Int): org.apache.spark.sql.Column = {
    val bw = (hi - lo) / lit(bins.toDouble)
    when(hi === lo, lit(0L)).otherwise(
      least(greatest(floor((f - lo) / bw), lit(0.0)),
        lit((bins - 1).toDouble)).cast("long"))
  }

  /** The (value, Δ) feature frame with the shared conventions:
    * (__sk, __i, __x, __y), null values and null series keys dropped,
    * Δ = x − lag(x) with 0 at the series head. */
  private def features(df: DataFrame, series: String, order: String,
                       value: String): DataFrame = {
    val w = Window.partitionBy("__sk").orderBy("__o")
    df.select(col(series).cast("string").as("__sk"),
        col(order).as("__o"), col(value).cast("double").as("__x"))
      .filter(col("__x").isNotNull && col("__sk").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__y",
        col("__x") - coalesce(lag("__x", 1).over(w), col("__x")))
      .select("__sk", "__i", "__x", "__y")
  }

  /** Output: (series, ord, value, hbos). */
  def hbos(df: DataFrame, series: String, order: String, value: String,
           bins: Int = 16): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    val pts = features(df, series, order, value)
    val stats = pts.groupBy("__sk").agg(
      min("__x").as("__xlo"), max("__x").as("__xhi"),
      min("__y").as("__ylo"), max("__y").as("__yhi"),
      count(lit(1)).as("__n"))
    def binOf(f: org.apache.spark.sql.Column,
              lo: org.apache.spark.sql.Column,
              hi: org.apache.spark.sql.Column) =
      Hbos.binOf(f, lo, hi, bins)
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

  /** Batch finisher for
    * [[graft.streaming.StreamingDetect.windowedHbosCounts]]: score
    * points against MERGED (series, feature, bin) histogram counts at
    * the same FIXED global edges the stream binned with. `counts` is
    * the raw union of window increments — merged here by addition
    * (the histogram merge law), so the caller hands over the sink
    * unaggregated. When the fixed edges equal each series' true
    * [min, max] (per feature), the scores are BIT-EQUAL to [[hbos]]
    * — StreamingSpec pins stream-built counts + this finisher against
    * the batch scorer. Output: (series, ord, value, hbos). */
  def hbosFromCounts(df: DataFrame, series: String, order: String,
                     value: String, counts: DataFrame,
                     xlo: Double, xhi: Double, ylo: Double, yhi: Double,
                     bins: Int = 16): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    val merged = counts
      .groupBy(col(series).cast("string").as("__sk"), col("feature"),
        col("bin"))
      .agg(sum("cnt").as("__c"))
    val cx = merged.filter(col("feature") === "x")
      .select(col("__sk"), col("bin").as("__bx"), col("__c").as("__cx"))
    val cy = merged.filter(col("feature") === "y")
      .select(col("__sk"), col("bin").as("__by"), col("__c").as("__cy"))
    // n from the x-feature histogram itself (Σ counts = points seen by
    // the stream), not from df — the sketch is self-contained
    val n = cx.groupBy("__sk").agg(sum("__cx").as("__n"))
    features(df, series, order, value)
      .withColumn("__bx", binOf(col("__x"), lit(xlo), lit(xhi), bins))
      .withColumn("__by", binOf(col("__y"), lit(ylo), lit(yhi), bins))
      .join(cx, Seq("__sk", "__bx"))
      .join(cy, Seq("__sk", "__by"))
      .join(n, Seq("__sk"))
      .select(col("__sk").as(series), col("__i").as("ord"),
        col("__x").as(value),
        (-log(col("__cx").cast("double") / col("__n").cast("double"))
          - log(col("__cy").cast("double") / col("__n").cast("double")))
          .as("hbos"))
  }
}
