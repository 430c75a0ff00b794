package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable histogram-quantile sketch — the one-pass approximate
  * quantile a 100 TB profile job needs where exact percentiles would
  * global-sort the column (and where GK/t-digest style sketches give
  * up cross-engine determinism: their state depends on merge order).
  *
  * The sketch is a fixed-range equi-width histogram: bin(v) =
  * clamp(⌊(v − lo) / w⌋, 0, bins−1) with w = (hi − lo)/bins. Counts
  * per (group, bin) are an ordinary partial-aggregated `groupBy` —
  * the map-side combine IS the sketch build, the exchange carries at
  * most `bins` rows per group per partition, and merging sketches is
  * plain count addition (associative + commutative), so the result is
  * identical on any partitioning. The quantile estimate is the RIGHT
  * EDGE of the first bin whose cumulative count reaches ⌈q·n⌉, giving
  * the deterministic guarantee exact_q ≤ est ≤ exact_q + w for values
  * inside [lo, hi) (est is an upper bound at most one bin width above
  * the exact quantile, with equality when the exact order statistic
  * sits on a bin's left edge; values clamped in from outside the range
  * void the bracket — the range is the sketch's contract;
  * QuantilesSpec pins the bracket against `percentile` exactly).
  *
  * Everything is integer-or-IEEE-deterministic arithmetic, so unlike
  * approx_percentile the estimate itself is oracle-checkable in plain
  * SQL — the library's L65/KMV convention for sketches.
  *
  * Plan shape: one (group, bin) count aggregate, one per-group
  * cumulative window over ≤ `bins` rows, and a final (group, q) min
  * that rides the window's group partitioning (no third exchange —
  * hash(group) already clusters (group, q)). Values outside [lo, hi)
  * clamp into the edge bins: the range is the sketch's contract, as
  * with any fixed-range histogram. */
object Quantiles {

  private def checkRange(lo: Double, hi: Double, bins: Int): Unit = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    require(hi > lo, s"need hi=$hi > lo=$lo")
  }

  /** The clamp-and-floor bin index of `value` for [lo, hi) / bins. */
  def binExpr(value: org.apache.spark.sql.Column, lo: Double,
              hi: Double, bins: Int): org.apache.spark.sql.Column = {
    val w = (hi - lo) / bins
    least(greatest(floor((value - lit(lo)) / lit(w)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
  }

  /** The sketch itself: (group, bin, cnt) counts — map-side
    * combinable, merge = addition, the relation a caller persists (or
    * streams — see `StreamingDetect.windowedBinCounts`). Null values
    * are ignored (SQL aggregate convention). */
  def binCounts(df: DataFrame, group: String, value: String,
                lo: Double, hi: Double, bins: Int): DataFrame = {
    checkRange(lo, hi, bins)
    df.filter(col(value).isNotNull)
      .select(col(group).as("group"),
        binExpr(col(value), lo, hi, bins).as("bin"))
      .groupBy("group", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Finisher over a (group, bin, cnt) sketch relation (same [lo, hi,
    * bins] it was built with): (group, q, n, qbin, est) per q. Safe to
    * run over a UNION of sketch increments — duplicate (group, bin)
    * rows merge by addition first, the sketch's merge law. */
  def quantilesFromCounts(counts: DataFrame, lo: Double, hi: Double,
                          bins: Int, qs: Seq[Double]): DataFrame = {
    checkRange(lo, hi, bins)
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "each q must be in (0, 1]")
    require(qs.distinct.size == qs.size,
      "duplicate q values would duplicate output rows")
    val w = (hi - lo) / bins
    val spark = counts.sparkSession
    import spark.implicits._
    val merged = counts
      .groupBy("group", "bin").agg(sum("cnt").as("__c"))
    val wg = Window.partitionBy("group").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("__cum", sum("__c").over(wg))
      .withColumn("__n", sum("__c").over(Window.partitionBy("group")))
    val qdf = broadcast(qs.toDF("q"))
    cum.join(qdf,
        col("__cum") >= ceil(col("q") * col("__n").cast("double")))
      .groupBy(col("group"), col("q"))
      .agg(min("bin").as("qbin"), max("__n").as("n"))
      .select(col("group"), col("q"), col("n"), col("qbin"),
        (lit(lo) + (col("qbin") + 1).cast("double") * lit(w))
          .as("est"))
  }

  /** Per-group quantile estimates: (group, q, n, qbin, est) for each
    * q in `qs` (each must be in (0, 1]); build + finish in one plan.
    * The output `group` column keeps the caller's name. */
  def histogramQuantiles(df: DataFrame, group: String, value: String,
                         lo: Double, hi: Double, bins: Int,
                         qs: Seq[Double]): DataFrame =
    quantilesFromCounts(binCounts(df, group, value, lo, hi, bins),
        lo, hi, bins, qs)
      .withColumnRenamed("group", group)
}
