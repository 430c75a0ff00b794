package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal Hybrid ESD anomaly detection (Hochenbaum, Vallis,
  * Kejariwal: "Automatic Anomaly Detection in the Cloud Via Statistical
  * Learning", arXiv:1704.07706 — Twitter's AnomalyDetection), built on
  * the generalized ESD many-outlier test (Rosner, Technometrics 1983).
  *
  * The decomposition step removes the STL seasonal component and the
  * series MEDIAN (deliberately NOT the STL trend — the paper replaces
  * trend with median so a long anomalous excursion cannot be absorbed
  * into the trend and vanish from the residual); the test step runs
  * GESD on the residual with ROBUST location/spread (median and MAD —
  * the "hybrid" part, immune to the masking that sample mean/std
  * suffer when several large anomalies inflate them).
  *
  * GESD (two-sided): for i = 1..k, with the surviving points,
  *   R_i = max |x − center| / spread   (remove the arg max),
  *   λ_i = (n−i)·t_{p,n−i−1} / √((n−i−1+t²)(n−i+1)),
  *   p   = 1 − α / (2(n−i+1)),
  * and the outlier count is the LARGEST i with R_i > λ_i (not the
  * first failure — Rosner's definition, which is what grants the
  * advertised type-I control).
  *
  * The Student-t quantile is computed from the regularized incomplete
  * beta function (Lentz continued fraction + Lanczos log-gamma —
  * standard public formulas) inverted by fixed-iteration bisection, so
  * every number here is bit-deterministic: the registered query
  * carries a fixture oracle, and EsdSpec pins t-table values.
  *
  * Scale: one relational STL pass (StlLite), then GESD runs PER SERIES
  * inside `mapGroups` — O(k·n) per series with k ≤ maxFrac·n, parallel
  * across series, the M2-M6 shape (a 100 TB corpus is many series).
  */
object Esd {

  // ---- special functions (public-domain formulas) -------------------

  /** Lanczos log-gamma (g=7, n=9 coefficients — the standard public
    * parameterization). */
  def logGamma(x: Double): Double = {
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6,
      1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t +
        math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b) via the Lentz continued
    * fraction (with the symmetry flip for convergence). */
  def betainc(a: Double, b: Double, x: Double): Double = {
    require(x >= 0 && x <= 1, s"x=$x out of [0,1]")
    if (x == 0.0 || x == 1.0) x
    else {
      val lbeta = logGamma(a) + logGamma(b) - logGamma(a + b)
      val front = math.exp(a * math.log(x) + b * math.log1p(-x) - lbeta)
      def cf(a: Double, b: Double, x: Double): Double = {
        val tiny = 1e-300
        var c = 1.0
        var d = 1.0 - (a + b) * x / (a + 1.0)
        if (math.abs(d) < tiny) d = tiny
        d = 1.0 / d
        var h = d
        var m = 1
        while (m <= 200) {
          val m2 = 2 * m
          // even step
          var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
          d = 1.0 + aa * d; if (math.abs(d) < tiny) d = tiny
          c = 1.0 + aa / c; if (math.abs(c) < tiny) c = tiny
          d = 1.0 / d
          h *= d * c
          // odd step
          aa = -(a + m) * (a + b + m) * x /
            ((a + m2) * (a + m2 + 1.0))
          d = 1.0 + aa * d; if (math.abs(d) < tiny) d = tiny
          c = 1.0 + aa / c; if (math.abs(c) < tiny) c = tiny
          d = 1.0 / d
          val del = d * c
          h *= del
          if (math.abs(del - 1.0) < 1e-15) return h
          m += 1
        }
        h
      }
      if (x < (a + 1.0) / (a + b + 2.0)) front * cf(a, b, x) / a
      else 1.0 - math.exp(b * math.log1p(-x) + a * math.log(x) -
        (logGamma(a) + logGamma(b) - logGamma(a + b))) *
        cf(b, a, 1.0 - x) / b
    }
  }

  /** Student-t CDF: F(t; ν) via the incomplete beta. */
  def tCdf(t: Double, df: Double): Double = {
    val x = df / (df + t * t)
    val tail = 0.5 * betainc(df / 2.0, 0.5, x)
    if (t > 0) 1.0 - tail else tail
  }

  /** Student-t quantile by fixed-iteration bisection on [[tCdf]] —
    * 200 halvings of [−5e3, 5e3] → deterministic to ~1e-12, no
    * data-dependent iteration counts. */
  def tQuantile(p: Double, df: Double): Double = {
    require(p > 0 && p < 1, s"p=$p out of (0,1)")
    var lo = -5000.0
    var hi = 5000.0
    var i = 0
    while (i < 200) {
      val mid = 0.5 * (lo + hi)
      if (tCdf(mid, df) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  // ---- generalized ESD ---------------------------------------------

  private def median(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else 0.5 * (s(n / 2 - 1) + s(n / 2))
  }

  /** Indices of the outliers GESD declares, in removal order. `hybrid`
    * = median/MAD location-spread (the S-H-ESD robust form); otherwise
    * classic mean / sample std. */
  def gesdOutliers(xs: Array[Double], maxOutliers: Int,
                   alpha: Double = 0.05,
                   hybrid: Boolean = true): Array[Int] = {
    require(alpha > 0 && alpha < 1, s"alpha=$alpha out of (0,1)")
    val n = xs.length
    val k = math.min(maxOutliers, math.max(0, n - 2))
    if (k == 0) return Array.empty
    val alive = Array.fill(xs.length)(true)
    val removed = new Array[Int](k)
    var lastSignificant = 0
    var scale0 = 0.0 // largest initial deviation — the numeric-noise yardstick
    var i = 1
    while (i <= k) {
      val cur = (0 until n).filter(alive(_)).map(xs(_)).toArray
      val (center, rawSpread) =
        if (hybrid) {
          val m = median(cur)
          (m, 1.4826022185056018 * median(cur.map(v => math.abs(v - m))))
        } else {
          val m = cur.sum / cur.length
          val v = cur.map(x => (x - m) * (x - m)).sum / (cur.length - 1)
          (m, math.sqrt(v))
        }
      var bestJ = -1
      var bestDev = -1.0
      var j = 0
      while (j < n) {
        if (alive(j)) {
          val d = math.abs(xs(j) - center)
          if (d > bestDev) { bestDev = d; bestJ = j }
        }
        j += 1
      }
      if (i == 1) scale0 = math.max(bestDev, java.lang.Double.MIN_NORMAL)
      // numeric deadband: deviations 9 orders below the series' own
      // largest are float noise, not statistics — without this, an
      // exactly-periodic series has MAD ~1e-13 and every rounding
      // wiggle clears lambda. Real (noisy) data never trips it.
      if (bestDev <= 1e-9 * scale0) return removed.take(lastSignificant)
      // degenerate spread (constant base under a huge spike): floor it
      // relative to the series scale so the spike still registers as
      // arbitrarily significant instead of aborting the test
      val spread = math.max(rawSpread, 1e-12 * scale0)
      val r = bestDev / spread
      val nn = cur.length // n - i + 1
      val p = 1.0 - alpha / (2.0 * nn)
      val t = tQuantile(p, nn - 2.0)
      val lambda = (nn - 1.0) * t /
        math.sqrt((nn - 2.0 + t * t) * nn)
      if (r > lambda) lastSignificant = i
      removed(i - 1) = bestJ
      alive(bestJ) = false
      i += 1
    }
    removed.take(lastSignificant)
  }

  // ---- S-H-ESD over a series table ---------------------------------

  case class ShesdRow(sk: String, ord: Long, ts: java.sql.Timestamp,
                      value: Double, seasonal: Double)
  case class ShesdOut(sk: String, ts: java.sql.Timestamp, value: Double,
                      shesd_resid: Double, is_anomaly: Int)

  /** Per-series S-H-ESD: STL-lite seasonal removal, median detrend,
    * hybrid GESD on the residual. `maxFrac` bounds the anomaly count
    * per series (the paper's k = ⌊maxFrac·n⌋, default 10% — also the
    * reference pipeline's anomaly-rate guard). */
  def seasonalHybridEsd(df: DataFrame, series: String, ts: String,
                        value: String, period: Int,
                        maxFrac: Double = 0.1,
                        alpha: Double = 0.05): DataFrame = {
    require(maxFrac > 0 && maxFrac <= 0.49, s"maxFrac=$maxFrac")
    // robust decomposition (median trend, median phase seasonal) — the
    // paper's robust-STL choice: an anomaly must not contaminate the
    // seasonal estimate it is judged against
    val dec = StlLite.decompose(df, series, ts, value, period,
      robust = true)
    val spark = df.sparkSession
    import spark.implicits._
    val typed = dec.select(col(series).cast("string").as("sk"),
        col("rn").cast("long").as("ord"),
        col(ts).cast("timestamp").as("ts"),
        col(value).cast("double").as("value"),
        col("seasonal").cast("double").as("seasonal"))
      .as[ShesdRow]
    graft.core.Grouped.pinned[String, ShesdRow](typed, col("sk"))
      .flatMapGroups { (sk: String, it: Iterator[ShesdRow]) =>
        val rows = it.toArray.sortBy(_.ord)
        val med = median(rows.map(_.value))
        val resid = rows.map(r => r.value - r.seasonal - med)
        val k = math.floor(maxFrac * rows.length).toInt
        val anom = gesdOutliers(resid, k, alpha, hybrid = true).toSet
        rows.indices.iterator.map { j =>
          ShesdOut(sk, rows(j).ts, rows(j).value, resid(j),
            if (anom.contains(j)) 1 else 0)
        }
      }
      .toDF("sk", "ts", "value", "shesd_resid", "is_anomaly")
      .withColumnRenamed("sk", series)
  }
}
