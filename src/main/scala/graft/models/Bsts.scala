package graft.models

import java.sql.Timestamp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M3: Bayesian structural time series — local linear trend +
  * trigonometric seasonal state space, the capability of statsmodels
  * UnobservedComponents as configured by the reference
  * (`src/bsts_model.py:12-50`: level='local linear trend',
  * freq_seasonal=[{period, harmonics ≤ 10}]; harmonic cap at
  * bsts_model.py:27-29). Forecast with CI over the test region
  * (`dynamic=True` run-out, bsts_model.py:52-71).
  *
  * State: [level, slope] ⊕ one 2-dim rotation block per harmonic.
  * Variance parameters are FIXED relative to the train variance
  * (SURVEY §7.4(1): exact statsmodels MLE parity is explicitly out of
  * scope; golden tests are tolerance-based).
  *
  * Scale: same mapGroups-per-series contract as M2; filter cost
  * O(n·d²) with d = 2 + 2·harmonics.
  */
object Bsts {

  case class Out(series_id: String, ts: Timestamp, value: Double,
                 bsts_mean: Double, bsts_lower: Double, bsts_upper: Double,
                 split: String)

  private[models] class Model(period: Double, harmonics: Int,
                              qLevel: Double, qSlope: Double,
                              qSeas: Double, val h: Double) {
    val d: Int = 2 + 2 * harmonics
    val T: DenseMatrix[Double] = {
      val t = DenseMatrix.zeros[Double](d, d)
      t(0, 0) = 1.0; t(0, 1) = 1.0; t(1, 1) = 1.0
      var j = 0
      while (j < harmonics) {
        val lam = 2 * math.Pi * (j + 1) / period
        val i = 2 + 2 * j
        t(i, i) = math.cos(lam); t(i, i + 1) = math.sin(lam)
        t(i + 1, i) = -math.sin(lam); t(i + 1, i + 1) = math.cos(lam)
        j += 1
      }
      t
    }
    val Z: DenseVector[Double] = {
      val z = DenseVector.zeros[Double](d)
      z(0) = 1.0
      var j = 0
      while (j < harmonics) { z(2 + 2 * j) = 1.0; j += 1 }
      z
    }
    val Q: DenseVector[Double] = {
      val q = DenseVector.zeros[Double](d)
      q(0) = qLevel; q(1) = qSlope
      var j = 2
      while (j < d) { q(j) = qSeas; j += 1 }
      q
    }

    /** Filter ys; returns (loglik, final a, final P). */
    def filter(ys: Array[Double], a0: DenseVector[Double],
               p0: DenseMatrix[Double])
        : (Double, DenseVector[Double], DenseMatrix[Double]) = {
      var a = a0; var p = p0
      var ll = 0.0
      var t = 0
      while (t < ys.length) {
        val aPred = T * a
        var pPred = T * p * T.t
        var i = 0
        while (i < d) { pPred(i, i) += Q(i); i += 1 }
        val f = (Z.t * pPred * Z) + h
        val v = ys(t) - (Z dot aPred)
        ll += -0.5 * (math.log(2 * math.Pi * f) + v * v / f)
        val k = (pPred * Z) / f
        a = aPred + k * v
        p = pPred - (k * Z.t * pPred)
        t += 1
      }
      (ll, a, p)
    }

    /** Dynamic forecast h steps from state (a, P): mean + obs variance. */
    def forecast(a0: DenseVector[Double], p0: DenseMatrix[Double],
                 steps: Int): (Array[Double], Array[Double]) = {
      var a = a0; var p = p0
      val mean = new Array[Double](steps); val varr = new Array[Double](steps)
      var t = 0
      while (t < steps) {
        a = T * a
        p = T * p * T.t
        var i = 0
        while (i < d) { p(i, i) += Q(i); i += 1 }
        mean(t) = Z dot a
        varr(t) = (Z.t * p * Z) + h
        t += 1
      }
      (mean, varr)
    }
  }

  /** Pipeline: fit-free filter on train (fixed variances scaled by train
    * variance), forecast the rest with a 1.96σ CI. */
  def run(df: DataFrame, series: String, ts: String, value: String,
          period: Double = 48, harmonics: Int = 3,
          trainFrac: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(series).cast("string"), col(ts), col(value))
      .as[(String, Timestamp, Double)]
    typed.groupByKey(_._1).flatMapGroups { (sid, it) =>
      val rows = it.toArray.sortBy(_._2.getTime)
      val ys = rows.map(_._3)
      val n = ys.length
      val trainEnd = (n * trainFrac).toInt
      if (trainEnd < 12) Iterator.empty
      else {
        val train = ys.slice(0, trainEnd)
        val m0 = train.sum / trainEnd
        val v0 = math.max(
          train.map(x => (x - m0) * (x - m0)).sum / trainEnd, 1e-8)
        val model = new Model(period, harmonics,
          qLevel = v0 * 1e-2, qSlope = v0 * 1e-4, qSeas = v0 * 1e-3,
          h = v0 * 0.5)
        val a0 = DenseVector.zeros[Double](model.d); a0(0) = ys(0)
        val p0 = DenseMatrix.eye[Double](model.d) * (v0 * 1e3)
        // filtered one-step predictions on train
        var a = a0; var p = p0
        val out = new Array[Out](n)
        var t = 0
        while (t < trainEnd) {
          val aPred = model.T * a
          var pPred = model.T * p * model.T.t
          var i = 0
          while (i < model.d) { pPred(i, i) += model.Q(i); i += 1 }
          val f = (model.Z.t * pPred * model.Z) + model.h
          val mu = model.Z dot aPred
          val sd = math.sqrt(f)
          out(t) = Out(sid, rows(t)._2, ys(t), mu, mu - 1.96 * sd,
            mu + 1.96 * sd, "Train")
          val v = ys(t) - mu
          val k = (pPred * model.Z) / f
          a = aPred + k * v
          p = pPred - (k * model.Z.t * pPred)
          t += 1
        }
        val (fm, fv) = model.forecast(a, p, n - trainEnd)
        while (t < n) {
          val j = t - trainEnd
          val sd = math.sqrt(fv(j))
          out(t) = Out(sid, rows(t)._2, ys(t), fm(j), fm(j) - 1.96 * sd,
            fm(j) + 1.96 * sd, "Test")
          t += 1
        }
        out.iterator
      }
    }.toDF()
  }

  // expose fixed variance knobs through the Model for tests
  private[models] def model(period: Double, harmonics: Int, qLevel: Double,
                            qSlope: Double, qSeas: Double, h: Double): Model =
    new Model(period, harmonics, qLevel, qSlope, qSeas, h)
}
