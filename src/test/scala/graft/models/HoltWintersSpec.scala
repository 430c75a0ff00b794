package graft.models

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HoltWintersSpec extends SparkSpec {

  /** Independent reference recursion (same published equations,
    * written flat). */
  private def reference(y: Array[Double], m: Int, a: Double, b0: Double,
                        g: Double): Array[(Double, Double)] = {
    val mean1 = y.slice(0, m).sum / m
    val mean2 = y.slice(m, 2 * m).sum / m
    var l = mean1
    var b = (mean2 - mean1) / m
    val s = Array.tabulate(m)(i => y(i) - mean1)
    y.zipWithIndex.map { case (v, t) =>
      val si = t % m
      val pred = l + b + s(si)
      val lNew = a * (v - s(si)) + (1 - a) * (l + b)
      b = b0 * (lNew - l) + (1 - b0) * b
      s(si) = g * (v - lNew) + (1 - g) * s(si)
      l = lNew
      (pred, v - pred)
    }
  }

  test("forecast matches the reference recursion bit-for-bit") {
    import spark.implicits._
    val m = 4
    val y = Array.tabulate(40)(t =>
      10.0 + 0.5 * t + Seq(3.0, -1.0, -4.0, 2.0)(t % m) +
        ((t * 7919) % 13) * 0.1)
    val rows = y.zipWithIndex.map { case (v, t) =>
      ("s", new java.sql.Timestamp(1700000000000L + t * 60000L), v)
    }
    val got = HoltWinters.forecast(rows.toSeq.toDF("sid", "ts", "v"),
        "sid", "ts", "v", m)
      .orderBy("ts").collect()
      .map(r => (r.getAs[Double]("hw_pred"), r.getAs[Double]("hw_resid")))
    val exp = reference(y, m, 0.2, 0.1, 0.3)
    assert(got.length === exp.length)
    got.zip(exp).zipWithIndex.foreach { case (((gp, gr), (ep, er)), t) =>
      assert(gp === ep, s"pred at $t")
      assert(gr === er, s"resid at $t")
    }
  }

  test("residuals shrink as the smoother locks onto trend + seasonality") {
    import spark.implicits._
    val m = 6
    val rows = (0 until 120).map { t =>
      val v = 50.0 + 0.3 * t + Seq(5.0, 2.0, -1.0, -6.0, -2.0, 2.0)(t % m)
      ("s", new java.sql.Timestamp(1700000000000L + t * 60000L), v)
    }
    val resid = HoltWinters.forecast(rows.toDF("sid", "ts", "v"),
        "sid", "ts", "v", m)
      .orderBy("ts").collect().map(r => math.abs(r.getAs[Double]("hw_resid")))
    val early = resid.slice(m, 3 * m).sum / (2 * m)
    val late = resid.takeRight(2 * m).sum / (2 * m)
    assert(late < early / 5 || late < 1e-6,
      s"no convergence: early=$early late=$late")
  }

  test("short series (< 2 periods) emit nothing; output is partition-invariant") {
    import spark.implicits._
    val short = (0 until 7).map(t =>
      ("x", new java.sql.Timestamp(1700000000000L + t * 60000L), t * 1.0))
    assert(HoltWinters.forecast(short.toDF("sid", "ts", "v"),
      "sid", "ts", "v", 4).count() === 0L)
    val rows = (0 until 50).flatMap(t => Seq(
      ("a", new java.sql.Timestamp(1700000000000L + t * 60000L),
        (t % 5) * 2.0),
      ("b", new java.sql.Timestamp(1700000000000L + t * 60000L),
        100.0 - t)))
    def run(parts: Int) = HoltWinters.forecast(
        rows.toDF("sid", "ts", "v").repartition(parts),
        "sid", "ts", "v", 5)
      .collect().map(_.toSeq).toSet
    assert(run(1) === run(9))
  }
}
