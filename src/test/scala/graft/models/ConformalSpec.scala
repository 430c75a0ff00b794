package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {

  private def frame(resids: Seq[Double], series: String = "s") = {
    import spark.implicits._
    resids.zipWithIndex.map { case (r, i) =>
      (series, java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), r * 10, r)
    }.toDF("series_id", "ts", "value", "resid")
  }

  /** Longhand recompute of the split-conformal rule. */
  private def expected(resids: Seq[Double], alpha: Double)
      : (Double, Seq[Int]) = {
    val n = resids.length
    val ncal = n / 2
    val sorted = resids.take(ncal).map(math.abs).sorted
    val k = math.ceil((ncal + 1) * (1.0 - alpha)).toLong
    val qhat = if (k <= ncal) sorted(k.toInt - 1)
      else Double.PositiveInfinity
    (qhat, resids.drop(ncal).map(r =>
      if (math.abs(r) > qhat) 1 else 0))
  }

  test("matches the longhand split-conformal rule exactly") {
    val resids = Seq(0.3, -1.2, 0.7, 2.5, -0.1, 0.9, -1.8, 0.4, 1.1,
      -0.6, 3.2, -0.2, 0.5, -2.9, 0.8, 1.4, -0.35, 0.05, 2.2, -1.0)
    val (qhat, flags) = expected(resids, 0.1)
    val out = Conformal.splitConformal(frame(resids), "series_id",
        "ts", "value", "resid", alpha = 0.1)
      .orderBy("ts").collect()
    assert(out.length == resids.length - resids.length / 2)
    assert(out.forall(_.getAs[Double]("qhat") == qhat))
    assert(out.map(_.getAs[Int]("is_anomaly")).toSeq == flags)
  }

  test("k = ncal at alpha=0.1 with 20 points: qhat is the calibration max") {
    // ncal = 10, k = ceil(11 * 0.9) = 10 -> the largest calibration |r|
    val resids = Seq.tabulate(20)(i => (i % 7 + 1).toDouble *
      (if (i % 2 == 0) 1 else -1))
    val calMax = resids.take(10).map(math.abs).max
    val out = Conformal.splitConformal(frame(resids), "series_id",
      "ts", "value", "resid").collect()
    assert(out.forall(_.getAs[Double]("qhat") == calMax))
  }

  test("alpha too small for the sample: infinite band, nothing flags") {
    val out = Conformal.splitConformal(frame(Seq(1.0, 2.0, 50.0, 60.0)),
        "series_id", "ts", "value", "resid", alpha = 0.1)
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Double]("qhat").isPosInfinity))
    assert(out.forall(_.getAs[Int]("is_anomaly") == 0))
  }

  test("planted test-half outlier flags; in-band points do not") {
    val resids = Seq.fill(30)(1.0) ++ Seq.fill(14)(0.5) ++ Seq(25.0)
    val out = Conformal.splitConformal(frame(resids), "series_id",
        "ts", "value", "resid", alpha = 0.1)
      .orderBy("ts").collect()
    assert(out.last.getAs[Int]("is_anomaly") == 1)
    assert(out.init.forall(_.getAs[Int]("is_anomaly") == 0))
  }

  test("multi-series isolation and short-series drop") {
    import spark.implicits._
    val rows =
      (0 until 20).map(i => ("wide", ts(i), 0.0, (i % 5).toDouble)) ++
      (0 until 3).map(i => ("tiny", ts(i), 0.0, 1.0))
    val out = Conformal.splitConformal(
        rows.toDF("series_id", "ts", "value", "resid"),
        "series_id", "ts", "value", "resid")
      .collect()
    assert(out.forall(_.getAs[String]("series_id") == "wide"))
  }

  private def ts(i: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d")
}
