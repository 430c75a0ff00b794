package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ForecastSpec extends SparkSpec {

  /** (series, ts, value, pred, resid) frame on a second grid. */
  private def frame(rows: Seq[(Double, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((y, p), i) =>
      ("s", java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), y, p, y - p)
    }.toDF("series_id", "ts", "value", "pred", "resid")
  }

  test("perfect forecast scores zero on all three metrics") {
    val r = Forecast.accuracy(
        frame(Seq.tabulate(12)(i => (i + 1.0, i + 1.0))),
        "series_id", "ts", "value", "pred", "resid", m = 2)
      .collect().head
    assert(r.getAs[Double]("rmse") == 0.0)
    assert(r.getAs[Double]("smape") == 0.0)
    assert(r.getAs[Double]("mase") == 0.0)
  }

  test("hand-computed metrics on a small series") {
    // y = [10, 20, 30, 40], pred = [12, 18, 33, 40], m = 1
    val rows = Seq((10.0, 12.0), (20.0, 18.0), (30.0, 33.0), (40.0, 40.0))
    val r = Forecast.accuracy(frame(rows), "series_id", "ts", "value",
        "pred", "resid", m = 1).collect().head
    val resid = Seq(-2.0, 2.0, -3.0, 0.0)
    val rmse = math.sqrt(resid.map(x => x * x).sum / 4)
    val smape = rows.zip(resid).map { case ((y, p), e) =>
      2 * math.abs(e) / (math.abs(y) + math.abs(p)) }.sum / 4
    val naive = Seq(10.0, 10.0, 10.0) // |y_t - y_{t-1}|
    val mase = (resid.map(math.abs).sum / 4) / (naive.sum / 3)
    assert(math.abs(r.getAs[Double]("rmse") - rmse) < 1e-12)
    assert(math.abs(r.getAs[Double]("smape") - smape) < 1e-12)
    assert(math.abs(r.getAs[Double]("mase") - mase) < 1e-12)
    assert(r.getAs[Long]("n") == 4L)
  }

  test("MASE is null when the seasonal-naive denominator vanishes") {
    // y repeats with period 2 exactly: |y_t - y_{t-2}| = 0 everywhere
    val r = Forecast.accuracy(
        frame(Seq.tabulate(10)(i => (if (i % 2 == 0) 5.0 else 8.0, 6.0))),
        "series_id", "ts", "value", "pred", "resid", m = 2)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("mase")))
    assert(r.getAs[Double]("rmse") > 0) // the others still defined
  }

  test("sMAPE skips points where |y| + |pred| = 0") {
    val r = Forecast.accuracy(
        frame(Seq((0.0, 0.0), (10.0, 5.0), (10.0, 5.0))),
        "series_id", "ts", "value", "pred", "resid", m = 1)
      .collect().head
    // only the two informative points contribute: 2*5/15 each
    assert(math.abs(r.getAs[Double]("smape") - 2.0 / 3) < 1e-12)
  }

  test("MASE is scale-free: scaling the series leaves it unchanged") {
    val rows = Seq.tabulate(20)(i =>
      (math.sin(i * 0.5) * 10 + 20, math.sin(i * 0.5) * 10 + 19))
    val a = Forecast.accuracy(frame(rows), "series_id", "ts", "value",
      "pred", "resid", m = 1).collect().head.getAs[Double]("mase")
    val b = Forecast.accuracy(
      frame(rows.map { case (y, p) => (y * 100, p * 100) }),
      "series_id", "ts", "value", "pred", "resid", m = 1)
      .collect().head.getAs[Double]("mase")
    assert(math.abs(a - b) < 1e-9)
  }
}
