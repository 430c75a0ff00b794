package graft.models

import graft.SparkSpec

/** Exact-mode STL: loess smoother sanity + decomposition quality on
  * synthetic trend+seasonal data (statsmodels tolerance-parity per
  * SURVEY §7.4(3)). */
class StlExactSpec extends SparkSpec {

  test("loess recovers a linear signal exactly") {
    val ys = Array.tabulate(50)(i => 2.0 + 0.5 * i)
    val sm = StlExact.loess(ys, 11)
    ys.indices.foreach { i =>
      assert(math.abs(sm(i) - ys(i)) < 1e-9, s"at $i: ${sm(i)} vs ${ys(i)}")
    }
  }

  test("loess smooths noise around a curve") {
    val rng = new scala.util.Random(3)
    val ys = Array.tabulate(200)(i =>
      math.sin(i / 20.0) * 5 + rng.nextGaussian() * 0.5)
    val sm = StlExact.loess(ys, 21)
    val mse = ys.indices.map(i =>
      math.pow(sm(i) - math.sin(i / 20.0) * 5, 2)).sum / ys.length
    assert(mse < 0.1, s"loess mse $mse")
  }

  test("STL exact separates trend and seasonal cleanly") {
    val rng = new scala.util.Random(9)
    val n = 480; val period = 24
    val trendTrue = Array.tabulate(n)(i => 10 + 0.02 * i)
    val seasTrue = Array.tabulate(n)(i =>
      4 * math.sin(2 * math.Pi * i / period))
    val ys = Array.tabulate(n)(i =>
      trendTrue(i) + seasTrue(i) + rng.nextGaussian() * 0.3)
    val (trend, seasonal) = StlExact.stl(ys, period)
    val core = 2 * period until (n - 2 * period)
    val trendMae = core.map(i => math.abs(trend(i) - trendTrue(i)))
      .sum / core.length
    val seasMae = core.map(i => math.abs(seasonal(i) - seasTrue(i)))
      .sum / core.length
    assert(trendMae < 0.5, s"trend MAE $trendMae")
    assert(seasMae < 0.5, s"seasonal MAE $seasMae")
  }

  test("robust STL shrugs off outliers") {
    // noise matters: with a noiseless fixture the bisquare scale
    // h = 6·median(|resid|) degenerates to ~0 and every weight dies
    // (statsmodels' robust STL has the same edge)
    val rng = new scala.util.Random(11)
    val n = 240; val period = 24
    val ys = Array.tabulate(n)(i =>
      10 + 4 * math.sin(2 * math.Pi * i / period)
        + rng.nextGaussian() * 0.3)
    ys(100) = 100.0 // single gross outlier
    val (trend, seasonal) = StlExact.stl(ys, period, outerIters = 15)
    val resid = Array.tabulate(n)(i => ys(i) - trend(i) - seasonal(i))
    // the outlier's influence on NEIGHBORING residuals stays bounded
    val neighbors = Seq(97, 98, 99, 101, 102, 103)
    neighbors.foreach { i =>
      assert(math.abs(resid(i)) < 2.0, s"resid($i) = ${resid(i)}")
    }
    assert(resid(100) > 50, "outlier itself must stay in the residual")
  }

  test("DataFrame pipeline emits aligned decomposition columns") {
    val ys = (0 until 200).map(i =>
      5.0 + 3 * math.sin(2 * math.Pi * i / 20.0))
    val out = StlExact.decompose(valueSeries(ys), "series_id", "ts",
      "value", 20).orderBy("ts").collect()
    assert(out.length === 200)
    out.foreach { r =>
      val v = r.getAs[Double]("value")
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(v - sum) < 1e-9)
    }
  }
}
