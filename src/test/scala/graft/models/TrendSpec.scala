package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendSpec extends SparkSpec {

  private def run(vals: Seq[Double]) =
    Trend.theilSenMannKendall(valueSeries(vals), "series_id", "ts",
      "value").collect().head

  test("perfect ascending line: exact slope/intercept, tau=1, S=n(n-1)/2") {
    val n = 21
    val r = run(Seq.tabulate(n)(i => 5.0 + 2.0 * (i + 1)))
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Double]("ts_slope") == 2.0)
    assert(r.getAs[Double]("ts_intercept") == 5.0)
    assert(r.getAs[Long]("mk_s") == n.toLong * (n - 1) / 2)
    assert(r.getAs[Double]("mk_tau") == 1.0)
    // no ties: Var = n(n-1)(2n+5)/18; z = (S-1)/sqrt(Var)
    val varS = n.toDouble * (n - 1) * (2 * n + 5) / 18.0
    assert(math.abs(r.getAs[Double]("mk_var") - varS) < 1e-9)
    val z = (n.toDouble * (n - 1) / 2 - 1) / math.sqrt(varS)
    assert(math.abs(r.getAs[Double]("mk_z") - z) < 1e-6)
  }

  test("descending line: tau=-1, z negative with +1 continuity correction") {
    val n = 15
    val r = run(Seq.tabulate(n)(i => 100.0 - 3.0 * i))
    assert(r.getAs[Double]("ts_slope") == -3.0)
    assert(r.getAs[Double]("mk_tau") == -1.0)
    val s = -n.toLong * (n - 1) / 2
    assert(r.getAs[Long]("mk_s") == s)
    val varS = n.toDouble * (n - 1) * (2 * n + 5) / 18.0
    assert(math.abs(r.getAs[Double]("mk_z") -
      (s + 1).toDouble / math.sqrt(varS)) < 1e-6)
  }

  test("Theil-Sen is robust: one huge spike does not bend the slope") {
    // 21-point unit-slope line with one 1000x outlier (off-center, so
    // OLS actually bends): only 20 of the 210 pairwise slopes are
    // contaminated — the median stays exactly 1
    val vals = Seq.tabulate(21)(i => i.toDouble).updated(3, 5000.0)
    val r = run(vals)
    assert(r.getAs[Double]("ts_slope") == 1.0)
    // OLS on the same data would be wildly off (sanity of the premise)
    val n = vals.length
    val xs = (1 to n).map(_.toDouble)
    val xm = xs.sum / n; val ym = vals.sum / n
    val beta = xs.zip(vals).map { case (x, y) => (x - xm) * (y - ym) }.sum /
      xs.map(x => (x - xm) * (x - xm)).sum
    assert(math.abs(beta - 1.0) > 10)
  }

  test("constant series: all tied, Var=0, z=0, slope=0") {
    val r = run(Seq.fill(10)(7.0))
    assert(r.getAs[Double]("ts_slope") == 0.0)
    assert(r.getAs[Long]("mk_s") == 0L)
    assert(r.getAs[Double]("mk_var") == 0.0)
    assert(r.getAs[Double]("mk_z") == 0.0)
  }

  test("tie-corrected variance matches the hand formula") {
    // y = [1,1,2,2,2,3]: tie groups of sizes 2 and 3
    val r = run(Seq(1.0, 1.0, 2.0, 2.0, 2.0, 3.0))
    val n = 6
    val tie = 2 * 1 * 9 + 3 * 2 * 11 // t(t-1)(2t+5) for t=2, t=3
    val varS = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    assert(math.abs(r.getAs[Double]("mk_var") - varS) < 1e-9)
    // S by brute force
    val y = Seq(1.0, 1.0, 2.0, 2.0, 2.0, 3.0)
    val s = (for (i <- 0 until n; j <- i + 1 until n)
      yield math.signum(y(j) - y(i)).toLong).sum
    assert(r.getAs[Long]("mk_s") == s)
  }

  test("multi-series: independent fits, short series dropped") {
    import spark.implicits._
    val rows = (0 until 12).map { i =>
      ("up", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        i.toDouble)
    } ++ (0 until 12).map { i =>
      ("down", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        -2.0 * i)
    } ++ Seq(("lone",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
    val out = Trend.theilSenMannKendall(
        rows.toDF("series_id", "ts", "value"), "series_id", "ts", "value")
      .collect().map(r => r.getAs[String]("series_id") -> r).toMap
    assert(out.keySet == Set("up", "down"))
    assert(out("up").getAs[Double]("ts_slope") == 1.0)
    assert(out("down").getAs[Double]("ts_slope") == -2.0)
  }

  test("deterministic under repartition") {
    val df = valueSeries(Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0))
    val a = Trend.theilSenMannKendall(df, "series_id", "ts", "value")
      .collect().toSeq
    val b = Trend.theilSenMannKendall(df.repartition(5), "series_id",
      "ts", "value").collect().toSeq
    assert(a == b)
  }

  test("windowed with w >= n-1 equals the exact form") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0,
      5.0, 8.0, 9.0, 7.0, 9.0)
    val df = valueSeries(vals)
    val ex = Trend.theilSenMannKendall(df, "series_id", "ts", "value")
      .collect().head
    for (w <- Seq(vals.length - 1, vals.length, 100)) {
      val r = Trend.theilSenWindowed(df, "series_id", "ts", "value", w)
        .collect().head
      assert(r.getAs[Long]("n") == vals.length.toLong)
      assert(r.getAs[Long]("n_pairs") ==
        vals.length.toLong * (vals.length - 1) / 2,
        s"w=$w must include every pair")
      assert(r.getAs[Double]("ts_slope") == ex.getAs[Double]("ts_slope"))
      assert(r.getAs[Double]("ts_intercept") ==
        ex.getAs[Double]("ts_intercept"))
      assert(r.getAs[Long]("s_w") == ex.getAs[Long]("mk_s"))
    }
  }

  test("windowed pair count is exactly the lag-<=w census") {
    // n=40, w=7: pairs = sum over ib of min(ib-1, w) — brute force it
    val n = 40; val w = 7
    val vals = Seq.tabulate(n)(i => math.sin(i * 0.7) * 10 + i * 0.1)
    val r = Trend.theilSenWindowed(valueSeries(vals), "series_id",
      "ts", "value", w).collect().head
    val expected = (2 to n).map(ib => math.min(ib - 1, w)).sum.toLong
    assert(r.getAs[Long]("n_pairs") == expected)
    // brute-force windowed slope/S agree (median of lag<=w slopes)
    val pairs = for (i <- 0 until n; j <- i + 1 until n
      if j - i <= w) yield (vals(j) - vals(i)) / (j - i).toDouble
    val sorted = pairs.sorted
    val m = sorted.length
    val med = if (m % 2 == 1) sorted(m / 2)
      else (sorted(m / 2 - 1) + sorted(m / 2)) / 2.0
    assert(math.abs(r.getAs[Double]("ts_slope") - med) < 1e-12)
    val sW = (for (i <- 0 until n; j <- i + 1 until n if j - i <= w)
      yield math.signum(vals(j) - vals(i)).toLong).sum
    assert(r.getAs[Long]("s_w") == sW)
  }

  test("windowed keeps Theil-Sen robustness on a lag-capped budget") {
    // unit-slope line with a spike: the lag cap still leaves the
    // outlier's contaminated pairs a minority at every lag
    val vals = Seq.tabulate(60)(i => i.toDouble).updated(11, 4000.0)
    val r = Trend.theilSenWindowed(valueSeries(vals), "series_id",
      "ts", "value", w = 8).collect().head
    assert(r.getAs[Double]("ts_slope") == 1.0)
  }

  test("windowed deterministic under repartition") {
    val vals = Seq.tabulate(50)(i => math.cos(i * 0.3) * 5 + 0.2 * i)
    val df = valueSeries(vals)
    val a = Trend.theilSenWindowed(df, "series_id", "ts", "value", 6)
      .collect().toSeq
    val b = Trend.theilSenWindowed(df.repartition(7), "series_id",
      "ts", "value", 6).collect().toSeq
    assert(a == b)
  }
}
