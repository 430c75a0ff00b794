package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpcSpec extends SparkSpec {

  // ---- EWMA control chart ----

  test("ewma: recursion and time-varying limit match the hand formulas") {
    val vals = Seq(2.0, 4.0, 3.0, 5.0, 4.0, 2.0, 3.0, 4.0)
    val out = Spc.ewmaChart(valueSeries(vals), "series_id", "ts", "value",
        lambda = 0.2, l = 3.0)
      .orderBy("ts").collect()
    assert(out.length == vals.length)
    // independent longhand: Welford mean/std, then the Roberts recursion
    val n = vals.length
    val mu = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / (n - 1))
    var z = mu
    for ((v, t) <- vals.zipWithIndex) {
      z = 0.2 * v + 0.8 * z
      val lim = 3.0 * sd * math.sqrt(0.2 / 1.8 *
        (1.0 - math.pow(0.8, 2.0 * (t + 1))))
      val row = out(t)
      assert(math.abs(row.getAs[Double]("ewma") - z) < 1e-12,
        s"ewma at t=$t")
      assert(math.abs(row.getAs[Double]("limit") - lim) < 1e-9,
        s"limit at t=$t")
      assert(row.getAs[Int]("is_anomaly") ==
        (if (math.abs(z - mu) > lim) 1 else 0))
    }
  }

  test("ewma: catches a small sustained shift a pointwise 3-sigma test misses") {
    // 60 points oscillating ±1 around 0, then 30 points oscillating
    // ±1 around 3: the shift inflates σ̂ (estimated over the whole
    // series) so every single point stays inside the pointwise 3σ̂
    // band, but the EWMA accumulates past its tighter limit.
    val base = Seq.tabulate(60)(i => if (i % 2 == 0) 1.0 else -1.0)
    val shifted = Seq.tabulate(30)(i => 3.0 + (if (i % 2 == 0) 1.0 else -1.0))
    val vals = base ++ shifted
    val df = valueSeries(vals)
    val out = Spc.ewmaChart(df, "series_id", "ts", "value")
      .orderBy("ts").collect()
    val flags = out.map(_.getAs[Int]("is_anomaly"))
    assert(flags.take(60).forall(_ == 0), "no false alarm pre-shift")
    assert(flags.drop(75).count(_ == 1) > 10, "sustained shift flagged")
    // the pointwise test indeed misses: every |value - mu| < 3σ̂
    val n = vals.length
    val mu = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / (n - 1))
    assert(vals.forall(v => math.abs(v - mu) < 3 * sd))
  }

  test("ewma: deterministic under repartition; short series dropped") {
    import spark.implicits._
    val df = valueSeries(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 4.0, 3.0))
    val a = Spc.ewmaChart(df, "series_id", "ts", "value")
      .orderBy("ts").collect().toSeq
    val b = Spc.ewmaChart(df.repartition(7), "series_id", "ts", "value")
      .orderBy("ts").collect().toSeq
    assert(a == b)
    val short = Seq(("s1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1.0)).toDF("series_id", "ts", "value")
    assert(Spc.ewmaChart(short, "series_id", "ts", "value").count() == 0)
  }

  // ---- CUSUM ----

  test("cusum: tabular recursion matches the hand formulas") {
    val vals = Seq(0.0, 1.0, -1.0, 2.0, 3.0, 4.0, 5.0, -2.0)
    val out = Spc.cusum(valueSeries(vals), "series_id", "ts", "value",
        k = 0.5, h = 2.0)
      .orderBy("ts").collect()
    val n = vals.length
    val mu = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / (n - 1))
    var sp = 0.0; var sn = 0.0
    for ((v, t) <- vals.zipWithIndex) {
      val z = (v - mu) / sd
      sp = math.max(0.0, sp + z - 0.5)
      sn = math.max(0.0, sn - z - 0.5)
      assert(math.abs(out(t).getAs[Double]("cusum_hi") - sp) < 1e-12)
      assert(math.abs(out(t).getAs[Double]("cusum_lo") - sn) < 1e-12)
      assert(out(t).getAs[Int]("is_anomaly") ==
        (if (sp > 2.0 || sn > 2.0) 1 else 0))
    }
  }

  test("cusum: alarms after a planted mean shift, not before") {
    val vals = Seq.tabulate(80)(i => if (i % 2 == 0) 1.0 else -1.0) ++
      Seq.tabulate(40)(i => 2.5 + (if (i % 2 == 0) 1.0 else -1.0))
    val out = Spc.cusum(valueSeries(vals), "series_id", "ts", "value")
      .orderBy("ts").collect()
    val flags = out.map(_.getAs[Int]("is_anomaly"))
    assert(flags.take(80).forall(_ == 0), "quiet before the shift")
    assert(flags.drop(90).forall(_ == 1), "latched after the shift")
    // both sums are non-negative by construction
    assert(out.forall(r => r.getAs[Double]("cusum_hi") >= 0.0 &&
      r.getAs[Double]("cusum_lo") >= 0.0))
  }

  test("cusum: downward shifts land on the low-side sum") {
    val vals = Seq.tabulate(80)(i => if (i % 2 == 0) 1.0 else -1.0) ++
      Seq.tabulate(40)(i => -2.5 + (if (i % 2 == 0) 1.0 else -1.0))
    val out = Spc.cusum(valueSeries(vals), "series_id", "ts", "value")
      .orderBy("ts").collect()
    val tail = out.drop(90)
    assert(tail.forall(_.getAs[Int]("is_anomaly") == 1))
    assert(tail.forall(r => r.getAs[Double]("cusum_lo") >
      r.getAs[Double]("cusum_hi")))
  }

  test("spc: multi-series isolation (per-series mean/std, no leakage)") {
    import spark.implicits._
    // series a is constant-ish around 0, series b around 100 — if the
    // stats leaked across series, everything would flag
    val rows = (0 until 20).flatMap { i =>
      val ts = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d")
      Seq(("a", ts, if (i % 2 == 0) 0.5 else -0.5),
          ("b", ts, 100.0 + (if (i % 2 == 0) 0.5 else -0.5)))
    }
    val df = rows.toDF("series_id", "ts", "value")
    val e = Spc.ewmaChart(df, "series_id", "ts", "value").collect()
    assert(e.forall(_.getAs[Int]("is_anomaly") == 0))
    val c = Spc.cusum(df, "series_id", "ts", "value").collect()
    assert(c.forall(_.getAs[Int]("is_anomaly") == 0))
  }
}
