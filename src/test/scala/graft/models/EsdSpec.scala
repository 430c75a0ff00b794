package graft.models

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ESD / S-H-ESD contracts: the Student-t quantile is pinned against
  * published t-table values (the one place a special-function bug
  * would silently corrupt every critical value), GESD against planted
  * outliers with the masking case that motivates the hybrid form, and
  * the full S-H-ESD against an injected-spike seasonal series.
  */
class EsdSpec extends SparkSpec {

  test("tQuantile matches published t-table critical values") {
    val table = Seq(
      // (p, df, expected) — standard two-sided 95% etc. table entries
      (0.975, 10.0, 2.2281),
      (0.95, 5.0, 2.0150),
      (0.995, 30.0, 2.7500),
      (0.975, 1.0, 12.7062),
      (0.90, 20.0, 1.3253),
      (0.975, 120.0, 1.9799))
    table.foreach { case (p, df, exp) =>
      val got = Esd.tQuantile(p, df)
      assert(math.abs(got - exp) < 5e-4, s"t_{$p,$df}: $got vs $exp")
    }
    // symmetry
    assert(math.abs(Esd.tQuantile(0.025, 10.0) +
      Esd.tQuantile(0.975, 10.0)) < 1e-9)
  }

  test("betainc satisfies the identities that pin its branches") {
    // I_x(1,1) = x (uniform case)
    Seq(0.1, 0.37, 0.5, 0.9).foreach { x =>
      assert(math.abs(Esd.betainc(1.0, 1.0, x) - x) < 1e-12)
    }
    // complement identity across the continued-fraction flip
    Seq((2.5, 3.5, 0.2), (0.5, 5.0, 0.7), (4.0, 0.5, 0.9))
      .foreach { case (a, b, x) =>
        val s = Esd.betainc(a, b, x) + Esd.betainc(b, a, 1.0 - x)
        assert(math.abs(s - 1.0) < 1e-10, s"I($a,$b,$x) complement: $s")
      }
  }

  test("gesdOutliers flags exactly the planted spikes (hybrid)") {
    // deterministic small noise via an LCG, three huge spikes
    var seed = 12345L
    def next(): Double = {
      seed = (seed * 48271L) % 2147483647L
      (seed % 1000) / 1000.0 - 0.5
    }
    val base = Array.fill(100)(next())
    base(17) = 40.0; base(55) = -35.0; base(80) = 30.0
    val got = Esd.gesdOutliers(base, maxOutliers = 10).toSet
    assert(got === Set(17, 55, 80))
    // clean series: nothing flagged
    val clean = Array.fill(100)(next())
    assert(Esd.gesdOutliers(clean, 10).isEmpty)
  }

  test("classic and hybrid GESD both recover clustered spikes (Rosner's largest-i scan)") {
    // 20% contamination inflates the round-1 std so the FIRST R_i
    // fails lambda — the largest-significant-i definition (not
    // first-failure) is what lets both forms still flag all eight
    val xs = Array.tabulate(40)(i => (i % 7) * 0.01)
    (0 until 8).foreach(j => xs(j * 5 + 2) = 25.0)
    val planted = (0 until 8).map(_ * 5 + 2).toSet
    assert(Esd.gesdOutliers(xs, 10, hybrid = true).toSet === planted)
    assert(Esd.gesdOutliers(xs, 10, hybrid = false).toSet === planted)
  }

  test("gesd stops at the numeric deadband on exactly-repeating data") {
    // exactly periodic base + one spike: MAD is float noise; without
    // the relative deadband every rounding wiggle clears lambda
    val xs = Array.tabulate(60)(i => (i % 6).toDouble)
    xs(30) = 500.0
    assert(Esd.gesdOutliers(xs, 6).toSet === Set(30))
    // constant base + spike: MAD is exactly 0, the relative floor keeps
    // the spike arbitrarily significant instead of aborting the test
    val const = Array.fill(50)(3.14)
    const(25) = 99.0
    assert(Esd.gesdOutliers(const, 5).toSet === Set(25))
    // fully constant, no spike: nothing to flag, no division blow-up
    assert(Esd.gesdOutliers(Array.fill(50)(3.14), 5).isEmpty)
  }

  test("smaller alpha flags a subset (monotone type-I control)") {
    var seed = 999L
    def next(): Double = {
      seed = (seed * 48271L) % 2147483647L
      (seed % 1000) / 100.0
    }
    val xs = Array.fill(80)(next())
    xs(10) = 200.0; xs(40) = 150.0; xs(60) = 120.0
    val loose = Esd.gesdOutliers(xs, 10, alpha = 0.10).toSet
    val tight = Esd.gesdOutliers(xs, 10, alpha = 0.01).toSet
    assert(tight.subsetOf(loose), s"$tight not within $loose")
    assert(loose.contains(10) && loose.contains(40))
  }

  test("seasonalHybridEsd flags injected spikes on a seasonal series") {
    import spark.implicits._
    val period = 12
    // two series, deterministic seasonal pattern + injected spikes
    var seed = 4242L
    def noise(): Double = {
      seed = (seed * 48271L) % 2147483647L
      (seed % 1000) / 1000.0 - 0.5
    }
    val rows = for {
      s <- Seq("a", "b")
      i <- 0 until 240
    } yield {
      val seasonal = Seq(0.0, 2.0, 5.0, 8.0, 9.0, 7.0, 4.0, 1.0, -1.0,
        -3.0, -4.0, -2.0)(i % period)
      val spike =
        if (s == "a" && (i == 50 || i == 130)) 60.0
        else if (s == "b" && i == 77) -55.0 else 0.0
      (s, new java.sql.Timestamp(1700000000000L + i * 3600000L),
        100.0 + seasonal + noise() + spike)
    }
    val out = Esd.seasonalHybridEsd(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", period)
      .filter(col("is_anomaly") === 1)
      .select("user_id", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime)).toSet
    val t0 = 1700000000000L
    assert(out === Set(
      ("a", t0 + 50L * 3600000L), ("a", t0 + 130L * 3600000L),
      ("b", t0 + 77L * 3600000L)), s"flagged: $out")
  }

  test("seasonalHybridEsd is invariant to input partitioning") {
    import spark.implicits._
    val rows = (0 until 120).map(i =>
      ("s", new java.sql.Timestamp(1700000000000L + i * 60000L),
        (i % 24).toDouble + (if (i == 60) 500.0 else 0.0)))
    def run(parts: Int) = Esd.seasonalHybridEsd(
        rows.toDF("user_id", "ts", "value").repartition(parts),
        "user_id", "ts", "value", 24)
      .collect().map(_.toSeq).toSet
    assert(run(1) === run(7))
  }
}
