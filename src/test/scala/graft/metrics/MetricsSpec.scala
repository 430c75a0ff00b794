package graft.metrics

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.events.Events

/** A5 epsilon formulas, A10 sweep tie-break + rate guard. */
class MetricsSpec extends SparkSpec {

  test("pointwise uses the 1e-9 epsilon formulas (evaluate.py:6-25)") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 0), (0, 1), (0, 0), (1, 1))
      .zipWithIndex.map { case ((t, p), i) =>
        ("s", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$i"), t, p)
      }.toDF("series_id", "ts", "t", "p")
    val m = Metrics.pointwise(df, Seq("series_id"), "t", "p").collect().head
    assert(m.getAs[Long]("tp") === 2)
    assert(m.getAs[Long]("fp") === 1)
    assert(m.getAs[Long]("fn") === 1)
    assert(math.abs(m.getAs[Double]("precision") - 2 / (3 + 1e-9)) < 1e-15)
    assert(math.abs(m.getAs[Double]("recall") - 2 / (3 + 1e-9)) < 1e-15)
  }

  test("sweep keeps the smallest k at the best F1 (strict > tie-break)") {
    // One clean anomaly run; z high there. Any k in the grid below z-max
    // detects the same single event → same F1 → winner must be smallest k.
    val z = Seq(0.1, 0.1, 5.0, 5.0, 0.2, 0.1, 0.1, 0.1)
    val t = Seq(0, 0, 1, 1, 0, 0, 0, 0)
    import spark.implicits._
    val df = z.zip(t).zipWithIndex.map { case ((zz, tt), i) =>
      ("s", java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), zz, tt)
    }.toDF("series_id", "ts", "z", "tflag")
    val truth = Events.eventize(df, Seq("series_id"), "ts", "tflag", 3)
    val best = Metrics.sweep(df.select("series_id", "ts", "z"),
      Seq("series_id"), "ts", "z", Seq(2.0, 3.0, 4.0), 2, 3, truth,
      maxRate = 0.5)
      .collect().head
    assert(best.getAs[Double]("best_k") === 2.0)
    assert(best.getAs[Double]("best_f1") > 0.99)
  }

  test("rate guard rejects candidates flagging more than maxRate") {
    // k=0.05 flags everything (rate 1.0) → rejected; k=4 flags only the
    // 2-row run → rate 2/30 <= 0.10 passes the guard
    val z = Seq(0.1, 0.1, 5.0, 5.0) ++ Seq.fill(26)(0.1)
    val t = Seq(0, 0, 1, 1) ++ Seq.fill(26)(0)
    import spark.implicits._
    val df = z.zip(t).zipWithIndex.map { case ((zz, tt), i) =>
      ("s", java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), zz, tt)
    }.toDF("series_id", "ts", "z", "tflag")
    val truth = Events.eventize(df, Seq("series_id"), "ts", "tflag", 3)
    val res = Metrics.sweep(df.select("series_id", "ts", "z"),
      Seq("series_id"), "ts", "z", Seq(0.05, 4.0), 2, 3, truth,
      maxRate = 0.10)
      .collect()
    assert(res.length === 1)
    assert(res.head.getAs[Double]("best_k") === 4.0)
  }

  test("business metrics: fp/day and median latency") {
    // series spans 2 days; pred events: one overlapping truth, one not
    import spark.implicits._
    val rows = (0 until 49).map { h =>
      ("s", java.sql.Timestamp.valueOf(f"2024-01-0${1 + h / 24} ${h % 24}%02d:00:00"), 1.0)
    }
    val series = rows.toDF("series_id", "ts", "value")
    val pred = Events.eventize(series
      .withColumn("f", when(col("ts").cast("string")
        .isin("2024-01-01 05:00:00", "2024-01-02 10:00:00"), 1).otherwise(0)),
      Seq("series_id"), "ts", "f", 0)
    val truth = Events.eventize(series
      .withColumn("f", when(col("ts").cast("string") === "2024-01-01 04:00:00", 1)
        .otherwise(0)),
      Seq("series_id"), "ts", "f", 0)
    // pred [6,6] vs truth [5,5]: no overlap → 2 fp events, 0 detected
    val b = Metrics.business(series, Seq("series_id"), "ts", pred, truth)
      .collect().head
    assert(b.getAs[Long]("fp_count") === 2)
    assert(math.abs(b.getAs[Double]("duration_days") - 2.0) < 1e-9)
    assert(math.abs(b.getAs[Double]("fp_per_day") - 1.0) < 1e-9)
    assert(b.getAs[Any]("median_latency_minutes") === null)
  }

  test("business metrics: zero-duration series yields NULL fp/day, not a crash") {
    // a single-instant series has duration 0; under ANSI mode an
    // unguarded division would THROW, and SQL semantics want NULL
    import spark.implicits._
    val series = Seq(("s", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("series_id", "ts", "value")
    val flagged = series.withColumn("f", lit(1))
    val pred = Events.eventize(flagged, Seq("series_id"), "ts", "f", 0)
    val truth = Events.eventize(series.withColumn("f", lit(0)),
      Seq("series_id"), "ts", "f", 0)
    val b = Metrics.business(series, Seq("series_id"), "ts", pred, truth)
      .collect().head
    assert(b.getAs[Double]("duration_days") === 0.0)
    assert(b.getAs[Long]("fp_count") === 1)
    assert(b.getAs[Any]("fp_per_day") === null)
  }

  test("prCurve matches hand-computed sklearn semantics, ties collapsed") {
    import spark.implicits._
    // scores 4,3,2,2,1 with labels 1,0,1,0,1: thresholds {4,3,2,1};
    // at 2 the tie group collapses to one row with cum stats over both
    val df = Seq(("s", 1, 4.0), ("s", 0, 3.0), ("s", 1, 2.0),
      ("s", 0, 2.0), ("s", 1, 1.0)).toDF("series_id", "label", "score")
    val out = Metrics.prCurve(df, "series_id", "label", "score")
      .orderBy(col("threshold").desc).collect()
    val rows = out.map(r => (r.getAs[Double]("threshold"),
      r.getAs[Double]("precision"), r.getAs[Double]("recall"),
      r.getAs[Long]("n_flagged")))
    assert(rows.length === 4)
    assert(rows(0) === ((4.0, 1.0, 1.0 / 3, 1L)))
    assert(rows(1) === ((3.0, 0.5, 1.0 / 3, 2L)))
    assert(rows(2) === ((2.0, 0.5, 2.0 / 3, 4L)))
    assert(rows(3) === ((1.0, 0.6, 1.0, 5L)))
  }

  test("histogram matches np.histogram density semantics") {
    import spark.implicits._
    // 10 values over [0, 9]: bins=5 → width 1.8; 9.0 folds into bin 4
    val vals = Seq(0.0, 0.5, 1.0, 2.0, 3.5, 4.0, 5.5, 7.0, 8.9, 9.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("s", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), v)
    }.toDF("series_id", "ts", "v")
    val h = Metrics.histogram(df, "series_id", "v", 5)
      .orderBy("bin").collect()
    assert(h.length === 5)
    // np.histogram(vals, 5) → counts [3, 2, 1, 2, 2]
    assert(h.map(_.getAs[Long]("count")).toSeq === Seq(3L, 2L, 1L, 2L, 2L))
    // edges contiguous over [0, 9], width 1.8
    assert(math.abs(h.head.getAs[Double]("bin_lo") - 0.0) < 1e-12)
    assert(math.abs(h.last.getAs[Double]("bin_hi") - 9.0) < 1e-12)
    h.foreach { r =>
      assert(math.abs(r.getAs[Double]("bin_hi") -
        r.getAs[Double]("bin_lo") - 1.8) < 1e-12)
    }
    // density integrates to 1: sum(density * width) = 1
    val integral = h.map(r => r.getAs[Double]("density") * 1.8).sum
    assert(math.abs(integral - 1.0) < 1e-12)
  }

  test("histogram degenerate constant series uses numpy's [c-0.5, c+0.5] range") {
    import spark.implicits._
    val df = (0 until 8).map(i =>
      ("s", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$i"), 5.0))
      .toDF("series_id", "ts", "v")
    val h = Metrics.histogram(df, "series_id", "v", 4).orderBy("bin").collect()
    assert(h.length === 4)
    assert(math.abs(h.head.getAs[Double]("bin_lo") - 4.5) < 1e-12)
    assert(math.abs(h.last.getAs[Double]("bin_hi") - 5.5) < 1e-12)
    // all mass in the bin containing 5.0: (5.0-4.5)/0.25 = 2
    assert(h.map(_.getAs[Long]("count")).toSeq === Seq(0L, 0L, 8L, 0L))
  }

  test("qqQuantiles emits Filliben positions through an accurate probit") {
    import spark.implicits._
    val n = 199
    val df = (1 to n).map(i => ("s", i.toDouble)).toDF("series_id", "v")
    val out = Metrics.qqQuantiles(df, "series_id", "v")
      .orderBy("qi").collect()
    assert(out.length === n)
    // middle rank of n=199: Filliben position (100-0.3175)/(199.365) is
    // almost exactly 0.5 → theoretical quantile ~0; sample_q = 100
    val mid = out(99)
    assert(mid.getAs[Double]("sample_q") === 100.0)
    assert(math.abs(mid.getAs[Double]("theoretical_q")) < 1e-3)
    // symmetry of the tails (probit(p) = -probit(1-p)) through both the
    // central and tail branches of the approximation
    (0 until n / 2).foreach { i =>
      val lo = out(i).getAs[Double]("theoretical_q")
      val hi = out(n - 1 - i).getAs[Double]("theoretical_q")
      assert(math.abs(lo + hi) < 1e-6, s"asymmetry at rank ${i + 1}")
    }
    // known value: probit(0.975) = 1.959964 (the 95% CI constant)
    val p975 = Metrics.probit(lit(0.975))
    val v = spark.range(1).select(p975.as("x")).collect().head.getDouble(0)
    assert(math.abs(v - 1.959963985) < 1e-6)
  }
}
