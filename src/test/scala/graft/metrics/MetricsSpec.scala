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
}
