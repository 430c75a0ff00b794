package graft.events

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** W7/W8/J3/J4 semantics from evaluate.py — the gap `+1` off-by-one,
  * persistence run lengths, precision/recall asymmetry, latency sign. */
class EventsSpec extends SparkSpec {

  private def events(flags: Seq[Int], gap: Int): Seq[(Int, Int)] =
    Events.eventize(flagSeries(flags), Seq("series_id"), "ts", "flag", gap)
      .select("start_rn", "end_rn").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq

  test("eventize collapses a single run inclusively") {
    assert(events(Seq(0, 1, 1, 1, 0), gap = 0) === Seq((2, 4)))
  }

  test("eventize merges runs separated by <= gap zeros (s - prev_end <= gap+1)") {
    // runs at rn 1-2 and 6-6: start(6) - prevEnd(2) = 4 = gap+1 → merged at gap=3
    assert(events(Seq(1, 1, 0, 0, 0, 1), gap = 3) === Seq((1, 6)))
    // gap=2: 4 > 3 → separate
    assert(events(Seq(1, 1, 0, 0, 0, 1), gap = 2) === Seq((1, 2), (6, 6)))
    // adjacent runs one zero apart always merge with gap>=1
    assert(events(Seq(1, 0, 1), gap = 1) === Seq((1, 3)))
    assert(events(Seq(1, 0, 1), gap = 0) === Seq((1, 1), (3, 3)))
  }

  test("eventize: boundary runs and all-ones") {
    assert(events(Seq(1, 1, 0, 0, 1, 1), gap = 0) === Seq((1, 2), (5, 6)))
    assert(events(Seq(1, 1, 1), gap = 0) === Seq((1, 3)))
    assert(events(Seq(0, 0, 0), gap = 0) === Seq())
  }

  test("persistence zeroes runs shorter than p") {
    val out = Events.persistFilter(
      flagSeries(Seq(0, 1, 0, 1, 1, 0, 1, 1, 1)), Seq("series_id"), "ts",
      "flag", 2, "fp", None)
      .orderBy("ts").select("fp").collect().map(_.getInt(0)).toSeq
    assert(out === Seq(0, 0, 0, 1, 1, 0, 1, 1, 1))
    val p3 = Events.persistFilter(
      flagSeries(Seq(1, 1, 0, 1, 1, 1)), Seq("series_id"), "ts",
      "flag", 3, "fp", None)
      .orderBy("ts").select("fp").collect().map(_.getInt(0)).toSeq
    assert(p3 === Seq(0, 0, 0, 1, 1, 1))
  }

  test("persistence is idempotent") {
    val once = Events.persistFilter(
      flagSeries(Seq(1, 0, 1, 1, 0, 1, 1, 1, 0, 1)), Seq("series_id"), "ts",
      "flag", 2, "fp", None)
    val twice = Events.persistFilter(once, Seq("series_id"), "ts",
      "fp", 2, "fp2", None)
    assert(twice.filter(col("fp") =!= col("fp2")).count() === 0)
  }

  test("event metrics: precision pred-side, recall true-side (evaluate.py:83-109)") {
    // truth: one event [2,4]; preds: [3,3] (hit) and [8,9] (miss)
    val pred = Events.eventize(
      flagSeries(Seq(0, 0, 1, 0, 0, 0, 0, 1, 1)), Seq("series_id"), "ts",
      "flag", 0)
    val truth = Events.eventize(
      flagSeries(Seq(0, 1, 1, 1, 0, 0, 0, 0, 0)), Seq("series_id"), "ts",
      "flag", 0)
    val m = Events.eventLevelMetrics(pred, truth, Seq("series_id"))
      .collect().head
    assert(m.getAs[Long]("tp") === 1)
    assert(m.getAs[Long]("fp") === 1)
    assert(m.getAs[Long]("fn") === 0)
    val p = m.getAs[Double]("precision"); val r = m.getAs[Double]("recall")
    assert(math.abs(p - 1.0 / (2 + 1e-9)) < 1e-12)
    assert(math.abs(r - 1.0 / (1 + 1e-9)) < 1e-12)
    val f1 = m.getAs[Double]("f1")
    assert(math.abs(f1 - 2 * p * r / (p + r + 1e-9)) < 1e-12)
  }

  test("one pred overlapping two true events counts tp once per side") {
    // pred [2,8] spans truth [2,3] and [7,8]: pred-tp=1, true-tp=2
    val pred = Events.eventize(
      flagSeries(Seq(0, 1, 1, 1, 1, 1, 1, 1, 0)), Seq("series_id"), "ts",
      "flag", 0)
    val truth = Events.eventize(
      flagSeries(Seq(0, 1, 1, 0, 0, 0, 1, 1, 0)), Seq("series_id"), "ts",
      "flag", 0)
    val m = Events.eventLevelMetrics(pred, truth, Seq("series_id"))
      .collect().head
    assert(m.getAs[Long]("tp") === 1)
    assert(m.getAs[Long]("fn") === 0)
    assert(m.getAs[Long]("n_true_events") === 2)
  }

  test("detection latency executes and can be negative (early detection)") {
    // rows are 1 s apart; pred starts at rn 2 (sec 1), truth at rn 4
    // (sec 3): latency = -2 s = -1/30 minutes
    val pred = Events.eventize(
      flagSeries(Seq(0, 1, 1, 1, 1, 0)), Seq("series_id"), "ts", "flag", 0)
    val truth = Events.eventize(
      flagSeries(Seq(0, 0, 0, 1, 1, 0)), Seq("series_id"), "ts", "flag", 0)
    val lat = Events.detectionLatency(pred, truth, Seq("series_id"))
      .collect()
    assert(lat.length === 1)
    assert(math.abs(lat.head.getAs[Double]("latency_minutes") - (-2.0 / 60))
      < 1e-9)
  }
}
