package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecomposeSpec extends SparkSpec {

  private def series(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      ("s", java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), v)
    }.toDF("series_id", "ts", "value")
  }

  test("recovers an exact linear trend + periodic seasonal, resid ~ 0") {
    val seas = Seq(1.0, -1.0, 2.0, -2.0) // zero-mean, period 4
    val vals = Seq.tabulate(40)(t => 2.0 + 0.1 * t + seas(t % 4))
    val out = Decompose.classical(series(vals), "series_id", "ts",
        "value", period = 4)
      .orderBy("ts").collect()
    assert(out.length == 40)
    out.zipWithIndex.foreach { case (r, t) =>
      if (t < 2 || t >= 38) {
        assert(r.isNullAt(r.fieldIndex("trend")), s"edge $t must be null")
        assert(r.isNullAt(r.fieldIndex("resid")))
      } else {
        assert(math.abs(r.getAs[Double]("trend") - (2.0 + 0.1 * t)) < 1e-9,
          s"trend at $t")
        assert(math.abs(r.getAs[Double]("resid")) < 1e-9, s"resid at $t")
      }
      assert(math.abs(r.getAs[Double]("seasonal") - seas(t % 4)) < 1e-9,
        s"seasonal at $t")
    }
  }

  test("seasonal component is centered (sums to ~0 over one period)") {
    val vals = Seq.tabulate(60)(t =>
      10.0 + math.sin(2 * math.Pi * t / 6.0) * 3 + (t % 5) * 0.01)
    val out = Decompose.classical(series(vals), "series_id", "ts",
        "value", period = 6)
      .orderBy("ts").limit(6).collect()
    val s = out.map(_.getAs[Double]("seasonal")).sum
    assert(math.abs(s) < 1e-9, s"seasonal period-sum $s")
  }

  test("decomposition identity: value = trend + seasonal + resid where defined") {
    val vals = Seq.tabulate(50)(t =>
      5.0 + 0.3 * t + ((t * 31) % 7).toDouble)
    val out = Decompose.classical(series(vals), "series_id", "ts",
      "value", period = 4).collect()
    out.filterNot(_.isNullAt(3)).foreach { r =>
      val v = r.getAs[Double]("value")
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(v - sum) < 1e-9)
    }
  }

  test("odd period rejected; deterministic under repartition") {
    intercept[IllegalArgumentException] {
      Decompose.classical(series(Seq(1.0, 2.0)), "series_id", "ts",
        "value", period = 3)
    }
    val vals = Seq.tabulate(30)(t => math.cos(t * 0.5) + t * 0.2)
    val df = series(vals)
    val a = Decompose.classical(df, "series_id", "ts", "value", 4)
      .orderBy("ts").collect().toSeq
    val b = Decompose.classical(df.repartition(7), "series_id", "ts",
      "value", 4).orderBy("ts").collect().toSeq
    assert(a == b)
  }
}
