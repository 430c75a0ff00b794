package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpectralResidualSpec extends SparkSpec {

  private def series(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      ("s", java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), v)
    }.toDF("series_id", "ts", "value")
  }

  test("saliency matches an independent DFT recompute on a small series") {
    // longhand: complex DFT -> log-amp residual -> inverse transform
    val y = Array(1.0, 3.0, 2.0, 5.0, 4.0, 1.0, 0.0, 2.0)
    val n = y.length
    val q = 3
    val f = Array.tabulate(n) { k =>
      val parts = (0 until n).map { t =>
        val a = -2.0 * math.Pi * k * t / n
        (y(t) * math.cos(a), y(t) * math.sin(a))
      }
      (parts.map(_._1).sum, parts.map(_._2).sum)
    }
    val amp = f.map { case (r, i) =>
      math.max(math.sqrt(r * r + i * i), 1e-12) }
    val la = amp.map(math.log)
    val avg = Array.tabulate(n) { i =>
      val lo = math.max(0, i - q / 2); val hi = math.min(n - 1, i + q / 2)
      (lo to hi).map(la).sum / (hi - lo + 1)
    }
    val expected = Array.tabulate(n) { x =>
      val acc = (0 until n).map { k =>
        val sc = math.exp(la(k) - avg(k)) / amp(k)
        val (rr, ii) = (f(k)._1 * sc, f(k)._2 * sc)
        val a = 2.0 * math.Pi * k * x / n
        (rr * math.cos(a) - ii * math.sin(a),
          rr * math.sin(a) + ii * math.cos(a))
      }
      math.sqrt(math.pow(acc.map(_._1).sum, 2) +
        math.pow(acc.map(_._2).sum, 2)) / n
    }
    val got = SpectralResidual.saliency(y, q)
    for (i <- 0 until n)
      assert(math.abs(got(i) - expected(i)) < 1e-9, s"saliency[$i]")
  }

  test("a spike dominates the saliency map and flags") {
    val vals = Seq.tabulate(96)(i => math.sin(2 * math.Pi * i / 24.0))
      .updated(60, 8.0)
    val out = SpectralResidual.detect(series(vals), "series_id", "ts",
        "value").orderBy("ts").collect()
    val sal = out.map(_.getAs[Double]("saliency"))
    assert(sal.zipWithIndex.maxBy(_._1)._2 == 60,
      "spike must be the saliency argmax")
    assert(out(60).getAs[Int]("is_anomaly") == 1)
    // smooth periodic background must not flag
    assert(out.zipWithIndex.count { case (r, i) =>
      r.getAs[Int]("is_anomaly") == 1 && math.abs(i - 60) > 2 } == 0)
  }

  test("smooth periodic series has no flags at all") {
    val vals = Seq.tabulate(72)(i => 5.0 + math.sin(2 * math.Pi * i / 12.0))
    val out = SpectralResidual.detect(series(vals), "series_id", "ts",
      "value").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("is_anomaly") == 0))
  }

  test("deterministic under repartition") {
    val vals = Seq.tabulate(50)(i =>
      math.cos(i * 0.3) + ((i * 31) % 7) * 0.2)
    val df = series(vals)
    val a = SpectralResidual.detect(df, "series_id", "ts", "value")
      .orderBy("ts").collect().toSeq
    val b = SpectralResidual.detect(df.repartition(9), "series_id",
      "ts", "value").orderBy("ts").collect().toSeq
    assert(a == b)
  }

  test("short series dropped") {
    assert(SpectralResidual.detect(series(Seq(1.0, 2.0, 3.0)),
      "series_id", "ts", "value").count() == 0)
  }
}
