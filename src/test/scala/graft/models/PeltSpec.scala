package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PeltSpec extends SparkSpec {

  test("pruned PELT equals the unpruned OP DP on varied series (exactness)") {
    val cases = Seq(
      Array.tabulate(60)(i => if (i < 30) 0.0 else 4.0) ,
      Array.tabulate(80)(i =>
        (if (i < 25) 0.0 else if (i < 55) 5.0 else -3.0) +
          ((i * 7919) % 11) * 0.1),
      Array.tabulate(50)(i => math.sin(i * 0.4)),
      Array.tabulate(40)(_ => 2.0),
      Array.tabulate(64)(i => ((i * 2654435761L) % 97).toDouble / 10))
    for (y <- cases) {
      val (mu, sd) = Spc.meanStd(y)
      val z = y.map(v => (v - mu) / sd)
      val beta = 3.0 * math.log(y.length.toDouble)
      assert(Pelt.segmentEnds(z, beta, prune = true) ==
        Pelt.segmentEnds(z, beta, prune = false),
        "pruning must preserve the exact optimum")
    }
  }

  test("recovers planted mean shifts at the exact boundaries") {
    import spark.implicits._
    val vals = Seq.tabulate(90)(i =>
      (if (i < 30) 0.0 else if (i < 60) 6.0 else 1.0) +
        (if (i % 2 == 0) 0.2 else -0.2))
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("s", java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), v)
    }.toDF("series_id", "ts", "value")
    val segs = Pelt.segments(df, "series_id", "ts", "value")
      .orderBy("seg_id").collect()
    assert(segs.length == 3, s"expected 3 segments, got ${segs.length}")
    assert(segs.map(_.getAs[Long]("n_points")).toSeq == Seq(30L, 30L, 30L))
    val means = segs.map(_.getAs[Double]("seg_mean"))
    assert(math.abs(means(0) - 0.0) < 1e-9)
    assert(math.abs(means(1) - 6.0) < 1e-9)
    assert(math.abs(means(2) - 1.0) < 1e-9)
  }

  test("no shift: one segment covering the series") {
    import spark.implicits._
    val df = (0 until 50).map { i =>
      ("s", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        math.sin(i * 0.7) * 0.3)
    }.toDF("series_id", "ts", "value")
    val segs = Pelt.segments(df, "series_id", "ts", "value").collect()
    assert(segs.length == 1)
    assert(segs.head.getAs[Long]("n_points") == 50L)
  }

  test("segments tile the series: counts sum to n, boundaries nest") {
    import spark.implicits._
    val vals = Seq.tabulate(70)(i =>
      (if (i < 20) 1.0 else if (i < 45) -2.0 else 3.0) + (i % 3) * 0.1)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("s", java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), v)
    }.toDF("series_id", "ts", "value")
    val segs = Pelt.segments(df, "series_id", "ts", "value")
      .orderBy("seg_id").collect()
    assert(segs.map(_.getAs[Long]("n_points")).sum == 70L)
    // consecutive segments: start of k+1 strictly after end of k
    segs.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[java.sql.Timestamp]("end_ts")
        .before(b.getAs[java.sql.Timestamp]("start_ts")))
      case _ => ()
    }
  }

  test("deterministic under repartition; multi-series independence") {
    import spark.implicits._
    val rows = (0 until 60).flatMap { i =>
      val t = java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d")
      Seq(("shift", t, if (i < 30) 0.0 else 5.0), ("flat", t, 1.0))
    }
    val df = rows.toDF("series_id", "ts", "value")
    val a = Pelt.segments(df, "series_id", "ts", "value")
      .orderBy("series_id", "seg_id").collect().toSeq
    val b = Pelt.segments(df.repartition(7), "series_id", "ts", "value")
      .orderBy("series_id", "seg_id").collect().toSeq
    assert(a == b)
    val byS = a.groupBy(_.getAs[String]("series_id"))
    assert(byS("shift").length == 2 && byS("flat").length == 1)
  }
}
