package graft.models

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Clustering anomaly scorer: outliers must score far above inliers. */
class KMeansDetectorSpec extends SparkSpec {

  test("outliers sit far from every centroid") {
    val rng = new scala.util.Random(21)
    val ys = (0 until 400).map { i =>
      val base = 10 + 3 * math.sin(2 * math.Pi * i / 20.0) +
        rng.nextGaussian() * 0.3
      if (i == 250 || i == 340) base + 40 else base
    }
    val out = KMeansDetector.run(valueSeries(ys), "series_id", "ts",
      "value", lags = 4, k = 4)
      .orderBy("ts").collect()
    val scores = out.map(_.getAs[Double]("km_score"))
    assert(scores.forall(s => !s.isNaN && s >= 0))
    // the two injected outliers rank in the top scores
    val top = scores.sorted.reverse.take(12).min
    val offset = 400 - out.length // rows dropped by lag na.drop
    Seq(250, 340).foreach { i =>
      assert(scores(i - offset) >= top,
        s"outlier at $i scored ${scores(i - offset)}, top cut $top")
    }
  }

  test("scoring is deterministic under the fixed seed") {
    val ys = (0 until 200).map(i => math.sin(i / 10.0) * 5)
    val a = KMeansDetector.run(valueSeries(ys), "series_id", "ts", "value")
      .agg(sum("km_score")).collect().head.getDouble(0)
    val b = KMeansDetector.run(valueSeries(ys), "series_id", "ts", "value")
      .agg(sum("km_score")).collect().head.getDouble(0)
    assert(math.abs(a - b) < 1e-9)
  }

  test("fit is bit-identical under different partitioning (incl. cluster ids)") {
    // the DetKMeans contract that makes q_kmeans/q_ann_ivf fixture-
    // oracle-able: every reduction has a fixed shape, so shuffle layout
    // cannot move a single ulp — red if anyone brings back an
    // arrival-order merge (MLlib KMeans/StandardScaler)
    val rng = new scala.util.Random(5)
    val ys = (0 until 300).map(i =>
      math.sin(i / 8.0) * 4 + rng.nextGaussian())
    def fp(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try KMeansDetector.run(valueSeries(ys), "series_id", "ts", "value")
        .select("ts", "cluster", "km_score").orderBy("ts")
        .collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "2")
    }
    assert(fp("3") === fp("17"))
  }

  test("moments are bit-identical under different partitioning and correct") {
    // r9 rewrote moments from groupByKey+toArray to the fit-style
    // streaming partition fold — same contract, bounded task memory:
    // red if the fold order ever becomes partition-layout-dependent
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (0 until 3000).map(i =>
      (i.toLong, Seq.fill(4)(rng.nextDouble() * (1 + i % 7))))
    def run(parts: Int) = {
      val df = rows.toDF("ord", "vec").repartition(parts)
      DetKMeans.moments(df, "vec", "ord")
    }
    val (n1, s1, q1) = run(2)
    val (n2, s2, q2) = run(17)
    assert(n1 === 3000L && n2 === 3000L)
    assert(s1.toSeq === s2.toSeq, "sums must not move an ulp")
    assert(q1.toSeq === q2.toSeq, "sum-of-squares must not move an ulp")
    // sanity vs a driver-side fold (order differs → tolerance, not bits)
    val exp = Array.fill(4)(0.0)
    rows.foreach { case (_, v) =>
      v.zipWithIndex.foreach { case (x, d) => exp(d) += x } }
    s1.zip(exp).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
  }
}
