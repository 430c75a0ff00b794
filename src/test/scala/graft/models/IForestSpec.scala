package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IForestSpec extends SparkSpec {

  /** (event_id, series, ts, value) frame on a second grid. */
  private def events(vals: Seq[(String, Double)]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case ((sk, v), i) =>
      (i.toLong, sk,
        java.sql.Timestamp.valueOf(
          f"2024-01-01 ${i / 3600}%02d:${(i / 60) % 60}%02d:${i % 60}%02d"),
        v)
    }.toDF("event_id", "series_id", "ts", "value")
  }

  test("cFactor matches the paper's average-path normalizer") {
    assert(IsolationForest.cFactor(1) == 0.0)
    assert(IsolationForest.cFactor(2) == 1.0)
    val c256 = 2.0 * (math.log(255.0) + 0.5772156649015329) -
      2.0 * 255.0 / 256.0
    assert(math.abs(IsolationForest.cFactor(256) - c256) < 1e-12)
    // monotone increasing in m
    assert((2 to 500).forall(m =>
      IsolationForest.cFactor(m) > IsolationForest.cFactor(m - 1)))
  }

  test("planted extreme outlier gets the top score; scores in (0,1)") {
    val base = Seq.tabulate(200)(i =>
      ("s", math.sin(i * 0.7) * 2.0 + (i % 5) * 0.1))
    val vals = base.updated(137, ("s", 500.0))
    val out = IsolationForest.score(events(vals), "event_id",
        "series_id", "ts", "value", trees = 50, psi = 64)
      .orderBy("ts").collect()
    val scores = out.map(_.getAs[Double]("if_score"))
    assert(scores.forall(s => s > 0.0 && s < 1.0))
    val top = scores.zipWithIndex.maxBy(_._1)._2
    assert(top == 137 || top == 138, // the spike or the jump back down
      s"outlier not top-scored (top at $top)")
    // clear separation from the bulk: the spike's score beats the
    // median normal score decisively (everything is deterministic, so
    // this is a fixed-number pin, not a statistical hope)
    val normals = scores.zipWithIndex
      .filterNot { case (_, i) => i == 137 || i == 138 }.map(_._1)
    val medNormal = normals.sorted.apply(normals.length / 2)
    assert(scores(137) > medNormal + 0.05,
      s"spike ${scores(137)} not separated from bulk median $medNormal")
  }

  test("scores match an independent forest-walk recompute") {
    val vals = Seq.tabulate(120)(i => ("s", (i % 7).toDouble + 0.5 * (i % 3)))
    val df = events(vals)
    val out = IsolationForest.score(df, "event_id", "series_id", "ts",
        "value", trees = 25, psi = 32)
      .orderBy("ts").collect()
    // rebuild the features + forest exactly as documented and re-walk
    val feats = vals.zipWithIndex.map { case ((_, v), i) =>
      val prev = if (i == 0) v else vals(i - 1)._2
      (i.toLong, Array(v, v - prev))
    }.toArray
    val forest = IsolationForest.buildForest(feats, trees = 25, psi = 32)
    val cPsi = IsolationForest.cFactor(32)
    for (i <- Seq(0, 17, 59, 119)) {
      val e = forest.map(t =>
        IsolationForest.pathLength(t, feats(i)._2)).sum / forest.length
      val expected = math.pow(2.0, -e / cPsi)
      assert(math.abs(out(i).getAs[Double]("if_score") - expected) < 1e-12,
        s"score mismatch at row $i")
    }
  }

  test("deterministic under repartition and row order") {
    val vals = Seq.tabulate(150)(i =>
      (if (i % 2 == 0) "a" else "b", math.cos(i * 0.3) + (i % 11) * 0.2))
    val df = events(vals)
    val a = IsolationForest.score(df, "event_id", "series_id", "ts",
      "value", trees = 20, psi = 32).orderBy("series_id", "ts")
      .collect().toSeq
    val b = IsolationForest.score(df.repartition(7).orderBy("value"),
      "event_id", "series_id", "ts", "value", trees = 20, psi = 32)
      .orderBy("series_id", "ts").collect().toSeq
    assert(a == b)
  }

  test("jump outliers isolate via the delta feature") {
    // level stays in range but one step jumps: delta catches it
    val ramp = Seq.tabulate(100)(i => ("s", i * 0.1)) // smooth ramp
    val vals = ramp.updated(50, ("s", 0.1 * 50 - 4.0)) // one-step plunge
    val out = IsolationForest.score(events(vals), "event_id",
        "series_id", "ts", "value", trees = 50, psi = 64)
      .orderBy("ts").collect()
    val scores = out.map(_.getAs[Double]("if_score"))
    val top2 = scores.zipWithIndex.sortBy(-_._1).take(2).map(_._2).toSet
    assert(top2.contains(50) || top2.contains(51),
      s"jump rows not in top-2 (got $top2)")
  }
}
