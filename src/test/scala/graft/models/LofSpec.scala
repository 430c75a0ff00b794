package graft.models

import graft.SparkSpec

/** LOF (relational Breunig 2000) vs an independent driver recompute. */
class LofSpec extends SparkSpec {
  import spark.implicits._

  /** Literal-from-the-paper LOF on (x, y) points: k-distance as the
    * k-th order statistic, tie-inclusive neighborhood, reach-dist,
    * lrd with the 1e-12 guard, lof — all in plain driver Scala. */
  private def bruteLof(pts: Seq[(Double, Double)], k: Int): Seq[Double] = {
    val n = pts.size
    def d(i: Int, j: Int): Double = {
      val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
      math.sqrt(dx * dx + dy * dy)
    }
    val dists = Array.tabulate(n) { i =>
      (0 until n).filter(_ != i).map(j => (d(i, j), j)).sorted
    }
    val kdist = dists.map(ds => ds.take(k).map(_._1).max)
    val nbrs = Array.tabulate(n) { i =>
      dists(i).filter(_._1 <= kdist(i)).map(_._2)
    }
    val lrd = Array.tabulate(n) { i =>
      val s = nbrs(i).sortBy(identity)
        .map(j => math.max(kdist(j), d(i, j))).sum
      nbrs(i).size.toDouble / math.max(s, 1e-12)
    }
    (0 until n).map { i =>
      nbrs(i).sortBy(identity).map(lrd).sum / nbrs(i).size / lrd(i)
    }
  }

  /** One series whose (value, Δ) features reproduce the wanted x-track;
    * Δ is implied by consecutive values so only x is controllable —
    * enough for the recompute, which mirrors the same feature build. */
  private def seriesDf(xs: Seq[Double]) = {
    import spark.implicits._
    xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("sk", "o", "v")
  }

  private def featuresOf(xs: Seq[Double]): Seq[(Double, Double)] =
    xs.zipWithIndex.map { case (x, i) =>
      (x, if (i == 0) 0.0 else x - xs(i - 1)) }

  test("matches the independent brute-force recompute exactly") {
    val xs = Seq(1.0, 2.0, 1.5, 8.0, 2.2, 1.8, 2.05, 40.0, 2.5, 1.9,
      2.3, 1.7, 9.5, 2.0, 2.6)
    val exp = bruteLof(featuresOf(xs), k = 3)
    val got = Lof.lof(seriesDf(xs), "sk", "o", "v", k = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    (0 until xs.size).foreach { i =>
      assert(math.abs(got(i + 1L) - exp(i)) < 1e-12,
        s"point $i: ${got(i + 1L)} vs ${exp(i)}")
    }
  }

  test("planted outlier tops the factor; steady inliers sit near 1") {
    // tiny monotone drift keeps the base pattern duplicate-free (the
    // eps-guard regime is covered by the all-duplicate test below)
    val xs = Seq.tabulate(60)(i => 10.0 + (i % 5) * 0.1 + i * 0.001) ++
      Seq(500.0) ++
      Seq.tabulate(60)(i => 10.0 + ((i + 2) % 5) * 0.1 + i * 0.001)
    val rows = Lof.lof(seriesDf(xs), "sk", "o", "v", k = 5).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val top = rows.maxBy(_._2)
    // the spike's ordinal (1-based) is 61 — or 62, whose Δ feature
    // also carries the jump; both are genuine outliers in (v, Δ)
    assert(Set(61L, 62L).contains(top._1), s"top=$top")
    assert(top._2 > 5.0)
    val inliers = rows.filter(r => r._1 > 5 && r._1 < 55).map(_._2)
    assert(inliers.forall(l => l > 0.5 && l < 2.0), s"${inliers.min} ${inliers.max}")
  }

  test("all-duplicate points degrade gracefully to lof 1") {
    val xs = Seq.fill(10)(3.0)
    val rows = Lof.lof(seriesDf(xs), "sk", "o", "v", k = 3).collect()
    // every distance is 0 → lrd = |N|/1e-12 for all points → ratio 1
    assert(rows.length === 10)
    rows.foreach(r => assert(math.abs(r.getDouble(3) - 1.0) < 1e-9))
  }

  test("tie-inclusive neighborhood: equidistant ring uses all ties") {
    // x-track 0, 1, 0, 1, ... gives |Δ|=1 everywhere after the first
    // point; many exact distance ties exercise the d <= kdist rule
    val xs = Seq.tabulate(12)(i => (i % 2).toDouble)
    val exp = bruteLof(featuresOf(xs), k = 2)
    val got = Lof.lof(seriesDf(xs), "sk", "o", "v", k = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    (0 until xs.size).foreach { i =>
      assert(math.abs(got(i + 1L) - exp(i)) < 1e-12)
    }
  }

  test("series shorter than 2 points vanish; n <= k uses all others") {
    val df = (Seq(("a", 0L, 1.0)) ++
      (0 until 3).map(i => ("b", i.toLong, i * 2.0)))
      .toDF("sk", "o", "v")
    val rows = Lof.lof(df, "sk", "o", "v", k = 5).collect()
    assert(rows.forall(_.getString(0) == "b") && rows.length === 3)
  }

  /** Windowed brute: the paper algorithm with candidates restricted
    * to |i−j| ≤ w (what lofWindowed computes). */
  private def bruteLofW(pts: Seq[(Double, Double)], k: Int,
                        w: Int): Map[Int, Double] = {
    val n = pts.size
    def d(i: Int, j: Int): Double = {
      val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
      math.sqrt(dx * dx + dy * dy)
    }
    val dists = Array.tabulate(n) { i =>
      (0 until n).filter(j => j != i && math.abs(i - j) <= w)
        .map(j => (d(i, j), j)).sorted
    }
    val kdist = dists.map(ds => ds.take(k).map(_._1).max)
    val nbrs = Array.tabulate(n) { i =>
      dists(i).filter(_._1 <= kdist(i)).map(_._2)
    }
    val lrd = Array.tabulate(n) { i =>
      val s = nbrs(i).sortBy(identity)
        .map(j => math.max(kdist(j), d(i, j))).sum
      nbrs(i).size.toDouble / math.max(s, 1e-12)
    }
    (0 until n).map { i =>
      i -> (nbrs(i).sortBy(identity).map(lrd).sum / nbrs(i).size / lrd(i))
    }.toMap
  }

  test("lofWindowed with w >= n-1 equals the exact face exactly") {
    val xs = Seq(1.0, 2.0, 1.5, 8.0, 2.2, 1.8, 2.05, 40.0, 2.5, 1.9,
      2.3, 1.7, 9.5, 2.0, 2.6)
    val exact = Lof.lof(seriesDf(xs), "sk", "o", "v", k = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val win = Lof.lofWindowed(seriesDf(xs), "sk", "o", "v", k = 3,
        w = xs.size - 1)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(win === exact)
  }

  test("lofWindowed matches the lag-restricted brute recompute") {
    val rnd = new scala.util.Random(41)
    val xs = Seq.tabulate(50)(i => (i % 6) * 2.0 + rnd.nextInt(4) * 0.25)
    val exp = bruteLofW(featuresOf(xs), k = 3, w = 8)
    val got = Lof.lofWindowed(seriesDf(xs), "sk", "o", "v", k = 3, w = 8)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    (0 until xs.size).foreach { i =>
      assert(math.abs(got(i + 1L) - exp(i)) < 1e-12,
        s"point $i: ${got(i + 1L)} vs ${exp(i)}")
    }
  }

  test("lofWindowed still ranks the planted outlier on top") {
    val xs = Seq.tabulate(60)(i => 10.0 + (i % 5) * 0.1 + i * 0.001) ++
      Seq(500.0) ++
      Seq.tabulate(60)(i => 10.0 + ((i + 2) % 5) * 0.1 + i * 0.001)
    val rows = Lof.lofWindowed(seriesDf(xs), "sk", "o", "v", k = 5,
        w = 12)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    val top = rows.maxBy(_._2)
    assert(Set(61L, 62L).contains(top._1), s"top=$top")
    assert(top._2 > 5.0)
  }

  test("windowed candidate pairs plan as a lag-bucket equi-join") {
    // the public face localCheckpoints downstream, hiding this stage
    // from its executed plan — pin the pair-generation stage directly
    val p = Lof.windowedPairs(seriesDf(Seq.tabulate(200)(_.toDouble)),
      "sk", "o", "v", w = 10).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "windowed LOF must never plan a cartesian candidate join")
    assert(p.contains("__bk"),
      s"the candidate join must key on the (series, lag-bucket) " +
        s"pair, not explode per-series:\n$p")
    // pair volume is O(n·w), not O(n²): 200 points, w=10 → < 2·n·w
    val n = Lof.windowedPairs(seriesDf(Seq.tabulate(200)(_.toDouble)),
      "sk", "o", "v", w = 10).count()
    assert(n <= 2L * 200 * 10, s"pair volume $n exceeds 2nw")
    assert(n >= 200L * 10, s"pair volume $n suspiciously low")
  }

  test("lofWindowed rejects w < k") {
    intercept[IllegalArgumentException] {
      Lof.lofWindowed(seriesDf(Seq(1.0, 2.0)), "sk", "o", "v",
        k = 5, w = 3)
    }
  }

  test("multi-series isolation and repartition invariance") {
    val xs1 = Seq.tabulate(30)(i => (i % 7).toDouble)
    val xs2 = Seq.tabulate(25)(i => 100.0 + (i % 4) * 3.0)
    val df = (xs1.zipWithIndex.map { case (x, i) => ("p", i.toLong, x) }
      ++ xs2.zipWithIndex.map { case (x, i) => ("q", i.toLong, x) })
      .toDF("sk", "o", "v")
    val one = Lof.lof(df, "sk", "o", "v", k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val two = Lof.lof(df.repartition(7), "sk", "o", "v", k = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(one === two)
    // per-series results equal the single-series runs (no cross-talk)
    val solo = Lof.lof(seriesDf(xs1), "sk", "o", "v", k = 4).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    solo.foreach { case (i, l) => assert(one(("p", i)) === l) }
  }
}
