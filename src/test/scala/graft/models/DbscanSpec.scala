package graft.models

import graft.SparkSpec

/** DBSCAN on (value, Δ) features: density rules, border assignment,
  * noise, and the driver recompute. */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def seriesDf(xs: Seq[Double], sk: Long = 7L) =
    xs.zipWithIndex.map { case (x, i) => (sk, i.toLong, x) }
      .toDF("sk", "o", "v")

  private def run(xs: Seq[Double], eps: Long, minPts: Int) =
    Dbscan.dbscan(seriesDf(xs), "sk", "o", "v", scale = 100,
        eps = eps, minPts = minPts)
      .collect()
      .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3))))
      .toMap

  /** Literal driver DBSCAN with the same conventions. */
  private def brute(xs: Seq[Double], sk: Long, eps: Long,
                    minPts: Int): Map[Long, (String, Long)] = {
    val c = xs.map(x => math.rint(x * 100).toLong)
    val d = c.indices.map(i => if (i == 0) 0L else c(i) - c(i - 1))
    val n = xs.size
    def near(i: Int, j: Int): Boolean = {
      val dx = c(i) - c(j); val dy = d(i) - d(j)
      dx * dx + dy * dy <= eps * eps
    }
    val nbrs = (0 until n).map(i =>
      (0 until n).filter(j => j != i && near(i, j)))
    val isCore = (0 until n).map(i => nbrs(i).size + 1 >= minPts)
    def nid(i: Int): Long = sk * 4294967296L + (i + 1)
    // components over core-core edges by repeated min propagation
    var label = (0 until n).map(i =>
      if (isCore(i)) nid(i) else -1L).toArray
    var changed = true
    while (changed) {
      changed = false
      for (i <- 0 until n if isCore(i); j <- nbrs(i) if isCore(j)) {
        val m = math.min(label(i), label(j))
        if (label(i) != m || label(j) != m) {
          label(i) = m; label(j) = m; changed = true
        }
      }
    }
    (0 until n).map { i =>
      val ord = (i + 1).toLong
      if (isCore(i)) ord -> (("core", label(i)))
      else {
        val coreN = nbrs(i).filter(isCore)
        if (coreN.nonEmpty)
          ord -> (("border", coreN.map(label).min))
        else ord -> (("noise", -1L))
      }
    }.toMap
  }

  test("two dense regimes cluster; the isolated spike is noise") {
    // regime A around 10.0, regime B around 100.0, spike at 400
    val xs = Seq.fill(6)(10.0) ++ Seq(400.0) ++ Seq.fill(6)(100.0)
    val got = run(xs, eps = 300, minPts = 3)
    val exp = brute(xs, 7L, 300, 3)
    assert(got === exp)
    assert(got(7L)._1 === "noise" && got(7L)._2 === -1L)
    // the two regimes carry different cluster labels
    val clA = got(2L)._2; val clB = got(10L)._2
    assert(clA != clB && clA > 0 && clB > 0)
  }

  test("matches the driver recompute on an irregular series") {
    val rnd = new scala.util.Random(23)
    val xs = Seq.tabulate(60)(i =>
      (i % 4) * 25.0 + rnd.nextInt(3) * 0.5)
    val got = run(xs, eps = 800, minPts = 4)
    val exp = brute(xs, 7L, 800, 4)
    assert(got === exp)
  }

  test("border points take the SMALLEST core-neighbor cluster label") {
    val xs = Seq.fill(5)(10.0) ++ Seq(13.0) ++ Seq.fill(5)(16.0)
    // eps=350: the 13.0 point (Δ=300 edge aside) reaches both regimes'
    // members; whatever it reaches, the rule is min-label — mirror brute
    val got = run(xs, eps = 350, minPts = 3)
    val exp = brute(xs, 7L, 350, 3)
    assert(got === exp)
  }

  test("minPts above any neighborhood size makes everything noise") {
    val xs = Seq(1.0, 1.1, 5.0, 5.1, 9.0)
    val got = run(xs, eps = 50, minPts = 4)
    assert(got.values.forall(_ == (("noise", -1L))))
  }

  test("eps-grid candidate generation equals the naive self-join") {
    // irregular series with large NEGATIVE deltas so the grid cells
    // go negative (the floor-division edge the naive path never hits)
    val rnd = new scala.util.Random(61)
    val xs = Seq.tabulate(80)(i =>
      (if (i % 9 == 0) -45.0 else (i % 5) * 12.0) + rnd.nextInt(4) * 0.5)
    val df = seriesDf(xs)
    for (eps <- Seq(300L, 800L, 1500L)) {
      val grid = Dbscan.dbscan(df, "sk", "o", "v", eps = eps,
          minPts = 4, grid = true).collect()
        .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3))))
        .toMap
      val naive = Dbscan.dbscan(df, "sk", "o", "v", eps = eps,
          minPts = 4, grid = false).collect()
        .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3))))
        .toMap
      assert(grid === naive, s"eps=$eps")
    }
  }

  test("grid pairs sit exactly on cell boundaries: eps-distance kept") {
    // two points exactly eps apart along one axis land in cells that
    // differ by exactly 1 — the <= (not <) contract of the eps test
    val xs = Seq(10.0, 10.0, 10.0, 20.0, 20.0, 20.0)
    // cents: 1000 vs 2000, eps=1000 → boundary-inclusive neighbors
    val got = run(xs, eps = 1000, minPts = 3)
    val exp = brute(xs, 7L, 1000, 3)
    assert(got === exp)
  }

  test("grid equals naive at |coordinate| near 2^53 (exact integer " +
      "cell division)") {
    // cents land around 9e15 ~ 2^53, where double division by eps
    // loses ulps and floor(c/eps) can flip across a cell boundary —
    // the grid cells must come from exact long arithmetic. The naive
    // path has no cells, so equality catches any misbucketed pair.
    val base = 9.0e13 // * 100 cents ≈ 9e15
    val xs = Seq(0.0, 9.99, 10.00, 19.99, 20.00, 25.00, 30.01, 45.00)
      .map(base + _)
    val df = seriesDf(xs)
    for (eps <- Seq(999L, 1000L, 1001L)) {
      val grid = Dbscan.dbscan(df, "sk", "o", "v", eps = eps,
          minPts = 3, grid = true).collect()
        .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3))))
        .toMap
      val naive = Dbscan.dbscan(df, "sk", "o", "v", eps = eps,
          minPts = 3, grid = false).collect()
        .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3))))
        .toMap
      assert(grid === naive, s"eps=$eps")
    }
  }

  test("series are isolated and output is repartition-invariant") {
    val df = (Seq.tabulate(20)(i => (1L, i.toLong, 10.0 + (i % 2))) ++
      Seq.tabulate(20)(i => (2L, i.toLong, 10.0 + (i % 2))))
      .toDF("sk", "o", "v")
    val one = Dbscan.dbscan(df, "sk", "o", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // same geometry per series, but labels embed the series key
    assert(one((1L, 5L))._1 === one((2L, 5L))._1)
    assert(one((1L, 5L))._2 != one((2L, 5L))._2)
    val two = Dbscan.dbscan(df.repartition(7), "sk", "o", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(one === two)
  }
}
