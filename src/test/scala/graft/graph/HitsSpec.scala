package graft.graph

import graft.SparkSpec

/** HITS hubs/authorities vs driver recomputes. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, (Double, Double)] =
    Hits.hits(nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap

  /** Two-level fold with the engine's conventions: neighbor
    * pmod(·, 64) bucket partials in neighbor order, subtotals in
    * bucket order. floorMod, NOT %: the engine salt-buckets with
    * Spark's pmod, which is non-negative for negative ids, while
    * Scala/DuckDB % returns negative remainders — the recompute must
    * mirror the engine for ALL long ids (negative-id test below). */
  private def fold(from: Seq[(Long, Double)]): Double = {
    val partials = from.groupBy(x => java.lang.Math.floorMod(x._1, 64L)).toSeq
      .map { case (sb, xs) =>
        sb -> xs.sortBy(_._1).foldLeft(0.0)((a, x) => a + x._2)
      }.sortBy(_._1)
    partials.foldLeft(0.0)((a, p) => a + p._2)
  }

  /** Literal driver recompute mirroring the ENGINE: unnormalized
    * sequential passes, ONE max normalization at the end. */
  private def brute(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, (Double, Double)] = {
    val e = edges.distinct.filter(x => x._1 != x._2)
    def pass(score: Map[Long, Double], in: Boolean): Map[Long, Double] =
      nodes.map { v =>
        val contribs =
          if (in) e.filter(_._2 == v)
            .map(x => (x._1, score.getOrElse(x._1, 0.0)))
          else e.filter(_._1 == v)
            .map(x => (x._2, score.getOrElse(x._2, 0.0)))
        v -> fold(contribs)
      }.toMap
    var auth = nodes.map(_ -> 1.0).toMap
    var hub = auth
    (1 to iters).foreach { _ =>
      auth = pass(hub, in = true)
      hub = pass(auth, in = false)
    }
    def norm(s: Map[Long, Double]): Map[Long, Double] = {
      val mx = s.values.max
      if (mx > 0.0) s.map { case (k, x) => k -> x / mx }
      else s.map { case (k, _) => k -> 0.0 }
    }
    val (a, h) = (norm(auth), norm(hub))
    nodes.map(v => v -> ((a(v), h(v)))).toMap
  }

  /** The TEXTBOOK per-pass-max-normalized form — end normalization is
    * exactly proportional to it in real arithmetic; pinned at 1e-12
    * to prove the documented equivalence. */
  private def bruteTextbook(nodes: Seq[Long], edges: Seq[(Long, Long)],
                            iters: Int): Map[Long, (Double, Double)] = {
    val e = edges.distinct.filter(x => x._1 != x._2)
    def norm(s: Map[Long, Double]): Map[Long, Double] = {
      val mx = s.values.max
      if (mx > 0.0) s.map { case (k, x) => k -> x / mx }
      else s.map { case (k, _) => k -> 0.0 }
    }
    def pass(score: Map[Long, Double], in: Boolean): Map[Long, Double] =
      norm(nodes.map { v =>
        val contribs =
          if (in) e.filter(_._2 == v).map(x => (x._1, score(x._1)))
          else e.filter(_._1 == v).map(x => (x._2, score(x._2)))
        v -> contribs.sortBy(_._1).foldLeft(0.0)((a, x) => a + x._2)
      }.toMap)
    var auth = nodes.map(_ -> 1.0).toMap
    var hub = auth
    (1 to iters).foreach { _ =>
      auth = pass(hub, in = true)
      hub = pass(auth, in = false)
    }
    nodes.map(v => v -> ((auth(v), hub(v)))).toMap
  }

  test("matches the driver recompute exactly on a tangled graph") {
    val nodes = (0L until 30L).toSeq
    val edges = nodes.flatMap(i => Seq(
      (i, (i * 7 + 1) % 30), (i, (i * 13 + 3) % 30),
      (i, (i * 3 + 11) % 30)))
    val got = run(nodes, edges, 5)
    val exp = brute(nodes, edges, 5)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
  }

  test("end normalization equals the textbook per-pass form (1e-12)") {
    val nodes = (0L until 30L).toSeq
    val edges = nodes.flatMap(i => Seq(
      (i, (i * 7 + 1) % 30), (i, (i * 13 + 3) % 30)))
    val got = run(nodes, edges, 5)
    val exp = bruteTextbook(nodes, edges, 5)
    nodes.foreach { v =>
      assert(math.abs(got(v)._1 - exp(v)._1) < 1e-12, s"auth $v")
      assert(math.abs(got(v)._2 - exp(v)._2) < 1e-12, s"hub $v")
    }
  }

  test("star graph: center is the sole authority, spokes the hubs") {
    // 1..5 -> 0: node 0 has max authority 1 and hub 0; spokes hub 1
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L)
    val edges = (1L to 5L).map(i => (i, 0L))
    val got = run(nodes, edges, 3)
    assert(got(0L) === ((1.0, 0.0)))
    (1L to 5L).foreach(i => assert(got(i) === ((0.0, 1.0))))
  }

  test("multi-element salt buckets match the two-level brute") {
    // 200 spokes into one authority: bucket partials genuinely hold
    // multiple contributions (ids >= 64)
    val nodes = (0L until 201L).toSeq
    val edges = (1L until 201L).map(i => (i, 0L)) ++ Seq((0L, 1L))
    val got = run(nodes, edges, 4)
    val exp = brute(nodes, edges, 4)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
  }

  test("duplicate edges and self-loops are ignored; repartition-invariant") {
    val nodes = (0L until 12L).toSeq
    val clean = nodes.map(i => (i, (i + 1) % 12))
    val dirty = clean ++ clean ++ nodes.map(i => (i, i))
    val a = run(nodes, clean, 4)
    val b = run(nodes, dirty, 4)
    assert(a === b)
    val c = Hits.hits(nodes.toDF("id").repartition(7), "id",
        dirty.toDF("src", "dst").repartition(5), "src", "dst", 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(a === c)
  }

  test("negative node ids bucket like the engine (pmod contract)") {
    // ids straddling zero: pmod(-5, 64) = 59 while -5 % 64 = -5, so a
    // %-based recompute would group (and hence order-fold) the
    // contributions differently — this pins the engine against the
    // floorMod recompute across the sign boundary
    val nodes = (-15L to 15L).toSeq
    val edges = nodes.flatMap(i => Seq(
      (i, if (i == 15L) -15L else i + 1),
      (i, -i)))
    val got = run(nodes, edges, 4)
    val exp = brute(nodes, edges, 4)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
  }

  test("empty-edge graph degrades to all-zero scores") {
    val got = run(Seq(0L, 1L), Seq((0L, 0L)), 3) // only a self-loop
    assert(got.values.forall(_ == ((0.0, 0.0))))
  }
}
