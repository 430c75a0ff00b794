package graft.graph

import graft.SparkSpec

/** PageRank power iteration vs hand/driver recomputes. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, Double] =
    PageRank.pageRank(nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Literal driver recompute with the same conventions (source-
    * ordered contribution sums, dropped dangling mass). */
  private def brute(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct.filter(x => x._1 != x._2)
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size }
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val contrib = e.groupBy(_._2).map { case (dstN, es) =>
        dstN -> es.map(_._1).sorted
          .foldLeft(0.0)((a, s) => a + r(s) / deg(s))
      }
      r = nodes.map(v =>
        v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  /** The skew-safe TWO-LEVEL fold (pmod(src, 64) bucket partials in
    * src order, then subtotals in bucket order) — what the engine
    * computes when buckets hold more than one contribution each.
    * floorMod mirrors Spark's pmod for negative ids (% would not). */
  private def bruteTwoLevel(nodes: Seq[Long], edges: Seq[(Long, Long)],
                            iters: Int,
                            d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct.filter(x => x._1 != x._2)
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size }
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val contrib = e.groupBy(_._2).map { case (dstN, es) =>
        val partials = es.map(_._1)
          .groupBy(x => java.lang.Math.floorMod(x, 64L)).toSeq
          .map { case (sb, srcs) =>
            sb -> srcs.sorted.foldLeft(0.0)((a, s) => a + r(s) / deg(s))
          }.sortBy(_._1)
        dstN -> partials.foldLeft(0.0)((a, p) => a + p._2)
      }
      r = nodes.map(v =>
        v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("hub with multi-element salt buckets matches the two-level brute") {
    // 300 spokes all pointing at one hub: every one of the 64 salt
    // buckets holds ~5 contributions, so the two-level float grouping
    // is genuinely exercised (ids < 64 degrade to the flat fold)
    val nodes = (0L until 301L).toSeq
    val edges = (1L until 301L).map(i => (i, 0L)) ++
      (1L until 301L).map(i => (0L, i)) // hub links back (no dangling)
    val got = run(nodes, edges, 8)
    val exp = bruteTwoLevel(nodes, edges, 8)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
    // and the hub genuinely dominates
    assert(got(0L) > got(1L) * 50)
  }

  test("negative node ids bucket like the engine (pmod contract)") {
    // pmod(-5, 64) = 59 vs -5 % 64 = -5: a %-based recompute would
    // bucket (and order-fold) differently — pin across the sign
    // boundary with buckets holding several contributions each
    val nodes = (-80L to 80L).toSeq
    val edges = nodes.flatMap(i =>
      Seq((i, -i), (i, if (i == 80L) -80L else i + 1), (i, 0L)))
    val got = run(nodes, edges, 5)
    val exp = bruteTwoLevel(nodes, edges, 5)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
  }

  test("3-cycle stays exactly uniform at every iteration") {
    val nodes = Seq(0L, 1L, 2L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val got = run(nodes, edges, 7)
    got.values.foreach(v => assert(v === 1.0 / 3))
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("matches the driver recompute exactly on a tangled graph") {
    val nodes = (0L until 20L).toSeq
    val edges = nodes.flatMap(i => Seq(
      (i, (i * 7 + 1) % 20), (i, (i * 13 + 3) % 20),
      (i, (i * 3 + 11) % 20)))
    val got = run(nodes, edges, 10)
    val exp = brute(nodes, edges, 10)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
  }

  test("authority hub out-ranks its spokes; isolated node keeps base mass") {
    // spokes 1..5 all link to hub 0; hub links back to 1; 9 isolated
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L, 9L)
    val edges = (1L to 5L).map(i => (i, 0L)) :+ ((0L, 1L))
    val got = run(nodes, edges, 20)
    assert(got(0L) > got(1L) && got(1L) > got(2L))
    assert(got(2L) === got(3L) && got(3L) === got(4L) && got(4L) === got(5L))
    // isolated node 9: never receives, always (1-d)/N
    assert(got(9L) === (1.0 - 0.85) / 7)
  }

  /** Driver recompute of the PERSONALIZED WEIGHTED form with the
    * engine's exact conventions: p = 1/|S| on seeds else 0, W(u) the
    * dst-ordered weight fold, two-level floorMod-bucketed src-ordered
    * contribution folds of r·w/W, update (1−d)·p + d·cs. */
  private def brutePers(nodes: Seq[Long], edges: Seq[(Long, Long, Double)],
                        seeds: Set[Long], iters: Int,
                        d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct.filter(x => x._1 != x._2 && x._3 > 0.0)
    // ordered folds sort struct(ord, v): ties in ord order by v —
    // mirror that (a multigraph can carry two weights on one (src,
    // dst) pair)
    val wOut = e.groupBy(_._1).map { case (s, xs) =>
      s -> xs.sortBy(x => (x._2, x._3))
        .foldLeft(0.0)((a, x) => a + x._3)
    }
    val p = nodes.map(v =>
      v -> (if (seeds(v)) 1.0 / seeds.size else 0.0)).toMap
    var r = p
    (1 to iters).foreach { _ =>
      val contrib = e.groupBy(_._2).map { case (dstN, es) =>
        val partials = es
          .map(x => (x._1, r(x._1) * x._3 / wOut(x._1)))
          .groupBy(x => java.lang.Math.floorMod(x._1, 64L)).toSeq
          .map { case (sb, xs) =>
            sb -> xs.sorted.foldLeft(0.0)((a, x) => a + x._2)
          }.sortBy(_._1)
        dstN -> partials.foldLeft(0.0)((a, q) => a + q._2)
      }
      r = nodes.map(v =>
        v -> ((1.0 - d) * p(v) + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("dangling mass is dropped: sums < 1 with a sink, = 1 without") {
    val sink = run(Seq(0L, 1L, 2L), Seq((0L, 1L), (1L, 2L)), 5)
    assert(sink.values.sum < 1.0 - 1e-6)
    val cycle = run(Seq(0L, 1L, 2L), Seq((0L, 1L), (1L, 2L), (2L, 0L)), 5)
    assert(math.abs(cycle.values.sum - 1.0) < 1e-12)
  }

  private def runPers(nodes: Seq[Long], edges: Seq[(Long, Long, Double)],
                      seeds: Seq[Long], iters: Int): Map[Long, Double] =
    PageRank.pageRank(nodes.toDF("id"), "id",
        edges.toDF("src", "dst", "w"), "src", "dst", iters,
        resetTo = Some(seeds.toDF("id")), weight = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("personalized weighted ranks match the driver recompute " +
      "exactly on a tangled graph (negative ids included)") {
    val nodes = (-40L to 40L).toSeq
    val edges = nodes.flatMap(i => Seq(
      (i, -i, ((i % 3) + 3).toDouble),
      (i, if (i == 40L) -40L else i + 1, 2.0),
      (i, (i * 7 + 1) % 41, 1.0)))
    val seeds = nodes.filter(_ % 5 == 0)
    val got = runPers(nodes, edges, seeds, 6)
    val exp = brutePers(nodes, edges, seeds.toSet, 6)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
  }

  test("seed locality: mass flows out from the seed; unreachable " +
      "nodes score exactly zero") {
    // directed chain 0 -> 1 -> ... -> 9, seed {0}: at steady state
    // rank decays strictly along the chain (iters > chain length so
    // the transient d^t seed wave has fallen off the sink end);
    // isolated node 100 (not reachable from the seed) gets EXACTLY 0
    // — no uniform teleport floor
    val nodes = (0L to 9L) :+ 100L
    val edges = (0L until 9L).map(i => (i, i + 1, 1.0))
    val got = runPers(nodes, edges, Seq(0L), 20)
    (0L until 9L).foreach(i =>
      assert(got(i) > got(i + 1), s"chain must decay at $i"))
    assert(got(9L) > 0.0)
    assert(got(100L) === 0.0)
  }

  test("edge weights split a source's mass proportionally") {
    // s=0 -> a=1 (w=3), s -> b=2 (w=1), seed {s}: a receives 3x b's
    // mass at every step
    val got = runPers(Seq(0L, 1L, 2L), Seq((0L, 1L, 3.0), (0L, 2L, 1.0)),
      Seq(0L), 2)
    assert(got(1L) > 0.0)
    assert(math.abs(got(1L) - 3.0 * got(2L)) < 1e-15)
  }

  test("duplicate edges and self-loops are ignored; repartition-invariant") {
    val nodes = (0L until 12L).toSeq
    val clean = nodes.map(i => (i, (i + 1) % 12))
    val dirty = clean ++ clean ++ nodes.map(i => (i, i))
    val a = run(nodes, clean, 6)
    val b = run(nodes, dirty, 6)
    assert(a === b)
    val c = PageRank.pageRank(nodes.toDF("id").repartition(7), "id",
        dirty.toDF("src", "dst").repartition(5), "src", "dst", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === c)
  }
}
