package graft.graph

import graft.SparkSpec

/** Triangle counts vs a brute-force triple-loop recompute. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long],
                  edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.triangleCounts(nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** O(n³) reference: undirected dedup, count triangles per corner. */
  private def brute(nodes: Seq[Long],
                    edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    def adj(a: Long, b: Long) = und((math.min(a, b), math.max(a, b)))
    val counts = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    val ns = nodes.distinct.sorted
    for {
      i <- ns.indices; j <- (i + 1) until ns.size
      k <- (j + 1) until ns.size
      if adj(ns(i), ns(j)) && adj(ns(j), ns(k)) && adj(ns(i), ns(k))
    } {
      counts(ns(i)) += 1; counts(ns(j)) += 1; counts(ns(k)) += 1
    }
    ns.map(n => n -> counts(n)).toMap
  }

  test("K5: every node sits in C(4,2)=6 triangles") {
    val nodes = (0L until 5L).toSeq
    val edges = for (i <- 0L until 5L; j <- (i + 1) until 5L)
      yield (i, j)
    val got = run(nodes, edges)
    assert(got === nodes.map(_ -> 6L).toMap)
    assert(got.values.sum / 3 === 10L) // global = C(5,3)
  }

  test("matches brute force on a tangled graph with a hub, duplicate " +
      "and reversed edges, self-loops, and negative ids") {
    val nodes = (-12L to 12L).toSeq
    val rnd = new scala.util.Random(41)
    val base = Seq.tabulate(90)(_ =>
      (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))))
    // hub: node 0 connects to everything (degree-orientation path)
    val hub = nodes.map(n => (0L, n))
    val dirty = base ++ hub ++ base.map(_.swap) ++ nodes.map(n => (n, n))
    val got = run(nodes, dirty)
    val exp = brute(nodes, dirty)
    nodes.foreach { v =>
      assert(got(v) === exp(v), s"node $v: ${got(v)} vs ${exp(v)}")
    }
  }

  test("triangle-free graphs (star, chain) count zero everywhere") {
    val nodes = (0L to 6L).toSeq
    val star = (1L to 6L).map(i => (0L, i))
    assert(run(nodes, star).values.forall(_ == 0L))
    val chain = (0L until 6L).map(i => (i, i + 1))
    assert(run(nodes, chain).values.forall(_ == 0L))
  }

  test("clustering coefficient: K5 is 1.0 everywhere, star is 0, " +
      "paw graph mixes, isolated node is 0 with degree 0") {
    def runCc(nodes: Seq[Long], edges: Seq[(Long, Long)]) =
      Triangles.clusteringCoefficient(nodes.toDF("id"), "id",
          edges.toDF("src", "dst"), "src", "dst")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
    val k5e = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    assert(runCc((0L until 5L).toSeq, k5e).values
      .forall(_ == ((4L, 6L, 1.0))))
    val star = (1L to 5L).map(i => (0L, i))
    assert(runCc((0L to 5L).toSeq, star).values.forall(_._3 == 0.0))
    // paw: triangle 0-1-2 plus pendant 3 on node 0 (+ isolated 9)
    val paw = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L))
    val got = runCc(Seq(0L, 1L, 2L, 3L, 9L), paw)
    assert(got(0L) === ((3L, 1L, BigDecimal(2.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(3L) === ((1L, 0L, 0.0)))
    assert(got(9L) === ((0L, 0L, 0.0)))
  }

  test("repartition-invariant") {
    val nodes = (0L until 20L).toSeq
    val edges = nodes.flatMap(i => Seq((i, (i + 1) % 20),
      (i, (i + 2) % 20)))
    val a = run(nodes, edges)
    val b = Triangles.triangleCounts(
        nodes.toDF("id").repartition(7), "id",
        edges.toDF("src", "dst").repartition(5), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
