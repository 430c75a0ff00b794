package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  rounds: Int): Map[Long, Long] =
    Communities.minLabelPropagation(nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("planted two-community graph: each clique collapses onto its " +
      "min id, no label crosses the (absent) bridge") {
    // clique A = {0,1,2,3}, clique B = {10,11,12,13}, isolate 20
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val got = run((0L to 3L) ++ (10L to 13L) :+ 20L,
      cliqueA ++ cliqueB, rounds = 2)
    assert((0L to 3L).forall(got(_) == 0L), s"clique A: $got")
    assert((10L to 13L).forall(got(_) == 10L), s"clique B: $got")
    assert(got(20L) == 20L, "an isolate keeps its own label")
  }

  test("bounded rounds = distance-R min id: a chain resolves exactly " +
      "as far as the radius reaches") {
    // path 0-1-2-3-4-5: after R rounds l(v) is the min id within
    // distance R along the path, i.e. max(0, v - R)
    val chain = (0L until 5L).map(i => (i, i + 1))
    val r1 = run(0L to 5L, chain, rounds = 1)
    assert((0L to 5L).forall(v => r1(v) == math.max(0L, v - 1)), s"$r1")
    val r3 = run(0L to 5L, chain, rounds = 3)
    assert((0L to 5L).forall(v => r3(v) == math.max(0L, v - 3)), s"$r3")
    // R >= diameter: full component convergence (= resolveComponents)
    val r5 = run(0L to 5L, chain, rounds = 5)
    assert((0L to 5L).forall(v => r5(v) == 0L), s"$r5")
  }

  test("direction-blind: edges propagate both ways; duplicates and " +
      "self-loops are inert") {
    val got = run(Seq(1L, 2L, 3L),
      Seq((3L, 2L), (3L, 2L), (2L, 1L), (1L, 1L)), rounds = 2)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"$got")
  }

  /** Seeded multi-component random graph: 3 planted components (sizes
    * 14/12/9, ids interleaved so min-ids aren't positional), each a
    * sparse connected mess (spanning chain + seeded chords), plus two
    * isolates. Diameter of any component ≤ its chain length (< 14). */
  private def plantedGraph: (Seq[Long], Seq[(Long, Long)]) = {
    val rnd = new scala.util.Random(42)
    val comps = Seq(
      Seq(5L, 17L, 2L, 30L, 11L, 26L, 8L, 40L, 13L, 35L, 21L, 44L, 3L, 28L),
      Seq(9L, 31L, 14L, 42L, 6L, 24L, 37L, 18L, 45L, 12L, 33L, 20L),
      Seq(7L, 29L, 15L, 41L, 22L, 36L, 10L, 43L, 25L))
    val edges = comps.flatMap { ns =>
      val chain = ns.zip(ns.tail)
      val chords = (0 until ns.length / 2).map { _ =>
        (ns(rnd.nextInt(ns.length)), ns(rnd.nextInt(ns.length)))
      }.filter(p => p._1 != p._2)
      chain ++ chords
    }
    (comps.flatten ++ Seq(50L, 51L), edges)
  }

  test("R >= diameter converges to resolveComponents' components " +
      "(the Scaladoc claim, machine-checked)") {
    val (nodes, edges) = plantedGraph
    val lpa = Communities.minLabelPropagation(nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst",
        rounds = 16, earlyStop = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // resolveComponents takes the pair relation (id_a, id_b) and
    // labels every node with the component MIN id (keep_id)
    val comp = graft.llm.Dedup.resolveComponents(
        nodes.toDF("id"), edges.toDF("id_a", "id_b"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == comp,
      s"LPA fixed point != components: ${lpa.toSeq.sorted} vs " +
        s"${comp.toSeq.sorted}")
  }

  test("early-stop output is bit-identical to fixed-R at the same R") {
    val (nodes, edges) = plantedGraph
    def runMode(es: Boolean) =
      Communities.minLabelPropagation(nodes.toDF("id"), "id",
          edges.toDF("src", "dst"), "src", "dst",
          rounds = 16, earlyStop = es)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(runMode(es = true) == runMode(es = false))
  }
}
