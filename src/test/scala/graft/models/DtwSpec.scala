package graft.models

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DtwSpec extends SparkSpec {

  /** Unbanded full-DP reference. */
  private def fullDtw(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length; val m = b.length
    val d = Array.fill(n + 1, m + 1)(Double.PositiveInfinity)
    d(0)(0) = 0.0
    for (i <- 1 to n; j <- 1 to m) {
      val c = (a(i - 1) - b(j - 1)) * (a(i - 1) - b(j - 1))
      d(i)(j) = c + math.min(d(i - 1)(j),
        math.min(d(i)(j - 1), d(i - 1)(j - 1)))
    }
    math.sqrt(d(n)(m))
  }

  private def lcg(n: Int, s0: Long): Array[Double] = {
    var s = s0
    Array.fill(n) { s = (s * 48271L) % 2147483647L; (s % 100) / 10.0 }
  }

  test("banded DTW with a covering band equals the full DP") {
    val a = lcg(60, 5L)
    val b = lcg(55, 9L)
    assert(math.abs(Dtw.dtwDistance(a, b, band = 60) -
      fullDtw(a, b)) < 1e-12)
  }

  test("DTW identities: self-distance 0, band monotone, absorbs time shifts") {
    val a = lcg(80, 3L)
    assert(Dtw.dtwDistance(a, a, 10) === 0.0)
    // a narrower band constrains the alignment -> distance can only grow
    val b = lcg(80, 17L)
    val wide = Dtw.dtwDistance(a, b, 80)
    val narrow = Dtw.dtwDistance(a, b, 3)
    assert(narrow >= wide - 1e-12)
    // a phase-shifted sine is DTW-near but Euclidean-far
    val s1 = Array.tabulate(100)(t => math.sin(t * 0.2))
    val s2 = Array.tabulate(100)(t => math.sin((t + 4) * 0.2))
    val euclid = math.sqrt(s1.zip(s2).map { case (x, y) =>
      (x - y) * (x - y) }.sum)
    assert(Dtw.dtwDistance(s1, s2, 10) < euclid / 3,
      "warping failed to absorb the shift")
  }

  test("dtwToTemplates scores every series against every template, z-normalized") {
    import spark.implicits._
    val rows = Seq("a", "b", "c", "d").flatMap { sk =>
      val base = lcg(50, sk.head.toLong)
      base.zipWithIndex.map { case (v, t) =>
        // series d is series a scaled+offset -> z-norm makes them equal
        val vv = if (sk == "d") lcg(50, 'a'.toLong)(t) * 7.0 + 100.0 else v
        (sk, new java.sql.Timestamp(1700000000000L + t * 60000L), vv)
      }
    }
    val out = Dtw.dtwToTemplates(rows.toDF("sid", "ts", "v"), "sid",
        "ts", "v", Seq("a", "b"), band = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    assert(out.size === 8) // 4 series x 2 templates
    assert(out(("a", "a")) === 0.0)
    assert(out(("b", "b")) === 0.0)
    // scale/offset invariance through z-normalization
    assert(out(("d", "a")) < 1e-9, s"znorm broke: ${out(("d", "a"))}")
    assert(out(("c", "a")) > 1.0)
  }
}
