package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {

  private def frame(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 1000003L + c.toLong) % 2147483647L)

  test("below k the sketch IS the exact distinct count") {
    val rows = Seq.tabulate(40)(i => ("a", s"v${i % 7}")) // 7 distinct
    val r = Kmv.distinctSketch(frame(rows), "g", "v", k = 16)
      .collect().head
    assert(r.getAs[Long]("n_sketch") == 7L)
    assert(r.getAs[Double]("est_distinct") == 7.0)
    assert(r.getAs[Long]("exact_distinct") == 7L)
  }

  test("kth_frac matches the hand-computed k-th smallest hash") {
    val vals = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val rows = vals.map(("a", _))
    val k = 3
    val r = Kmv.distinctSketch(frame(rows), "g", "v", k)
      .collect().head
    val kth = vals.map(polyHash).sorted.apply(k - 1)
    assert(math.abs(r.getAs[Double]("kth_frac") -
      kth.toDouble / 2147483647.0) < 1e-15)
    assert(r.getAs[Double]("est_distinct") ==
      (k - 1).toDouble / (kth.toDouble / 2147483647.0))
  }

  test("estimator lands near truth in the sketching regime") {
    // 2000 distinct values, k = 128: Beyer et al. give relative error
    // ~ 1/sqrt(k-2) ≈ 9%; everything is deterministic, so this is a
    // fixed-number check with a generous 25% band
    val rows = Seq.tabulate(6000)(i => ("a", s"token_${i % 2000}_x"))
    val r = Kmv.distinctSketch(frame(rows), "g", "v", k = 128)
      .collect().head
    assert(r.getAs[Long]("exact_distinct") == 2000L)
    val est = r.getAs[Double]("est_distinct")
    assert(est > 1500 && est < 2500, s"estimate $est too far from 2000")
  }

  test("short-token vocabularies overestimate, as documented") {
    // all 1-2 char lowercase tokens: 26 + 676 = 702 distinct, hashes
    // confined to ~6% of the 2^31 space -> the uniformity assumption
    // breaks and (k-1)/U_(k) lands far ABOVE the truth. This pins the
    // documented bias (Kmv scaladoc "KNOWN BIAS") so it can't silently
    // change; long-token accuracy is covered by the test above.
    val short = (('a' to 'z').map(_.toString) ++
      (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$a$b"))
    val rows = short.flatMap(t => Seq(("a", t), ("a", t)))
    val r = Kmv.distinctSketch(frame(rows), "g", "v", k = 128)
      .collect().head
    assert(r.getAs[Long]("exact_distinct") == 702L)
    val est = r.getAs[Double]("est_distinct")
    assert(est > 2 * 702,
      s"expected the documented short-token overestimate, got $est")
  }

  test("all-null group survives: empty sketch, null kth_frac, est 0") {
    import spark.implicits._
    val df = Seq(("a", Option("x")), ("a", Option("y")),
      ("nullg", Option.empty[String]))
      .toDF("g", "v")
    val r = Kmv.distinctSketch(df, "g", "v", k = 8)
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(r("a").getAs[Long]("n_sketch") == 2L)
    val ng = r("nullg")
    assert(ng.getAs[Long]("n_sketch") == 0L)
    assert(ng.isNullAt(ng.fieldIndex("kth_frac")))
    assert(ng.getAs[Double]("est_distinct") == 0.0)
    // exact leg shares the null-skipping convention: 0, not 1
    assert(ng.getAs[Long]("exact_distinct") == 0L)
    assert(r("a").getAs[Long]("exact_distinct") == 2L)
  }

  test("groups are independent; repartition-invariant") {
    val rows = Seq.tabulate(500)(i => ("big", s"w$i")) ++
      Seq.tabulate(30)(i => ("small", s"w${i % 5}"))
    val df = frame(rows)
    val a = Kmv.distinctSketch(df, "g", "v", k = 64)
      .orderBy("g").collect().toSeq
    val b = Kmv.distinctSketch(df.repartition(9), "g", "v", k = 64)
      .orderBy("g").collect().toSeq
    assert(a == b)
    val m = a.map(r => r.getAs[String]("g") ->
      r.getAs[Long]("exact_distinct")).toMap
    assert(m("big") == 500L && m("small") == 5L)
  }
}
