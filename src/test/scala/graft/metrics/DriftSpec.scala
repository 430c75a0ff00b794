package graft.metrics

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Drift tests (exact KS + binned PSI/KS vs rest). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("exact KS matches the hand-computed two-sample statistic") {
    // A = {1, 2}, B = {2, 3}: F_A = .5/1/1 at x=1/2/3, F_B = 0/.5/1
    // → diffs .5/.5/0 → KS = 0.5 for both strata (symmetric).
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("s", "v")
    val m = Drift.ksDrift(df, "s", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("A") === ((2L, 0.5)))
    assert(m("B") === ((2L, 0.5)))
  }

  test("identical distributions give KS 0; a planted shift separates") {
    val base = (0 until 200).map(i => (i % 10).toDouble)
    val same = base.map(("A", _)) ++ base.map(("B", _))
    val m0 = Drift.ksDrift(same.toDF("s", "v"), "s", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m0("A") === 0.0 && m0("B") === 0.0)

    val shifted = base.map(("A", _)) ++ base.map(x => ("B", x + 5.0))
    val m1 = Drift.ksDrift(shifted.toDF("s", "v"), "s", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // shift by 5 over a 0..9 support: half the mass no longer overlaps
    assert(m1("A") === 0.5 && m1("B") === 0.5)
  }

  test("single-stratum input yields no rows (rest undefined)") {
    val df = Seq(("A", 1.0), ("A", 2.0)).toDF("s", "v")
    assert(Drift.ksDrift(df, "s", "v").count() === 0)
    assert(Drift.binnedDrift(df, "s", "v", 10, 0.0, 10.0).count() === 0)
  }

  test("binned PSI matches a driver-side recompute on the same grid") {
    val data = Seq.tabulate(300)(i => ("A", (i % 7).toDouble * 1.3)) ++
      Seq.tabulate(200)(i => ("B", (i % 5).toDouble * 2.1 + 1.0))
    val bins = 10; val lo = 0.0; val hi = 15.0
    val width = (hi - lo) / bins
    def binOf(v: Double): Long =
      math.min(math.max(math.floor((v - lo) / width).toLong, 0L),
        bins - 1L)
    val counts = data.groupBy { case (s, v) => (s, binOf(v)) }
      .map { case ((s, b), xs) => (s, b, xs.size.toLong) }
    val byS = counts.groupBy(_._1)
    val nBy = byS.map { case (s, xs) => s -> xs.map(_._3).sum }
    val total = nBy.values.sum
    val binTot = counts.groupBy(_._2).map { case (b, xs) =>
      b -> xs.map(_._3).sum }
    def expected(s: String): (Double, Double) = {
      val ns = nBy(s)
      val cs = counts.filter(_._1 == s).map(x => x._2 -> x._3).toMap
      var psi = 0.0; var cums = 0L; var cumr = 0L; var ks = 0.0
      (0L until bins.toLong).foreach { b =>
        val c = cs.getOrElse(b, 0L); val bt = binTot.getOrElse(b, 0L)
        val p = (c + 1).toDouble / (ns + bins)
        val q = (bt - c + 1).toDouble / (total - ns + bins)
        psi += (p - q) * math.log(p / q)
        cums += c; cumr += bt - c
        ks = math.max(ks, math.abs(cums.toDouble / ns -
          cumr.toDouble / (total - ns)))
      }
      (math.rint(psi * 1e6) / 1e6, math.rint(ks * 1e9) / 1e9)
    }
    val got = Drift.binnedDrift(data.toDF("s", "v"), "s", "v",
        bins, lo, hi).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(math.abs(got("A")._1 - expected("A")._1) < 2e-6)
    assert(math.abs(got("A")._2 - expected("A")._2) < 2e-9)
    assert(math.abs(got("B")._1 - expected("B")._1) < 2e-6)
    assert(math.abs(got("B")._2 - expected("B")._2) < 2e-9)
  }

  test("binned counts merge by addition (two halves union = whole)") {
    val data = Seq.tabulate(400)(i =>
      (if (i % 3 == 0) "A" else "B", (i % 13).toDouble))
    val df = data.toDF("s", "v")
    val whole = Drift.binnedDrift(df, "s", "v", 8, 0.0, 13.0).collect()
    val (h1, h2) = data.splitAt(157)
    val inc = Drift.binCountsByStratum(h1.toDF("s", "v"), "s", "v",
        8, 0.0, 13.0)
      .unionByName(Drift.binCountsByStratum(h2.toDF("s", "v"), "s",
        "v", 8, 0.0, 13.0))
    val merged = Drift.binnedDriftFromCounts(inc, 8).collect()
    def key(r: Row) = r.getString(0)
    assert(whole.sortBy(key).toSeq === merged.sortBy(key).toSeq)
  }

  test("binned KS is a lower bound on the exact KS") {
    val data = Seq.tabulate(500)(i =>
      (if (i % 2 == 0) "A" else "B",
        (i * 37 % 101).toDouble + (if (i % 2 == 0) 10.0 else 0.0)))
    val df = data.toDF("s", "v")
    val exact = Drift.ksDrift(df, "s", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val binned = Drift.binnedDrift(df, "s", "v", 16, 0.0, 115.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    binned.foreach { case (s, kb) =>
      assert(kb <= exact(s) + 1e-9, s"stratum $s: $kb > ${exact(s)}")
    }
  }

  test("results are repartition-invariant") {
    val data = Seq.tabulate(300)(i =>
      ((i % 4).toString, (i * 29 % 97).toDouble))
    val df = data.toDF("s", "v")
    val a = Drift.ksDrift(df, "s", "v").collect().sortBy(_.getString(0))
    val b = Drift.ksDrift(df.repartition(7), "s", "v").collect()
      .sortBy(_.getString(0))
    assert(a.toSeq === b.toSeq)
    val c = Drift.binnedDrift(df, "s", "v", 12, 0.0, 100.0).collect()
      .sortBy(_.getString(0))
    val d = Drift.binnedDrift(df.repartition(5), "s", "v", 12, 0.0,
        100.0).collect().sortBy(_.getString(0))
    assert(c.toSeq === d.toSeq)
  }

  test("nulls in value or stratum are ignored") {
    val df = Seq(("A", Some(1.0)), ("A", None), ("B", Some(2.0)),
        ("B", Some(3.0)), (null, Some(9.0)))
      .toDF("s", "v")
    val m = Drift.ksDrift(df, "s", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("A" -> 1L, "B" -> 2L))
  }
}
