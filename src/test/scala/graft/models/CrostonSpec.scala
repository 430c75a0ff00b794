package graft.models

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Croston SES pair vs a literal driver recursion. */
class CrostonSpec extends SparkSpec {
  import spark.implicits._

  private def seriesDf(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("sk", "o", "v")

  private def run(xs: Seq[Double], alpha: Double = 0.25) =
    Croston.croston(seriesDf(xs), "sk", "o", "v",
        demandIf = col("v") > 0.0, alpha = alpha)
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))

  /** Literal recursion with the engine's conventions. */
  private def brute(xs: Seq[Double], alpha: Double = 0.25)
      : (Long, Double, Double, Double) = {
    val b = 1.0 - alpha
    val demands = xs.zipWithIndex.filter(_._1 > 0.0)
      .map { case (d, i) => (i + 1L, d) }
    var z = 0.0; var p = 0.0; var k = 0L; var prev = 0L
    demands.foreach { case (i, d) =>
      val q = (i - prev).toDouble
      if (k == 0) { z = d; p = q }
      else { z = alpha * d + b * z; p = alpha * q + b * p }
      prev = i; k += 1
    }
    (k, z, p, z / p)
  }

  test("matches the driver recursion exactly on a sparse series") {
    val rnd = new scala.util.Random(29)
    val xs = Seq.tabulate(100)(i =>
      if (rnd.nextInt(6) == 0) 5.0 + rnd.nextInt(20) else 0.0)
    assert(run(xs).toSeq === Seq(brute(xs)))
  }

  test("hand-checked two-demand recursion") {
    // demands at ordinals 3 (d=10) and 7 (d=20), alpha=0.25:
    // z1=10, p1=3; z2=.25*20+.75*10=12.5; p2=.25*4+.75*3=3.25
    val xs = Seq(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 20.0)
    val got = run(xs).head
    assert(got === ((2L, 12.5, 3.25, 12.5 / 3.25)))
  }

  test("single demand: z=d, p=first ordinal") {
    val got = run(Seq(0.0, 0.0, 0.0, 8.0)).head
    assert(got === ((1L, 8.0, 4.0, 2.0)))
  }

  test("all-zero series vanish (no forecast defined)") {
    assert(run(Seq(0.0, 0.0, 0.0)).isEmpty)
  }

  test("dense series degrades to plain SES with intervals pinned at 1") {
    val xs = Seq(4.0, 6.0, 5.0, 7.0)
    val (k, z, p, f) = brute(xs)
    val got = run(xs).head
    assert(got === ((k, z, p, f)))
    assert(p === 1.0) // every interval is 1 -> SES of 1s stays 1
  }

  test("series are isolated; repartition-invariant") {
    val df = (Seq.tabulate(40)(i =>
        ("a", i.toLong, if (i % 5 == 0) 10.0 + i else 0.0)) ++
      Seq.tabulate(40)(i =>
        ("b", i.toLong, if (i % 7 == 0) 3.0 + i else 0.0)))
      .toDF("sk", "o", "v")
    val one = Croston.croston(df, "sk", "o", "v", col("v") > 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val two = Croston.croston(df.repartition(7), "sk", "o", "v",
        col("v") > 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(one === two && one.keySet === Set("a", "b"))
  }
}
