package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {

  private val w = 0.1 // width for lo=0, hi=10, bins=100

  private def frame(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  /** The order statistic the sketch brackets: x_(⌈q·n⌉). */
  private def exactQ(vs: Seq[Double], q: Double): Double =
    vs.sorted.apply(math.ceil(q * vs.size).toInt - 1)

  test("estimate brackets the exact order statistic within one bin width") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(500)(rng.nextDouble() * 10.0)
    val r = Quantiles.histogramQuantiles(frame(vals.map(("a", _))),
        "g", "v", lo = 0.0, hi = 10.0, bins = 100,
        qs = Seq(0.5, 0.9, 0.99, 1.0))
      .collect().map(x => x.getAs[Double]("q") -> x.getAs[Double]("est"))
      .toMap
    for (q <- Seq(0.5, 0.9, 0.99, 1.0)) {
      val ex = exactQ(vals, q)
      assert(r(q) >= ex && r(q) <= ex + w + 1e-12,
        s"q=$q est=${r(q)} exact=$ex must satisfy exact <= est <= exact + w")
    }
  }

  test("merge-invariant: any partitioning gives the identical sketch") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(400)((if (rng.nextBoolean()) "a" else "b",
      rng.nextDouble() * 10.0))
    val df = frame(rows)
    def run(d: org.apache.spark.sql.DataFrame) =
      Quantiles.histogramQuantiles(d, "g", "v", 0.0, 10.0, 100,
          Seq(0.5, 0.9))
        .orderBy("g", "q").collect().toSeq
    assert(run(df) == run(df.repartition(13)))
  }

  test("out-of-range values clamp into the edge bins") {
    val rows = Seq(("a", -5.0), ("a", -1.0), ("a", 99.0), ("a", 5.0))
    val r = Quantiles.histogramQuantiles(frame(rows), "g", "v",
        0.0, 10.0, 100, Seq(0.25, 1.0))
      .orderBy("q").collect()
    // p25: the two below-range values fill bin 0 -> est = right edge
    assert(r(0).getAs[Long]("qbin") == 0L)
    assert(math.abs(r(0).getAs[Double]("est") - w) < 1e-12)
    // p100: the above-range value clamps to the last bin
    assert(r(1).getAs[Long]("qbin") == 99L)
    assert(math.abs(r(1).getAs[Double]("est") - 10.0) < 1e-12)
    assert(r(0).getAs[Long]("n") == 4L)
  }

  test("groups are independent") {
    val rows = Seq.tabulate(100)(i => ("lo", i / 100.0 )) ++
      Seq.tabulate(100)(i => ("hi", 9.0 + i / 100.0))
    val r = Quantiles.histogramQuantiles(frame(rows), "g", "v",
        0.0, 10.0, 100, Seq(0.5))
      .collect().map(x => x.getAs[String]("g") -> x.getAs[Double]("est"))
      .toMap
    assert(r("lo") < 1.1 && r("hi") > 9.0)
  }
}
