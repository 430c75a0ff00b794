package graft.models

import graft.SparkSpec

/** HBOS on (value, Δ) features vs a literal driver recompute. */
class HbosSpec extends SparkSpec {
  import spark.implicits._

  private def seriesDf(xs: Seq[Double], sk: String = "s") =
    xs.zipWithIndex.map { case (x, i) => (sk, i.toLong, x) }
      .toDF("sk", "o", "v")

  private def run(xs: Seq[Double], bins: Int): Map[Long, Double] =
    Hbos.hbos(seriesDf(xs), "sk", "o", "v", bins).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap

  /** Literal recompute with the same conventions. */
  private def brute(xs: Seq[Double], bins: Int): Seq[Double] = {
    val x = xs
    val y = xs.indices.map(i => if (i == 0) 0.0 else xs(i) - xs(i - 1))
    val n = xs.size
    def binIdx(f: Seq[Double]): Seq[Long] = {
      val lo = f.min; val hi = f.max
      if (hi == lo) f.map(_ => 0L)
      else {
        val w = (hi - lo) / bins
        f.map(v => math.min(math.max(math.floor((v - lo) / w), 0.0),
          (bins - 1).toDouble).toLong)
      }
    }
    val bx = binIdx(x); val by = binIdx(y)
    val cx = bx.groupBy(identity).map { case (k, v) => k -> v.size }
    val cy = by.groupBy(identity).map { case (k, v) => k -> v.size }
    (0 until n).map(i =>
      -math.log(cx(bx(i)).toDouble / n) -
        math.log(cy(by(i)).toDouble / n))
  }

  test("matches the driver recompute exactly") {
    val rnd = new scala.util.Random(17)
    val xs = Seq.tabulate(80)(i =>
      (i % 6) * 3.0 + rnd.nextInt(5) * 0.25)
    val got = run(xs, bins = 8)
    val exp = brute(xs, bins = 8)
    (0 until xs.size).foreach { i =>
      assert(got(i + 1L) === exp(i), s"point $i")
    }
  }

  test("a planted outlier gets the highest score") {
    val xs = Seq.tabulate(50)(i => 10.0 + (i % 4) * 0.5) ++
      Seq(900.0) ++ Seq.tabulate(50)(i => 10.0 + ((i + 1) % 4) * 0.5)
    val got = run(xs, bins = 16)
    val top = got.maxBy(_._2)
    assert(Set(51L, 52L).contains(top._1), s"top=$top")
    // the spike sits alone in its value bin AND its delta bin
    assert(top._2 > got.values.toSeq.sorted.apply(got.size / 2) + 2.0)
  }

  test("constant series scores 0 everywhere (density-1 bins)") {
    val got = run(Seq.fill(10)(5.0), bins = 8)
    got.values.foreach(v => assert(v === 0.0))
  }

  test("max-value points clamp into the top bin (no overflow bin)") {
    val xs = Seq(0.0, 1.0, 2.0, 3.0, 4.0) // max lands exactly on hi
    val got = run(xs, bins = 4)
    val exp = brute(xs, bins = 4)
    (0 until 5).foreach(i => assert(got(i + 1L) === exp(i)))
  }

  test("series are isolated; repartition-invariant") {
    val a = Seq.tabulate(30)(i => (i % 5).toDouble)
    val b = Seq.tabulate(30)(i => 100.0 + (i % 3) * 7.0)
    val df = (a.zipWithIndex.map { case (x, i) => ("p", i.toLong, x) }
      ++ b.zipWithIndex.map { case (x, i) => ("q", i.toLong, x) })
      .toDF("sk", "o", "v")
    val one = Hbos.hbos(df, "sk", "o", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val two = Hbos.hbos(df.repartition(7), "sk", "o", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(one === two)
    val solo = Hbos.hbos(seriesDf(a, "p"), "sk", "o", "v").collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    solo.foreach { case (i, s) => assert(one(("p", i)) === s) }
  }
}
