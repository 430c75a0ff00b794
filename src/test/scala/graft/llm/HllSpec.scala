package graft.llm

import graft.SparkSpec

/** Relational HLL: exact-arithmetic recompute, regimes, merge law. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  /** The portable polynomial hash (q_rollhash convention) + the HLL
    * xorshift-multiply finalizer. */
  private def polyHash(s: String): Long = {
    val p = s.foldLeft(0L)((a, c) => (a * 1000003L + c.toLong) % 2147483647L)
    val s1 = p ^ (p >> 16)
    val m1 = (s1 * 73244475L) & 0x7FFFFFFFL
    val s2 = m1 ^ (m1 >> 16)
    val m2 = (s2 * 73244475L) & 0x7FFFFFFFL
    m2 ^ (m2 >> 16)
  }

  /** Literal driver HLL with the engine's conventions (m = 16). */
  private def brute(values: Seq[String], m: Int = 16): (Long, Double, Double) = {
    val restBits = 31 - Integer.numberOfTrailingZeros(m)
    val mj = new Array[Int](m)
    values.foreach { v =>
      val h = polyHash(v)
      val b = (h % m).toInt
      val r = math.floor(h.toDouble / m).toLong
      val rho = if (r == 0) restBits + 1
        else restBits + 1 - java.lang.Long.toBinaryString(r).length
      if (rho > mj(b)) mj(b) = rho
    }
    val vZero = mj.count(_ == 0).toLong
    val s = mj.filter(_ > 0).map(j => 1.0 / (1L << j)).sum + vZero
    val alpha = 0.673
    val raw = alpha * m * m / s
    val est = if (raw <= 2.5 * m && vZero > 0) m * math.log(m.toDouble / vZero)
      else raw
    (vZero, s, est)
  }

  private def run(values: Seq[String]): (Long, Double, Double, Long) = {
    val df = values.map(("g", _)).toDF("g", "v")
    val r = Hll.distinctSketch(df, "g", "v").collect().head
    (r.getAs[Long]("v_zero"), r.getAs[Double]("s_sum"),
      r.getAs[Double]("est_distinct"), r.getAs[Long]("exact_distinct"))
  }

  test("raw-regime estimate matches the driver recompute exactly") {
    val vals = (0 until 300).map(i => f"user-$i%05d-graft")
    val (vz, s, est, exact) = run(vals ++ vals.take(50)) // dups collapse
    val (bvz, bs, best) = brute(vals)
    assert(vz === bvz)
    assert(s === bs)       // power-of-two sum: bit-exact
    assert(est === best)
    assert(exact === 300L)
    // and the estimate is in a sane band around the truth
    assert(est > 150.0 && est < 600.0, s"est=$est")
  }

  test("linear-counting regime (few distinct) matches m*ln(m/V)") {
    val vals = Seq("alpha-key-1", "beta-key-22", "gamma-key-333")
    val (vz, _, est, exact) = run(vals)
    val (bvz, _, best) = brute(vals)
    assert(vz === bvz && est === best && exact === 3L)
    assert(est === 16.0 * math.log(16.0 / vz))
  }

  test("sketch is insensitive to duplication and row order (merge law)") {
    val vals = (0 until 120).map(i => f"item-$i%06d")
    val a = run(vals)
    val b = run(scala.util.Random.shuffle(vals ++ vals ++ vals.reverse))
    assert(a === b)
  }

  test("groups are independent; repartition-invariant") {
    val df = ((0 until 80).map(i => ("x", f"k-$i%05d-x")) ++
      (0 until 40).map(i => ("y", f"k-$i%05d-y"))).toDF("g", "v")
    val one = Hll.distinctSketch(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    val two = Hll.distinctSketch(df.repartition(7), "g", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    assert(one === two)
    assert(one.keySet === Set("x", "y"))
  }

  test("the bucket max aggregate partial-aggregates map-side") {
    val df = (0 until 200).map(i => ("g", f"p-$i%05d")).toDF("g", "v")
    val p = Hll.distinctSketch(df, "g", "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_max"),
      s"the (group, bucket) max must combine map-side (the HLL merge " +
        s"law is what makes the sketch cheap at scale):\n$p")
  }
}
