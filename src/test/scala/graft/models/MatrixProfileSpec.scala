package graft.models

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MatrixProfileSpec extends SparkSpec {

  private def lcgSeries(n: Int, seed0: Long): Array[Double] = {
    var seed = seed0
    Array.fill(n) {
      seed = (seed * 48271L) % 2147483647L
      (seed % 1000) / 100.0
    }
  }

  test("STOMP equals the O(n^2 w) brute force") {
    val y = lcgSeries(300, 7L)
    val w = 16
    val fast = MatrixProfile.stomp(y, w)
    val slow = MatrixProfile.bruteForce(y, w)
    fast.zip(slow).zipWithIndex.foreach { case (((fd, fi), (sd, si)), k) =>
      assert(math.abs(fd - sd) < 1e-7, s"profile at $k: $fd vs $sd")
      assert(fi === si, s"index at $k")
    }
  }

  test("the discord lands on a planted anomaly; motifs on planted repeats") {
    // repeating sawtooth with ONE corrupted cycle
    val w = 12
    val y = Array.tabulate(240)(t => (t % w).toDouble)
    (0 until w).foreach(k => y(120 + k) =
      Seq(5.0, 0.0, 9.0, 1.0, 7.0, 2.0, 8.0, 0.0, 6.0, 3.0, 9.0, 4.0)(k))
    val prof = MatrixProfile.stomp(y, w)
    val discord = prof.zipWithIndex.maxBy(_._1._1)._2
    assert(discord >= 120 - w && discord <= 120 + w,
      s"discord at $discord, planted at 120")
    // any window fully inside the clean region has an exact twin
    assert(prof(12)._1 < 1e-6)
  }

  test("constant-window convention: flat vs flat is 0, flat vs varied is sqrt(2w)") {
    val w = 8
    val y = Array.fill(64)(5.0)
    (24 until 40).foreach(i => y(i) = lcgSeries(40, 3L)(i - 24) )
    val prof = MatrixProfile.stomp(y, w)
    // window 0 is flat; windows 48+ are flat too -> distance 0
    assert(prof(0)._1 === 0.0)
    // a fully-varied window's nearest flat neighbor costs sqrt(2w)
    // unless another varied window is closer — just bound it
    assert(prof.forall(p => p._1 <= math.sqrt(2.0 * w) + 1e-9))
  }

  test("DataFrame face: per-series profiles, short series drop, partition-invariant") {
    import spark.implicits._
    val w = 10
    val rows =
      (0 until 100).map(t => ("a",
        new java.sql.Timestamp(1700000000000L + t * 60000L),
        lcgSeries(100, 11L)(t))) ++
      (0 until 15).map(t => ("short",
        new java.sql.Timestamp(1700000000000L + t * 60000L), t * 1.0))
    def run(parts: Int) = MatrixProfile.profile(
        rows.toDF("sid", "ts", "v").repartition(parts),
        "sid", "ts", "v", w)
      .collect().map(_.toSeq).toSet
    val out = run(1)
    assert(out.nonEmpty)
    assert(!out.exists(_.head == "short"))
    assert(out.count(_.head == "a") === 100 - w + 1)
    assert(out === run(8))
  }
}
