package graft.core

import graft.SparkSpec

/** Out-of-fold target encoding: formula, leakage guard, degeneracies. */
class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(rows: Seq[(Long, String, Double)], k: Int = 2,
                  m: Double = 10.0): Map[Long, (Long, Double)] =
    TargetEncode.oofTargetEncode(rows.toDF("id", "cat", "y"),
        "id", "cat", "y", k, m)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("fold"), r.getAs[Double]("target_enc"))))
      .toMap

  /** Driver recompute of the documented formula. */
  private def brute(rows: Seq[(Long, String, Double)], k: Int,
                    m: Double): Map[Long, Double] = {
    val withFold = rows.map { case (id, c, y) => (id, c, y, id % k) }
    def s(p: ((Long, String, Double, Long)) => Boolean) =
      (withFold.filter(p).map(_._3).sum, withFold.count(p).toLong)
    withFold.map { case (id, c, _, f) =>
      val (sc, nc) = s(r => r._2 == c)
      val (scf, ncf) = s(r => r._2 == c && r._4 == f)
      val (sAll, nAll) = s(_ => true)
      val (sf, nf) = s(_._4 == f)
      val prior = (sAll - sf) / (nAll - nf).toDouble
      id -> (sc - scf + m * prior) / ((nc - ncf).toDouble + m)
    }.toMap
  }

  test("matches the driver recompute of the OOF formula") {
    val rows = Seq(
      (0L, "a", 10.0), (1L, "a", 20.0), (2L, "a", 30.0), (3L, "a", 40.0),
      (4L, "b", 100.0), (5L, "b", 200.0), (6L, "b", 300.0),
      (7L, "c", 5.0), (8L, "c", 7.0))
    val got = enc(rows, k = 2, m = 10.0)
    val exp = brute(rows, 2, 10.0)
    rows.foreach { case (id, _, _) =>
      assert(math.abs(got(id)._2 - exp(id)) < 1e-9, s"id $id")
      assert(got(id)._1 === id % 2)
    }
  }

  test("the leakage guard holds: a row never sees its own fold's targets") {
    // category X: fold-0 rows carry a HUGE target, fold-1 rows a tiny
    // one. Fold-0 encodings must be built from the tiny values only.
    val rows = Seq(
      (0L, "x", 1000.0), (2L, "x", 1000.0),  // fold 0
      (1L, "x", 1.0), (3L, "x", 2.0),        // fold 1
      (4L, "z", 5.0), (5L, "z", 6.0), (6L, "z", 7.0), (7L, "z", 8.0))
    val got = enc(rows, k = 2, m = 0.5)
    // fold-0 x rows: (1 + 2 + 0.5·prior)/(2 + 0.5) — nowhere near 1000
    assert(got(0L)._2 < 10.0, s"leaked: ${got(0L)}")
    // fold-1 x rows see the huge fold-0 values
    assert(got(1L)._2 > 100.0)
  }

  test("a category confined to one fold degenerates to the OOF prior") {
    val rows = Seq(
      (0L, "solo", 99.0), (2L, "solo", 98.0),          // fold 0 only
      (1L, "bg", 10.0), (3L, "bg", 20.0),
      (4L, "bg", 30.0), (5L, "bg", 40.0))
    val got = enc(rows, k = 2, m = 10.0)
    // for a fold-0 solo row: N_c − N_cf = 0 → enc = prior of fold 0
    val prior0 = (10.0 + 20.0 + 40.0) / 3 // out-of-fold-0 rows: ids 1,3,5
    assert(math.abs(got(0L)._2 - prior0) < 1e-9, s"${got(0L)}")
  }

  test("repartition-invariant") {
    val rows = (0L until 40L).map(i =>
      (i, s"c${i % 3}", (i * 7 % 23).toDouble))
    val a = enc(rows, k = 4)
    val df = rows.toDF("id", "cat", "y").repartition(7)
    val b = TargetEncode.oofTargetEncode(df, "id", "cat", "y", 4, 10.0)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("fold"), r.getAs[Double]("target_enc"))))
      .toMap
    // sums may associate differently across partitionings; compare at
    // the round-6 output contract
    assert(a.keySet === b.keySet)
    a.foreach { case (id, (f, e)) =>
      assert(b(id)._1 === f)
      assert(math.abs(b(id)._2 - e) < 1e-9)
    }
  }

  test("NULL categories and NULL targets are handled, not dropped or biased") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("cat", StringType), StructField("y", DoubleType)))
    val rows = Seq(
      Row(0L, "a", 1.0), Row(1L, "a", 3.0), Row(2L, "a", null),
      Row(3L, "a", 5.0),
      Row(4L, null, 7.0), Row(5L, null, 9.0),
      Row(6L, "b", 2.0), Row(7L, "b", 4.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = TargetEncode.oofTargetEncode(df, "id", "cat", "y",
        k = 2, smoothing = 0.5)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("target_enc"))
      .toMap
    // EVERY input row keeps a row — including the NULL-category pair
    assert(out.keySet === (0L until 8L).toSet)
    // row 2 (NULL target) still gets an encoding from fold-1 'a' rows:
    // out-of-fold-0 'a' observed targets = {3.0, 5.0} (ids 1, 3)
    val prior0 = (3.0 + 5.0 + 9.0 + 4.0) / 4 // observed, fold-1 rows
    val exp2 = (3.0 + 5.0 + 0.5 * prior0) / (2 + 0.5)
    assert(math.abs(out(2L) - exp2) < 1e-9, s"${out(2L)} vs $exp2")
    // the NULL category is its own group: id 4 (fold 0) encodes from
    // id 5 (fold 1, y=9.0) only
    val exp4 = (9.0 + 0.5 * prior0) / (1 + 0.5)
    assert(math.abs(out(4L) - exp4) < 1e-9, s"${out(4L)} vs $exp4")
  }
}
