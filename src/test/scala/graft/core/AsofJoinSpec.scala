package graft.core

import java.sql.Timestamp
import graft.SparkSpec

/** As-of backward join: inclusive-equality, leakage, tolerance,
  * multi-key, and invariance contracts. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private def leftDf(rows: (String, Long)*) =
    rows.map { case (k, t) => (k, ts(t)) }.toDF("k", "lts")
  private def rightDf(rows: (String, Long, Double)*) =
    rows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rts", "v")

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame,
                  tol: Option[Long] = None) =
    AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("v"),
        toleranceSeconds = tol)
      .collect()
      .map(row => (row.getAs[String]("k"), row.getAs[Timestamp]("lts"),
        Option(row.getAs[Timestamp]("asof_ts")).map(_.getTime),
        Option(row.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))

  test("picks the latest right row at or before each left timestamp") {
    val l = leftDf(("a", 10), ("a", 25), ("a", 31))
    val r = rightDf(("a", 5, 1.0), ("a", 20, 2.0), ("a", 30, 3.0),
      ("a", 40, 4.0))
    val got = run(l, r).sortBy(_._2.getTime).map(x => (x._3, x._4))
    assert(got.toSeq === Seq(
      (Some(ts(5).getTime), Some(1.0)),   // 10 -> r@5
      (Some(ts(20).getTime), Some(2.0)),  // 25 -> r@20 (not 30!)
      (Some(ts(30).getTime), Some(3.0)))) // 31 -> r@30; r@40 never leaks
  }

  test("an exactly-equal right timestamp is INCLUDED (>= semantics)") {
    val got = run(leftDf(("a", 20)), rightDf(("a", 20, 9.0), ("a", 5, 1.0)))
    assert(got.head._3 === Some(ts(20).getTime))
    assert(got.head._4 === Some(9.0))
  }

  test("left rows before any right row keep nulls (left-join shape)") {
    val got = run(leftDf(("a", 3), ("b", 50)),
      rightDf(("a", 5, 1.0), ("a", 9, 2.0)))
    val byK = got.map(x => x._1 -> ((x._3, x._4))).toMap
    assert(byK("a") === ((None, None)))  // too early
    assert(byK("b") === ((None, None)))  // key has no right rows at all
  }

  test("tolerance nulls out stale matches like pandas merge_asof") {
    val l = leftDf(("a", 100), ("a", 12))
    val r = rightDf(("a", 10, 7.0))
    val got = run(l, r, tol = Some(30L))
      .map(x => x._2.getTime -> x._4).toMap
    assert(got(ts(12).getTime) === Some(7.0))  // 2s old, inside
    assert(got(ts(100).getTime) === None)      // 90s old, stale
  }

  test("tolerance is exact at sub-second granularity (micros, not" +
      " truncated seconds)") {
    // right row 1.9s older than the left row: a whole-second
    // unix_timestamp gap computes 1s and would PASS a 1s tolerance;
    // the micros gap computes 1.9e6 > 1e6 and must null the match
    val l = Seq(("a", new Timestamp(1700000001900L))).toDF("k", "lts")
    val r = Seq(("a", new Timestamp(1700000000000L), 7.0))
      .toDF("k", "rts", "v")
    val strict = run(l, r, tol = Some(1L))
    assert(strict.head._4 === None, s"1.9s-old match passed 1s tol")
    // and a genuinely in-tolerance sub-second gap survives
    val l2 = Seq(("a", new Timestamp(1700000000900L))).toDF("k", "lts")
    val ok = run(l2, r, tol = Some(1L))
    assert(ok.head._4 === Some(7.0))
  }

  test("keys are isolated; repartition-invariant") {
    val l = leftDf(("a", 10), ("b", 10))
    val r = rightDf(("a", 5, 1.0), ("b", 6, 2.0))
    val got = run(l, r).map(x => x._1 -> x._4).toMap
    assert(got === Map("a" -> Some(1.0), "b" -> Some(2.0)))
    val again = run(l.repartition(5), r.repartition(3))
      .map(x => x._1 -> x._4).toMap
    assert(again === got)
  }

  test("multiple payload columns come through with the prefix") {
    val l = Seq(("a", ts(10))).toDF("k", "lts")
    val r = Seq(("a", ts(5), 1.5, "tag1")).toDF("k", "rts", "v", "t")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts",
      Seq("v", "t")).collect().head
    assert(out.getAs[Double]("asof_v") === 1.5)
    assert(out.getAs[String]("asof_t") === "tag1")
    assert(out.getAs[Timestamp]("asof_ts") === ts(5))
  }
}
