package graft.events

import java.sql.Timestamp
import graft.SparkSpec

/** Association rules over session baskets: hand counts, lift
  * direction, dedup within basket, invariance. */
class AssocSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  // three users; gap 60s splits u1 into two sessions
  // baskets: u1s1={a,b}, u1s2={a,c}, u2s1={a,b}, u3s1={b}
  private val df = Seq(
    (1L, 0L, "a"), (1L, 10L, "b"), (1L, 15L, "a"),   // u1 s1
    (1L, 200L, "a"), (1L, 210L, "c"),                // u1 s2
    (2L, 0L, "a"), (2L, 5L, "b"),                    // u2 s1
    (3L, 0L, "b")                                    // u3 s1
  ).map { case (u, t, e) => (u, ts(t), e) }
    .toDF("user_id", "ts", "event_type")

  private def rules = Assoc.associationRules(df, "user_id", "ts",
      "event_type", gapSeconds = 60L)
    .collect()
    .map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")) ->
      ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
        r.getAs[Double]("conf_a_b"), r.getAs[Double]("conf_b_a"),
        r.getAs[Double]("lift"))))
    .toMap

  test("hand-computed support, confidence, and lift") {
    val got = rules
    // N=4 sessions; n_a=3 (u1s1,u1s2,u2s1), n_b=3, n_c=1
    // {a,b}: 2 sessions; {a,c}: 1; {b,c}: 0 (absent)
    assert(got(("a", "b")) ===
      ((3L, 3L, 2L, 0.5, 2.0 / 3, 2.0 / 3, 4.0 * 2 / 9)))
    assert(got(("a", "c")) ===
      ((3L, 1L, 1L, 0.25, 1.0 / 3, 1.0, 4.0 / 3)))
    assert(!got.contains(("b", "c")))
    assert(!got.contains(("b", "a"))) // unordered: a < b only
  }

  test("duplicate events in one session count the basket once") {
    // u1 s1 has 'a' twice -> n_ab for (a,b) is per-SESSION, not per-row
    assert(rules(("a", "b"))._3 === 2L)
  }

  test("minCount prunes rare pairs") {
    val got = Assoc.associationRules(df, "user_id", "ts", "event_type",
        gapSeconds = 60L, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b")))
  }

  test("lift above/below 1 separates affinity from repulsion") {
    // x and y always together; x and z never
    val d2 = Seq(
      (1L, 0L, "x"), (1L, 1L, "y"),
      (2L, 0L, "x"), (2L, 1L, "y"),
      (3L, 0L, "z"), (4L, 0L, "z"), (5L, 0L, "x"), (5L, 1L, "y")
    ).map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")
    val got = Assoc.associationRules(d2, "user_id", "ts", "event_type",
        gapSeconds = 60L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("lift")).toMap
    assert(got(("x", "y")) > 1.0)
    assert(!got.contains(("x", "z")))
  }

  test("repartition-invariant") {
    val one = rules
    val two = Assoc.associationRules(df.repartition(7), "user_id",
        "ts", "event_type", gapSeconds = 60L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("lift")).toMap
    one.foreach { case (k, v) => assert(two(k) === v._7) }
  }
}
