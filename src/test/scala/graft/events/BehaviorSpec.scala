package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {

  private def ev(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.map { case (u, t, typ) =>
      (u, java.sql.Timestamp.valueOf(t), typ)
    }.toDF("user_id", "ts", "event_type")
  }

  private val steps = Seq("view", "click", "purchase")

  test("funnel: full conversion inside the window, sequential-min choice") {
    val df = ev(Seq(
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 09:00:00", "click"),  // BEFORE the view: ignored
      ("u1", "2024-01-02 11:00:00", "click"),  // first qualifying click
      ("u1", "2024-01-03 12:00:00", "click"),
      ("u1", "2024-01-04 08:00:00", "purchase")))
    val r = Behavior.funnel(df, "user_id", "ts", "event_type", steps,
      "7 DAYS").collect().head
    assert(r.getAs[Int]("level") == 3)
    assert(r.getAs[java.sql.Timestamp]("ts_2") ==
      java.sql.Timestamp.valueOf("2024-01-02 11:00:00"))
    assert(r.getAs[java.sql.Timestamp]("ts_3") ==
      java.sql.Timestamp.valueOf("2024-01-04 08:00:00"))
  }

  test("funnel: steps after the window deadline do not count") {
    val df = ev(Seq(
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-02 10:00:00", "click"),
      ("u1", "2024-01-20 10:00:00", "purchase"))) // > 7 days after view
    val r = Behavior.funnel(df, "user_id", "ts", "event_type", steps,
      "7 DAYS").collect().head
    assert(r.getAs[Int]("level") == 2)
    assert(r.isNullAt(r.fieldIndex("ts_3")))
  }

  test("funnel: out-of-order steps and missing anchors") {
    val df = ev(Seq(
      // u1: purchase before click — chain stops at click
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-03 10:00:00", "purchase"),
      ("u1", "2024-01-04 10:00:00", "click"),
      // u2: no view at all — level 0, still present
      ("u2", "2024-01-01 10:00:00", "click"),
      ("u2", "2024-01-02 10:00:00", "purchase")))
    val out = Behavior.funnel(df, "user_id", "ts", "event_type", steps,
        "7 DAYS").collect()
      .map(r => r.getAs[String]("user_id") -> r.getAs[Int]("level"))
      .toMap
    assert(out("u1") == 2)
    assert(out("u2") == 0)
  }

  test("funnel: window anchors at step 1, not at the previous step") {
    // click on day 6, purchase on day 9: within 7d of the CLICK but
    // past 7d of the VIEW — must not convert
    val df = ev(Seq(
      ("u1", "2024-01-01 00:00:00", "view"),
      ("u1", "2024-01-06 00:00:00", "click"),
      ("u1", "2024-01-09 00:00:00", "purchase")))
    val r = Behavior.funnel(df, "user_id", "ts", "event_type", steps,
      "7 DAYS").collect().head
    assert(r.getAs[Int]("level") == 2)
  }

  test("retention: hand-computed weekly cohort grid") {
    // 2024-01-01 is a Monday. Cohort W1 = {a, b}; W2 = {c}.
    // a active W1, W2, W3; b active W1 only; c active W2, W4.
    val df = ev(Seq(
      ("a", "2024-01-02 10:00:00", "view"),
      ("a", "2024-01-09 10:00:00", "view"),
      ("a", "2024-01-17 10:00:00", "view"),
      ("b", "2024-01-03 10:00:00", "view"),
      ("c", "2024-01-10 10:00:00", "view"),
      ("c", "2024-01-23 10:00:00", "view")))
    val out = Behavior.retention(df, "user_id", "ts").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("cohort_week").toString
        .take(10), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("cohort_size"), r.getAs[Long]("n_active")))
      .toMap
    assert(out(("2024-01-01", 0L)) == (2L, 2L))
    assert(out(("2024-01-01", 1L)) == (2L, 1L)) // only a returns
    assert(out(("2024-01-01", 2L)) == (2L, 1L))
    assert(out(("2024-01-08", 0L)) == (1L, 1L))
    assert(out(("2024-01-08", 2L)) == (1L, 1L)) // c skips a week
    assert(!out.contains(("2024-01-08", 1L)))   // nobody active there
  }

  test("retention: rate is n_active / cohort_size, offset 0 is 1.0") {
    val df = ev(Seq(
      ("a", "2024-01-02 10:00:00", "view"),
      ("b", "2024-01-03 10:00:00", "view"),
      ("b", "2024-01-10 10:00:00", "view")))
    val out = Behavior.retention(df, "user_id", "ts").collect()
      .map(r => r.getAs[Long]("week_offset") ->
        r.getAs[Double]("retention")).toMap
    assert(out(0L) == 1.0)
    assert(out(1L) == 0.5)
  }

  test("deterministic under repartition") {
    val rows = (0 until 200).map { i =>
      (s"u${i % 23}", f"2024-01-${1 + i % 28}%02d 0${i % 10}:00:00",
        Seq("view", "click", "purchase", "error")(i % 4))
    }
    val df = ev(rows)
    val f1 = Behavior.funnel(df, "user_id", "ts", "event_type", steps,
      "7 DAYS").orderBy("user_id").collect().toSeq
    val f2 = Behavior.funnel(df.repartition(11), "user_id", "ts",
      "event_type", steps, "7 DAYS").orderBy("user_id").collect().toSeq
    assert(f1 == f2)
    val r1 = Behavior.retention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect().toSeq
    val r2 = Behavior.retention(df.repartition(5), "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect().toSeq
    assert(r1 == r2)
  }

  test("topPaths counts consecutive event-type n-grams with tie-broken ranks") {
    import spark.implicits._
    def t(sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    // user 1: view>click>buy, click>buy>view ; user 2: view>click>buy
    val df = Seq(
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "buy"),
      (1L, t(4), "view"),
      (2L, t(1), "view"), (2L, t(2), "click"), (2L, t(3), "buy"))
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.topPaths(df, "user_id", "ts", "event_type",
        n = 3, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    // paths: u1 rows 1-3 view>click>buy, rows 2-4 click>buy>view,
    // u2 view>click>buy -> counts 2 and 1; no cross-user chaining
    assert(out.toSeq === Seq(("view>click>buy", 2L, 1L),
      ("click>buy>view", 1L, 2L)))
    // bigram form counts every adjacent pair
    val bi = Behavior.topPaths(df, "user_id", "ts", "event_type",
        n = 2, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi === Map("view>click" -> 2L, "click>buy" -> 2L,
      "buy>view" -> 1L))
  }
}
