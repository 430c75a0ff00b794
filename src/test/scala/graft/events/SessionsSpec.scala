package graft.events

import java.sql.Timestamp
import graft.SparkSpec

/** Sessionization: gap splits, boundary inclusivity, ties, rollup. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private def df(rows: (Long, Long, String)*) =
    rows.map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")

  private def seqs(d: org.apache.spark.sql.DataFrame, gap: Long) =
    Sessions.sessionize(d, "user_id", "ts", gap)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("session_seq")))
      .sortBy(x => (x._1, x._2.getTime))

  test("a silence longer than the gap opens a new session") {
    // gaps: 10s, 100s, 10s with threshold 60s -> sessions 1,1,2,2
    val got = seqs(df((1L, 0L, "a"), (1L, 10L, "b"), (1L, 110L, "a"),
      (1L, 120L, "b")), gap = 60L)
    assert(got.map(_._3).toSeq === Seq(1L, 1L, 2L, 2L))
  }

  test("a gap EXACTLY equal to the threshold stays in-session (>)") {
    val got = seqs(df((1L, 0L, "a"), (1L, 60L, "b"), (1L, 121L, "c")),
      gap = 60L)
    // 60s gap == threshold -> same session; 61s -> new
    assert(got.map(_._3).toSeq === Seq(1L, 1L, 2L))
  }

  test("tied timestamps share a session regardless of order") {
    val got = seqs(df((1L, 0L, "a"), (1L, 0L, "b"), (1L, 200L, "c"),
      (1L, 200L, "d")), gap = 60L)
    assert(got.map(_._3).toSeq === Seq(1L, 1L, 2L, 2L))
  }

  test("users are independent; each starts at session 1") {
    val got = seqs(df((1L, 0L, "a"), (2L, 5000L, "a"), (2L, 5010L, "b")),
      gap = 60L)
    assert(got.map(x => (x._1, x._3)).toSeq ===
      Seq((1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("sessionStats rolls up bounds, counts, duration, and types") {
    val d = df((1L, 0L, "view"), (1L, 30L, "view"), (1L, 45L, "click"),
      (1L, 500L, "view"))
    val got = Sessions.sessionStats(d, "user_id", "ts", "event_type",
        gapSeconds = 60L)
      .collect()
      .map(r => r.getAs[Long]("session_seq") ->
        ((r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"),
          r.getAs[Long]("n_events"),
          r.getAs[Double]("duration_secs"),
          r.getAs[Long]("n_types"))))
      .toMap
    assert(got(1L) === ((ts(0L), ts(45L), 3L, 45.0, 2L)))
    assert(got(2L) === ((ts(500L), ts(500L), 1L, 0.0, 1L)))
  }

  test("sub-second gaps compare in exact micros, not truncated seconds") {
    val base = 1700000000000L
    val d = Seq((1L, new Timestamp(base), "a"),
      (1L, new Timestamp(base + 1900L), "b")) // 1.9s later
      .toDF("user_id", "ts", "event_type")
    val got = Sessions.sessionize(d, "user_id", "ts", gapSeconds = 1L)
      .collect().map(_.getAs[Long]("session_seq")).sorted
    // 1.9s > 1s -> a second-truncating gap (1s) would keep one session
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("repartition-invariant") {
    val d = df((0L until 50L).map(i =>
      (i % 3, i * 40L, if (i % 2 == 0) "a" else "b")): _*)
    val one = seqs(d, gap = 60L)
    val two = seqs(d.repartition(7), gap = 60L)
    assert(one.toSeq === two.toSeq)
  }
}
