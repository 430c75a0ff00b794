package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** core/Rank equivalence contract: the two-level count-based ranking
  * must be row-for-row identical to the global window form — including
  * tie groups, where rank() leaves gaps and dense_rank() doesn't.
  * Plus the q15 argmax discipline the same mechanics feed: the
  * max-equality join-back keeps ALL tied winners (TakeOrdered would
  * drop a co-winner).
  */
class RankSpec extends SparkSpec {

  // planted ties: value 30 twice, 20 three times, 10 once
  private def tied = {
    import spark.implicits._
    Seq(("a", 30L), ("b", 30L), ("c", 20L), ("d", 20L), ("e", 20L),
      ("f", 10L)).toDF("k", "v")
  }

  test("globalRankByCounts == the global rank()/dense_rank() window, " +
      "tie groups included") {
    val w = Window.orderBy(col("v").desc)
    val want = tied.select(col("k"), col("v"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = Rank.globalRankByCounts(tied, "v")
      .select("k", "v", "rnk", "drnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    // the tie semantics explicitly: both 30s rank 1, the 20s rank 3
    // (gap), dense ranks 1/2/3 with no gap
    assert(got.filter(_._2 == 20L).map(t => (t._3, t._4)) ===
      Set((3L, 2L)))
    assert(got.filter(_._2 == 10L).map(t => (t._3, t._4)) ===
      Set((6L, 3L)))
  }

  test("ascending order and custom column names work") {
    val got = Rank.globalRankByCounts(tied, "v", ascending = true,
        rankCol = "r", denseCol = "d")
      .select("k", "v", "r", "d")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set((10L, 1L, 1L), (20L, 2L, 2L), (30L, 5L, 3L)))
  }

  test("the ordered window runs over the DISTINCT-value relation and " +
      "the join-back broadcasts — no global row sort") {
    val df = Rank.globalRankByCounts(tied, "v")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"boundary table must broadcast back:\n$p")
    // exactly one Window, and it sits INSIDE the broadcast side (the
    // BroadcastExchange prints above its child window subtree): the
    // base rows never enter an ordered exchange
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"one boundary-rank window only:\n$p")
    val bx = p.indexOf("BroadcastExchange")
    val wd = p.indexOf("Window ")
    assert(bx >= 0 && wd > bx,
      s"the only window must be under the broadcast (aggregate-sized) " +
        s"side, never over the base rows:\n$p")
  }

  test("q15 argmax discipline: the max-equality join-back keeps ALL " +
      "tied winners") {
    import spark.implicits._
    // two suppliers tied at the max revenue, exact integer cents
    val rev = Seq((1L, 500L), (2L, 500L), (3L, 499L))
      .toDF("supp", "total_cents")
    val mx = rev.agg(max("total_cents").as("max_cents"))
    val winners = rev.join(broadcast(mx),
        col("total_cents") === col("max_cents"))
      .select("supp").collect().map(_.getLong(0)).toSet
    assert(winners === Set(1L, 2L),
      "both co-winners must survive the argmax")
  }
}
