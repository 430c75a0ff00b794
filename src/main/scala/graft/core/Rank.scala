package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking — the two-level form promised at the
  * `q_rank_users` registration site (rounds 16–17 carried it as a
  * prose recipe; this is the code).
  *
  * A global `rank()/dense_rank()` window sorts EVERY row on one
  * reducer — fine over a group-cell-sized aggregate, fatal over a
  * 100 TB fact. The distributed form splits the work in two levels:
  *
  *  1. per-VALUE counts (`groupBy(orderCol).count` — partial-agged
  *     map-side, skew-immune: each bucket contributes a local count
  *     and the merge is an integer sum);
  *  2. ONE ordered pass over the DISTINCT-value relation (bounded by
  *     value cardinality, never row count) turns the merged counts
  *     into boundary ranks: `rank(v) = 1 + Σ count(v')` over values
  *     strictly ahead of v, `dense_rank(v)` = the value's ordinal.
  *
  * The boundary table then broadcast-joins back onto the rows — no
  * row ever moves for the sort. Result is row-for-row identical to
  * `rank().over(Window.orderBy(orderCol))` /
  * `dense_rank().over(...)` including tie groups (RankSpec pins the
  * equivalence on a tied fixture). Functions needing a TOTAL order
  * (ntile, lead) are out of scope by construction — ties make them
  * partition-order-dependent without a tie-break key.
  *
  * Null order values are the caller's contract (Spark sorts them
  * FIRST desc, DuckDB LAST): filter them upstream, as every registry
  * user does.
  */
object Rank {

  /** Attach global `rankCol`/`denseCol` (ordered by `orderCol`,
    * descending unless `ascending`) without a global row sort. */
  def globalRankByCounts(df: DataFrame, orderCol: String,
                         ascending: Boolean = false,
                         rankCol: String = "rnk",
                         denseCol: String = "drnk"): DataFrame = {
    val cnt = df.groupBy(orderCol).agg(count(lit(1)).as("__n"))
    val ord = if (ascending) col(orderCol).asc else col(orderCol).desc
    // this window runs over DISTINCT values only — the one ordered
    // pass the algorithm needs, and the reason it scales: its input
    // is the aggregate, never the fact
    val w = Window.orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = cnt.select(col(orderCol),
      (sum("__n").over(w) - col("__n") + 1).cast("long").as(rankCol),
      row_number().over(Window.orderBy(ord)).cast("long").as(denseCol))
    df.join(broadcast(offs), Seq(orderCol))
  }
}
