package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics — the funnel / cohort-retention pair
  * every event-stream warehouse ships (the ClickHouse
  * `windowFunnel` / retention shape, here as declarative Spark
  * relational plans so Catalyst owns the physical strategy).
  *
  *  - `funnel`: ordered-step conversion. Step 1 anchors at the user's
  *    FIRST occurrence of the first event type; each later step is
  *    the MIN timestamp of its type strictly after the previous step
  *    and within `window` of the anchor. That sequential-min
  *    formulation is exactly expressible as a chain of filtered
  *    aggregates + equi-joins on the user key — every join is
  *    user-keyed, so the whole funnel co-partitions on one exchange
  *    family and scales with users, not with event pairs.
  *  - `retention`: classic weekly cohort grid. Cohort = ISO week of
  *    the user's first event; a cohort×offset cell counts distinct
  *    users active in that later week. Two aggregates + one join,
  *    all user-keyed; offsets computed in exact integer microsecond
  *    arithmetic (`unix_micros` / 7-day divisor), so any engine
  *    reproduces the grid bit-for-bit. */
object Behavior {

  /** Per-user funnel over `steps` event types; returns
    * (user, level, ts_1 .. ts_k) where level = deepest step reached
    * (0 = none) and ts_i is that step's matched timestamp (null when
    * unreached). Users appear iff they have ≥ 1 event. */
  def funnel(df: DataFrame, user: String, ts: String, typeCol: String,
             steps: Seq[String], window: String): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val users = df.select(col(user)).distinct()
    val t1 = df.filter(col(typeCol) === steps.head)
      .groupBy(user).agg(min(col(ts)).as("ts_1"))
    val anchored = users.join(t1, Seq(user), "left")
      .withColumn("__deadline",
        col("ts_1") + expr(s"INTERVAL $window"))
    val full = steps.zipWithIndex.drop(1).foldLeft(anchored) {
      case (acc, (step, i)) =>
        val prevTs = s"ts_$i"
        val thisTs = s"ts_${i + 1}"
        val matched = df.filter(col(typeCol) === step)
          .select(col(user), col(ts).as("__t"))
          .join(acc.select(col(user), col(prevTs), col("__deadline"))
            .filter(col(prevTs).isNotNull), user)
          .filter(col("__t") > col(prevTs) &&
            col("__t") <= col("__deadline"))
          .groupBy(user).agg(min(col("__t")).as(thisTs))
        acc.join(matched, Seq(user), "left")
    }
    val tsCols = steps.indices.map(i => col(s"ts_${i + 1}"))
    val level = tsCols.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (c, i)) => when(c.isNotNull, lit(i + 1)).otherwise(acc)
    }
    full.select(col(user) +: (level.as("level") +: tsCols): _*)
  }

  /** Weekly cohort retention grid: (cohort_week, week_offset,
    * cohort_size, n_active, retention). Offset 0 is the cohort week
    * itself (retention 1.0 by construction — kept as the grid's
    * sanity row). */
  def retention(df: DataFrame, user: String, ts: String): DataFrame = {
    val weekly = df.select(col(user),
        date_trunc("week", col(ts)).as("__week"))
      .distinct()
    val cohort = weekly.groupBy(user)
      .agg(min(col("__week")).as("cohort_week"))
    val size = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    val active = weekly.join(cohort, user)
      .withColumn("week_offset",
        ((unix_micros(col("__week")) - unix_micros(col("cohort_week")))
          / lit(604800000000L)).cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    active.join(size, "cohort_week")
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
  }

  /** Top event-type paths ("Sankey" / user-flow analysis): the k most
    * frequent length-`n` consecutive event-type sequences across all
    * users — the path-exploration read every product-analytics engine
    * ships next to funnels (which test ONE hypothesized path; this
    * surfaces the paths worth hypothesizing). One user-keyed ordered
    * window builds the n-grams in place (no self-join), one global
    * count, one top-k — the n-gram-over-events twin of the text
    * n-gram machinery. Ties break (count DESC, path ASC). */
  def topPaths(df: DataFrame, user: String, ts: String,
               typeCol: String, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"n=$n must be >= 2")
    require(k >= 1, s"k=$k must be >= 1")
    val w = Window.partitionBy(user).orderBy(ts)
    val steps = (0 until n).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
    // NULL event types are dropped BEFORE the windows: concat_ws
    // silently skips NULLs, which would otherwise conflate an
    // (A, NULL, B) window with a genuine shorter path
    val withPath = df.filter(col(typeCol).isNotNull)
      .withColumn("__last", steps.last)
      .withColumn("__path", concat_ws(">", steps: _*))
      .filter(col("__last").isNotNull) // window tail has no full path
    val counts = withPath.groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_occurrences"))
    // Top-k via orderBy().limit(k) — plans as TakeOrderedAndProject
    // (per-partition heap + driver merge of k rows), NOT the global
    // un-partitioned row_number window, which would funnel the whole
    // distinct-path relation through ONE partition's sort. With a
    // high-cardinality type alphabet (|vocab|^n paths) the window form
    // is the classic single-partition bottleneck; TakeOrdered stays
    // distributed. Rank is derived AFTER the limit, over k rows only.
    val top = counts
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(k)
    val rk = Window.orderBy(col("n_occurrences").desc, col("path").asc)
    top.withColumn("rank", row_number().over(rk).cast("long"))
  }
}
