package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — the inactivity-gap event grouping every
  * product-analytics engine ships beside funnels and retention (the
  * BigQuery/ClickHouse "session window" shape): a user's events belong
  * to one session until a silence longer than `gapSeconds`, then the
  * next event opens a new session.
  *
  * Relational formulation (the classic gaps-and-islands rank trick,
  * same family as the W7 eventize): ONE user-keyed ordered window
  * computes the previous timestamp, a new-session flag (`gap >
  * threshold`, exact integer microsecond arithmetic — no DST/rounding
  * surprises), and the running flag sum as the 1-based session
  * ordinal. Everything downstream (per-session stats) is a keyed
  * aggregate on (user, session) that reuses the user partitioning.
  * At scale the only exchange is the per-user one; session count per
  * user is data-bounded, never materialized driver-side.
  */
object Sessions {

  /** Adds `session_seq` (1-based per user, in time order) to every
    * event row. Ties on `ts` within a user stay in one session (gap 0
    * ≤ threshold). */
  def sessionize(df: DataFrame, user: String, ts: String,
                 gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds=$gapSeconds must be >= 1")
    val w = Window.partitionBy(user).orderBy(ts)
    val gapMicros = gapSeconds * 1000000L
    df.withColumn("__prev", lag(col(ts), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(ts)) - unix_micros(col("__prev")) >
            gapMicros, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Per-session rollup: (user, session_seq, session_start,
    * session_end, n_events, duration_secs, n_types) — duration in
    * exact whole microseconds exposed as a DOUBLE seconds value
    * (micros/1e6 is exact for any realistic span). */
  def sessionStats(df: DataFrame, user: String, ts: String,
                   typeCol: String, gapSeconds: Long): DataFrame =
    sessionize(df, user, ts, gapSeconds)
      .groupBy(col(user), col("session_seq"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        ((unix_micros(max(col(ts))) - unix_micros(min(col(ts))))
          .cast("double") / 1e6).as("duration_secs"),
        countDistinct(col(typeCol)).as("n_types"))
}
