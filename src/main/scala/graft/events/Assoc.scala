package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant, VLDB 1994's
  * measure family — support / confidence / lift) over sessionized
  * event baskets: which event types co-occur in one session more than
  * chance predicts — the "users who X also Y" read next to funnels
  * (which test ORDER; association ignores it).
  *
  * Basket = the DISTINCT event types of one [[Sessions]] session.
  * For each unordered type pair {a, b} (a < b lexically):
  *
  *   support(ab)   = n_ab / N
  *   conf(a→b)     = n_ab / n_a     (and symmetrically b→a)
  *   lift(ab)      = N · n_ab / (n_a · n_b)
  *
  * with N the total session count. Everything is a ratio of exact
  * integer counts — engine-reproducible to the last bit before the
  * final rounding.
  *
  * Distribution shape: baskets are (session, type) distinct rows —
  * one aggregate after the sessionize window; the pair join is keyed
  * by the SESSION (per-basket item count is bounded by the type
  * vocabulary, so pair volume per session is |vocab|²-bounded — the
  * classic a<b self-join that never explodes); the per-type and
  * global counts are broadcast-sized. No driver-side loops anywhere.
  */
object Assoc {

  /** Output: (item_a, item_b, n_a, n_b, n_ab, support, conf_a_b,
    * conf_b_a, lift), one row per unordered pair with n_ab ≥
    * `minCount`. */
  def associationRules(df: DataFrame, user: String, ts: String,
                       typeCol: String, gapSeconds: Long,
                       minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    val baskets = Sessions.sessionize(
        df.filter(col(typeCol).isNotNull), user, ts, gapSeconds)
      .select(col(user).as("__u"), col("session_seq").as("__s"),
        col(typeCol).cast("string").as("__it"))
      .distinct()
    val nSessions = baskets.select("__u", "__s").distinct()
      .agg(count(lit(1)).as("__N"))
    val itemCounts = baskets.groupBy("__it")
      .agg(count(lit(1)).as("__n"))
    val a = baskets.select(col("__u"), col("__s"),
      col("__it").as("item_a"))
    val b = baskets.select(col("__u"), col("__s"),
      col("__it").as("item_b"))
    val pairs = a.join(b, Seq("__u", "__s"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(broadcast(itemCounts.select(col("__it").as("item_a"),
        col("__n").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("__it").as("item_b"),
        col("__n").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nSessions))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        (col("n_ab").cast("double") / col("__N").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_a"),
        (col("__N").cast("double") * col("n_ab").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
  }
}
