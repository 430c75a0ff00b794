package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
  * frequency summary for heavy-hitter queries at corpus scale: d hash
  * rows × w buckets of counts, est(x) = min over rows of the bucket
  * counts, with the one-sided guarantee exact ≤ est ≤ exact + ε·N
  * (ε = e/w with probability 1 − e^{−d} under pairwise-independent
  * hashing). The sketch table is d·w rows TOTAL regardless of input
  * size, the build is one partial-aggregated exchange, and merging
  * sketches is count addition — the same law as [[Kmv]]/the histogram
  * sketch, and the reason a 100 TB token-frequency profile fits in a
  * broadcastable relation.
  *
  * DETERMINISTIC twist (the library's sketch convention): row r's
  * hash is the portable polynomial over the DECIMAL-DIGIT-prefixed
  * value (`r || value`), so any engine computes the identical sketch
  * and the ESTIMATE itself is oracle-checkable in plain SQL. The same
  * short-key caveat as [[Kmv]] applies: the polynomial mixes weakly
  * on very short strings, which for CMS only shifts WHICH buckets
  * collide — the ≥-exact guarantee is structural and holds for any
  * hash. */
object Cms {

  private val HashMod = 2147483647L

  /** Row-r salted portable hash bucket of `value` in [0, width). */
  def bucketExpr(value: Column, row: Int, width: Int): Column =
    pmod(TextAnalysis.rollingHash(
      concat(lit(row.toString), value.cast("string"))),
      lit(width.toLong))

  /** The sketch: (row, bucket, cnt) counts over `value` occurrences —
    * d·w rows total, one exchange, merge = addition. */
  def sketch(df: DataFrame, value: String, depth: Int,
             width: Int): DataFrame = {
    require(depth >= 1 && depth <= 10, s"depth=$depth must be in [1,10]")
    require(width >= 2, s"width=$width must be >= 2")
    df.filter(col(value).isNotNull)
      .select(posexplode(array((0 until depth).map(r =>
        bucketExpr(col(value), r, width)): _*)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `items` (a frame with column `value`) against
    * a (row, bucket, cnt) sketch built with the same (depth, width):
    * input columns ride through, plus `cms_est` = min over rows of the
    * item's bucket count (0 if a bucket row is absent — an item never
    * counted). The sketch side is d·w rows — broadcast by
    * construction. Safe to feed a UNION of sketch increments (e.g. the
    * windowed streaming sink): duplicate (row, bucket) rows merge by
    * addition first — the sketch's merge law. */
  def estimate(sk: DataFrame, items: DataFrame, value: String,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    require(!items.columns.exists(Set("row", "bucket", "cnt")),
      "items must not carry columns named row/bucket/cnt (sketch keys)")
    val merged = sk.groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val withRb = items
      .withColumn("__rb", explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"),
          bucketExpr(col(value), r, width).as("bucket"))): _*)))
      .select(items.columns.map(col) :+ col("__rb.row").as("row") :+
        col("__rb.bucket").as("bucket"): _*)
    withRb.join(broadcast(merged), Seq("row", "bucket"), "left")
      .groupBy(items.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
