package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General point-in-time ("as-of backward") join — the
  * feature-assembly primitive of every training pipeline: for each
  * left row, attach the LATEST right row of the same key whose
  * timestamp is ≤ the left timestamp (pandas `merge_asof`, kdb `aj`,
  * DuckDB `ASOF JOIN`; the J2 label-window join is the bounded special
  * case). Leakage-safe by construction: nothing from the future of
  * `leftTs` can reach the row.
  *
  * Implementation is the UNION trick, not a range join: tag right
  * rows side=0 and left rows side=1, union on the key, and take
  * `last(payload, ignoreNulls)` over the key-partitioned
  * (ts, side)-ordered window — ONE shuffle by key + one in-partition
  * sort, linear in |L|+|R|, no per-key driver loops and no quadratic
  * candidate pairs (a naive `l.ts >= r.ts` range join is |L|×|R| per
  * key before its argmax). Ordering (ts, side) makes the join
  * INCLUSIVE of an exactly-equal right timestamp, matching DuckDB's
  * `ON l.ts >= r.ts` semantics.
  *
  * Contract: right rows must be unique per (keys, rightTs) — with
  * duplicates the kept row follows the engine's stable-sort order and
  * is not guaranteed across engines (assert or pre-aggregate first).
  * `toleranceSeconds` (optional) nulls the match when the right row is
  * older than the tolerance — pandas `merge_asof(tolerance=...)`.
  *
  * Null keys follow EQUI-JOIN semantics (SQL `ON l.k = r.k`): a null
  * key matches NOTHING — left rows with a null key pass through
  * UNMATCHED, right rows with a null key are dropped. The union trick
  * would otherwise silently group null==null (a window partition
  * treats null as a value), which no SQL asof join does — the r15
  * null-key audit caught exactly that divergence on q_asof.
  */
object AsofJoin {

  /** As-of backward join. Output: every left row + `<prefix>ts` (the
    * matched right timestamp) + one `<prefix><col>` per payload
    * column; unmatched (or out-of-tolerance) rows keep nulls. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String], prefix: String = "asof_",
               toleranceSeconds: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    require(!payloadCols.contains("ts"),
      "a payload column named 'ts' would overwrite the matched-" +
        "timestamp output column <prefix>ts — rename it first")
    // equi-join null semantics: a null-keyed right row can never be
    // anyone's match, so it is dropped BEFORE the union — a null-keyed
    // LEFT row then lands in a right-free window partition and comes
    // out unmatched, exactly like SQL `ASOF LEFT JOIN ... ON l.k = r.k`
    val rSel = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"),
          struct(col(rightTs).as("__rts") +:
            payloadCols.map(c => col(c).as(c)): _*).as("__p")): _*)
      .withColumn("__side", lit(0))
    val lSel = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val u = rSel.unionByName(lSel, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__last", last("__p", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance gap in exact integer MICROSECONDS (unix_timestamp
    // truncates to whole seconds — a right row 1.9s old would pass a
    // 1s tolerance; unix_micros matches the m4Downsample convention)
    val inTol: Column = toleranceSeconds match {
      case Some(t) =>
        col("__last").isNotNull &&
          unix_micros(col("__ts")) -
            unix_micros(col("__last").getField("__rts")) <=
              t * 1000000L
      case None => col("__last").isNotNull
    }
    val withCols = matched
      .withColumn(s"${prefix}ts",
        when(inTol, col("__last").getField("__rts")))
    val out = payloadCols.foldLeft(withCols) { (df, c) =>
      df.withColumn(s"$prefix$c",
        when(inTol, col("__last").getField(c)))
    }
    out.drop("__ts", "__side", "__p", "__last")
  }
}
