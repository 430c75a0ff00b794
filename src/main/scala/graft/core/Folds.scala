package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The house float-fold convention, in ONE place: any float sum whose
  * value is oracle-checked must be a TOTAL-ORDERED fold, because
  * unordered partial aggregation makes the result partition-dependent
  * (IEEE addition is not associative). Previously copied verbatim
  * into Lof/PageRank/Hits — one shared definition keeps the engines'
  * bit-exactness contract from silently forking between operators.
  */
object Folds {

  /** Σ over `v` in ascending-`ord` order (collect, sort by `ord`,
    * left fold from 0.0) — mirror in DuckDB as
    * `list_reduce(list_prepend(0.0, list_transform(
    *    list(v ORDER BY ord), x -> x)), (a, b) -> a + b)`. */
  def orderedSum(ord: Column, v: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(ord, v.as("__v")))),
        s => s.getField("__v")),
      lit(0.0), (a, x) => a + x)
}
