package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — the multi-dimensional
  * complement to [[Bucketed]]: pay ONE clustering write so that box
  * predicates on EITHER (or both) of two dimensions touch a small
  * fraction of files. A single-column sort gives perfect pruning on
  * that column and none on the other; bit-interleaving the two keys
  * makes file min/max ranges tight on BOTH — the property Delta/Iceberg
  * `OPTIMIZE ZORDER BY` builds on, done here with plain Spark
  * repartitionByRange + parquet footer stats.
  *
  * The z-value is a pure codegen'd column expression (a fixed fold of
  * shift/mask/or terms — no UDF); the write is one range exchange.
  * ZorderSpec proves the contract by measuring it: after z-ordering,
  * a box query's matching rows concentrate in ~√(selectivity) of the
  * files on each axis, vs ALL files for the axis a linear sort ignores.
  */
object Zorder {

  /** Morton code of two non-negative longs, `bits` low bits each
    * (values are masked into [0, 2^bits)): x occupies the even bit
    * positions, y the odd. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits not in [1,31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)),
          2 * b + 1))
    }
  }

  /** Write `df` to `path` clustered along the Morton curve of
    * (`xCol`, `yCol`): range-partition into `numFiles` z-ranges, sort
    * within each, drop the helper column. Rows are unchanged. */
  def writeZordered(df: DataFrame, path: String, xCol: String,
                    yCol: String, bits: Int, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles=$numFiles must be >= 1")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
