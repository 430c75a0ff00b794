package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-defeating salted equi-joins — the standard 100 TB remedy when
  * a shuffle join's key distribution has hot keys (one key's rows
  * exceed an executor's partition budget) and the small side is still
  * too large to broadcast. AQE's skew-join split handles sort-merge
  * skew AFTER materializing oversized partitions; salting prevents the
  * oversized partition from ever existing, and is the form that also
  * works under bucketing and in streaming-static joins.
  *
  * Mechanics: the PROBE side tags each row with a deterministic salt
  * in [0, salts) (a row hash — any assignment is correct, determinism
  * keeps plans replayable); the BUILD side is replicated `salts` ways
  * with one replica per salt; the join runs on (keys, salt), spreading
  * each hot key over `salts` shuffle partitions. Row-for-row identical
  * to the unsalted join (each probe row meets exactly the one replica
  * carrying its salt) — SaltedSpec pins the equivalence, including
  * duplicate rows and null keys.
  *
  * [[saltedJoinSkewed]] is the production hybrid: detect hot keys with
  * one count aggregate (a partial-agged, skew-immune pass), salt ONLY
  * the hot-key rows, and run the untouched majority through the plain
  * join — paying the replication tax on exactly the keys that need it.
  */
object Salted {

  /** Deterministic salt in [0, salts) from a whole-row hash. */
  def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
      lit(salts.toLong))

  /** Inner equi-join on `keys` with the left side's keys spread over
    * `salts` partitions; the right side is replicated ×salts. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts >= 2, s"salts=$salts must be >= 2")
    require(keys.nonEmpty, "keys must be non-empty")
    val l = left.withColumn("__salt", saltCol(left, salts))
    val r = right.crossJoin(
      broadcast(right.sparkSession.range(salts)
        .select(col("id").as("__salt"))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Hot keys of `df` under `keys`: keys whose row count exceeds
    * `threshold` (one partial-agged count — itself skew-immune). */
  def hotKeys(df: DataFrame, keys: Seq[String],
              threshold: Long): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold)
      .select(keys.map(col).toIndexedSeq: _*)

  /** Hybrid skew join: rows of hot keys (detected on the left at
    * `threshold`) go through the salted path, everything else through
    * the plain join. The hot-key set must be broadcastable — by
    * construction it is tiny (there are at most |left|/threshold hot
    * keys). Result ≡ plain inner join. */
  def saltedJoinSkewed(left: DataFrame, right: DataFrame,
                       keys: Seq[String], salts: Int,
                       threshold: Long): DataFrame = {
    require(salts >= 2, s"salts=$salts must be >= 2")
    val hot = broadcast(hotKeys(left, keys, threshold)
      .withColumn("__hot", lit(true)))
    val lTag = left.join(hot, keys, "left")
    val rTag = right.join(hot, keys, "left")
    val plain = lTag.filter(col("__hot").isNull).drop("__hot")
      .join(rTag.filter(col("__hot").isNull).drop("__hot"), keys)
    val salted = saltedJoin(
      lTag.filter(col("__hot").isNotNull).drop("__hot"),
      rTag.filter(col("__hot").isNotNull).drop("__hot"), keys, salts)
    plain.unionByName(salted)
  }
}
