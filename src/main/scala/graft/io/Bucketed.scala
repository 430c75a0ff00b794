package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the 100 TB co-location pattern: pay the
  * shuffle ONCE at write time (`bucketBy` + `sortBy` into a managed
  * table), and every later equi-join or aggregation on the bucket keys
  * plans with ZERO exchanges on that side (bucket counts must match
  * across join sides). This is how a production deployment would store
  * the dedup corpus (bucketed by doc id) or the fact series (bucketed by
  * series id) so repeated pipeline runs never re-shuffle the big table.
  *
  * BucketedSpec proves the contract: a self-equi-join of two bucketed
  * tables plans a SortMergeJoin with no `Exchange hashpartitioning` on
  * either side.
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `keys` into `buckets` buckets, replacing any existing table.
    * Robust to a PRIOR SESSION's leftover: with the default in-memory
    * catalog the table metadata dies with the session but its managed
    * LOCATION survives on disk, and `saveAsTable` then refuses with
    * LOCATION_ALREADY_EXISTS — so any stale default-db location is
    * cleared first (on a deployment with a persistent metastore the
    * DROP alone covers it and the location delete is a no-op). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    require(keys.nonEmpty && buckets > 0)
    require(!table.contains("."),
      s"table=$table must be unqualified (default db)")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
