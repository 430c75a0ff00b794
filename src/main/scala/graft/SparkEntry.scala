package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.SeriesOps
import graft.events.Events
import graft.metrics.Metrics
import graft.models.StlLite

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a SURVEY §2 operator exercised over the
  * driver testdata (`/root/testdata/sf*`); `oracleSql` carries the ANSI
  * SQL equivalent the driver runs in DuckDB. Conventions that make the
  * hash-compare robust:
  *  - every float column whose computation is algorithm-dependent across
  *    engines (window/group means, stddevs, corr) is `round(x, 4)` on
  *    BOTH sides; floats derived by identical arithmetic from exact ints
  *    (metric formulas) are `round(x, 6)`;
  *  - int ordinals/counts are cast to BIGINT on the Spark side to match
  *    DuckDB's window/count result types;
  *  - the events table's nanosecond timestamps are read via
  *    `nanosAsLong` and floored to microseconds (`ts DIV 1000`), which is
  *    exactly DuckDB's ns→µs read behavior.
  */
object SparkEntry {

  /** events scan, robust to BOTH driver-testdata generations:
    *  - TIMESTAMP(NANOS) parquet (rounds 1-9): Spark 4 rejects it, so
    *    the legacy conf reads ns as BIGINT, floor-divided to µs (exact
    *    integer math — a double division would lose precision above
    *    2^53), then `timestamp_micros`;
    *  - native timestamp[us] parquet (round 10+): read as
    *    TIMESTAMP_NTZ, cast to the session-TZ timestamp — identical
    *    instants under the pinned UTC session TZ, and the same µs
    *    values DuckDB sees in its naive TIMESTAMP read. */
  def readEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private[graft] def ev(s: SparkSession, dir: String): DataFrame =
    readEvents(s, dir)

  private[graft] def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Fan a small scan out to the full core count. The driver testdata is
    * one row group per table, so the scan — and every map-side op until
    * the first exchange — otherwise runs on a single core; on a real
    * multi-split layout the partition guard makes this a no-op (never
    * add a shuffle to an input that is already parallel). Applied ONLY
    * to queries whose math is exact per row (hashes, set counts,
    * per-pair cosines): repartitioning an input to a float AGGREGATION
    * would change partial-sum order and could flip rounded digits vs
    * the oracle. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // metadata only, NOT df.rdd.getNumPartitions: the .rdd probe forces
    // physical planning + RDD conversion inside the query-build path on
    // every invocation. Parallelism is estimated as max(file count,
    // size-derived split count) — one LARGE splittable parquet file
    // already scans as bytes/maxPartitionBytes native splits and must
    // not pay a full shuffle; a non-file-backed plan (no scan relation)
    // is left untouched since its parallelism is unknowable from here.
    val files = df.inputFiles.length
    if (files == 0) return df
    val conf = df.sparkSession.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (bytes / conf.filesMaxPartitionBytes).toLong + 1
    if (math.max(files.toLong, estSplits) < target) df.repartition(target)
    else df
  }

  /** documents scan, fanned out (text operators are CPU-bound per row). */
  private[graft] def docs(s: SparkSession, dir: String): DataFrame =
    spread(tbl(s, dir, "documents"))

  /** embeddings scan, fanned out (signature/cosine math per row/pair). */
  private[graft] def emb(s: SparkSession, dir: String): DataFrame =
    spread(tbl(s, dir, "embeddings"))

  /** Deterministic line-structure synthesis for the C4-cleaning
    * queries (the corpus has no newlines): 8-word lines, terminal '.'
    * only when (doc_id + line) % 3 != 0, a "lorem ipsum" prefix on
    * line 0 of doc_id%11 docs, a trailing '{' on line 1 of doc_id%13
    * docs — every published rule exercised. Mirrored verbatim in the
    * q_c4_filter / q_corpus2 oracle SQL. */
  private[graft] def synthLines: Column = {
    val w = split(col("text"), " ")
    transform(
      sequence(lit(0L), floor((size(w) - lit(1)) / lit(8)).cast("long")),
      i => concat(
        when(col("doc_id") % 11 === 0 && i === 0,
          lit("lorem ipsum ")).otherwise(lit("")),
        array_join(slice(w, (i * 8 + 1).cast("int"), lit(8)), " "),
        when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0 && i === 1, lit(" {"))
          .otherwise(lit(""))))
  }

  // shared flag definitions for the detector queries
  private[graft] val predFlag = when(col("value") > 150, 1).otherwise(0)
  private[graft] val truthFlag =
    when(col("event_type") === "error" && col("value") > 100, 1).otherwise(0)

  private[graft] def withZ(base: DataFrame): DataFrame = {
    val st = base.groupBy("user_id")
      .agg(avg("value").as("__mu"), stddev_samp("value").as("__sd"))
    base.join(broadcast(st), Seq("user_id"))
      .withColumn("z", abs(col("value") - col("__mu")) / (col("__sd") + lit(1e-9)))
      .drop("__mu", "__sd")
  }

  private[graft] def predEvents(base: DataFrame): DataFrame =
    Events.eventize(base.withColumn("flag", predFlag), Seq("user_id"), "ts",
      "flag", 3)

  private[graft] def truthEvents(base: DataFrame): DataFrame =
    Events.eventize(base.withColumn("tflag", truthFlag), Seq("user_id"), "ts",
      "tflag", 3)

  /** Flagship: full anomaly-detection pipeline on the events series —
    * per-user z-score → threshold (k=3) → persistence(2) → eventize(gap 3)
    * → event-level F1 vs the truth flag. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val base = withZ(ev(spark, dir))
    val flagged = base.withColumn("flag",
      SeriesOps.thresholdFlag(col("z"), lit(3.0)))
    val persisted = Events.persistFilter(flagged, Seq("user_id"), "ts",
      "flag", 2, "flag_p")
    val pred = Events.eventize(persisted, Seq("user_id"), "ts", "flag_p", 3)
    Events.eventLevelMetrics(pred, truthEvents(ev(spark, dir)), Seq("user_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.registry.QueriesSeries.map ++ graft.registry.QueriesLlm.map


  /** For each key in queries, the equivalent ANSI SQL the driver runs
    * in DuckDB on the same parquet tables — see
    * [[graft.oracles.OracleSql]]. */
  def oracleSql: Map[String, String] = graft.oracles.OracleSql.map
}
