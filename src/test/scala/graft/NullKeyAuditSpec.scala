package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Null-key convention audit — the machine check behind the r15 sweep.
  *
  * The hazard class (it bit q_lof in r13 and q_croston/q_hbos/q_dbscan/
  * q_asof/q_kurtosis/q_leadlag/q_split/q_leaderboard in the r15 audit):
  * an engine operator and its DuckDB oracle can disagree on what a
  * NULL series key does — Spark window partitions and groupBys treat
  * null as a value, equi-joins drop it, `ORDER BY` puts nulls FIRST
  * where DuckDB puts them LAST — and the driver fixture has no null
  * keys today, so the gate stays green until the first null-keyed row
  * flips a query red.
  *
  * The r15 audit ran EVERY events-reading SQL-oracle query through the
  * full driver-style compare (Verify parquet vs DuckDB hash) on two
  * null-bearing fixtures (sf0.001 + 20 null-user rows; + 6
  * null-event_type rows) — all pairs green after the r15 fixes. This
  * spec pins what that audit established, one classification per
  * query and axis:
  *
  *   drops = output is IDENTICAL with null-keyed input rows present
  *           (the operator filters them, or an inner join structurally
  *           discards them — and the audit verified the oracle does
  *           the SAME);
  *   keeps = null-keyed rows are visible in the output (their own
  *           window/group partition — and the audit verified the
  *           oracle groups them identically).
  *
  * The classification is structural (filters/joins/windows), not
  * data-dependent, so it is re-checked here on the same fixture recipe
  * the audit used. A new events-reading oracle query MUST be added to
  * the table (test 1 fails otherwise) and a behavior flip on either
  * axis fails test 2 — re-run the DuckDB-side audit before repinning.
  */
class NullKeyAuditSpec extends SparkSpec {

  /** (null-user axis, null-event_type axis) — pinned from the r15
    * audit (126/126 SQL-oracle pairs green on both null fixtures). */
  private val expected: Map[String, (String, String)] = Map(
    "q_acf" -> (("keeps", "keeps")),
    "q_asof" -> (("keeps", "drops")),
    "q_assoc" -> (("keeps", "drops")),
    "q_backfill" -> (("keeps", "keeps")),
    "q_business" -> (("keeps", "drops")),
    "q_croston" -> (("drops", "keeps")),
    "q_dbscan" -> (("drops", "keeps")),
    "q_decompose" -> (("drops", "keeps")),
    "q_event_metrics" -> (("keeps", "drops")),
    "q_eventize" -> (("keeps", "keeps")),
    "q_flags" -> (("drops", "keeps")),
    "q_funnel" -> (("keeps", "drops")),
    "q_global_stats" -> (("keeps", "keeps")),
    "q_hbos" -> (("drops", "keeps")),
    "q_hist" -> (("keeps", "keeps")),
    "q_histq" -> (("keeps", "keeps")),
    "q_hll" -> (("drops", "keeps")),
    "q_json" -> (("keeps", "keeps")),
    "q_ks" -> (("keeps", "drops")),
    "q_kurtosis" -> (("keeps", "keeps")),
    "q_label_windows" -> (("keeps", "keeps")),
    "q_lags" -> (("keeps", "keeps")),
    "q_lastn" -> (("keeps", "drops")),
    "q_latency" -> (("drops", "keeps")),
    "q_leaderboard" -> (("drops", "drops")),
    "q_leadlag" -> (("drops", "keeps")),
    "q_lof" -> (("drops", "keeps")),
    "q_lof_w" -> (("drops", "keeps")),
    "q_m4" -> (("drops", "keeps")),
    "q_mad" -> (("drops", "keeps")),
    "q_paths" -> (("keeps", "drops")),
    "q_persist" -> (("keeps", "keeps")),
    "q_pointwise" -> (("keeps", "drops")),
    "q_pr_curve" -> (("keeps", "keeps")),
    "q_psi" -> (("keeps", "drops")),
    "q_qq" -> (("keeps", "keeps")),
    "q_retention" -> (("keeps", "drops")),
    "q_rolling" -> (("keeps", "keeps")),
    "q_rollup" -> (("keeps", "keeps")),
    "q_rownum" -> (("keeps", "keeps")),
    "q_salted" -> (("keeps", "drops")),
    "q_sax" -> (("drops", "keeps")),
    "q_session" -> (("keeps", "drops")),
    "q_sessions" -> (("keeps", "keeps")),
    "q_split" -> (("drops", "keeps")),
    "q_stl_lite" -> (("drops", "keeps")),
    "q_sweep" -> (("drops", "drops")),
    "q_sweep_curve" -> (("drops", "drops")),
    "q_target_enc" -> (("keeps", "keeps")),
    "q_trend" -> (("drops", "keeps")),
    "q_trend_w" -> (("drops", "keeps")),
    "q_tukey" -> (("drops", "keeps")),
    "q_zorder" -> (("keeps", "keeps")),
    "q_zscore" -> (("drops", "keeps")))

  /** Oracles whose paired engine operator FILTERS null user keys must
    * say so explicitly — these are the ones where the drop is not
    * structural on the SQL side (no inner join discards the group). */
  private val mustFilterUser = Seq("q_croston", "q_hbos", "q_dbscan",
    "q_split", "q_leaderboard", "q_leadlag", "q_lof", "q_lof_w")

  private def audited: Set[String] =
    SparkEntry.oracleSql.collect {
      case (q, sql) if sql.contains("events") &&
        !sql.contains("fixtures/sf0.01") => q
    }.toSet

  test("every events-reading SQL-oracle query is classified") {
    val a = audited
    assert(a == expected.keySet,
      s"unclassified: ${a -- expected.keySet}; " +
        s"stale: ${expected.keySet -- a} — run the null-key audit " +
        "(Verify + check_oracle on a null-bearing fixture) and pin")
  }

  test("null-dropping engine operators have explicitly filtered oracles") {
    val missing = mustFilterUser.filterNot(q =>
      SparkEntry.oracleSql(q).contains("user_id IS NOT NULL"))
    assert(missing.isEmpty,
      s"oracle lost its null-key filter: $missing")
  }

  test("engine null-key behavior matches the audited classification") {
    val dir = "/root/testdata/sf0.001"
    val base = SparkEntry.readEvents(spark, dir)
    val schema = base.schema
    // the exact null-row recipe the r15 DuckDB-side audit used
    val t0 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val types = Seq("click", "purchase", "error", "signup", "view")
    val nullUserRows = (0 until 20).map { i =>
      Row(1000000L + i, ts(7L * i), null, types(i % 5),
        if (i % 7 != 0) 50.0 + 17.3 * i else 190.0 + i, s"""{"k": $i}""")
    }
    val nullTypeRows = (0 until 6).map { i =>
      Row(1000100L + i, ts(500L + 11L * i), 3L + (i % 3), null,
        77.0 + i, """{"k": 1}""")
    }
    def fixture(extra: Seq[Row], name: String): String = {
      val out = s"/tmp/graft-nullkey-audit/$name"
      base.unionByName(spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(extra).asJava), schema))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/events.parquet")
      out
    }
    val clean = fixture(Seq.empty, "clean")
    val nUser = fixture(nullUserRows, "nulluser")
    val nType = fixture(nullTypeRows, "nulltype")
    def canon(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(c => col(c).cast("string")): _*)
        .collect().map(_.mkString("|")).toSeq.sorted
    }
    val bad = expected.toSeq.sortBy(_._1).flatMap { case (q, (eu, et)) =>
      val f = SparkEntry.queries(q)
      val a = canon(f(spark, clean))
      val gu = if (canon(f(spark, nUser)) == a) "drops" else "keeps"
      val gt = if (canon(f(spark, nType)) == a) "drops" else "keeps"
      if ((gu, gt) == ((eu, et))) Nil
      else Seq(s"$q: expected ($eu,$et) got ($gu,$gt)")
    }
    assert(bad.isEmpty, s"null-key behavior drifted — re-run the " +
      s"DuckDB-side audit before repinning: ${bad.mkString("; ")}")
  }
}
