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
    "q_cube" -> (("keeps", "keeps")),
    "q_dbscan" -> (("drops", "keeps")),
    "q_decompose" -> (("drops", "keeps")),
    "q_event_metrics" -> (("keeps", "drops")),
    "q_except" -> (("drops", "drops")),
    "q_intersect" -> (("keeps", "drops")),
    "q_eventize" -> (("keeps", "keeps")),
    "q_flags" -> (("drops", "keeps")),
    "q_funnel" -> (("keeps", "drops")),
    "q_global_stats" -> (("keeps", "keeps")),
    "q_grouping_sets" -> (("keeps", "keeps")),
    "q_hbos" -> (("drops", "keeps")),
    "q_hist" -> (("keeps", "keeps")),
    "q_histq" -> (("keeps", "keeps")),
    "q_ijoin" -> (("drops", "drops")),
    "q_ijoin_left" -> (("keeps", "drops")),
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
    "q_multi_distinct" -> (("keeps", "keeps")),
    "q_paths" -> (("keeps", "drops")),
    "q_persist" -> (("keeps", "keeps")),
    "q_pivot" -> (("keeps", "drops")),
    "q_pointwise" -> (("keeps", "drops")),
    "q_pr_curve" -> (("keeps", "keeps")),
    "q_psi" -> (("keeps", "drops")),
    "q_qq" -> (("keeps", "keeps")),
    "q_rank_users" -> (("drops", "keeps")),
    "q_rank_users_2l" -> (("drops", "keeps")),
    "q_rank_full" -> (("drops", "keeps")),
    "q_resample" -> (("drops", "keeps")),
    "q_rolling_time" -> (("keeps", "keeps")),
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
    "q_split", "q_leaderboard", "q_leadlag", "q_lof", "q_lof_w",
    "q_resample", "q_rank_users", "q_rank_users_2l", "q_rank_full")

  // --- the audit's PERIMETER, as code (r16): every registry query is
  // in exactly one bucket. `expected` above (the events-reading
  // SQL-oracle queries) is the audited bucket; the other two are
  // exemptions whose VALIDITY is machine-checked per query below:
  //   fixtureOracle — the oracle replays a pinned parquet fixture
  //     (literal outputs; a null key can only enter via a deliberate
  //     fixture regeneration, which re-pins the outputs themselves);
  //   noEventsRead  — the oracle never reads the events table, so
  //     neither null axis (user_id / event_type) exists in its input.
  // A NEW query lands in no bucket and fails the perimeter test until
  // a human classifies it — and a query whose oracle DRIFTS (a
  // noEventsRead oracle gaining an events read, a fixture oracle
  // losing its fixture) fails the validity check for its bucket.

  private val fixtureOracle: Set[String] = Set(
    "q_ann_ivf", "q_ann_ivf_q8", "q_ann_ivfpq", "q_ann_lsh", "q_ann_pq",
    "q_ann_q8", "q_ar", "q_attributes", "q_bocpd", "q_bpe_merges",
    "q_bpe_tokens", "q_bsts", "q_bsts_dummy", "q_ci_flags",
    "q_conformal", "q_containment", "q_cp_flags", "q_cusum", "q_dtw",
    "q_embed_neardup", "q_ensemble2", "q_ensemble3", "q_ewma",
    "q_forecast_metrics", "q_gp", "q_holtwinters", "q_hybrid",
    "q_iforest", "q_kalman", "q_kmeans", "q_langid", "q_matrix_profile",
    "q_minhash", "q_mm_decode", "q_mm_resize", "q_mm_video",
    "q_multimodal", "q_pelt", "q_semdedup", "q_shesd", "q_sig_dedup",
    "q_simhash", "q_simhash_multi", "q_spectral", "q_stem",
    "q_stl_exact", "q_unigram", "q_unigram_tokens", "q_winnow")

  private val noEventsRead: Set[String] = Set(
    "q10_returned", "q11_important_stock",
    "q13_cust_dist", "q16_supplier_cnt",
    "q17_small_qty", "q18_big_orders", "q1_pricing",
    "q19_brackets",
    "q20_excess_stock", "q21_waiting", "q22_idle_balance",
    "q2_min_cost", "q3_shipping",
    "q4_priority", "q5_region_revenue", "q6_forecast",
    "q7_nation_trade", "q9_product_profit", "q15_top_supplier",
    "q_backoff",
    "q_bm25", "q_bucketed", "q_c4_filter", "q_chunks", "q_clustering",
    "q_cms", "q_code", "q_colloc", "q_communities", "q_compact",
    "q_corpus",
    "q_corpus2", "q_corpus3", "q_cosine_topk", "q_decontam",
    "q_decontam_bloom", "q_dedup_exact", "q_dedup_resolve", "q_drift",
    "q_dsir", "q_dsir_resample", "q_editdist", "q_entropy",
    "q_er_block", "q_er_resolve", "q_er_union", "q_fingerprint",
    "q_hardneg", "q_hashcos", "q_hits", "q_hybrid_search", "q_join_agg",
    "q_kmv", "q_langid_ngram", "q_lsh_tune", "q_mixture", "q_mm_audio",
    "q_mm_frames", "q_mmr", "q_nbquality", "q_ngram_jaccard",
    "q_normalize", "q_novelty", "q_pack", "q_pack_slices", "q_pagerank",
    "q_pagerank_pers", "q_part_revenue", "q_perplexity", "q_pii",
    "q_pii_card", "q_quality", "q_quality_calibrate", "q_randproj",
    "q_readability", "q_repetition", "q_retrieval_eval", "q_rm3",
    "q_rollhash", "q_sample", "q_sample_up", "q_shuffle",
    "q_shuffle_pack", "q_soundex", "q_span_dedup", "q_substr_dedup",
    "q_text_stats", "q_tfidf", "q_topk_orders", "q_triangles", "q_url",
    "q_vocab")

  /** Names in `all` that no bucket classifies — the perimeter check,
    * factored out so the negative case can prove it fires. */
  private def unclassified(all: Set[String]): Set[String] =
    all -- expected.keySet -- fixtureOracle -- noEventsRead

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

  test("perimeter: every registry query is in exactly one audit bucket " +
      "and each exemption is structurally valid") {
    val all = SparkEntry.queries.keySet
    assert(unclassified(all).isEmpty,
      s"unclassified queries: ${unclassified(all).toSeq.sorted} — " +
        "classify as audited (run the null-key audit), fixtureOracle, " +
        "or noEventsRead")
    val stale = (expected.keySet ++ fixtureOracle ++ noEventsRead) -- all
    assert(stale.isEmpty, s"stale classifications: ${stale.toSeq.sorted}")
    val overlaps = Seq(
      expected.keySet & fixtureOracle, expected.keySet & noEventsRead,
      fixtureOracle & noEventsRead).flatten
    assert(overlaps.isEmpty, s"queries in two buckets: $overlaps")
    // exemption validity: the structural reason each bucket is out of
    // the audit's reach must still hold against the live oracle text
    val badFix = fixtureOracle.filterNot(q =>
      SparkEntry.oracleSql(q).contains("fixtures/sf0.01"))
    assert(badFix.isEmpty,
      s"fixture-oracle exemption no longer valid (oracle stopped " +
        s"reading its pinned fixture): ${badFix.toSeq.sorted}")
    val badNo = noEventsRead.filter(q =>
      SparkEntry.oracleSql(q).contains("events"))
    assert(badNo.isEmpty,
      s"noEventsRead exemption no longer valid (oracle now reads " +
        s"events — run the null-key audit): ${badNo.toSeq.sorted}")
  }

  test("perimeter negative case: an unclassified newcomer is reported") {
    val got = unclassified(SparkEntry.queries.keySet + "q_dummy_new")
    assert(got == Set("q_dummy_new"),
      s"the perimeter check must flag exactly the newcomer, got $got")
  }

  test("null-dropping engine operators have explicitly filtered oracles") {
    // EVERY events read in these oracles must carry the filter —
    // counting reads vs filters catches a partially-filtered oracle
    // (today each reads events exactly once)
    val bad = mustFilterUser.filterNot { q =>
      val sql = SparkEntry.oracleSql(q)
      val reads = "FROM events".r.findAllIn(sql).length
      val filters = "user_id IS NOT NULL".r.findAllIn(sql).length
      reads >= 1 && filters >= reads
    }
    assert(bad.isEmpty,
      s"oracle lost a null-key filter (fewer 'user_id IS NOT NULL' " +
        s"than 'FROM events' reads): $bad")
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
