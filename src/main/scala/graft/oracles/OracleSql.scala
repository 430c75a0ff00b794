package graft.oracles

/** DuckDB oracle SQL for every entry in `graft.SparkEntry.queries` —
  * the driver runs each statement in DuckDB over the same parquet
  * tables and byte-compares against the Spark result (the round's
  * correctness gate). Pure strings + string generators: nothing here
  * touches Spark. House rules (see repo memory + COVERAGE.md): alias
  * every output identically on both sides; `+ 0.0` after any rounded
  * subtraction/corr output (IEEE signed zero); integer-pin multi-step
  * float pipelines; write float constants as the literal IEEE
  * expressions the engine computes (`1.0 - 0.85`, never `0.15`);
  * never backslash-s classes in oracle-paired regexes (Java vs RE2
  * vertical-tab divergence); multiply-referenced CTEs in unrolled
  * chains must be `AS MATERIALIZED` (DuckDB inlines CTEs). Kept in
  * ONE file so the conventions stay reviewable side by side; the
  * Spark-side query registry lives in [[graft.SparkEntry]].
  */
object OracleSql {
  /** q_mmr oracle: greedy MMR unrolled as chained CTEs — step t
    * anti-joins the already-selected set, computes each remaining
    * candidate's max cosine to it (same left-to-right component fold
    * and `dot/(nrm_a·nrm_b + 1e-12)` convention as the Spark side),
    * and picks the (score DESC, corpus_id ASC) winner. The λ
    * arithmetic is written `CAST(0.7 AS DOUBLE)·rel − (CAST(1.0 AS
    * DOUBLE) − CAST(0.7 AS DOUBLE))·ms` so both engines compute the
    * identical IEEE expression (1.0 − 0.7 ≠ 0.3 in doubles). */
  private def mmrOracleSql: String = {
    val head =
      """WITH q AS (SELECT vec_id AS query_id,
        |    embedding::DOUBLE[] AS qv FROM embeddings
        |  WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings),
        |p AS (SELECT query_id, corpus_id, cv,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(list_zip(qv, cv), x -> x[1]*x[2])),
        |      (a, b) -> a + b) /
        |    (sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(list_zip(qv, qv), x -> x[1]*x[2])),
        |      (a, b) -> a + b)) *
        |     sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(list_zip(cv, cv), x -> x[1]*x[2])),
        |      (a, b) -> a + b)) + 1e-12) AS rel,
        |    sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(list_zip(cv, cv), x -> x[1]*x[2])),
        |      (a, b) -> a + b)) AS nrm
        |  FROM q CROSS JOIN c WHERE query_id <> corpus_id),
        |cand AS (SELECT query_id, corpus_id, cv, nrm, rel,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, corpus_id ASC) AS rk
        |  FROM p QUALIFY rk <= 20),
        |sel1 AS (SELECT query_id, corpus_id, cv, nrm, rel,
        |    CAST(0.7 AS DOUBLE) * rel AS score,
        |    CAST(1 AS BIGINT) AS mmr_rank
        |  FROM cand WHERE rk = 1),
        |""".stripMargin
    val steps = (2 to 5).map { t =>
      val prev = s"sel${t - 1}"
      s"""rem$t AS (SELECT * FROM cand WHERE NOT EXISTS (
         |  SELECT 1 FROM $prev s WHERE s.query_id = cand.query_id
         |    AND s.corpus_id = cand.corpus_id)),
         |ms$t AS (SELECT r.query_id, r.corpus_id,
         |    max(list_reduce(list_prepend(0.0,
         |      list_transform(list_zip(r.cv, s.cv), x -> x[1]*x[2])),
         |      (a, b) -> a + b) / (r.nrm * s.nrm + 1e-12)) AS ms
         |  FROM rem$t r JOIN $prev s ON r.query_id = s.query_id
         |  GROUP BY 1, 2),
         |pick$t AS (SELECT r.query_id, r.corpus_id, r.cv, r.nrm,
         |    r.rel,
         |    CAST(0.7 AS DOUBLE) * r.rel - (CAST(1.0 AS DOUBLE) -
         |      CAST(0.7 AS DOUBLE)) * m.ms AS score,
         |    CAST($t AS BIGINT) AS mmr_rank
         |  FROM rem$t r JOIN ms$t m ON r.query_id = m.query_id
         |    AND r.corpus_id = m.corpus_id
         |  QUALIFY row_number() OVER (PARTITION BY r.query_id
         |    ORDER BY CAST(0.7 AS DOUBLE) * r.rel -
         |      (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * m.ms
         |      DESC, r.corpus_id ASC) = 1),
         |sel$t AS (SELECT * FROM $prev UNION ALL
         |  SELECT query_id, corpus_id, cv, nrm, rel, score, mmr_rank
         |  FROM pick$t),
         |""".stripMargin
    }.mkString
    val tail =
      """fin AS (SELECT * FROM sel5)
        |SELECT query_id, mmr_rank, corpus_id, round(rel, 6) AS rel,
        |  round(score, 6) AS mmr_score FROM fin""".stripMargin
    head + steps + tail
  }

  /** q_pagerank oracle: the 10 power-iteration steps unrolled as
    * chained CTEs — per step one edge⋈rank join with a SOURCE-ordered
    * contribution fold per destination, then the damping update with
    * the same literal IEEE constants as the Spark side
    * (`CAST(1.0) − CAST(0.85)`, never a decimal 0.15). */
  private def pageRankOracleSql: String = {
    val head =
      """WITH nodes AS (SELECT doc_id AS id FROM documents),
        |mm AS (SELECT max(id) + 1 AS m, count(*) AS n FROM nodes),
        |eraw AS (
        |  SELECT id AS src, (id * 7 + 1) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 13 + 3) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 31 + 11) % m AS dst
        |  FROM nodes CROSS JOIN mm),
        |edges AS (SELECT DISTINCT src, dst FROM eraw
        |  WHERE src <> dst),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / n AS rank
        |  FROM nodes CROSS JOIN mm),
        |""".stripMargin
    // two-level source-ordered fold mirroring PageRank.scala's
    // skew-safe shape: salt-bucket (src % 64) partial sums in src
    // order, then the ordered merge of bucket subtotals
    val steps = (1 to 10).map { t =>
      s"""p$t AS (SELECT e.dst, ((e.src % 64) + 64) % 64 AS sb,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list(r.rank / deg.deg ORDER BY e.src), x -> x)),
         |      (a, b) -> a + b) AS ps
         |  FROM edges e JOIN r${t - 1} r ON e.src = r.id
         |    JOIN deg ON e.src = deg.src
         |  GROUP BY e.dst, ((e.src % 64) + 64) % 64),
         |c$t AS (SELECT dst AS id,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list(ps ORDER BY sb), x -> x)),
         |      (a, b) -> a + b) AS cs
         |  FROM p$t GROUP BY dst),
         |r$t AS (SELECT nodes.id,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / mm.n +
         |      CAST(0.85 AS DOUBLE) * coalesce(c$t.cs,
         |        CAST(0.0 AS DOUBLE)) AS rank
         |  FROM nodes CROSS JOIN mm
         |  LEFT JOIN c$t ON nodes.id = c$t.id),
         |""".stripMargin
    }.mkString
    val tail =
      """fin AS (SELECT * FROM r10)
        |SELECT id AS doc_id,
        |  CAST(round(rank * 1e9) AS BIGINT) AS pagerank_i9
        |FROM fin""".stripMargin
    head + steps + tail
  }

  /** q_triangles oracle: degree-oriented two-path join mirrored
    * step for step (undirect+dedup, (degree, id)-ordered orientation,
    * ordered wedges at the low endpoint, close on the oriented edge,
    * per-corner counts). Pure integer arithmetic — no float
    * convention needed anywhere. `und`/`deg`/`ed` are MATERIALIZED
    * (multi-referenced). */
  private def trianglesOracleSql: String = triGraphCtes +
    """
      |SELECT nodes.id AS doc_id,
      |  CAST(coalesce(corner.t, 0) AS BIGINT) AS n_triangles
      |FROM nodes LEFT JOIN corner ON nodes.id = corner.n""".stripMargin

  /** q_clustering oracle: cc(v) = 2·T(v)/(d·(d−1)) over the shared
    * triangle CTE chain; 0.0 below degree 2; round 6. */
  private def clusteringOracleSql: String = triGraphCtes +
    """
      |SELECT nodes.id AS doc_id,
      |  CAST(coalesce(dg.d, 0) AS BIGINT) AS degree,
      |  CAST(coalesce(corner.t, 0) AS BIGINT) AS n_triangles,
      |  CASE WHEN coalesce(dg.d, 0) >= 2
      |    THEN round(2.0 * CAST(coalesce(corner.t, 0) AS DOUBLE) /
      |      CAST(dg.d * (dg.d - 1) AS DOUBLE), 6)
      |    ELSE CAST(0.0 AS DOUBLE) END AS clustering
      |FROM nodes LEFT JOIN corner ON nodes.id = corner.n
      |LEFT JOIN deg dg ON nodes.id = dg.n""".stripMargin

  /** Shared triangle-counting CTE chain (degree-oriented forward
    * method) — see [[trianglesOracleSql]]. */
  private def triGraphCtes: String =
    """WITH nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
      |mm AS (SELECT max(id) + 1 AS m FROM nodes),
      |eraw AS (
      |  SELECT id AS src, (id * 7 + 1) % m AS dst
      |  FROM nodes CROSS JOIN mm
      |  UNION ALL
      |  SELECT id AS src, (id * 13 + 3) % m AS dst
      |  FROM nodes CROSS JOIN mm
      |  UNION ALL
      |  SELECT id AS src, (id * 31 + 11) % m AS dst
      |  FROM nodes CROSS JOIN mm),
      |e0 AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
      |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,
      |    greatest(src, dst) AS v FROM e0),
      |deg AS MATERIALIZED (SELECT n, count(*) AS d FROM
      |    (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
      |  GROUP BY n),
      |ed AS MATERIALIZED (SELECT
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |      THEN u ELSE v END AS s,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |      THEN v ELSE u END AS t,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |      THEN dv.d ELSE du.d END AS dt
      |  FROM und JOIN deg du ON und.u = du.n
      |    JOIN deg dv ON und.v = dv.n),
      |w AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c
      |  FROM ed e1 JOIN ed e2 ON e1.s = e2.s
      |  WHERE e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t)),
      |tri AS (SELECT a, b, c FROM w
      |  JOIN ed ON w.b = ed.s AND w.c = ed.t),
      |corner AS (SELECT n, count(*) AS t FROM
      |    (SELECT a AS n FROM tri UNION ALL SELECT b AS n FROM tri
      |     UNION ALL SELECT c AS n FROM tri)
      |  GROUP BY n)""".stripMargin

  /** The shared ER-tier CTE chain: distinct part-name words → the
    * q_soundex fold → (word, code), null codes dropped. Used by both
    * q_er_block and q_er_resolve. */
  private def erSoundexCtes: String =
    """w0 AS (SELECT DISTINCT w AS word
      |  FROM (SELECT unnest(string_split(p_name, ' ')) AS w
      |        FROM part) x
      |  WHERE length(w) > 0),
      |u AS (SELECT word,
      |    upper(regexp_replace(word, '[^A-Za-z]', '', 'g')) AS L
      |  FROM w0),
      |f AS (SELECT word, L,
      |    translate(translate(translate(L, 'HW', ''),
      |      'AEIOUY', '......'),
      |      'BFPVCGJKQSXZDTLMNR', '111122222222334556') AS coded
      |  FROM u),
      |c AS (SELECT word, L,
      |    replace(list_reduce(list_prepend('',
      |        regexp_extract_all(coded, '(?s).')),
      |      (a, ch) -> CASE WHEN ends_with(a, ch) THEN a
      |        ELSE a || ch END), '.', '') AS codes
      |  FROM f),
      |k AS (SELECT word,
      |    CASE WHEN length(L) = 0 THEN NULL
      |      ELSE substr(L, 1, 1) || rpad(
      |        CASE WHEN translate(substr(L, 1, 1),
      |            'AEIOUYHW', '') = ''
      |          THEN substr(codes, 1, 3)
      |          ELSE substr(codes, 2, 3) END, 3, '0')
      |    END AS code
      |  FROM c),
      |kk AS (SELECT word, code FROM k WHERE code IS NOT NULL)""".stripMargin

  /** documents ∪ the one non-BMP probe row — interpolates the SAME
    * constant the engine unions ([[graft.registry.QueriesLlm
    * .uniProbeText]]), so the two sides cannot drift; puts surrogate-
    * pair code points through the live per-code-point hash gate. */
  private def uniDocCte: String =
    "documents2 AS (SELECT doc_id, text, source FROM documents\n" +
      "  UNION ALL SELECT 900000001, '" +
      graft.registry.QueriesLlm.uniProbeText + "', 'srcU')"

  /** q_communities oracle: 3 unrolled min-label rounds over the
    * shared synthetic graph's undirected closure. Pure integer
    * least/min — no float convention. Every round's label relation is
    * referenced TWICE (messages + update), so each l{t} is
    * MATERIALIZED (the house DuckDB rule: inlined multi-referenced
    * CTEs blow up exponentially across unrolled rounds). */
  private def communitiesOracleSql: String = {
    val head =
      """WITH nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
        |mm AS (SELECT max(id) + 1 AS m FROM nodes),
        |eraw AS (
        |  SELECT id AS src, (id * 7 + 1) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 13 + 3) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 31 + 11) % m AS dst
        |  FROM nodes CROSS JOIN mm),
        |e0 AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
        |und AS (SELECT DISTINCT least(src, dst) AS u,
        |    greatest(src, dst) AS v FROM e0),
        |adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v AS src, u AS dst FROM und),
        |l0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes),
        |""".stripMargin
    val steps = (1 to 3).map { t =>
      s"""m$t AS (SELECT adj.dst AS id, min(l.lbl) AS nm
         |  FROM adj JOIN l${t - 1} l ON adj.src = l.id
         |  GROUP BY adj.dst),
         |l$t AS MATERIALIZED (SELECT l.id,
         |    least(l.lbl, coalesce(m$t.nm, l.lbl)) AS lbl
         |  FROM l${t - 1} l LEFT JOIN m$t ON l.id = m$t.id),
         |""".stripMargin
    }.mkString
    val tail =
      """fin AS (SELECT * FROM l3)
        |SELECT id AS doc_id, CAST(lbl AS BIGINT) AS community
        |FROM fin""".stripMargin
    head + steps + tail
  }

  /** q_pagerank_pers oracle: 10 unrolled PERSONALIZED weighted steps
    * mirroring PageRank.scala — teleport mass 1/|S| on the seed set
    * (else 0), contributions rank·w/W(src) with W the dst-ordered
    * weight fold, the same pmod-equivalent two-level bucket folds,
    * base (1−d)·p per node, r0 = p; 1e9-integer-pinned. Shared
    * relations (ew, ws, pp) are MATERIALIZED — they are referenced
    * once per unrolled step and DuckDB would otherwise re-inline
    * them. */
  private def pprOracleSql: String = {
    val head =
      """WITH nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
        |mm AS (SELECT max(id) + 1 AS m FROM nodes),
        |eraw AS (
        |  SELECT id AS src, (id * 7 + 1) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 13 + 3) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 31 + 11) % m AS dst
        |  FROM nodes CROSS JOIN mm),
        |edges AS (SELECT DISTINCT src, dst FROM eraw
        |  WHERE src <> dst),
        |ew AS MATERIALIZED (SELECT src, dst,
        |    CAST((src + dst) % 3 + 1 AS DOUBLE) AS w FROM edges),
        |wsum AS MATERIALIZED (SELECT src,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list(w ORDER BY dst), x -> x)), (a, b) -> a + b) AS ws
        |  FROM ew GROUP BY src),
        |sc AS (SELECT count(*) AS s FROM nodes WHERE id % 17 = 0),
        |pp AS MATERIALIZED (SELECT id, CASE WHEN id % 17 = 0
        |    THEN CAST(1.0 AS DOUBLE) / s
        |    ELSE CAST(0.0 AS DOUBLE) END AS p
        |  FROM nodes CROSS JOIN sc),
        |r0 AS (SELECT id, p AS rank FROM pp),
        |""".stripMargin
    val steps = (1 to 10).map { t =>
      s"""q$t AS (SELECT e.dst, ((e.src % 64) + 64) % 64 AS sb,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list(r.rank * e.w / wsum.ws ORDER BY e.src), x -> x)),
         |      (a, b) -> a + b) AS ps
         |  FROM ew e JOIN r${t - 1} r ON e.src = r.id
         |    JOIN wsum ON e.src = wsum.src
         |  GROUP BY e.dst, ((e.src % 64) + 64) % 64),
         |c$t AS (SELECT dst AS id,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list(ps ORDER BY sb), x -> x)),
         |      (a, b) -> a + b) AS cs
         |  FROM q$t GROUP BY dst),
         |r$t AS (SELECT pp.id,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * pp.p +
         |      CAST(0.85 AS DOUBLE) * coalesce(c$t.cs,
         |        CAST(0.0 AS DOUBLE)) AS rank
         |  FROM pp LEFT JOIN c$t ON pp.id = c$t.id),
         |""".stripMargin
    }.mkString
    val tail =
      """fin AS (SELECT * FROM r10)
        |SELECT id AS doc_id,
        |  CAST(round(rank * 1e9) AS BIGINT) AS ppr_i9
        |FROM fin""".stripMargin
    head + steps + tail
  }

  /** q_hits oracle: 5 unrolled UNNORMALIZED HITS iterations mirroring
    * Hits.scala — per pass the two-level (neighbor % 64)-bucketed
    * ordered fold over the nonzero-score relation, then ONE
    * end-of-chain max normalization over the zero-coalesced full node
    * set; 1e9-integer-pinned. Every CTE is referenced exactly once up
    * to the final normalization (DuckDB inlines CTEs — a
    * multiply-referenced per-pass CTE would blow up the query tree
    * exponentially over 10 passes). */
  private def hitsOracleSql: String = {
    val head =
      """WITH nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
        |mm AS (SELECT max(id) + 1 AS m FROM nodes),
        |eraw AS (
        |  SELECT id AS src, (id * 7 + 1) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 13 + 3) % m AS dst
        |  FROM nodes CROSS JOIN mm
        |  UNION ALL
        |  SELECT id AS src, (id * 31 + 11) % m AS dst
        |  FROM nodes CROSS JOIN mm),
        |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw
        |  WHERE src <> dst),
        |h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS score FROM nodes),
        |""".stripMargin
    // one unnormalized two-level-fold pass: scores keyed `from` fold
    // into `to` groups in from-order (absent node = score 0, exact)
    def pass(out: String, in: String, from: String, to: String) =
      s"""p$out AS (SELECT e.$to AS id,
         |    ((e.$from % 64) + 64) % 64 AS sb,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list(s.score ORDER BY e.$from), x -> x)),
         |      (a, b) -> a + b) AS ps
         |  FROM edges e JOIN $in s ON e.$from = s.id
         |  GROUP BY e.$to, ((e.$from % 64) + 64) % 64),
         |$out AS MATERIALIZED (SELECT id,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list(ps ORDER BY sb), x -> x)),
         |      (a, b) -> a + b) AS score
         |  FROM p$out GROUP BY id),
         |""".stripMargin
    val steps = (1 to 5).map { t =>
      pass(s"a$t", if (t == 1) "h0" else s"h${t - 1}", "src", "dst") +
        pass(s"h$t", s"a$t", "dst", "src")
    }.mkString
    val tail =
      """fa AS MATERIALIZED (SELECT n.id, coalesce(a5.score, CAST(0.0 AS DOUBLE))
        |    AS raw FROM nodes n LEFT JOIN a5 ON n.id = a5.id),
        |fh AS MATERIALIZED (SELECT n.id, coalesce(h5.score, CAST(0.0 AS DOUBLE))
        |    AS raw FROM nodes n LEFT JOIN h5 ON n.id = h5.id),
        |na AS (SELECT id, CASE WHEN mx > CAST(0.0 AS DOUBLE)
        |    THEN raw / mx ELSE CAST(0.0 AS DOUBLE) END AS authority
        |  FROM fa CROSS JOIN (SELECT max(raw) AS mx FROM fa) m),
        |nh AS (SELECT id, CASE WHEN mx > CAST(0.0 AS DOUBLE)
        |    THEN raw / mx ELSE CAST(0.0 AS DOUBLE) END AS hub
        |  FROM fh CROSS JOIN (SELECT max(raw) AS mx FROM fh) m)
        |SELECT na.id AS doc_id,
        |  CAST(round(authority * 1e9) AS BIGINT) AS authority_i9,
        |  CAST(round(hub * 1e9) AS BIGINT) AS hub_i9
        |FROM na JOIN nh ON na.id = nh.id""".stripMargin
    head + steps + tail
  }

  /** q_zorder oracle: the 16-bit Morton interleave written out as the
    * 32 shift/mask terms OR-ed together — bit-identical to the Spark
    * fold by construction. */
  private def zorderOracleSql: String = {
    val terms = (0 until 16).flatMap(b => Seq(
      s"(((x >> $b) & 1) << ${2 * b})",
      s"(((y >> $b) & 1) << ${2 * b + 1})"))
    s"""WITH e AS (SELECT event_id,
       |    least(greatest(CAST(round(value * 100) AS BIGINT), 0),
       |      65535) AS x,
       |    user_id % 65536 AS y
       |  FROM events)
       |SELECT event_id,
       |  ${terms.mkString(" |\n  ")} AS zval
       |FROM e""".stripMargin
  }

  /** q_rm3 oracle: two full BM25 passes (the q_bm25 formula verbatim,
    * rounded-rank convention) around the feedback stage — top-3 docs'
    * term weights as a doc-ordered Σ tf/dl fold, top-5 non-query terms
    * by (weight DESC, term ASC), expanded term set = qt ∪ exp. */
  private def rm3OracleSql: String =
    """WITH words AS (SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM words
      |  GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM dl),
      |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |   FROM documents WHERE doc_id < 5) x),
      |contribs1 AS (SELECT query_id, tf.doc_id, qt.term,
      |    ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) /
      |              (CAST(df AS DOUBLE) + 0.5)) *
      |    (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
      |     (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(dl AS DOUBLE) / avgdl))) AS contrib
      |  FROM qt JOIN tf ON qt.term = tf.term
      |    JOIN dl ON tf.doc_id = dl.doc_id
      |    JOIN dfreq ON qt.term = dfreq.term CROSS JOIN stats),
      |scored1 AS (SELECT query_id, doc_id,
      |    round(list_reduce(list_prepend(0.0,
      |        list_transform(list(contrib ORDER BY term), x -> x)),
      |      (a, b) -> a + b), 6) AS bm25
      |  FROM contribs1 GROUP BY query_id, doc_id),
      |top1 AS (SELECT query_id, doc_id FROM (SELECT query_id, doc_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY bm25 DESC, doc_id ASC) AS rk
      |  FROM scored1) x WHERE rk <= 3),
      |fbw AS (SELECT t1.query_id, tf.term,
      |    list_reduce(list_prepend(0.0, list_transform(
      |      list(CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE)
      |        ORDER BY tf.doc_id), x -> x)), (a, b) -> a + b) AS w
      |  FROM top1 t1 JOIN tf ON t1.doc_id = tf.doc_id
      |    JOIN dl ON tf.doc_id = dl.doc_id
      |  GROUP BY t1.query_id, tf.term),
      |expn AS (SELECT query_id, term FROM (
      |    SELECT f.query_id, f.term, row_number() OVER (
      |      PARTITION BY f.query_id
      |      ORDER BY f.w DESC, f.term ASC) AS rk
      |    FROM fbw f WHERE NOT EXISTS (SELECT 1 FROM qt
      |      WHERE qt.query_id = f.query_id AND qt.term = f.term)
      |  ) x WHERE rk <= 5),
      |q2 AS (SELECT query_id, term FROM qt
      |  UNION SELECT query_id, term FROM expn),
      |contribs2 AS (SELECT query_id, tf.doc_id, q2.term,
      |    ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) /
      |              (CAST(df AS DOUBLE) + 0.5)) *
      |    (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
      |     (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(dl AS DOUBLE) / avgdl))) AS contrib
      |  FROM q2 JOIN tf ON q2.term = tf.term
      |    JOIN dl ON tf.doc_id = dl.doc_id
      |    JOIN dfreq ON q2.term = dfreq.term CROSS JOIN stats),
      |scored2 AS (SELECT query_id, doc_id,
      |    round(list_reduce(list_prepend(0.0,
      |        list_transform(list(contrib ORDER BY term), x -> x)),
      |      (a, b) -> a + b), 6) AS bm25
      |  FROM contribs2 GROUP BY query_id, doc_id)
      |SELECT query_id, doc_id, bm25,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
      |FROM scored2 QUALIFY rank <= 5""".stripMargin

  // lazy: the map literal references the long SQL bodies declared
  // BELOW it (kept at the bottom for readability); a strict val would
  // capture them uninitialized (null) — lazy evaluates on first
  // access, after object construction completes
  lazy val map: Map[String, String] = Map(
    "q_m4" ->
      """WITH base AS (SELECT CAST(user_id AS BIGINT) AS u,
        |    epoch_us(ts) AS us, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |rng AS (SELECT u, min(us) AS lo, max(us) AS hi FROM base
        |  GROUP BY 1),
        |b AS (SELECT base.u,
        |    ((us - lo) * 48) // (hi - lo + 1) AS bucket, us, v
        |  FROM base JOIN rng ON base.u = rng.u)
        |SELECT u AS user_id, bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  arg_min(v, us) AS v_first, arg_max(v, us) AS v_last,
        |  min(v) AS v_min, max(v) AS v_max
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q_target_enc" ->
      """WITH rows_ AS (SELECT event_id, event_type AS c, value AS v,
        |    event_id % 5 AS fold FROM events),
        |cf AS (SELECT c, fold, coalesce(sum(v), 0.0) AS scf,
        |    count(v) AS ncf
        |  FROM rows_ GROUP BY 1, 2),
        |cc AS (SELECT c, sum(scf) AS sc,
        |    CAST(sum(ncf) AS BIGINT) AS nc FROM cf GROUP BY 1),
        |ff AS (SELECT fold, sum(scf) AS sf,
        |    CAST(sum(ncf) AS BIGINT) AS nf FROM cf GROUP BY 1),
        |gg AS (SELECT sum(scf) AS s,
        |    CAST(sum(ncf) AS BIGINT) AS n FROM cf),
        |st AS (SELECT cf.c, cf.fold,
        |    (sc - scf + 10.0 * ((s - sf) /
        |      CAST(n - nf AS DOUBLE))) /
        |    (CAST(nc - ncf AS DOUBLE) + 10.0) AS enc
        |  FROM cf JOIN cc ON cf.c IS NOT DISTINCT FROM cc.c
        |  JOIN ff USING (fold)
        |  CROSS JOIN gg)
        |SELECT r.event_id, r.c AS event_type,
        |  CAST(r.fold AS BIGINT) AS fold,
        |  round(st.enc, 6) AS target_enc
        |FROM rows_ r JOIN st ON r.c IS NOT DISTINCT FROM st.c
        |  AND r.fold = st.fold""".stripMargin,
    "q_paths" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER w AS e1,
        |    lead(event_type, 2) OVER w AS e2
        |  FROM events WHERE event_type IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |p AS (SELECT event_type || '>' || e1 || '>' || e2 AS path
        |  FROM o WHERE e2 IS NOT NULL),
        |c AS (SELECT path, count(*) AS n_occurrences FROM p
        |  GROUP BY path)
        |SELECT path, n_occurrences,
        |  CAST(row_number() OVER (ORDER BY n_occurrences DESC,
        |    path ASC) AS BIGINT) AS rank
        |FROM c QUALIFY rank <= 20""".stripMargin,
    "q_dbscan" ->
      """WITH RECURSIVE pts AS (SELECT CAST(user_id AS BIGINT) AS u,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
        |      AS BIGINT) AS i,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |pd AS (SELECT u, i, u * 4294967296 + i AS nid, c,
        |    c - coalesce(lag(c) OVER (PARTITION BY u ORDER BY i), c)
        |      AS d
        |  FROM pts),
        |nbp AS (SELECT a.nid AS na, b.nid AS nx
        |  FROM pd a JOIN pd b ON a.u = b.u AND a.nid <> b.nid
        |  WHERE (a.c - b.c) * (a.c - b.c) +
        |        (a.d - b.d) * (a.d - b.d) <= 1000000),
        |deg AS (SELECT na, count(*) AS n FROM nbp GROUP BY na),
        |core AS (SELECT na FROM deg WHERE n + 1 >= 4),
        |ce AS (SELECT nbp.na AS src, nbp.nx AS dst FROM nbp
        |  JOIN core ca ON nbp.na = ca.na
        |  JOIN core cb ON nbp.nx = cb.na),
        |reach(root, node) AS (
        |  SELECT na, na FROM core
        |  UNION
        |  SELECT r.root, e.dst FROM reach r
        |    JOIN ce e ON e.src = r.node),
        |comp AS (SELECT node AS na, min(root) AS cl FROM reach
        |  GROUP BY node),
        |bord AS (SELECT nbp.na, min(comp.cl) AS cl
        |  FROM nbp JOIN comp ON nbp.nx = comp.na
        |  WHERE nbp.na NOT IN (SELECT na FROM core)
        |  GROUP BY nbp.na),
        |lab AS (SELECT na, cl, 'core' AS role FROM comp
        |  UNION ALL SELECT na, cl, 'border' AS role FROM bord)
        |SELECT pd.u AS user_id, pd.i AS ord,
        |  coalesce(lab.role, 'noise') AS role,
        |  CAST(coalesce(lab.cl, -1) AS BIGINT) AS cluster
        |FROM pd LEFT JOIN lab ON pd.nid = lab.na""".stripMargin,
    "q_asof" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, max(value) AS value FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts,
        |  coalesce(r.ts, TIMESTAMP '1970-01-01 00:00:00') AS asof_ts,
        |  coalesce(r.value, -1.0) AS asof_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    // ranking tier: rank/dense_rank share the TIED window (equal
    // counts share a rank — deterministic by definition), ntile/lead
    // the total-ordered one; user filter matches the engine (Spark
    // sorts nulls first, DuckDB last)
    "q_rank_users" ->
      """WITH c AS (SELECT user_id, count(*) AS n_events,
        |    round(sum(value), 9) AS sum_value
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_events, sum_value,
        |  CAST(rank() OVER tied AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER tied AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER total AS BIGINT) AS quartile,
        |  lead(user_id, 1) OVER total AS next_user
        |FROM c
        |WINDOW tied AS (ORDER BY n_events DESC),
        |  total AS (ORDER BY n_events DESC, user_id ASC)""".stripMargin,

    // two-level rank (core/Rank): the oracle is the PLAIN global
    // window — identical rows including tie groups IS the operator's
    // equivalence claim
    "q_rank_users_2l" ->
      """WITH c AS (SELECT user_id, count(*) AS n_events,
        |    round(sum(value), 9) AS sum_value
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_events, sum_value,
        |  CAST(rank() OVER tied AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER tied AS BIGINT) AS drnk
        |FROM c
        |WINDOW tied AS (ORDER BY n_events DESC)""".stripMargin,

    // ranking-family completeness: percent_rank/cume_dist on the TIED
    // window (exact rational functions of rank/peer counts);
    // first_value/nth_value on the total order, nth_value under the
    // shared default frame (null until row 3 enters)
    "q_rank_full" ->
      """WITH c AS (SELECT user_id, count(*) AS n_events
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_events,
        |  round(percent_rank() OVER tied, 9) AS prnk,
        |  round(cume_dist() OVER tied, 9) AS cdist,
        |  first_value(user_id) OVER total AS top_user,
        |  nth_value(user_id, 3) OVER total AS third_user
        |FROM c
        |WINDOW tied AS (ORDER BY n_events DESC),
        |  total AS (ORDER BY n_events DESC, user_id ASC)""".stripMargin,

    // time-RANGE frame on exact integer microseconds — the same
    // numeric bounds as the engine's rangeBetween, (ts-24h, ts]
    "q_rolling_time" ->
      """SELECT user_id, ts,
        |  count(*) OVER w AS n_24h,
        |  round(avg(value) OVER w, 9) AS avg_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)""".stripMargin,

    // grid ffill resample: DuckDB's ASOF join (max e.ts <= grid_ts,
    // inclusive) is the exact mirror of the engine's ordered-window
    // forward fill; user_id IS NOT NULL on BOTH events reads (the
    // engine filters null keys — NullKeyAudit class drops/keeps)
    "q_resample" ->
      """WITH e AS (SELECT user_id, ts, value FROM events
        |  WHERE user_id IS NOT NULL),
        |r AS (SELECT user_id, date_trunc('hour', min(ts)) AS mn,
        |    date_trunc('hour', max(ts)) AS mx
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |g AS (SELECT user_id,
        |    unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
        |      AS grid_ts
        |  FROM r)
        |SELECT g.user_id, g.grid_ts, e.value AS value_ff
        |FROM g ASOF LEFT JOIN e
        |  ON g.user_id = e.user_id AND g.grid_ts >= e.ts""".stripMargin,

    // interval join: plain equi+range inner join — epoch_us keeps the
    // gap exact-integer (the verify house rule: never epoch())
    "q_ijoin" ->
      """WITH v AS (SELECT user_id, event_id AS view_id,
        |    ts AS view_ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, view_id, click_id, view_ts, click_ts,
        |  CAST(epoch_us(click_ts) - epoch_us(view_ts) AS BIGINT)
        |    AS gap_us
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND click_ts > view_ts
        |  AND click_ts <= view_ts + INTERVAL 6 HOUR""".stripMargin,

    // LEFT OUTER interval join: un-clicked views survive once with
    // null click fields; null-user views pass through unmatched
    "q_ijoin_left" ->
      """WITH v AS (SELECT user_id, event_id AS view_id,
        |    ts AS view_ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, view_id, click_id, view_ts, click_ts,
        |  CAST(epoch_us(click_ts) - epoch_us(view_ts) AS BIGINT)
        |    AS gap_us
        |FROM v LEFT OUTER JOIN c ON v.user_id = c.user_id
        |  AND click_ts > view_ts
        |  AND click_ts <= view_ts + INTERVAL 6 HOUR""".stripMargin,
    "q_novelty" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |      w[i+3] || ' ' || w[i+4] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
        |        FROM words) wi),
        |freq AS (SELECT shingle, count(*) AS df FROM sh
        |  GROUP BY shingle)
        |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN freq.df >= 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shared,
        |  round(1.0 - CAST(sum(CASE WHEN freq.df >= 2 THEN 1
        |      ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        |FROM sh JOIN freq USING (shingle)
        |GROUP BY sh.doc_id""".stripMargin,
    "q_hardneg" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |    embedding::DOUBLE[] AS qv, label AS anchor_label
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv,
        |    label AS neg_label FROM embeddings),
        |p AS (SELECT query_id, corpus_id, anchor_label, neg_label,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(list_zip(qv, cv), x -> x[1]*x[2])),
        |      (a, b) -> a + b) /
        |    (sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(list_zip(qv, qv), x -> x[1]*x[2])),
        |      (a, b) -> a + b)) *
        |     sqrt(list_reduce(list_prepend(0.0,
        |      list_transform(list_zip(cv, cv), x -> x[1]*x[2])),
        |      (a, b) -> a + b)) + 1e-12) AS raw_cos
        |  FROM q CROSS JOIN c
        |  WHERE query_id <> corpus_id AND anchor_label <> neg_label)
        |SELECT query_id, corpus_id, anchor_label, neg_label,
        |  round(raw_cos, 6) AS cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY raw_cos DESC, corpus_id ASC) AS BIGINT) AS rank
        |FROM p QUALIFY rank <= 4""".stripMargin,
    "q_rm3" -> rm3OracleSql,
    "q_tukey" ->
      """WITH pts AS (SELECT CAST(user_id AS VARCHAR) AS u,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT u, c,
        |    row_number() OVER (PARTITION BY u ORDER BY c) AS rn,
        |    count(*) OVER (PARTITION BY u) AS n
        |  FROM pts),
        |s AS (SELECT u, max(n) AS n,
        |    max(CASE WHEN rn = (n + 3) // 4 THEN c END) AS q1_c,
        |    max(CASE WHEN rn = (3 * n + 3) // 4 THEN c END) AS q3_c
        |  FROM r GROUP BY u)
        |SELECT CAST(p.u AS BIGINT) AS user_id,
        |  CAST(max(s.n) AS BIGINT) AS n,
        |  max(q1_c) AS q1_c, max(q3_c) AS q3_c,
        |  CAST(sum(CASE
        |    WHEN 4 * p.c < 4 * q1_c - 6 * (q3_c - q1_c) THEN 1
        |    WHEN 4 * p.c > 4 * q3_c + 6 * (q3_c - q1_c) THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_out
        |FROM pts p JOIN s ON p.u = s.u
        |GROUP BY p.u""".stripMargin,
    "q_zorder" -> zorderOracleSql,
    "q_entropy" ->
      """WITH d AS (SELECT doc_id, string_split(text, '') AS chars
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |c AS (SELECT doc_id, CAST(len(chars) AS DOUBLE) AS n,
        |    list_transform(list_sort(list_distinct(chars)),
        |      x -> CAST(len(list_filter(chars, ch -> ch = x))
        |        AS DOUBLE)) AS cnts
        |  FROM d)
        |SELECT doc_id,
        |  round(ln(n) - list_reduce(list_prepend(0.0,
        |    list_transform(cnts, cc -> cc * ln(cc))),
        |    (a, b) -> a + b) / n, 6) AS entropy_nats
        |FROM c""".stripMargin,
    // Integer-micros pin mirrors the engine: the per-row deviation is
    // rounded to 1e-6 and summed as BIGINT (exact, order-independent);
    // DuckDB's sum(BIGINT) widens to HUGEINT, so CAST back to DOUBLE
    // before the final 2dp round. `+ 0.0` normalizes IEEE signed zero
    // (DuckDB round can return -0.0; Spark's BigDecimal round cannot).
    "q_salted" ->
      """WITH d AS (SELECT event_type,
        |    round(avg(value), 6) AS type_avg
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(round((e.value - d.type_avg) * 1e6)
        |      AS BIGINT)) AS DOUBLE) / 1e6, 2) + 0.0 AS dev_sum
        |FROM events e JOIN d USING (event_type)
        |GROUP BY e.event_type""".stripMargin,
    "q_pagerank" -> pageRankOracleSql,
    "q_triangles" -> trianglesOracleSql,
    "q_clustering" -> clusteringOracleSql,
    "q_pagerank_pers" -> pprOracleSql,
    "q_communities" -> communitiesOracleSql,
    "q_hits" -> hitsOracleSql,
    "q_mmr" -> mmrOracleSql,
    "q_split" ->
      """WITH b AS (SELECT user_id, ts, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n FROM events
        |  WHERE user_id IS NOT NULL)
        |SELECT user_id, ts, value,
        |  CASE WHEN rn <= floor(n*0.5) THEN 'Train'
        |       WHEN rn <= floor(n*0.75) THEN 'Validation'
        |       ELSE 'Test' END AS split
        |FROM b""".stripMargin,

    "q_rownum" ->
      """SELECT user_id, ts,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |FROM events""".stripMargin,

    "q_rolling" ->
      """WITH b AS (SELECT user_id, ts, value,
        |    count(value) OVER w AS cnt, avg(value) OVER w AS mu,
        |    stddev_samp(value) OVER w AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |               ROWS BETWEEN 47 PRECEDING AND CURRENT ROW)),
        |c AS (SELECT user_id, ts,
        |    CASE WHEN cnt >= 5 THEN mu END AS mu0,
        |    CASE WHEN cnt >= 5 THEN sd END AS sd0 FROM b)
        |SELECT user_id, ts,
        |  round(first_value(mu0 IGNORE NULLS) OVER wb, 9) AS roll_mean,
        |  round(first_value(sd0 IGNORE NULLS) OVER wb + 1e-6, 6) AS roll_std
        |FROM c
        |WINDOW wb AS (PARTITION BY user_id ORDER BY ts
        |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q_backfill" ->
      """WITH b AS (SELECT user_id, ts,
        |  CASE WHEN event_type <> 'error' THEN value END AS c FROM events)
        |SELECT user_id, ts,
        |  first_value(c IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS value_bf
        |FROM b""".stripMargin,

    "q_lags" ->
      """SELECT user_id, ts, value,
        |  lag(value, 1) OVER w AS value_lag1,
        |  lag(value, 2) OVER w AS value_lag2,
        |  lag(value, 3) OVER w AS value_lag3
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)""".stripMargin,

    "q_mad" ->
      """WITH med AS (SELECT user_id, median(value) AS m FROM events
        |             GROUP BY user_id)
        |SELECT e.user_id,
        |  round(1.4826*median(abs(e.value - med.m)), 6) AS mad_sigma
        |FROM events e JOIN med USING (user_id) GROUP BY e.user_id""".stripMargin,

    "q_zscore" ->
      """WITH st AS (SELECT user_id, avg(value) AS mu,
        |  stddev_samp(value) AS sd FROM events GROUP BY user_id)
        |SELECT e.user_id, e.ts,
        |  round(abs(e.value - st.mu)/(st.sd + 1e-9), 6) AS z
        |FROM events e JOIN st USING (user_id)""".stripMargin,

    "q_flags" ->
      """WITH st AS (SELECT user_id, avg(value) AS mu,
        |  stddev_samp(value) AS sd FROM events GROUP BY user_id)
        |SELECT e.user_id, e.ts,
        |  CASE WHEN abs(e.value - st.mu)/(st.sd + 1e-9) > 2.5
        |       THEN 1 ELSE 0 END AS flag
        |FROM events e JOIN st USING (user_id)""".stripMargin,

    "q_eventize" ->
      """WITH b AS (SELECT user_id, ts,
        |    CASE WHEN value > 150 THEN 1 ELSE 0 END AS flag,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |f AS (SELECT * FROM b WHERE flag = 1),
        |r0 AS (SELECT user_id, ts, rn,
        |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
        |  FROM f),
        |runs AS (SELECT user_id, isl, min(rn) AS srn, max(rn) AS ern,
        |    min(ts) AS sts, max(ts) AS ets FROM r0 GROUP BY user_id, isl),
        |br AS (SELECT *, CASE WHEN srn - lag(ern) OVER
        |    (PARTITION BY user_id ORDER BY srn) <= 4 THEN 0 ELSE 1 END AS ng
        |  FROM runs),
        |g AS (SELECT *, sum(ng) OVER (PARTITION BY user_id ORDER BY srn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM br),
        |e2 AS (SELECT user_id, grp, min(srn) AS start_rn, max(ern) AS end_rn,
        |    min(sts) AS start_ts, max(ets) AS end_ts FROM g
        |  GROUP BY user_id, grp)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY start_rn)
        |    AS event_id,
        |  start_rn, end_rn, start_ts, end_ts,
        |  end_rn - start_rn + 1 AS n_points
        |FROM e2""".stripMargin,

    "q_persist" ->
      """WITH b AS (SELECT user_id, ts,
        |    CASE WHEN value > 150 THEN 1 ELSE 0 END AS flag,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |i AS (SELECT *, rn - row_number() OVER
        |    (PARTITION BY user_id, flag ORDER BY rn) AS isl FROM b),
        |c AS (SELECT *, count(*) OVER
        |    (PARTITION BY user_id, flag, isl) AS rl FROM i)
        |SELECT user_id, ts, flag,
        |  CASE WHEN flag = 1 AND rl >= 2 THEN 1 ELSE 0 END AS flag_p
        |FROM c""".stripMargin,

    "q_pointwise" ->
      """WITH b AS (SELECT user_id,
        |    CASE WHEN value > 150 THEN 1 ELSE 0 END AS p,
        |    CASE WHEN event_type = 'error' AND value > 100
        |         THEN 1 ELSE 0 END AS t
        |  FROM events),
        |a AS (SELECT user_id,
        |    CAST(sum(CASE WHEN t=1 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN t=0 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN t=1 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM b GROUP BY user_id)
        |SELECT user_id, tp, fp, fn,
        |  round(tp/(tp+fp+1e-9), 6) AS precision,
        |  round(tp/(tp+fn+1e-9), 6) AS recall,
        |  round(2*(tp/(tp+fp+1e-9))*(tp/(tp+fn+1e-9)) /
        |        ((tp/(tp+fp+1e-9)) + (tp/(tp+fn+1e-9)) + 1e-9), 6) AS f1
        |FROM a""".stripMargin,

    "q_event_metrics" -> eventMetricsSql,
    "q_leaderboard" -> leaderboardSql,
    "q_latency" -> latencySql,
    "q_business" -> businessSql,
    "q_sweep" -> sweepSql,
    "q_sweep_curve" -> sweepCurveSql,
    "q_label_windows" -> labelWindowsSql,

    "q_stl_lite" ->
      """WITH b AS (SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
        |    avg(value) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
        |  FROM events),
        |d AS (SELECT *, (rn-1) % 24 AS phase, value - trend AS detr FROM b),
        |sr AS (SELECT user_id, phase, avg(detr) AS sraw FROM d
        |  GROUP BY user_id, phase),
        |sc AS (SELECT user_id, phase,
        |    sraw - avg(sraw) OVER (PARTITION BY user_id) AS seasonal FROM sr)
        |SELECT d.user_id, d.ts, round(d.trend, 9) + 0.0 AS trend,
        |  round(sc.seasonal, 9) + 0.0 AS seasonal,
        |  round(d.value - d.trend - sc.seasonal, 9) + 0.0 AS resid
        |FROM d JOIN sc ON d.user_id = sc.user_id AND d.phase = sc.phase""".stripMargin,

    "q_acf" -> acfSql,

    "q_qq" -> qqSql,

    "q_hist" ->
      """WITH r AS (SELECT user_id,
        |    value - median(value) OVER (PARTITION BY user_id) AS resid
        |  FROM events),
        |s AS (SELECT user_id, min(resid) AS mn, max(resid) AS mx,
        |    count(*) AS n FROM r GROUP BY user_id),
        |p AS (SELECT user_id, n,
        |    CASE WHEN mx = mn THEN mn - 0.5 ELSE mn END AS lo,
        |    CASE WHEN mx = mn THEN 1.0/50 ELSE (mx - mn)/50 END AS w
        |  FROM s),
        |c AS (SELECT r.user_id,
        |    LEAST(CAST(FLOOR((r.resid - p.lo)/p.w) AS BIGINT), 49) AS bin,
        |    count(*) AS cnt
        |  FROM r JOIN p USING (user_id) GROUP BY 1, 2),
        |g AS (SELECT p.user_id, p.lo, p.w, p.n, t.i AS bin
        |  FROM p CROSS JOIN range(50) AS t(i))
        |SELECT g.user_id, g.bin,
        |  round(g.lo + g.bin * g.w, 6) AS bin_lo,
        |  round(g.lo + (g.bin + 1) * g.w, 6) AS bin_hi,
        |  COALESCE(c.cnt, 0) AS count,
        |  round(COALESCE(c.cnt, 0) / (g.n * g.w), 6) AS density
        |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.bin = c.bin
        |""".stripMargin,

    "q_pr_curve" ->
      """WITH l AS (SELECT user_id, value,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS label
        |  FROM events),
        |r AS (SELECT user_id, value, label,
        |    sum(label) OVER (PARTITION BY user_id ORDER BY value DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
        |    count(*) OVER (PARTITION BY user_id ORDER BY value DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rnk,
        |    sum(label) OVER (PARTITION BY user_id) AS pos,
        |    lead(value, 1) OVER (PARTITION BY user_id ORDER BY value DESC)
        |      AS nxt
        |  FROM l)
        |SELECT user_id, round(value, 9) AS threshold,
        |  round(CAST(cum_tp AS DOUBLE)/rnk, 6) AS precision,
        |  round(CAST(cum_tp AS DOUBLE)/greatest(pos, 1), 6) AS recall,
        |  CAST(rnk AS BIGINT) AS n_flagged
        |FROM r WHERE nxt IS NULL OR nxt < value""".stripMargin,

    "q_kurtosis" ->
      """WITH m AS (SELECT user_id, avg(value) AS mu FROM events
        |  GROUP BY user_id),
        |c AS (SELECT e.user_id, e.value - m.mu AS d FROM events e
        |  JOIN m ON e.user_id IS NOT DISTINCT FROM m.user_id)
        |SELECT user_id,
        |  round(avg(d*d*d*d)/(avg(d*d)*avg(d*d)) - 3, 6) AS kurt
        |FROM c GROUP BY user_id""".stripMargin,

    "q_global_stats" ->
      """SELECT user_id, count(*) AS n,
        |  round(sum(value), 9) AS sum_value,
        |  round(avg(value), 9) AS avg_value,
        |  round(stddev_samp(value), 6) AS std_samp,
        |  round(stddev_pop(value), 6) AS std_pop,
        |  round(median(value), 6) AS med
        |FROM events GROUP BY user_id""".stripMargin,

    "q_lastn" ->
      """SELECT user_id, ts, value FROM (
        |  SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC)
        |      AS rnd
        |  FROM events) t WHERE rnd <= 10""".stripMargin,

    "q_json" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 9)
        |    AS avg_k
        |FROM events GROUP BY user_id""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 9) AS avg_qty,
        |  round(avg(l_discount), 9) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_part_revenue" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice*(1-l_discount) ELSE 0 END), 2)
        |    AS promo_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q_join_agg" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
        |  count(*) AS n_lines,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q_session" ->
      """WITH f AS (SELECT user_id, ts FROM events WHERE value > 150),
        |i AS (SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         < INTERVAL 1 HOUR THEN 0 ELSE 1 END AS ng
        |  FROM f),
        |g AS (SELECT user_id, ts, sum(ng) OVER (PARTITION BY user_id
        |    ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS grp FROM i)
        |SELECT user_id, min(ts) AS start_ts, max(ts) AS end_ts,
        |  count(*) AS n_points
        |FROM g GROUP BY user_id, grp""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_dedup_exact" ->
      """SELECT lang, n_chars, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY lang, n_chars""".stripMargin,

    "q_fingerprint" ->
      (s"WITH $uniDocCte\n" +
        "SELECT doc_id, md5(text) AS fp FROM documents2"),

    "q_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 1000000 <
        |  CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000
        |            WHEN 'es' THEN 500000 WHEN 'fr' THEN 250000
        |            WHEN 'zh' THEN 125000 ELSE 0 END""".stripMargin,

    "q_sample_up" ->
      """WITH t AS (SELECT doc_id, lang, source,
        |    CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 2500000
        |              WHEN 'zh' THEN 500000 ELSE 0 END AS ratem,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 1000000
        |      AS b
        |  FROM documents),
        |c AS (SELECT doc_id, lang, source,
        |    ratem // 1000000 +
        |      CASE WHEN b < ratem % 1000000 THEN 1 ELSE 0 END AS copies
        |  FROM t)
        |SELECT doc_id, lang, source, CAST(unnest(range(copies)) AS BIGINT)
        |  AS epoch
        |FROM c WHERE copies > 0""".stripMargin,

    "q_pack" ->
      """WITH t AS (SELECT doc_id,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 8 AS shard,
        |    len(string_split(text, ' ')) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, shard,
        |    sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks
        |      AS strt
        |  FROM t)
        |SELECT doc_id, shard, CAST(strt // 256 AS BIGINT) AS seq_id,
        |  CAST(strt % 256 AS BIGINT) AS seq_offset FROM c""".stripMargin,

    "q_pack_slices" ->
      """WITH t AS (SELECT doc_id,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 8 AS shard,
        |    len(string_split(text, ' ')) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, shard, toks,
        |    CAST(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks
        |      AS BIGINT) AS strt
        |  FROM t WHERE toks > 0),
        |s AS (SELECT doc_id, shard, toks, strt,
        |    CAST(unnest(range(strt // 256, (strt + toks - 1) // 256 + 1))
        |      AS BIGINT) AS seq_id
        |  FROM c)
        |SELECT doc_id, shard, seq_id,
        |  greatest(0, seq_id * 256 - strt) AS slice_start,
        |  least(strt + toks, (seq_id + 1) * 256)
        |    - greatest(strt, seq_id * 256) AS slice_len
        |FROM s""".stripMargin,

    "q_substr_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    md5(array_to_string(w[i+1 : i+8], ' ')) AS gk
        |  FROM (SELECT doc_id, w, unnest(range(0, len(w) - 7)) AS i
        |        FROM w WHERE len(w) >= 8) x),
        |c AS (SELECT doc_id, pos, gk,
        |    count(*) OVER (PARTITION BY gk) AS occ FROM g),
        |f AS (SELECT doc_id, pos, gk FROM c WHERE occ <= 50),
        |h AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.pos AS pa, b.pos AS pb
        |  FROM f a JOIN f b ON a.gk = b.gk AND a.doc_id < b.doc_id),
        |r AS (SELECT id_a, id_b, pa - pb AS d, pa,
        |    pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb
        |      ORDER BY pa) AS isl
        |  FROM h),
        |runs AS (SELECT id_a, id_b, count(*) AS run
        |  FROM r GROUP BY id_a, id_b, d, isl)
        |SELECT id_a, id_b,
        |  CAST(sum(run) AS BIGINT) AS n_anchor_hits,
        |  CAST(max(run) + 7 AS BIGINT) AS match_len
        |FROM runs GROUP BY id_a, id_b""".stripMargin,

    "q_decontam" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM words) wi),
        |bsh AS (SELECT shingle FROM sh WHERE doc_id % 20 = 0
        |  GROUP BY shingle HAVING count(*) <= 100)
        |SELECT t.doc_id, count(*) AS n_shared
        |FROM sh t JOIN bsh USING (shingle)
        |WHERE t.doc_id % 20 <> 0
        |GROUP BY t.doc_id HAVING count(*) >= 2""".stripMargin,

    // identical result to q_decontam by construction (the bloom is a
    // prefilter; the exact join removes its false positives)
    "q_decontam_bloom" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM words) wi),
        |bsh AS (SELECT shingle FROM sh WHERE doc_id % 20 = 0
        |  GROUP BY shingle HAVING count(*) <= 100)
        |SELECT t.doc_id, count(*) AS n_shared
        |FROM sh t JOIN bsh USING (shingle)
        |WHERE t.doc_id % 20 <> 0
        |GROUP BY t.doc_id HAVING count(*) >= 2""".stripMargin,

    "q_span_dedup" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sp AS (SELECT doc_id, CAST((len(w) + 15) // 16 AS BIGINT)
        |      AS n_spans,
        |    CAST(i AS BIGINT) AS span_idx,
        |    array_to_string(w[i*16+1 : i*16+16], ' ') AS span_text
        |  FROM (SELECT doc_id, w, unnest(range(0, (len(w) + 15) // 16))
        |        AS i FROM words) wi),
        |k AS (SELECT doc_id, n_spans, span_idx, span_text,
        |    row_number() OVER (PARTITION BY md5(span_text)
        |      ORDER BY doc_id, span_idx) AS rn
        |  FROM sp)
        |SELECT doc_id,
        |  string_agg(span_text, ' ' ORDER BY span_idx) AS clean_text,
        |  n_spans, count(*) AS n_kept
        |FROM k WHERE rn = 1 GROUP BY doc_id, n_spans""".stripMargin,

    "q_repetition" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, 'w1' AS tag, unnest(w) AS gram FROM words
        |  UNION ALL
        |  SELECT doc_id, 'g2', w[i] || ' ' || w[i+1]
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |        FROM words) b
        |  UNION ALL
        |  SELECT doc_id, 'g5', w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |    || ' ' || w[i+3] || ' ' || w[i+4]
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
        |        FROM words) f),
        |c AS (SELECT doc_id, tag, gram, count(*) AS cnt
        |  FROM g GROUP BY doc_id, tag, gram),
        |a AS (SELECT doc_id,
        |    sum(CASE WHEN tag = 'w1' THEN cnt END) AS nw,
        |    count(CASE WHEN tag = 'w1' THEN 1 END) AS uw,
        |    max(CASE WHEN tag = 'g2' THEN cnt END) AS m2,
        |    sum(CASE WHEN tag = 'g5' AND cnt >= 2 THEN cnt END) AS d5
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_tokens,
        |  round(CAST(uw AS DOUBLE)/nw, 6) AS uniq_word_frac,
        |  round(CAST(coalesce(m2*2, 0) AS DOUBLE)/nw, 6)
        |    AS top2gram_frac,
        |  round(CAST(coalesce(d5*5, 0) AS DOUBLE)/nw, 6)
        |    AS dup5gram_frac
        |FROM a""".stripMargin,

    "q_mixture" ->
      """WITH d AS (SELECT lang, source,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS t
        |  FROM documents),
        |a AS (SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(t) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY lang, source)
        |SELECT lang, source, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6)
        |    AS token_share
        |FROM a""".stripMargin,

    "q_shuffle" ->
      """WITH t AS (SELECT doc_id,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 1000000
        |      AS b
        |  FROM documents)
        |SELECT doc_id, CAST(b * 64 // 1000000 AS INTEGER) AS shard,
        |  row_number() OVER (ORDER BY b, doc_id) - 1 AS pos
        |FROM t""".stripMargin,

    "q_shuffle_pack" ->
      """WITH t AS (SELECT doc_id, text,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 1000000
        |      AS b
        |  FROM documents),
        |o AS (SELECT doc_id, text,
        |    CAST(b * 64 // 1000000 AS INTEGER) AS shard,
        |    row_number() OVER (ORDER BY b, doc_id) - 1 AS pos
        |  FROM t),
        |c AS (SELECT doc_id, shard, pos,
        |    sum(len(string_split(text, ' '))) OVER (PARTITION BY shard
        |      ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - len(string_split(text, ' ')) AS strt
        |  FROM o)
        |SELECT doc_id, shard, CAST(strt // 256 AS BIGINT) AS seq_id,
        |  CAST(strt % 256 AS BIGINT) AS seq_offset FROM c""".stripMargin,

    "q_vocab" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' '))
        |    AS term FROM documents)
        |SELECT term, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM w GROUP BY term
        |ORDER BY n_occurrences DESC, term ASC LIMIT 100""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(CAST(sum(CAST(round(l_extendedprice *
        |      (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
        |    / 100, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |      AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING total_qty > 150)
        |SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    // Q21 shape: EXISTS compiles to the semi probe, NOT EXISTS to the
    // anti probe — both correlated on l_orderkey with the non-equi
    // residuals inside, exactly the engine's join conditions
    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND n_nationkey < 5
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name""".stripMargin,

    // the bucketed-path contract: the oracle is the PLAIN join on the
    // raw parquet — the engine's bucketed write+read+join must be
    // row-equivalent (the q_salted equivalence pattern); the zero-
    // exchange plan itself is pinned in BucketedSpec
    "q_bucketed" ->
      """SELECT o_orderpriority,
        |  round(CAST(sum(CAST(round(l_extendedprice *
        |      (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    // the compaction contract: the oracle aggregates the RAW parquet —
    // the engine's explode→compact→read round-trip must be
    // row-equivalent (layout may change, rows may not); the
    // file-count evidence lives in CompactSpec
    "q_compact" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  round(CAST(sum(CAST(round(l_extendedprice *
        |      (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
        |    AS revenue
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,

    // Q10 shape: returnflag pushed to lineitem, date window to
    // orders, top-20 tie-broken on the customer key
    "q10_returned" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  round(CAST(sum(CAST(round(l_extendedprice *
        |      (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
        |    AS revenue,
        |  count(*) AS n_returned
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,

    // Q17 shape: the correlated scalar subquery is decorrelated the
    // same way the engine plans it — one per-part aggregate joined
    // back; the threshold is the exact-integer form (qty*n*5 < total)
    "q17_small_qty" ->
      """WITH p AS (SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#13' AND p_size < 20),
        |l AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN p ON l_partkey = p_partkey),
        |th AS (SELECT l_partkey AS t_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |      AS total_qty,
        |    count(*) AS n_lines
        |  FROM l GROUP BY 1)
        |SELECT round(CAST(sum(CAST(round(l_extendedprice * 100)
        |      AS BIGINT)) AS DOUBLE) / 100 / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_small
        |FROM l JOIN th ON l_partkey = t_partkey
        |  AND CAST(l_quantity AS BIGINT) * n_lines * 5 < total_qty""".stripMargin,

    // Q7 shape: both sides pre-filtered to the watched nations, the
    // disjunctive pair condition then reduces to supp <> cust
    "q7_nation_trade" ->
      """WITH sup AS (SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_nationkey IN (1, 2)),
        |cus AS (SELECT c_custkey, n_name AS cust_nation
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_nationkey IN (1, 2))
        |SELECT supp_nation, cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(CAST(sum(CAST(round(l_extendedprice *
        |      (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN sup ON l_suppkey = s_suppkey
        |JOIN cus ON o_custkey = c_custkey
        |WHERE supp_nation <> cust_nation
        |GROUP BY 1, 2, 3""".stripMargin,

    // Q13 shape: the priority filter lives INSIDE the outer join's ON
    // (a fully-filtered customer counts as 0, not gone), and
    // count(o_orderkey) null-skips exactly like the engine
    "q13_cust_dist" ->
      """WITH per AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |      AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM per GROUP BY c_count""".stripMargin,

    // Q22 shape: the scalar threshold is the exact-integer form
    // (bal_cents * n_pos > tot_cents), NOT EXISTS is the anti probe
    "q22_idle_balance" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer WHERE c_nationkey < 10),
        |thr AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS tot_cents,
        |    count(*) AS n_pos
        |  FROM c WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS n_cust,
        |  round(CAST(sum(bal_cents) AS DOUBLE) / 100, 2) AS total_bal
        |FROM c, thr
        |WHERE bal_cents * n_pos > tot_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY c_nationkey""".stripMargin,

    // Q2 shape: the CORRELATED scalar-subquery form — DuckDB
    // decorrelates it into the same per-part MIN the engine plans;
    // the supply relation derives from lineitem in exact integer
    // cents (no partsupp in the testdata), so the min-equality can
    // never flake on float ulps
    "q2_min_cost" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part
        |  WHERE p_size = 15),
        |sup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |ps AS (SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS cost_cents
        |  FROM lineitem JOIN p ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  round(CAST(cost_cents AS DOUBLE) / 100, 2) AS cost
        |FROM ps JOIN sup ON l_suppkey = s_suppkey
        |JOIN p ON l_partkey = p_partkey
        |WHERE cost_cents = (SELECT min(ps2.cost_cents)
        |  FROM ps ps2 JOIN sup s2 ON ps2.l_suppkey = s2.s_suppkey
        |  WHERE ps2.l_partkey = ps.l_partkey)""".stripMargin,

    // Q11 shape: the HAVING-against-global-share form — the grand
    // total + part count aggregate the per-part aggregate (one row),
    // and the scale-free threshold (value > 2·avg) is exact
    // cross-multiplied cents
    "q11_important_stock" ->
      """WITH sup AS (SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 3),
        |psv AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS value_cents
        |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS tot_cents,
        |    count(*) AS n_parts
        |  FROM psv)
        |SELECT l_partkey AS partkey,
        |  round(CAST(value_cents AS DOUBLE) / 100, 2) AS value
        |FROM psv, tot
        |WHERE value_cents * n_parts > tot_cents * 2""".stripMargin,

    // Q16 shape: NOT IN compiles to the anti probe; the supply pairs
    // are one DISTINCT aggregate over the fact
    "q16_supplier_cnt" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
        |  FROM lineitem),
        |bad AS (SELECT s_suppkey FROM supplier
        |  WHERE s_acctbal < 0 AND s_suppkey IS NOT NULL)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_size IN (5, 10, 15, 20)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
        |GROUP BY 1, 2, 3""".stripMargin,

    // Q20 shape: nested EXISTS against a per-(part, supplier)
    // aggregate that itself probes lineitem — compiles to the
    // engine's semi-over-aggregate-over-fact; the 30% threshold is
    // the exact cross-multiplied integer form
    "q20_excess_stock" ->
      """WITH w AS (SELECT p_partkey FROM part
        |  WHERE p_name LIKE 'red%'),
        |lw AS (SELECT l_partkey, l_suppkey,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem JOIN w ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |ps AS (SELECT l_partkey, l_suppkey, sum(qty) AS qty_ps
        |  FROM lw GROUP BY 1, 2),
        |pt AS (SELECT l_partkey AS t_partkey, sum(qty_ps) AS qty_p
        |  FROM ps GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey < 15
        |  AND EXISTS (SELECT 1 FROM ps JOIN pt ON l_partkey = t_partkey
        |    WHERE l_suppkey = s_suppkey
        |      AND qty_ps * 10 > qty_p * 3)""".stripMargin,

    // Q9 shape: per-part min-price cost (exact cents) joined back onto
    // the fact, profit per (supplier nation, order year); the engine's
    // salted hybrid is row-set ≡ the plain joins stated here
    "q9_product_profit" ->
      """WITH p AS (SELECT p_partkey FROM part
        |  WHERE p_name LIKE '%blue%'),
        |l AS (SELECT l_orderkey, l_partkey, l_suppkey,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |      AS BIGINT) AS rev_cents,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem JOIN p ON l_partkey = p_partkey),
        |c AS (SELECT l_partkey AS c_partkey,
        |    min(price_cents) AS cost_cents
        |  FROM l GROUP BY 1)
        |SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(CAST(sum(rev_cents - cost_cents) AS DOUBLE) / 100, 2)
        |    AS profit,
        |  count(*) AS n_lines
        |FROM l JOIN c ON l_partkey = c_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,

    // Q19 shape: the OR-of-ANDs bracket predicate stated naively —
    // DuckDB evaluates it post-join exactly as the engine's residual
    "q19_brackets" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice *
        |      (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // Q15 shape: the max-revenue view with ALL argmax rows kept —
    // exact-cents equality makes the tie rule deterministic
    "q15_top_supplier" ->
      """WITH r AS (SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |      * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  round(CAST(total_cents AS DOUBLE) / 100, 2) AS total_revenue
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM r)""".stripMargin,

    "q6_forecast" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice *
        |      l_discount * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // the per-character collapse fold mirrors llm/Phonetic.soundex
    // exactly (RE2 has no backreferences, so the collapse cannot be a
    // regex); verified against the seven published NARA examples
    "q_soundex" ->
      """WITH w AS (SELECT p_partkey, CAST(i - 1 AS BIGINT) AS pos,
        |    parts[i] AS word
        |  FROM (SELECT p_partkey, string_split(p_name, ' ') AS parts,
        |        unnest(range(1, len(string_split(p_name, ' ')) + 1))
        |          AS i
        |        FROM part) x),
        |u AS (SELECT p_partkey, pos, word,
        |    upper(regexp_replace(word, '[^A-Za-z]', '', 'g')) AS L
        |  FROM w),
        |f AS (SELECT p_partkey, pos, word, L,
        |    translate(translate(translate(L, 'HW', ''),
        |      'AEIOUY', '......'),
        |      'BFPVCGJKQSXZDTLMNR', '111122222222334556') AS coded
        |  FROM u),
        |c AS (SELECT p_partkey, pos, word, L,
        |    replace(list_reduce(list_prepend('',
        |        regexp_extract_all(coded, '(?s).')),
        |      (a, ch) -> CASE WHEN ends_with(a, ch) THEN a
        |        ELSE a || ch END), '.', '') AS codes
        |  FROM f)
        |SELECT p_partkey, pos, word,
        |  CASE WHEN length(L) = 0 THEN NULL
        |    ELSE substr(L, 1, 1) || rpad(
        |      CASE WHEN translate(substr(L, 1, 1), 'AEIOUYHW', '') = ''
        |        THEN substr(codes, 1, 3)
        |        ELSE substr(codes, 2, 3) END, 3, '0')
        |  END AS soundex
        |FROM c""".stripMargin,

    // the composed ER tier: Soundex chain (verbatim the q_soundex
    // fold) over the DISTINCT part-name vocabulary, block equi-join on
    // the code, |len|<=2 lower-bound prune, exact levenshtein <= 2
    "q_er_block" ->
      ("WITH " + erSoundexCtes + "\n" +
      """SELECT a.code AS block, a.word AS id_a, b.word AS id_b,
        |  CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
        |FROM kk a JOIN kk b ON a.code = b.code
        |WHERE a.word < b.word
        |  AND abs(length(a.word) - length(b.word)) <= 2
        |  AND levenshtein(a.word, b.word) <= 2""".stripMargin),

    // the ER pipeline end to end: the q_er_block pair set resolved to
    // transitive entity clusters (recursive reachability over the
    // symmetric pair graph; entity = lexicographic min of the
    // component — exactly Dedup.resolveComponents' contract)
    "q_er_resolve" ->
      ("WITH RECURSIVE " + erSoundexCtes + ",\n" +
      """prs AS (SELECT a.word AS id_a, b.word AS id_b
        |  FROM kk a JOIN kk b ON a.code = b.code
        |  WHERE a.word < b.word
        |    AND abs(length(a.word) - length(b.word)) <= 2
        |    AND levenshtein(a.word, b.word) <= 2),
        |sym AS (SELECT id_a AS a, id_b AS b FROM prs
        |  UNION ALL SELECT id_b AS a, id_a AS b FROM prs),
        |reach(node, r) AS (
        |  SELECT word, word FROM w0
        |  UNION
        |  SELECT s.b, r.r FROM reach r JOIN sym s ON s.a = r.node)
        |SELECT node AS word, min(r) AS entity_id,
        |  (min(r) = node) AS is_kept
        |FROM reach GROUP BY node""".stripMargin),

    // the multi-blocking union's closed form: because each engine leg
    // confirms dist <= 2 exactly, the union's pair set is simply
    // "dist <= 2 AND (code equal OR 3-prefix equal)" — no blocking
    // appears here at all. Flags are the same predicates; the
    // soundex flag is COALESCE'd so a letterless word (NULL code)
    // compares false, matching the engine leg that drops NULL codes.
    "q_er_union" ->
      ("WITH " + erSoundexCtes + "\n" +
      """SELECT a.word AS id_a, b.word AS id_b,
        |  CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist,
        |  COALESCE(a.code = b.code, FALSE) AS via_soundex,
        |  (substr(a.word, 1, 3) = substr(b.word, 1, 3)) AS via_prefix
        |FROM k a JOIN k b ON a.word < b.word
        |WHERE abs(length(a.word) - length(b.word)) <= 2
        |  AND levenshtein(a.word, b.word) <= 2
        |  AND (COALESCE(a.code = b.code, FALSE)
        |    OR substr(a.word, 1, 3) = substr(b.word, 1, 3))""".stripMargin),

    "q_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |c AS (SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) <= 64 THEN CAST(1 AS BIGINT)
        |      ELSE CAST(floor(CAST(len(toks) - 16 + 48 - 1 AS DOUBLE)
        |        / 48.0) AS BIGINT) END AS nc
        |  FROM d),
        |e AS (SELECT doc_id, toks, n, unnest(range(nc)) AS i FROM c)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  CAST(least(64, n - i * 48) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, CAST(i * 48 + 1 AS BIGINT),
        |    CAST(least(i * 48 + 64, n) AS BIGINT)), ' ') AS chunk_text
        |FROM e""".stripMargin,

    "q_colloc" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |uni AS (SELECT u AS t, count(*) AS c FROM
        |    (SELECT unnest(w) AS u FROM t) x
        |  WHERE u <> '' GROUP BY u),
        |nn AS (SELECT sum(c) AS n FROM uni),
        |bi AS (SELECT w1, w2, count(*) AS bc FROM
        |    (SELECT w[i] AS w1, w[i+1] AS w2 FROM
        |      (SELECT w, unnest(range(1, len(w))) AS i FROM t
        |       WHERE len(w) >= 2) y) z
        |  WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
        |  HAVING count(*) >= 20)
        |SELECT w1, w2, bc AS pair_count,
        |  round(ln((CAST(bc AS DOUBLE) * CAST(n AS DOUBLE)) /
        |    (CAST(c1.c AS DOUBLE) * CAST(c2.c AS DOUBLE))), 6) AS pmi
        |FROM bi JOIN uni c1 ON bi.w1 = c1.t
        |  JOIN uni c2 ON bi.w2 = c2.t
        |CROSS JOIN nn
        |ORDER BY pmi DESC, w1 ASC, w2 ASC
        |LIMIT 25""".stripMargin,

    "q_perplexity" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |bi AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    w[i] AS w1, w[i+1] AS w2
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |        FROM words WHERE len(w) >= 2) x),
        |bc AS (SELECT w1, w2, count(*) AS bc FROM bi GROUP BY w1, w2),
        |cc AS (SELECT w1, count(*) AS cc FROM bi GROUP BY w1),
        |v AS (SELECT count(DISTINCT t) AS vv FROM
        |  (SELECT unnest(string_split(text, ' ')) AS t
        |   FROM documents) u),
        |t AS (SELECT bi.doc_id, bi.pos,
        |    -ln(CAST(bc + 1 AS DOUBLE) / (cc + vv)) AS nll
        |  FROM bi JOIN bc USING (w1, w2) JOIN cc USING (w1)
        |  CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(list_reduce(list_prepend(0.0,
        |      list_transform(list(nll ORDER BY pos), x -> x)),
        |    (a, b) -> a + b) / count(*), 6) AS avg_nll
        |FROM t GROUP BY doc_id""".stripMargin,

    "q_backoff" ->
      """WITH train AS (SELECT doc_id, text FROM documents
        |  WHERE ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 2 < 1),
        |tw AS (SELECT string_split(text, ' ') AS w FROM train),
        |uni AS (SELECT unnest(w) AS u FROM tw),
        |ucnt AS (SELECT u, count(*) AS uc FROM uni GROUP BY u),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM uni),
        |tb AS (SELECT w[i] AS b1, w[i+1] AS b2
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i
        |        FROM tw WHERE len(w) >= 2) x),
        |bcnt AS (SELECT b1, b2, count(*) AS bc FROM tb GROUP BY b1, b2),
        |tt AS (SELECT w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
        |  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i
        |        FROM tw WHERE len(w) >= 3) y),
        |tcnt AS (SELECT w1, w2, w3, count(*) AS tc FROM tt
        |  GROUP BY w1, w2, w3),
        |tri AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, ' ') AS w
        |              FROM documents) q WHERE len(w) >= 3) z),
        |sc AS (SELECT tri.doc_id, tri.pos,
        |    CASE WHEN tc IS NOT NULL THEN CAST(tc AS DOUBLE) / bc12
        |         WHEN bc23 IS NOT NULL
        |           THEN 0.4 * (CAST(bc23 AS DOUBLE) / uc2)
        |         ELSE 0.4 * (0.4 * (coalesce(CAST(uc3 AS DOUBLE), 0.5)
        |           / nn)) END AS s,
        |    CASE WHEN tc IS NOT NULL THEN 0 ELSE 1 END AS bo
        |  FROM tri
        |  LEFT JOIN tcnt USING (w1, w2, w3)
        |  LEFT JOIN (SELECT b1 AS w1, b2 AS w2, bc AS bc12 FROM bcnt) j1
        |    USING (w1, w2)
        |  LEFT JOIN (SELECT b1 AS w2, b2 AS w3, bc AS bc23 FROM bcnt) j2
        |    USING (w2, w3)
        |  LEFT JOIN (SELECT u AS w2, uc AS uc2 FROM ucnt) j3 USING (w2)
        |  LEFT JOIN (SELECT u AS w3, uc AS uc3 FROM ucnt) j4 USING (w3)
        |  CROSS JOIN n)
        |SELECT doc_id, count(*) AS n_trigrams,
        |  round(list_reduce(list_prepend(0.0,
        |      list_transform(list(-ln(s) ORDER BY pos), x -> x)),
        |    (a, b) -> a + b) / count(*), 6) AS avg_nll,
        |  round(CAST(sum(bo) AS DOUBLE) / count(*), 6) AS backoff_rate
        |FROM sc GROUP BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' '))
        |    AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM w GROUP BY doc_id, term),
        |tk AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS toks
        |  FROM tf GROUP BY doc_id),
        |idf AS (SELECT term, count(DISTINCT doc_id) AS df
        |  FROM w GROUP BY term),
        |n AS (SELECT count(*) AS nn FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |    round((CAST(tf AS DOUBLE) / toks)
        |      * ln(CAST(nn AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN tk USING (doc_id) JOIN idf USING (term)
        |  CROSS JOIN n)
        |SELECT doc_id, term, tfidf,
        |  row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term ASC) AS rank
        |FROM s QUALIFY rank <= 3""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM words) wi),
        |freq AS (SELECT shingle FROM sh GROUP BY shingle
        |  HAVING count(*) <= 100),
        |f AS (SELECT sh.doc_id, sh.shingle FROM sh
        |  JOIN freq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM f GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS i FROM f a JOIN f b ON a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        |  round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.2""".stripMargin,

    "q_dedup_resolve" ->
      """WITH RECURSIVE words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM words) wi),
        |freq AS (SELECT shingle FROM sh GROUP BY shingle
        |  HAVING count(*) <= 100),
        |f AS (SELECT sh.doc_id, sh.shingle FROM sh
        |  JOIN freq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM f GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS i FROM f a JOIN f b ON a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT id_a, id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.2),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(root, node) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node)
        |SELECT node AS doc_id, min(root) AS keep_id,
        |  (node = min(root)) AS is_kept
        |FROM reach GROUP BY node""".stripMargin,

    "q_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings),
        |p AS (SELECT query_id, corpus_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
        |      x -> x[1]*x[2])), (a, b) -> a + b) AS dot,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(qv, qv),
        |      x -> x[1]*x[2])), (a, b) -> a + b) AS qq,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(cv, cv),
        |      x -> x[1]*x[2])), (a, b) -> a + b) AS cc
        |  FROM q CROSS JOIN c WHERE query_id <> corpus_id),
        |s AS (SELECT query_id, corpus_id,
        |    dot/(sqrt(qq)*sqrt(cc) + 1e-12) AS raw_cos FROM p)
        |SELECT query_id, corpus_id, round(raw_cos, 6) AS cosine,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY raw_cos DESC, corpus_id ASC) AS rank
        |FROM s QUALIFY rank <= 3""".stripMargin,

    "q_quality" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','and','of','to','in','is','it')))
        |      AS stop_hits,
        |    length(text) - length(regexp_replace(text, '[[:punct:]]', '',
        |      'g')) AS punct
        |  FROM documents)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(CAST(len - n_tokens + 1 AS DOUBLE)/n_tokens, 6)
        |    AS avg_token_len,
        |  round(CAST(stop_hits AS DOUBLE)/n_tokens, 6) AS stop_ratio,
        |  round(CAST(punct AS DOUBLE)/len, 6) AS punct_ratio,
        |  round((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4
        |         ELSE 0.0 END)
        |    + (CASE WHEN CAST(len - n_tokens + 1 AS DOUBLE)/n_tokens
        |         BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
        |    + least(CAST(stop_hits AS DOUBLE)/n_tokens * 3.0, 0.3), 6)
        |    AS quality_score
        |FROM d""".stripMargin,

    "q_randproj" ->
      """WITH p AS (SELECT vec_id, unnest(range(0, 16)) AS i,
        |    embedding AS v
        |  FROM embeddings)
        |SELECT vec_id, CAST(i AS BIGINT) AS out_dim,
        |  round((1.0 / sqrt(16)) * list_reduce(list_prepend(0.0,
        |      list_transform(range(0, 64), j ->
        |        (1.0 - 2.0 * ((((((i*64 + j) * (i*64 + j) % 2147483647)
        |            * 48271 + (i*64 + j) * 1000003 + 12345)
        |            % 2147483647 % 2147483646 + 1)
        |          * 48271 % 2147483647) % 2))
        |        * CAST(v[j + 1] AS DOUBLE))),
        |    (a, b) -> a + b), 6) AS component
        |FROM p""".stripMargin,

    "q_corpus2" ->
      """WITH w AS (SELECT doc_id, lang, source,
        |    string_split(text, ' ') AS w
        |  FROM documents),
        |l AS (SELECT doc_id, lang, source, list_transform(
        |    range(0, (len(w) + 7) // 8), i ->
        |    CASE WHEN doc_id % 11 = 0 AND i = 0 THEN 'lorem ipsum '
        |      ELSE '' END
        |    || array_to_string(w[i*8+1 : i*8+8], ' ')
        |    || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 AND i = 1 THEN ' {'
        |      ELSE '' END) AS lines
        |  FROM w),
        |f AS (SELECT doc_id, lang, source,
        |    list_filter(lines, l ->
        |      len(string_split(l, ' ')) >= 3
        |      AND regexp_matches(l, '[.!?"]$')
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS ks
        |  FROM l),
        |c AS (SELECT doc_id, lang, source,
        |    array_to_string(ks, chr(10)) AS ctext
        |  FROM f WHERE len(ks) >= 1),
        |d AS (SELECT doc_id, lang, source, ctext,
        |    length(ctext) AS len,
        |    length(ctext) - length(replace(ctext, ' ', '')) + 1
        |      AS n_tokens,
        |    len(list_filter(string_split(ctext, ' '),
        |      w -> w IN ('the','a','and','of','to','in','is','it')))
        |      AS stop_hits
        |  FROM c),
        |qq AS (SELECT doc_id, lang, source, ctext,
        |    round((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4
        |           ELSE 0.0 END)
        |      + (CASE WHEN CAST(len - n_tokens + 1 AS DOUBLE)/n_tokens
        |           BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
        |      + least(CAST(stop_hits AS DOUBLE)/n_tokens * 3.0, 0.3), 6)
        |      AS qs
        |  FROM d),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY source ORDER BY qs, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM qq),
        |cal AS (SELECT doc_id, lang, source, ctext, qs FROM r
        |  WHERE rn > n * 3 // 10),
        |k AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(ctext))
        |    AS keep_id FROM cal),
        |dd AS (SELECT doc_id, lang, source, ctext, qs FROM k
        |  WHERE doc_id = keep_id),
        |m AS (SELECT doc_id, lang, source, qs,
        |    len(string_split(ctext, ' ')) AS toks,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 8
        |      AS shard
        |  FROM dd),
        |p AS (SELECT doc_id, lang, source, qs, shard,
        |    CAST(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks
        |      AS BIGINT) AS strt
        |  FROM m)
        |SELECT doc_id, lang, source, qs, shard,
        |  strt // 128 AS seq_id, strt % 128 AS seq_offset
        |FROM p""".stripMargin,

    "q_corpus3" ->
      """WITH w AS (SELECT doc_id, lang, source,
        |    string_split(text, ' ') AS w
        |  FROM documents),
        |l AS (SELECT doc_id, lang, source, list_transform(
        |    range(0, (len(w) + 7) // 8), i ->
        |    CASE WHEN doc_id % 11 = 0 AND i = 0 THEN 'lorem ipsum '
        |      ELSE '' END
        |    || array_to_string(w[i*8+1 : i*8+8], ' ')
        |    || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 AND i = 1 THEN ' {'
        |      ELSE '' END) AS lines
        |  FROM w),
        |f AS (SELECT doc_id, lang, source,
        |    list_filter(lines, l ->
        |      len(string_split(l, ' ')) >= 3
        |      AND regexp_matches(l, '[.!?"]$')
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS ks
        |  FROM l),
        |c AS (SELECT doc_id, lang, source,
        |    CAST(substr(source, 4) AS INT) < 5 AS pc,
        |    array_to_string(ks, chr(10)) AS ctext
        |  FROM f WHERE len(ks) >= 1),
        |tok AS (SELECT doc_id, lang, source, pc, ctext,
        |    CAST(i AS BIGINT) AS p,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(cw[i], ''),
        |        ch -> ascii(ch)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) % 1024 AS b
        |  FROM (SELECT doc_id, lang, source, pc, ctext,
        |          string_split(ctext, ' ') AS cw,
        |          unnest(range(1, len(string_split(ctext, ' ')) + 1))
        |            AS i FROM c) x),
        |cnt AS (SELECT b,
        |    sum(CASE WHEN pc THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN pc THEN 0 ELSE 1 END) AS cn
        |  FROM tok GROUP BY b),
        |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
        |model AS (SELECT b,
        |    ln(CAST(cp + 1 AS DOUBLE) / CAST(tp + 1024 AS DOUBLE)) -
        |    ln(CAST(cn + 1 AS DOUBLE) / CAST(tn + 1024 AS DOUBLE))
        |      AS llr
        |  FROM cnt CROSS JOIN tot),
        |sc AS (SELECT doc_id, any_value(lang) AS lang,
        |    any_value(source) AS source, any_value(ctext) AS ctext,
        |    round(list_reduce(list_prepend(0.0,
        |      list_transform(list(llr ORDER BY p), x -> x)),
        |      (a, b) -> a + b) / count(*), 6) AS nbq
        |  FROM (SELECT tok.doc_id, tok.lang, tok.source, tok.ctext,
        |          tok.p, llr FROM tok
        |        JOIN model ON tok.b = model.b) s
        |  GROUP BY doc_id),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY source ORDER BY nbq, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM sc),
        |cal AS (SELECT doc_id, lang, source, ctext, nbq FROM r
        |  WHERE rn > n * 3 // 10),
        |sp AS (SELECT doc_id, lang, source, nbq,
        |    string_split(ctext, ' ') AS cw,
        |    len(string_split(ctext, ' ')) AS nw
        |  FROM cal),
        |spans AS (SELECT doc_id, lang, source, nbq,
        |    CAST(i AS BIGINT) AS span_idx,
        |    array_to_string(cw[i*16+1 : i*16+16], ' ') AS span_text
        |  FROM (SELECT doc_id, lang, source, nbq, cw,
        |          unnest(range(0, (nw - 1) // 16 + 1)) AS i FROM sp) x),
        |fk AS (SELECT *, row_number() OVER (
        |    PARTITION BY md5(span_text)
        |    ORDER BY doc_id, span_idx) AS srn FROM spans),
        |dd AS (SELECT doc_id, any_value(lang) AS lang,
        |    any_value(source) AS source, any_value(nbq) AS nbq,
        |    CAST(count(*) AS BIGINT) AS n_kept,
        |    array_to_string(list(span_text ORDER BY span_idx), ' ')
        |      AS clean_text
        |  FROM fk WHERE srn = 1 GROUP BY doc_id),
        |m AS (SELECT doc_id, lang, source, nbq, n_kept,
        |    len(string_split(clean_text, ' ')) AS toks,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 % 8
        |      AS shard
        |  FROM dd),
        |p AS (SELECT doc_id, lang, source, nbq, n_kept, shard,
        |    CAST(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks
        |      AS BIGINT) AS strt
        |  FROM m)
        |SELECT doc_id, lang, source, nbq, n_kept, shard,
        |  strt // 128 AS seq_id, strt % 128 AS seq_offset
        |FROM p""".stripMargin,

    "q_attributes" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |    length(text) - length(replace(text, ' ', '')) + 1
        |      AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','and','of','to','in','is','it')))
        |      AS stop_hits
        |  FROM documents),
        |q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    round((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4
        |           ELSE 0.0 END)
        |      + (CASE WHEN CAST(len - n_tokens + 1 AS DOUBLE)/n_tokens
        |           BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
        |      + least(CAST(stop_hits AS DOUBLE)/n_tokens * 3.0, 0.3), 6)
        |      AS quality_score
        |  FROM d),
        |words AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, 'w1' AS tag, unnest(w) AS gram FROM words
        |  UNION ALL
        |  SELECT doc_id, 'g5', w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |    || ' ' || w[i+3] || ' ' || w[i+4]
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
        |        FROM words) f),
        |c AS (SELECT doc_id, tag, gram, count(*) AS cnt
        |  FROM g GROUP BY doc_id, tag, gram),
        |rep AS (SELECT doc_id,
        |    round(CAST(count(CASE WHEN tag = 'w1' THEN 1 END) AS DOUBLE)
        |      / sum(CASE WHEN tag = 'w1' THEN cnt END), 6)
        |      AS uniq_word_frac,
        |    round(CAST(coalesce(sum(CASE WHEN tag = 'g5' AND cnt >= 2
        |        THEN cnt END) * 5, 0) AS DOUBLE)
        |      / sum(CASE WHEN tag = 'w1' THEN cnt END), 6)
        |      AS dup5gram_frac
        |  FROM c GROUP BY doc_id),
        |pii AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))
        |    + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
        |    + len(regexp_extract_all(text,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
        |      AS pii_total
        |  FROM documents)
        |SELECT q.doc_id, q.n_tokens, q.quality_score,
        |  rep.uniq_word_frac, rep.dup5gram_frac, pii.pii_total,
        |  f.lang_pred
        |FROM q JOIN rep ON q.doc_id = rep.doc_id
        |JOIN pii ON q.doc_id = pii.doc_id
        |JOIN read_parquet(
        |  '/root/repo/fixtures/sf0.01/q_langid.parquet/*.parquet') f
        |  ON q.doc_id = f.doc_id""".stripMargin,

    "q_lsh_tune" ->
      """WITH pairs AS (SELECT CAST(b AS INTEGER) AS bands,
        |    CAST(128 // b AS INTEGER) AS rows_per_band
        |  FROM (SELECT unnest(range(1, 129)) AS b) x
        |  WHERE 128 % b = 0),
        |m AS (SELECT bands, rows_per_band,
        |    round(list_reduce(list_prepend(0.0,
        |      list_transform(range(0, 1000), i ->
        |        CASE WHEN (i + 0.5)/1000 < 0.5 THEN
        |          (1.0 - pow(1.0 - pow((i + 0.5)/1000, rows_per_band),
        |            bands)) / 1000
        |        ELSE 0.0 END)), (a, b) -> a + b), 6) AS fp,
        |    round(list_reduce(list_prepend(0.0,
        |      list_transform(range(0, 1000), i ->
        |        CASE WHEN (i + 0.5)/1000 >= 0.5 THEN
        |          (1.0 - (1.0 - pow(1.0 - pow((i + 0.5)/1000,
        |            rows_per_band), bands))) / 1000
        |        ELSE 0.0 END)), (a, b) -> a + b), 6) AS fn
        |  FROM pairs)
        |SELECT bands, rows_per_band, fp, fn,
        |  round(fp + fn, 6) AS cost
        |FROM m""".stripMargin,

    "q_leadlag" ->
      """WITH k AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events WHERE user_id IS NOT NULL),
        |rk AS (SELECT DISTINCT user_id FROM k
        |  ORDER BY user_id LIMIT 3),
        |refs AS (SELECT k.user_id AS ref_id, rn, value AS ra
        |  FROM k JOIN rk ON k.user_id = rk.user_id),
        |l AS (SELECT CAST(unnest(range(-10, 11)) AS INTEGER) AS lag),
        |a AS (SELECT ref_id, rn + lag AS rn2, lag, ra
        |  FROM refs CROSS JOIN l),
        |j AS (SELECT a.ref_id, k.user_id AS other_id, a.lag, a.ra,
        |    k.value AS rb
        |  FROM a JOIN k ON k.rn = a.rn2),
        |c AS (SELECT ref_id, other_id, lag,
        |    round(corr(ra, rb), 6) AS c6, count(*) AS n
        |  FROM j GROUP BY ref_id, other_id, lag
        |  HAVING count(*) >= 2 AND round(corr(ra, rb), 6) IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY ref_id, other_id
        |    ORDER BY c6 DESC, lag) AS rkk
        |  FROM c)
        |SELECT ref_id, other_id, lag AS best_lag, c6 + 0.0 AS best_corr
        |FROM r WHERE rkk = 1""".stripMargin,

    "q_sax" ->
      """WITH st AS (SELECT user_id, avg(value) AS mu,
        |    stddev_samp(value) AS sd
        |  FROM events GROUP BY user_id),
        |r AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |f AS (SELECT user_id,
        |    CAST(FLOOR((rn - 1) / 8.0) AS BIGINT) AS frame,
        |    avg(value) AS fm
        |  FROM r GROUP BY user_id, FLOOR((rn - 1) / 8.0)),
        |p AS (SELECT f.user_id, f.frame,
        |    (fm - mu) / (sd + 1e-12) AS paa
        |  FROM f JOIN st ON f.user_id = st.user_id)
        |SELECT user_id, frame, round(paa, 6) AS paa,
        |  CASE WHEN paa < -0.6744897501960817 THEN 'a'
        |       WHEN paa < 0.0 THEN 'b'
        |       WHEN paa < 0.6744897501960817 THEN 'c'
        |       ELSE 'd' END AS symbol
        |FROM p""".stripMargin,

    "q_langid_ngram" ->
      """WITH g AS (
        |  SELECT doc_id, lang, unnest(string_split(text, '')) AS g
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, lang, substr(text, i + 1, 2)
        |  FROM (SELECT doc_id, lang, text,
        |      unnest(range(0, length(text) - 1)) AS i FROM documents) a
        |  UNION ALL
        |  SELECT doc_id, lang, substr(text, i + 1, 3)
        |  FROM (SELECT doc_id, lang, text,
        |      unnest(range(0, length(text) - 2)) AS i FROM documents) b),
        |lp AS (SELECT lang, g, count(*) AS c FROM g GROUP BY lang, g),
        |lr AS (SELECT * FROM (
        |    SELECT lang AS cand, g, CAST(row_number() OVER (
        |      PARTITION BY lang ORDER BY c DESC, g) AS BIGINT) AS rl
        |    FROM lp) x WHERE rl <= 40),
        |dc AS (SELECT doc_id, g, count(*) AS c FROM g
        |  GROUP BY doc_id, g),
        |dp AS (SELECT * FROM (
        |    SELECT doc_id, g, CAST(row_number() OVER (
        |      PARTITION BY doc_id ORDER BY c DESC, g) AS BIGINT) AS rd
        |    FROM dc) x WHERE rd <= 20),
        |langs AS (SELECT DISTINCT cand FROM lr),
        |pen AS (SELECT dp.doc_id, l.cand,
        |    coalesce(abs(dp.rd - lr.rl), 40) AS pen
        |  FROM dp CROSS JOIN langs l
        |  LEFT JOIN lr ON lr.cand = l.cand AND lr.g = dp.g),
        |s AS (SELECT doc_id, cand, CAST(sum(pen) AS BIGINT) AS dist
        |  FROM pen GROUP BY doc_id, cand),
        |best AS (SELECT * FROM (
        |    SELECT doc_id, cand, dist, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY dist, cand) AS rn
        |    FROM s) x WHERE rn = 1)
        |SELECT b.doc_id, d.lang, b.cand AS lang_pred_ngram,
        |  b.dist AS oop_dist
        |FROM best b JOIN documents d ON b.doc_id = d.doc_id""".stripMargin,

    "q_drift" ->
      """WITH g AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS gram
        |  FROM documents),
        |h AS (SELECT source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(gram, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) % 256 AS b
        |  FROM g),
        |c AS (SELECT source, b, count(*) AS c FROM h
        |  GROUP BY source, b),
        |grid AS (SELECT s.source, r.range AS b
        |  FROM (SELECT DISTINCT source FROM c) s
        |  CROSS JOIN range(256) r),
        |fl AS (SELECT grid.source, grid.b,
        |    coalesce(c.c, 0) AS c
        |  FROM grid LEFT JOIN c
        |    ON grid.source = c.source AND grid.b = c.b),
        |bt AS (SELECT b, sum(c) AS bt FROM fl GROUP BY b),
        |st AS (SELECT source, sum(c) AS st FROM fl GROUP BY source),
        |gt AS (SELECT sum(bt) AS gt FROM bt),
        |t AS (SELECT f.source, f.b,
        |    CAST(f.c + 1 AS DOUBLE) / (st.st + 256) AS p,
        |    CAST(bt.bt - f.c + 1 AS DOUBLE) / (gt.gt - st.st + 256)
        |      AS q
        |  FROM fl f JOIN bt USING (b) JOIN st ON f.source = st.source
        |  CROSS JOIN gt)
        |SELECT t.source, CAST(max(st.st) AS BIGINT) AS n_tokens,
        |  round(list_reduce(list_prepend(0.0,
        |      list_transform(list(p * ln(p / q) ORDER BY b), x -> x)),
        |    (a, b) -> a + b), 6) AS kl_vs_rest
        |FROM t JOIN st ON t.source = st.source
        |GROUP BY t.source""".stripMargin,

    "q_dsir" ->
      (s"WITH $uniDocCte,\n" +
      """w AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |  FROM documents2),
        |g AS (
        |  SELECT doc_id, source, unnest(w) AS gram FROM w
        |  UNION ALL
        |  SELECT doc_id, source, w[i] || ' ' || w[i+1]
        |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        |        FROM w) b),
        |h AS (SELECT doc_id, source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(gram, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) % 256 AS b
        |  FROM g),
        |d AS (SELECT doc_id, b, count(*) AS cnt,
        |    max(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tgt
        |  FROM h GROUP BY doc_id, b),
        |dist AS (SELECT b, sum(cnt) AS ac,
        |    sum(CASE WHEN tgt = 1 THEN cnt ELSE 0 END) AS tc
        |  FROM d GROUP BY b),
        |tot AS (SELECT sum(ac) AS na, sum(tc) AS nt FROM dist),
        |r AS (SELECT b,
        |    ln(CAST(tc + 1 AS DOUBLE) / (nt + 256))
        |      - ln(CAST(ac + 1 AS DOUBLE) / (na + 256)) AS lr
        |  FROM dist CROSS JOIN tot),
        |j AS (SELECT doc_id, b, cnt, cnt * lr AS wt
        |  FROM d JOIN r USING (b))
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
        |  round(list_reduce(list_prepend(0.0,
        |      list_transform(list(wt ORDER BY b), x -> x)),
        |    (a, b) -> a + b), 6) AS dsir_logw
        |FROM j GROUP BY doc_id""".stripMargin),

    "q_dsir_resample" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, unnest(w) AS gram FROM w
        |  UNION ALL
        |  SELECT doc_id, source, w[i] || ' ' || w[i+1]
        |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        |        FROM w) b),
        |h AS (SELECT doc_id, source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(gram, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) % 256 AS b
        |  FROM g),
        |d AS (SELECT doc_id, b, count(*) AS cnt,
        |    max(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tgt
        |  FROM h GROUP BY doc_id, b),
        |dist AS (SELECT b, sum(cnt) AS ac,
        |    sum(CASE WHEN tgt = 1 THEN cnt ELSE 0 END) AS tc
        |  FROM d GROUP BY b),
        |tot AS (SELECT sum(ac) AS na, sum(tc) AS nt FROM dist),
        |r AS (SELECT b,
        |    ln(CAST(tc + 1 AS DOUBLE) / (nt + 256))
        |      - ln(CAST(ac + 1 AS DOUBLE) / (na + 256)) AS lr
        |  FROM dist CROSS JOIN tot),
        |j AS (SELECT doc_id, b, cnt, cnt * lr AS wt
        |  FROM d JOIN r USING (b)),
        |lw AS (SELECT doc_id,
        |    round(list_reduce(list_prepend(0.0,
        |        list_transform(list(wt ORDER BY b), x -> x)),
        |      (a, b) -> a + b), 6) AS dsir_logw
        |  FROM j GROUP BY doc_id),
        |kk AS (SELECT doc_id, dsir_logw,
        |    round(dsir_logw + -ln(-ln(
        |      (((doc_id % 2147483646) + 1) * 48271 % 2147483647
        |        % 1000000 + 0.5) / 1000000)), 6) AS gumbel_key
        |  FROM lw)
        |SELECT doc_id, dsir_logw, gumbel_key,
        |  CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id)
        |    AS BIGINT) AS sel_rank
        |FROM kk ORDER BY gumbel_key DESC, doc_id LIMIT 100""".stripMargin,

    "q_quality_calibrate" ->
      """WITH d AS (SELECT doc_id, source, length(text) AS len,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','and','of','to','in','is','it')))
        |      AS stop_hits
        |  FROM documents),
        |q AS (SELECT doc_id, source,
        |    round((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4
        |           ELSE 0.0 END)
        |      + (CASE WHEN CAST(len - n_tokens + 1 AS DOUBLE)/n_tokens
        |           BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
        |      + least(CAST(stop_hits AS DOUBLE)/n_tokens * 3.0, 0.3), 6)
        |      AS qs
        |  FROM d),
        |r AS (SELECT doc_id, source, qs,
        |    row_number() OVER (PARTITION BY source ORDER BY qs, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM q)
        |SELECT source, round(min(qs), 6) AS threshold,
        |  count(*) AS n_kept
        |FROM r WHERE rn > n * 3 // 10 GROUP BY source""".stripMargin,

    "q_normalize" ->
      """WITH t AS (SELECT doc_id,
        |    chr(8220) || substr(text, 1, 40) || chr(8221) || ' '
        |      || chr(8212) || ' x' || chr(160) || 'y' || chr(9)
        |      || 'z  tail' || chr(8230)
        |      || CASE WHEN doc_id % 2 = 0 THEN chr(7) || 'bell'
        |         ELSE '' END AS m
        |  FROM documents),
        |n AS (SELECT doc_id, m,
        |    trim(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(m,
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
        |      '[\x{2018}\x{2019}\x{201b}]', '''', 'g'),
        |      '[\x{201c}\x{201d}\x{201f}]', '"', 'g'),
        |      '[\x{2013}\x{2014}\x{2212}]', '-', 'g'),
        |      '\x{2026}', '...', 'g'),
        |      '[\x{00a0}\x{2000}-\x{200a}\x{202f}\x{205f}\x{3000}]',
        |      ' ', 'g'),
        |      '[ \t\n\x0B\f\r]+', ' ', 'g')) AS normalized
        |  FROM t)
        |SELECT doc_id, length(m) AS n_chars_raw, normalized,
        |  length(normalized) AS n_chars_norm
        |FROM n""".stripMargin,

    "q_code" ->
      """WITH t AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 9 = 0 THEN chr(10)
        |       || 'function foo(x) { return x + 1; }' || chr(10)
        |       || '  var y = foo(2);'
        |     ELSE '' END AS cs
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    round(CAST(length(cs) - length(regexp_replace(cs,
        |        '[{}\[\]();=]', '', 'g')) AS DOUBLE)
        |      / greatest(length(cs), 1), 6) AS symbol_density,
        |    CAST(len(list_filter(string_split_regex(cs, '[ \n]+'),
        |      w -> w IN ('def','return','import','var','val','if',
        |        'else','for','while','class','function','const','let',
        |        'void','int','public','static'))) AS BIGINT)
        |      AS keyword_hits,
        |    round(CAST(len(list_filter(string_split(cs, chr(10)),
        |        l -> starts_with(l, '  '))) AS DOUBLE)
        |      / greatest(len(string_split(cs, chr(10))), 1), 6)
        |      AS indent_frac
        |  FROM t)
        |SELECT doc_id, symbol_density, keyword_hits, indent_frac,
        |  round(least(symbol_density * 4.0, 1.0) * 0.5
        |    + least(CAST(keyword_hits AS DOUBLE) / 4.0, 1.0) * 0.3
        |    + indent_frac * 0.2, 6) AS code_score
        |FROM f""".stripMargin,

    "q_pii_card" ->
      """WITH t AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 13 = 0
        |       THEN ' card 4111 1111 1111 1111 ok' ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0
        |       THEN ' amex 378282246310005 bill' ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0
        |       THEN ' ref 1234-5678-9012-3456 code' ELSE '' END AS ct
        |  FROM documents),
        |c AS (SELECT doc_id, ct,
        |    list_filter(regexp_extract_all(ct,
        |        '\b(?:\d[ -]?){12,15}\d\b'), m ->
        |      length(regexp_replace(m, '[ -]', '', 'g'))
        |        BETWEEN 13 AND 16
        |      AND list_reduce(list_prepend(0,
        |        list_transform(range(1, length(regexp_replace(m,
        |            '[ -]', '', 'g')) + 1), i ->
        |          CASE WHEN (i - 1) % 2 = 1 THEN
        |            CASE WHEN (ascii(reverse(regexp_replace(m, '[ -]',
        |                '', 'g'))[i]) - 48) * 2 > 9
        |              THEN (ascii(reverse(regexp_replace(m, '[ -]', '',
        |                'g'))[i]) - 48) * 2 - 9
        |              ELSE (ascii(reverse(regexp_replace(m, '[ -]', '',
        |                'g'))[i]) - 48) * 2 END
        |          ELSE ascii(reverse(regexp_replace(m, '[ -]', '',
        |            'g'))[i]) - 48 END)),
        |        (a, b) -> a + b) % 10 = 0) AS valid
        |  FROM t)
        |SELECT doc_id, CAST(len(valid) AS BIGINT) AS n_card,
        |  list_reduce(list_prepend(ct, valid),
        |    (acc, m) -> replace(acc, m, '<CARD>')) AS card_redacted
        |FROM c""".stripMargin,

    "q_pii" ->
      """WITH t AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
        |       || CAST(doc_id AS VARCHAR) || '@example.com'
        |     ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
        |       || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
        |       || CAST(doc_id % 9000 + 1000 AS VARCHAR)
        |     ELSE '' END
        |  || CASE WHEN doc_id % 3 = 0 THEN ' host 10.'
        |       || CAST(doc_id % 256 AS VARCHAR) || '.'
        |       || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
        |       || CAST((doc_id * 13) % 256 AS VARCHAR)
        |     ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN ' id 987-65-'
        |       || CAST(doc_id % 9000 + 1000 AS VARCHAR)
        |     ELSE '' END AS pt
        |  FROM documents),
        |c AS (SELECT doc_id, pt,
        |    CAST(len(regexp_extract_all(pt,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      AS BIGINT) AS n_email,
        |    CAST(len(regexp_extract_all(pt,
        |      '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
        |    CAST(len(regexp_extract_all(pt,
        |      '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
        |    CAST(len(regexp_extract_all(pt,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
        |      AS n_ipv4
        |  FROM t)
        |SELECT doc_id, n_email, n_phone, n_ssn, n_ipv4,
        |  n_email + n_phone + n_ssn + n_ipv4 AS pii_total,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        |    AS redacted
        |FROM c""".stripMargin,

    "q_c4_filter" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |l AS (SELECT doc_id, list_transform(
        |    range(0, (len(w) + 7) // 8), i ->
        |    CASE WHEN doc_id % 11 = 0 AND i = 0 THEN 'lorem ipsum '
        |      ELSE '' END
        |    || array_to_string(w[i*8+1 : i*8+8], ' ')
        |    || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 AND i = 1 THEN ' {'
        |      ELSE '' END) AS lines
        |  FROM w),
        |f AS (SELECT doc_id, lines,
        |    list_filter(lines, l ->
        |      len(string_split(l, ' ')) >= 3
        |      AND regexp_matches(l, '[.!?"]$')
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS ks
        |  FROM l)
        |SELECT doc_id, array_to_string(ks, chr(10)) AS clean_text,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(ks) AS BIGINT) AS n_kept
        |FROM f WHERE len(ks) >= 1""".stripMargin,

    "q_rollhash" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |    (a, b) -> (a * 1000003 + b) % 2147483647) AS rollhash
        |FROM documents""".stripMargin,

    "q_trend" ->
      """WITH base AS (SELECT CAST(user_id AS VARCHAR) AS sk,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
        |      AS BIGINT) AS i, value AS y FROM events),
        |pairs AS (SELECT a.sk,
        |    (b.y - a.y) / CAST(b.i - a.i AS DOUBLE) AS pslope,
        |    CAST(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
        |      ELSE 0 END AS BIGINT) AS sgn
        |  FROM base a JOIN base b ON a.sk = b.sk AND a.i < b.i),
        |pp AS (SELECT sk, median(pslope) AS ts_slope, sum(sgn) AS mk_s
        |  FROM pairs GROUP BY sk),
        |inter AS (SELECT base.sk,
        |    median(y - ts_slope * CAST(i AS DOUBLE)) AS ts_intercept
        |  FROM base JOIN pp ON base.sk = pp.sk GROUP BY base.sk),
        |nt AS (SELECT sk, count(*) AS n FROM base GROUP BY sk),
        |ties AS (SELECT sk, sum(t*(t-1)*(2*t+5)) AS tie_term FROM
        |  (SELECT sk, y, count(*) AS t FROM base GROUP BY sk, y) g
        |  GROUP BY sk),
        |f AS (SELECT pp.sk, n, ts_slope, ts_intercept, mk_s,
        |    CAST(n*(n-1)*(2*n+5) - tie_term AS DOUBLE)/18.0 AS mk_var
        |  FROM pp JOIN inter ON pp.sk = inter.sk
        |    JOIN nt ON pp.sk = nt.sk JOIN ties ON pp.sk = ties.sk
        |  WHERE n >= 2)
        |SELECT CAST(sk AS BIGINT) AS user_id, n,
        |  CAST(round(ts_slope * 1e6) AS BIGINT) AS ts_slope_i6,
        |  CAST(round(ts_intercept * 1e6) AS BIGINT) AS ts_intercept_i6,
        |  CAST(mk_s AS BIGINT) AS mk_s,
        |  CAST(round(mk_var * 1e6) AS BIGINT) AS mk_var_i6,
        |  CAST(round((CASE WHEN mk_var <= 0 THEN 0.0
        |    WHEN mk_s > 0 THEN CAST(mk_s - 1 AS DOUBLE)/sqrt(mk_var)
        |    WHEN mk_s < 0 THEN CAST(mk_s + 1 AS DOUBLE)/sqrt(mk_var)
        |    ELSE 0.0 END) * 1e6) AS BIGINT) AS mk_z_i6,
        |  CAST(round(2.0*CAST(mk_s AS DOUBLE)/CAST(n*(n-1) AS DOUBLE)
        |    * 1e6) AS BIGINT) AS mk_tau_i6
        |FROM f""".stripMargin,

    "q_trend_w" ->
      """WITH base AS (SELECT CAST(user_id AS VARCHAR) AS sk,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
        |      AS BIGINT) AS i, value AS y FROM events),
        |pairs AS (SELECT a.sk,
        |    (b.y - a.y) / CAST(b.i - a.i AS DOUBLE) AS pslope,
        |    CAST(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
        |      ELSE 0 END AS BIGINT) AS sgn
        |  FROM base a JOIN base b
        |    ON a.sk = b.sk AND a.i < b.i AND b.i - a.i <= 24),
        |pp AS (SELECT sk, median(pslope) AS ts_slope,
        |    sum(sgn) AS s_w, count(*) AS n_pairs
        |  FROM pairs GROUP BY sk),
        |inter AS (SELECT base.sk,
        |    median(y - ts_slope * CAST(i AS DOUBLE)) AS ts_intercept
        |  FROM base JOIN pp ON base.sk = pp.sk GROUP BY base.sk),
        |nt AS (SELECT sk, count(*) AS n FROM base GROUP BY sk)
        |SELECT CAST(pp.sk AS BIGINT) AS user_id, n, n_pairs,
        |  CAST(round(ts_slope * 1e6) AS BIGINT) AS ts_slope_i6,
        |  CAST(round(ts_intercept * 1e6) AS BIGINT) AS ts_intercept_i6,
        |  CAST(s_w AS BIGINT) AS s_w
        |FROM pp JOIN inter ON pp.sk = inter.sk
        |  JOIN nt ON pp.sk = nt.sk
        |WHERE n >= 2""".stripMargin,

    "q_ks" ->
      """WITH r AS (SELECT CAST(event_type AS VARCHAR) AS s,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |c AS (SELECT s, v, count(*) AS cs FROM r GROUP BY 1, 2),
        |vt AS (SELECT v, CAST(sum(cs) AS BIGINT) AS cv FROM c
        |  GROUP BY 1),
        |st AS (SELECT s, CAST(sum(cs) AS BIGINT) AS ns FROM c
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM st),
        |g AS (SELECT sl.s, vt.v, vt.cv
        |  FROM (SELECT DISTINCT s FROM st) sl CROSS JOIN vt),
        |j AS (SELECT g.s, g.v, g.cv, coalesce(c.cs, 0) AS cs
        |  FROM g LEFT JOIN c ON c.s = g.s AND c.v = g.v),
        |w AS (SELECT s, v,
        |    sum(cs) OVER (PARTITION BY s ORDER BY v) AS cums,
        |    sum(cv) OVER (PARTITION BY s ORDER BY v) AS cuma
        |  FROM j),
        |d AS (SELECT w.s, st.ns,
        |    abs(CAST(cums AS DOUBLE) / st.ns -
        |      CAST(cuma - cums AS DOUBLE) / (tot.n - st.ns)) AS d
        |  FROM w JOIN st ON w.s = st.s CROSS JOIN tot
        |  WHERE tot.n > st.ns)
        |SELECT s AS event_type, CAST(max(ns) AS BIGINT) AS n_points,
        |  round(max(d), 9) AS ks_vs_rest
        |FROM d GROUP BY 1""".stripMargin,

    "q_psi" ->
      """WITH r AS (SELECT CAST(event_type AS VARCHAR) AS s,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |bb AS (SELECT s, least(greatest(
        |    CAST(floor((v - 0.0) / 10.0) AS BIGINT), 0), 49) AS b
        |  FROM r),
        |c AS (SELECT s, b, count(*) AS c FROM bb GROUP BY 1, 2),
        |grid AS (SELECT sl.s, rg.range AS b
        |  FROM (SELECT DISTINCT s FROM c) sl CROSS JOIN range(50) rg),
        |fl AS (SELECT grid.s, grid.b, coalesce(c.c, 0) AS c
        |  FROM grid LEFT JOIN c ON grid.s = c.s AND grid.b = c.b),
        |bt AS (SELECT b, CAST(sum(c) AS BIGINT) AS bt FROM fl
        |  GROUP BY b),
        |st AS (SELECT s, CAST(sum(c) AS BIGINT) AS st FROM fl
        |  GROUP BY s),
        |gt AS (SELECT CAST(sum(bt) AS BIGINT) AS gt FROM bt),
        |t AS (SELECT f.s, f.b, st.st, gt.gt,
        |    CAST(f.c + 1 AS DOUBLE) / (st.st + 50) AS p,
        |    CAST(bt.bt - f.c + 1 AS DOUBLE) / (gt.gt - st.st + 50)
        |      AS q,
        |    sum(f.c) OVER (PARTITION BY f.s ORDER BY f.b) AS cums,
        |    sum(bt.bt - f.c) OVER (PARTITION BY f.s ORDER BY f.b)
        |      AS cumr
        |  FROM fl f JOIN bt USING (b) JOIN st ON f.s = st.s
        |  CROSS JOIN gt WHERE gt.gt > st.st)
        |SELECT s AS event_type, CAST(max(st) AS BIGINT) AS n_points,
        |  round(list_reduce(list_prepend(0.0,
        |      list_transform(list((p - q) * ln(p / q) ORDER BY b),
        |        x -> x)),
        |    (a, x) -> a + x), 6) AS psi_vs_rest,
        |  round(max(abs(CAST(cums AS DOUBLE) / st -
        |    CAST(cumr AS DOUBLE) / (gt - st))), 9) AS ks_binned
        |FROM t GROUP BY 1""".stripMargin,

    "q_lof" ->
      """WITH base AS (SELECT CAST(user_id AS VARCHAR) AS sk, ts,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |pts AS (SELECT sk,
        |    CAST(row_number() OVER (PARTITION BY sk ORDER BY ts)
        |      AS BIGINT) AS i,
        |    v AS x,
        |    v - coalesce(lag(v) OVER (PARTITION BY sk ORDER BY ts), v)
        |      AS y
        |  FROM base),
        |pairs AS (SELECT a.sk, a.i AS ia, b.i AS ib, a.x AS xa,
        |    sqrt((a.x - b.x) * (a.x - b.x) +
        |         (a.y - b.y) * (a.y - b.y)) AS d
        |  FROM pts a JOIN pts b ON a.sk = b.sk AND a.i <> b.i),
        |rk AS (SELECT sk, ia, ib, d, row_number() OVER
        |    (PARTITION BY sk, ia ORDER BY d, ib) AS rn FROM pairs),
        |kd AS (SELECT sk, ia, max(d) AS kd FROM rk WHERE rn <= 5
        |  GROUP BY sk, ia),
        |nbr AS (SELECT p.sk, p.ia, p.ib, p.xa, p.d
        |  FROM pairs p JOIN kd ON p.sk = kd.sk AND p.ia = kd.ia
        |  WHERE p.d <= kd.kd),
        |lrd AS (SELECT n.sk, n.ia, CAST(count(*) AS DOUBLE) /
        |    greatest(list_reduce(list_prepend(0.0,
        |      list_transform(list(greatest(kj.kd, n.d) ORDER BY n.ib),
        |        x -> x)), (a, b) -> a + b), 1e-12) AS lrd
        |  FROM nbr n JOIN kd kj ON n.sk = kj.sk AND n.ib = kj.ia
        |  GROUP BY n.sk, n.ia),
        |lof AS (SELECT n.sk, n.ia, max(n.xa) AS x,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(list(lj.lrd ORDER BY n.ib), x -> x)),
        |      (a, b) -> a + b) / count(*) / max(li.lrd) AS lof
        |  FROM nbr n JOIN lrd lj ON n.sk = lj.sk AND n.ib = lj.ia
        |    JOIN lrd li ON n.sk = li.sk AND n.ia = li.ia
        |  GROUP BY n.sk, n.ia)
        |SELECT CAST(sk AS BIGINT) AS user_id, ia AS ord, x AS value,
        |  round(lof, 6) AS lof FROM lof""".stripMargin,

    "q_croston" ->
      """WITH pts AS (SELECT CAST(user_id AS VARCHAR) AS sk,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
        |      AS BIGINT) AS i,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |dm AS (SELECT sk, i, v AS d,
        |    CAST(i - coalesce(lag(i) OVER
        |      (PARTITION BY sk ORDER BY i), 0) AS DOUBLE) AS q
        |  FROM pts WHERE v > 113.0),
        |st AS (SELECT sk, count(*) AS n_demands,
        |    list_reduce(list_prepend(
        |      {'z': CAST(0.0 AS DOUBLE), 'p': CAST(0.0 AS DOUBLE),
        |       'k': CAST(0 AS BIGINT)},
        |      list_transform(list({'z': d, 'p': q,
        |        'k': CAST(1 AS BIGINT)} ORDER BY i), x -> x)),
        |      (a, e) -> {
        |        'z': CASE WHEN a.k = 0 THEN e.z
        |          ELSE CAST(0.25 AS DOUBLE) * e.z +
        |               CAST(0.75 AS DOUBLE) * a.z END,
        |        'p': CASE WHEN a.k = 0 THEN e.p
        |          ELSE CAST(0.25 AS DOUBLE) * e.p +
        |               CAST(0.75 AS DOUBLE) * a.p END,
        |        'k': a.k + 1}) AS s
        |  FROM dm GROUP BY sk)
        |SELECT CAST(sk AS BIGINT) AS user_id, n_demands,
        |  round(s.z, 6) AS z_hat, round(s.p, 6) AS p_hat,
        |  round(s.z / s.p, 6) AS croston_forecast
        |FROM st""".stripMargin,

    "q_hbos" ->
      """WITH pts AS (SELECT CAST(user_id AS VARCHAR) AS sk,
        |    CAST(row_number() OVER w AS BIGINT) AS i,
        |    CAST(value AS DOUBLE) AS x,
        |    CAST(value AS DOUBLE) - coalesce(
        |      lag(CAST(value AS DOUBLE)) OVER w,
        |      CAST(value AS DOUBLE)) AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |st AS (SELECT sk, min(x) AS xlo, max(x) AS xhi,
        |    min(y) AS ylo, max(y) AS yhi, count(*) AS n
        |  FROM pts GROUP BY sk),
        |b AS (SELECT pts.sk, i, x, n,
        |    CASE WHEN xhi = xlo THEN 0 ELSE
        |      CAST(least(greatest(
        |        floor((x - xlo) / ((xhi - xlo) / 16.0)), 0.0), 15.0)
        |        AS BIGINT) END AS bx,
        |    CASE WHEN yhi = ylo THEN 0 ELSE
        |      CAST(least(greatest(
        |        floor((y - ylo) / ((yhi - ylo) / 16.0)), 0.0), 15.0)
        |        AS BIGINT) END AS byy
        |  FROM pts JOIN st ON pts.sk = st.sk),
        |cx AS (SELECT sk, bx, count(*) AS cx FROM b GROUP BY 1, 2),
        |cy AS (SELECT sk, byy, count(*) AS cy FROM b GROUP BY 1, 2)
        |SELECT CAST(b.sk AS BIGINT) AS user_id, i AS ord, x AS value,
        |  round(-ln(CAST(cx AS DOUBLE) / n)
        |    - ln(CAST(cy AS DOUBLE) / n), 6) AS hbos
        |FROM b JOIN cx ON b.sk = cx.sk AND b.bx = cx.bx
        |  JOIN cy ON b.sk = cy.sk AND b.byy = cy.byy""".stripMargin,

    // identical to q_lof with candidates restricted to |lag| <= 8
    "q_lof_w" ->
      """WITH base AS (SELECT CAST(user_id AS VARCHAR) AS sk, ts,
        |    CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |pts AS (SELECT sk,
        |    CAST(row_number() OVER (PARTITION BY sk ORDER BY ts)
        |      AS BIGINT) AS i,
        |    v AS x,
        |    v - coalesce(lag(v) OVER (PARTITION BY sk ORDER BY ts), v)
        |      AS y
        |  FROM base),
        |pairs AS (SELECT a.sk, a.i AS ia, b.i AS ib, a.x AS xa,
        |    sqrt((a.x - b.x) * (a.x - b.x) +
        |         (a.y - b.y) * (a.y - b.y)) AS d
        |  FROM pts a JOIN pts b ON a.sk = b.sk AND a.i <> b.i
        |    AND abs(a.i - b.i) <= 8),
        |rk AS (SELECT sk, ia, ib, d, row_number() OVER
        |    (PARTITION BY sk, ia ORDER BY d, ib) AS rn FROM pairs),
        |kd AS (SELECT sk, ia, max(d) AS kd FROM rk WHERE rn <= 5
        |  GROUP BY sk, ia),
        |nbr AS (SELECT p.sk, p.ia, p.ib, p.xa, p.d
        |  FROM pairs p JOIN kd ON p.sk = kd.sk AND p.ia = kd.ia
        |  WHERE p.d <= kd.kd),
        |lrd AS (SELECT n.sk, n.ia, CAST(count(*) AS DOUBLE) /
        |    greatest(list_reduce(list_prepend(0.0,
        |      list_transform(list(greatest(kj.kd, n.d) ORDER BY n.ib),
        |        x -> x)), (a, b) -> a + b), 1e-12) AS lrd
        |  FROM nbr n JOIN kd kj ON n.sk = kj.sk AND n.ib = kj.ia
        |  GROUP BY n.sk, n.ia),
        |lof AS (SELECT n.sk, n.ia, max(n.xa) AS x,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(list(lj.lrd ORDER BY n.ib), x -> x)),
        |      (a, b) -> a + b) / count(*) / max(li.lrd) AS lof
        |  FROM nbr n JOIN lrd lj ON n.sk = lj.sk AND n.ib = lj.ia
        |    JOIN lrd li ON n.sk = li.sk AND n.ia = li.ia
        |  GROUP BY n.sk, n.ia)
        |SELECT CAST(sk AS BIGINT) AS user_id, ia AS ord, x AS value,
        |  round(lof, 6) AS lof FROM lof""".stripMargin,

    // the multi-label suffix IN-list is GENERATED from the same
    // resource file the engine loads (graft/public_suffixes.txt) —
    // the "full public list is a data-file swap" claim holds for the
    // oracle too, not just the Spark side
    "q_url" ->
      """WITH u AS (SELECT doc_id,
        |    'HTTPS://' ||
        |    CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END ||
        |    source || '-' || CAST(doc_id % 20 AS VARCHAR) ||
        |    '.example' ||
        |    CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.org'
        |      ELSE '.co.uk' END ||
        |    '/Doc/' || CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      '?utm_source=feed&ref=keep&utm_id=' ||
        |        CAST(doc_id AS VARCHAR) ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |nf AS (SELECT doc_id, regexp_replace(url, '#.*', '')
        |    AS nofrag FROM u),
        |parts0 AS (SELECT doc_id, nofrag,
        |    lower(regexp_extract(nofrag,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(nofrag,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0
        |  FROM nf),
        |parts AS (SELECT doc_id, scheme,
        |    regexp_replace(CASE
        |      WHEN scheme = 'http' THEN regexp_replace(host0,
        |        ':80$', '')
        |      WHEN scheme = 'https' THEN regexp_replace(host0,
        |        ':443$', '')
        |      ELSE host0 END, '^www\.', '') AS host,
        |    regexp_extract(nofrag,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
        |      AS path_raw,
        |    regexp_extract(nofrag, '\?([^#]*)', 1) AS qs
        |  FROM parts0),
        |np AS (SELECT doc_id, scheme, host,
        |    CASE WHEN regexp_replace(path_raw, '/+$', '') = ''
        |      THEN '/' ELSE regexp_replace(path_raw, '/+$', '') END
        |      AS path,
        |    CASE WHEN length(qs) > 0 AND
        |        array_to_string(list_filter(string_split(qs, '&'),
        |          p -> NOT regexp_matches(p,
        |            '^(utm_[^=]*|fbclid|gclid)=')), '&') <> ''
        |      THEN '?' || array_to_string(
        |        list_filter(string_split(qs, '&'),
        |          p -> NOT regexp_matches(p,
        |            '^(utm_[^=]*|fbclid|gclid)=')), '&')
        |      ELSE '' END AS qpart
        |  FROM parts),
        |normed AS (SELECT doc_id,
        |    scheme || '://' || host || path || qpart AS url_norm,
        |    string_split(host, '.') AS l, host FROM np),
        |domd AS (SELECT doc_id, url_norm,
        |    CASE WHEN len(l) <= 2 THEN host
        |         WHEN (l[-2] || '.' || l[-1]) IN (__MULTI_SUFFIXES__)
        |            AND len(l) >= 3
        |           THEN l[-3] || '.' || l[-2] || '.' || l[-1]
        |         ELSE l[-2] || '.' || l[-1] END AS domain
        |  FROM normed),
        |capd AS (SELECT doc_id, url_norm, domain,
        |    CAST(row_number() OVER (PARTITION BY domain
        |      ORDER BY doc_id) AS BIGINT) AS domain_rank
        |  FROM domd WHERE domain <> 'example.org')
        |SELECT doc_id, url_norm, domain, domain_rank
        |FROM capd WHERE domain_rank <= 25""".stripMargin
        .replace("__MULTI_SUFFIXES__", graft.llm.UrlHygiene.multiSuffixes
          .map(x => "'" + x + "'").mkString(", ")),

    "q_bm25" ->
      """WITH words AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM words
        |  GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT count(*) AS n_docs,
        |    CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM dl),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |   FROM documents WHERE doc_id < 5) x),
        |contribs AS (SELECT query_id, tf.doc_id, qt.term,
        |    ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) /
        |              (CAST(df AS DOUBLE) + 0.5)) *
        |    (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
        |     (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
        |        0.75 * CAST(dl AS DOUBLE) / avgdl))) AS contrib
        |  FROM qt JOIN tf ON qt.term = tf.term
        |    JOIN dl ON tf.doc_id = dl.doc_id
        |    JOIN dfreq ON qt.term = dfreq.term CROSS JOIN stats),
        |scored AS (SELECT query_id, doc_id,
        |    round(list_reduce(list_prepend(0.0,
        |        list_transform(list(contrib ORDER BY term), x -> x)),
        |      (a, b) -> a + b), 6) AS bm25
        |  FROM contribs GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, bm25,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
        |FROM scored QUALIFY rank <= 5""".stripMargin,

    "q_kmv" ->
      (s"WITH $uniDocCte,\n" +
      """w AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS term FROM documents2),
        |h AS (SELECT source, term,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(term, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) AS hh
        |  FROM w),
        |ex AS (SELECT source, count(*) AS exact_distinct FROM
        |  (SELECT DISTINCT source, term FROM h) x GROUP BY source),
        |dh AS (SELECT DISTINCT source, hh FROM h),
        |topk AS (SELECT source, hh,
        |    row_number() OVER (PARTITION BY source ORDER BY hh ASC) AS r
        |  FROM dh QUALIFY r <= 256),
        |sk AS (SELECT source, count(*) AS n_sketch,
        |    CAST(max(hh) AS DOUBLE) / 2147483647.0 AS kth_frac
        |  FROM topk GROUP BY source)
        |SELECT sk.source, n_sketch, round(kth_frac, 9) AS kth_frac,
        |  round(CASE WHEN n_sketch < 256 THEN CAST(n_sketch AS DOUBLE)
        |    ELSE 255.0 / kth_frac END, 6) AS est_distinct,
        |  exact_distinct
        |FROM sk JOIN ex ON sk.source = ex.source""".stripMargin),

    "q_nbquality" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(substr(source, 4) AS INT) < 5 AS pc,
        |    string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, pc, CAST(i AS BIGINT) AS p,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(w[i], ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) % 1024 AS b
        |  FROM (SELECT doc_id, pc, w,
        |          unnest(range(1, len(w) + 1)) AS i FROM d) x),
        |cnt AS (SELECT b,
        |    sum(CASE WHEN pc THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN pc THEN 0 ELSE 1 END) AS cn
        |  FROM tok GROUP BY b),
        |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
        |model AS (SELECT b,
        |    ln(CAST(cp + 1 AS DOUBLE) / CAST(tp + 1024 AS DOUBLE)) -
        |    ln(CAST(cn + 1 AS DOUBLE) / CAST(tn + 1024 AS DOUBLE))
        |      AS llr
        |  FROM cnt CROSS JOIN tot),
        |sc AS (SELECT doc_id, count(*) AS n_tokens,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(list(llr ORDER BY p), x -> x)),
        |      (a, b) -> a + b) / count(*) AS m
        |  FROM (SELECT tok.doc_id, tok.p, llr FROM tok
        |        JOIN model ON tok.b = model.b) s
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, round(m, 6) AS nb_llr_mean,
        |  CASE WHEN m > 0 THEN 1 ELSE 0 END AS is_quality
        |FROM sc""".stripMargin,

    "q_cms" ->
      (s"WITH $uniDocCte,\n" +
      """wds AS (SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents2),
        |ex AS (SELECT term, count(*) AS exact_cnt FROM wds
        |  GROUP BY term ORDER BY exact_cnt DESC, term ASC LIMIT 20),
        |rws AS (SELECT CAST(unnest(range(4)) AS BIGINT) AS r),
        |h AS (SELECT w.term, r.r,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        CAST(r.r AS VARCHAR) || w.term, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) % 1024
        |      AS bucket
        |  FROM wds w CROSS JOIN rws r),
        |sk AS (SELECT r, bucket, count(*) AS cnt FROM h
        |  GROUP BY r, bucket),
        |probe AS (SELECT e.term, e.exact_cnt, r.r,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        CAST(r.r AS VARCHAR) || e.term, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) % 1024
        |      AS bucket
        |  FROM ex e CROSS JOIN rws r)
        |SELECT p.term, p.exact_cnt,
        |  CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_est
        |FROM probe p LEFT JOIN sk s
        |  ON p.r = s.r AND p.bucket = s.bucket
        |GROUP BY p.term, p.exact_cnt""".stripMargin),

    "q_histq" ->
      """WITH b AS (SELECT user_id,
        |    CAST(least(greatest(
        |      floor((value - 0.0) / ((500.0 - 0.0) / 1000)), 0.0),
        |      999.0) AS BIGINT) AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT user_id, bin, count(*) AS c FROM b
        |  GROUP BY user_id, bin),
        |cu AS (SELECT user_id, bin, c,
        |    sum(c) OVER (PARTITION BY user_id ORDER BY bin) AS cum,
        |    sum(c) OVER (PARTITION BY user_id) AS n
        |  FROM c),
        |qv AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        |SELECT user_id, q, CAST(max(n) AS BIGINT) AS n,
        |  min(bin) AS qbin,
        |  round(0.0 + CAST(min(bin) + 1 AS DOUBLE)
        |    * ((500.0 - 0.0) / 1000), 6) AS est
        |FROM cu JOIN qv ON cum >= ceil(q * CAST(n AS DOUBLE))
        |GROUP BY user_id, q""".stripMargin,

    "q_decompose" ->
      """WITH b AS (SELECT user_id, ts, value,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    count(value) OVER f AS cnt,
        |    sum(value) OVER f AS s,
        |    lag(value, 12) OVER w AS lg,
        |    lead(value, 12) OVER w AS ld
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts),
        |    f AS (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |b2 AS (SELECT *,
        |    CASE WHEN cnt = 25
        |      THEN round((s - 0.5*lg - 0.5*ld)/24, 9) END AS trend,
        |    (rn - 1) % 24 AS phase FROM b),
        |si AS (SELECT user_id, phase,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(list(value - trend ORDER BY rn), x -> x)),
        |      (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS sidx
        |  FROM b2 WHERE trend IS NOT NULL GROUP BY user_id, phase),
        |sm AS (SELECT user_id,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(list(sidx ORDER BY phase), x -> x)),
        |      (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS smean
        |  FROM si GROUP BY user_id)
        |SELECT b2.user_id, ts, value, round(trend, 6) + 0.0 AS trend,
        |  round(sidx - smean, 6) + 0.0 AS seasonal,
        |  round(value - trend - (sidx - smean), 6) + 0.0 AS resid
        |FROM b2 JOIN si ON b2.user_id = si.user_id AND b2.phase = si.phase
        |JOIN sm ON b2.user_id = sm.user_id""".stripMargin,

    "q_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, min(ts) AS ts_1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |a AS (SELECT u.user_id, ts_1, ts_1 + INTERVAL 7 DAY AS dl
        |  FROM u LEFT JOIN s1 USING (user_id)),
        |s2 AS (SELECT e.user_id, min(e.ts) AS ts_2 FROM events e
        |  JOIN a ON e.user_id = a.user_id
        |  WHERE e.event_type = 'click' AND a.ts_1 IS NOT NULL
        |    AND e.ts > a.ts_1 AND e.ts <= a.dl
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS ts_3 FROM events e
        |  JOIN a ON e.user_id = a.user_id
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts > s2.ts_2 AND e.ts <= a.dl
        |  GROUP BY e.user_id)
        |SELECT a.user_id,
        |  CASE WHEN ts_3 IS NOT NULL THEN 3
        |       WHEN ts_2 IS NOT NULL THEN 2
        |       WHEN ts_1 IS NOT NULL THEN 1 ELSE 0 END AS level,
        |  ts_1, ts_2, ts_3
        |FROM a LEFT JOIN s2 ON a.user_id = s2.user_id
        |  LEFT JOIN s3 ON a.user_id = s3.user_id""".stripMargin,

    "q_retention" ->
      """WITH weekly AS (SELECT DISTINCT user_id,
        |    date_trunc('week', ts) AS w FROM events),
        |cohort AS (SELECT user_id, min(w) AS cohort_week FROM weekly
        |  GROUP BY user_id),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM cohort
        |  GROUP BY cohort_week),
        |act AS (SELECT cohort_week,
        |    CAST((epoch_us(w) - epoch_us(cohort_week)) // 604800000000
        |      AS BIGINT) AS week_offset,
        |    count(*) AS n_active
        |  FROM weekly JOIN cohort USING (user_id) GROUP BY 1, 2)
        |SELECT act.cohort_week, week_offset, cohort_size, n_active,
        |  round(CAST(n_active AS DOUBLE)/CAST(cohort_size AS DOUBLE), 6)
        |    AS retention
        |FROM act JOIN sz USING (cohort_week)""".stripMargin,

    "q_rollup" ->
      """WITH e AS (SELECT event_type, user_id % 10 AS user_mod,
        |    value FROM events)
        |SELECT event_type, user_mod,
        |  CAST(GROUPING(event_type, user_mod) AS BIGINT) AS gid,
        |  count(*) AS n_events,
        |  round(sum(value), 9) AS sum_value
        |FROM e GROUP BY ROLLUP(event_type, user_mod)""".stripMargin,

    // set ops: EXCEPT/INTERSECT are DISTINCT set semantics with
    // null-equality on both engines (SQL standard)
    "q_except" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,

    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,

    "q_cube" ->
      """WITH e AS (SELECT event_type, user_id % 10 AS user_mod,
        |    value FROM events)
        |SELECT event_type, user_mod,
        |  CAST(GROUPING(event_type, user_mod) AS BIGINT) AS gid,
        |  count(*) AS n_events,
        |  round(sum(value), 9) AS sum_value
        |FROM e GROUP BY CUBE(event_type, user_mod)""".stripMargin,

    // pivot desugars to conditional aggregation — FILTER counts give
    // 0 for empty cells, matching the engine's coalesce
    "q_pivot" ->
      """WITH e AS (SELECT user_id % 10 AS user_mod, event_type
        |  FROM events)
        |SELECT user_mod,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase')
        |    AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM e GROUP BY user_mod""".stripMargin,

    "q_grouping_sets" ->
      """WITH e AS (SELECT event_type, user_id % 10 AS user_mod,
        |    value FROM events)
        |SELECT event_type, user_mod,
        |  CAST(GROUPING(event_type, user_mod) AS BIGINT) AS gid,
        |  count(*) AS n_events,
        |  round(sum(value), 9) AS sum_value
        |FROM e GROUP BY GROUPING SETS ((event_type), (user_mod), ())""".stripMargin,

    // multi-distinct: two count(DISTINCT) + plain aggregates in one
    // statement (count DISTINCT skips NULL keys on both engines; the
    // plain count/sum still see every row)
    "q_multi_distinct" ->
      """SELECT date_trunc('day', ts) AS d,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types,
        |  count(*) AS n_events,
        |  round(sum(value), 9) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "q_readability" ->
      """WITH c AS (SELECT doc_id,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS s,
        |    greatest(len(regexp_extract_all(text,
        |      '[^ \t\n\f\r\x0B]+')), 1) AS w,
        |    len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS y
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0)
        |SELECT doc_id,
        |  CAST(s AS BIGINT) AS n_sentences,
        |  CAST(w AS BIGINT) AS n_words,
        |  CAST(y AS BIGINT) AS n_syllables,
        |  round(CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) *
        |      (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE) *
        |      (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)), 6)
        |    AS flesch_ease,
        |  round(CAST(0.39 AS DOUBLE) *
        |      (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
        |    + CAST(11.8 AS DOUBLE) *
        |      (CAST(y AS DOUBLE) / CAST(w AS DOUBLE))
        |    - CAST(15.59 AS DOUBLE), 6) AS fk_grade
        |FROM c""".stripMargin,

    "q_editdist" ->
      """WITH base AS (SELECT doc_id AS id, text AS t,
        |    CAST(length(text) AS BIGINT) AS len,
        |    substr(text, 1, 16) AS pf,
        |    CAST(floor(CAST(length(text) AS BIGINT) / 50) AS BIGINT)
        |      AS lb
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT id AS id_b, t AS tb, len AS lbn, pf,
        |    unnest([lb - 1, lb, lb + 1]) AS lb FROM base),
        |j AS (SELECT a.id AS id_a, b.id_b,
        |    CAST(levenshtein(a.t, b.tb) AS BIGINT) AS dist,
        |    greatest(a.len, b.lbn) AS mx
        |  FROM base a JOIN b ON a.pf = b.pf AND a.lb = b.lb
        |  WHERE a.id < b.id_b AND abs(a.len - b.lbn) <= 50)
        |SELECT id_a, id_b, dist,
        |  round(CAST(1.0 AS DOUBLE) -
        |    CAST(dist AS DOUBLE) / CAST(mx AS DOUBLE), 6) AS sim
        |FROM j WHERE dist <= 40""".stripMargin,

    // mirrors Hll.scala token for token: polynomial -> 3-round
    // xorshift-multiply finalizer -> bucket/rho via bin() bitlen ->
    // exact power-of-two indicator sum -> raw / linear-counting CASE
    "q_hll" ->
      """WITH k AS (SELECT event_type,
        |    'u' || lpad(CAST(user_id AS VARCHAR), 8, '0') || 'x'
        |      AS ukey
        |  FROM events WHERE user_id IS NOT NULL),
        |ph AS (SELECT event_type, ukey,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(ukey, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (a, b) -> (a * 1000003 + b) % 2147483647) AS p
        |  FROM k),
        |m1 AS (SELECT event_type,
        |    (xor(p, p >> 16) * 73244475) & 2147483647 AS x FROM ph),
        |m2 AS (SELECT event_type,
        |    (xor(x, x >> 16) * 73244475) & 2147483647 AS x FROM m1),
        |mx AS (SELECT event_type, xor(x, x >> 16) AS h FROM m2),
        |hb AS (SELECT event_type, h % 16 AS b,
        |    CAST(floor(CAST(h AS DOUBLE) / 16.0) AS BIGINT) AS r
        |  FROM mx),
        |mj AS (SELECT event_type, b,
        |    max(CASE WHEN r = 0 THEN 28
        |      ELSE 28 - length(bin(r)) END) AS mj
        |  FROM hb GROUP BY 1, 2),
        |sk AS (SELECT event_type, count(*) AS nb,
        |    sum(CAST(1.0 AS DOUBLE) /
        |      CAST((CAST(1 AS BIGINT) << CAST(mj AS INT)) AS DOUBLE))
        |      AS s1
        |  FROM mj GROUP BY 1),
        |fin AS (SELECT event_type,
        |    16 - nb AS v_zero,
        |    s1 + CAST(16 - nb AS DOUBLE) AS s_sum
        |  FROM sk),
        |est AS (SELECT event_type, v_zero, s_sum,
        |    CAST(0.673 AS DOUBLE) * CAST(16.0 AS DOUBLE) *
        |      CAST(16.0 AS DOUBLE) / s_sum AS raw
        |  FROM fin),
        |ex AS (SELECT event_type,
        |    count(DISTINCT ukey) AS exact_distinct FROM k GROUP BY 1)
        |SELECT est.event_type, CAST(16 AS BIGINT) AS m,
        |  CAST(v_zero AS BIGINT) AS v_zero, s_sum,
        |  round(CASE WHEN raw <= CAST(40.0 AS DOUBLE) AND v_zero > 0
        |    THEN CAST(16.0 AS DOUBLE) *
        |      ln(CAST(16.0 AS DOUBLE) / CAST(v_zero AS DOUBLE))
        |    ELSE raw END, 6) AS est_distinct,
        |  exact_distinct
        |FROM est JOIN ex
        |  ON est.event_type IS NOT DISTINCT FROM ex.event_type"""
        .stripMargin,

    "q_assoc" ->
      """WITH b0 AS (SELECT user_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) -
        |         epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) >
        |           14400000000
        |      THEN 1 ELSE 0 END AS nw
        |  FROM events WHERE event_type IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, event_type,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS sq
        |  FROM b0),
        |bk AS (SELECT DISTINCT user_id AS u, sq,
        |    CAST(event_type AS VARCHAR) AS it FROM s),
        |nn AS (SELECT count(*) AS n FROM
        |  (SELECT DISTINCT u, sq FROM bk)),
        |ic AS (SELECT it, count(*) AS cnt FROM bk GROUP BY it),
        |p AS (SELECT a.it AS item_a, b.it AS item_b,
        |    count(*) AS n_ab
        |  FROM bk a JOIN bk b ON a.u = b.u AND a.sq = b.sq
        |    AND a.it < b.it
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, ia.cnt AS n_a, ib.cnt AS n_b, n_ab,
        |  round(CAST(n_ab AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS support,
        |  round(CAST(n_ab AS DOUBLE) / CAST(ia.cnt AS DOUBLE), 6)
        |    AS conf_a_b,
        |  round(CAST(n_ab AS DOUBLE) / CAST(ib.cnt AS DOUBLE), 6)
        |    AS conf_b_a,
        |  round(CAST(n AS DOUBLE) * CAST(n_ab AS DOUBLE) /
        |    (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)), 6)
        |    AS lift
        |FROM p JOIN ic ia ON p.item_a = ia.it
        |  JOIN ic ib ON p.item_b = ib.it
        |  CROSS JOIN nn""".stripMargin,

    "q_sessions" ->
      """WITH b AS (SELECT user_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) -
        |         epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) >
        |           14400000000
        |      THEN 1 ELSE 0 END AS nw
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, event_type,
        |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_seq
        |  FROM b)
        |SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(epoch_us(CAST(max(ts) AS TIMESTAMP)) -
        |       epoch_us(CAST(min(ts) AS TIMESTAMP)) AS DOUBLE) / 1e6
        |    AS duration_secs,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM s GROUP BY 1, 2""".stripMargin,

    // Metric/band math recomputed in SQL from the PINNED q_holtwinters
    // fixture (whose own gate catches forecast regressions): a true
    // cross-engine check of the metric formulas, not a replay.
    "q_forecast_metrics" ->
      """WITH f AS (SELECT * FROM read_parquet(
        |    '/root/repo/fixtures/sf0.01/q_holtwinters.parquet/*.parquet')),
        |b AS (SELECT user_id, value, hw_pred, hw_resid,
        |    abs(value - lag(value, 24) OVER (PARTITION BY user_id
        |      ORDER BY ts)) AS naive
        |  FROM f)
        |SELECT user_id, count(*) AS n,
        |  round(sqrt(avg(hw_resid*hw_resid)), 6) AS rmse,
        |  round(avg(CASE WHEN abs(value) + abs(hw_pred) > 0
        |    THEN 2.0*abs(hw_resid)/(abs(value) + abs(hw_pred)) END), 6)
        |    AS smape,
        |  round(avg(abs(hw_resid)) /
        |    (CASE WHEN avg(naive) > 0 THEN avg(naive) END), 6) AS mase
        |FROM b GROUP BY user_id""".stripMargin,

    "q_conformal" ->
      """WITH f AS (SELECT * FROM read_parquet(
        |    '/root/repo/fixtures/sf0.01/q_holtwinters.parquet/*.parquet')),
        |b AS (SELECT user_id, ts, value, hw_resid,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
        |      AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM f),
        |b2 AS (SELECT *, CAST(floor(n/2.0) AS BIGINT) AS ncal FROM b
        |  WHERE n >= 4),
        |cal AS (SELECT user_id, abs(hw_resid) AS a,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY abs(hw_resid)) AS r
        |  FROM b2 WHERE rn <= ncal),
        |ks AS (SELECT user_id,
        |    CAST(ceil((ncal + 1) * (1.0 - 0.1)) AS BIGINT) AS k
        |  FROM (SELECT DISTINCT user_id, ncal FROM b2) x),
        |qh AS (SELECT ks.user_id,
        |    coalesce(a, CAST('infinity' AS DOUBLE)) AS qhat
        |  FROM ks LEFT JOIN cal
        |    ON cal.user_id = ks.user_id AND cal.r = ks.k)
        |SELECT b2.user_id, ts, value, hw_resid AS resid, qhat,
        |  CASE WHEN abs(hw_resid) > qhat THEN 1 ELSE 0 END AS is_anomaly
        |FROM b2 JOIN qh ON b2.user_id = qh.user_id
        |WHERE rn > ncal""".stripMargin,

    "q_hashcos" -> (hashVecSql +
      """
        |SELECT query_id, doc_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rank
        |FROM cos QUALIFY rank <= 10""".stripMargin),

    "q_retrieval_eval" -> (hashVecSql + bmRankSql +
      """,
        |truth AS (SELECT query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS r
        |  FROM cos QUALIFY r <= 5),
        |nrel AS (SELECT query_id, count(*) AS n_rel FROM truth
        |  GROUP BY query_id),
        |hitpos AS (SELECT t.query_id,
        |    coalesce(list(r.rank ORDER BY r.rank)
        |      FILTER (WHERE r.rank IS NOT NULL), []) AS rp
        |  FROM truth t LEFT JOIN bmrank r
        |    ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        |  GROUP BY t.query_id)
        |SELECT n.query_id, n_rel,
        |  round(CAST(len(list_filter(rp, p -> p <= 5)) AS DOUBLE) /
        |    CAST(n_rel AS DOUBLE), 6) AS recall_at_k,
        |  round(CASE WHEN len(rp) > 0
        |    THEN 1.0 / CAST(rp[1] AS DOUBLE) ELSE 0.0 END, 6) AS mrr,
        |  round(list_reduce(list_prepend(0.0,
        |      list_transform(list_filter(rp, p -> p <= 5),
        |        p -> 1.0 / (ln(CAST(p + 1 AS DOUBLE)) / ln(2.0)))),
        |      (a, b) -> a + b) /
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, least(n_rel, 5) + 1),
        |        p -> 1.0 / (ln(CAST(p + 1 AS DOUBLE)) / ln(2.0)))),
        |      (a, b) -> a + b), 6) AS ndcg_at_k
        |FROM nrel n JOIN hitpos h ON n.query_id = h.query_id""".stripMargin),

    "q_hybrid_search" -> (hashVecSql + bmRankSql +
      """,
        |cosrank AS (SELECT query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rank
        |  FROM cos QUALIFY rank <= 20),
        |fused AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
        |    coalesce(a.doc_id, b.doc_id) AS doc_id,
        |    round(coalesce(1.0/(60.0 + CAST(a.rank AS DOUBLE)), 0.0) +
        |          coalesce(1.0/(60.0 + CAST(b.rank AS DOUBLE)), 0.0), 9)
        |      AS rrf
        |  FROM bmrank a FULL OUTER JOIN cosrank b
        |    ON a.query_id = b.query_id AND a.doc_id = b.doc_id)
        |SELECT query_id, doc_id, rrf,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
        |FROM fused QUALIFY rank <= 5""".stripMargin),

    // Fixture oracles: model operators whose math is not SQL-expressible
    // are pinned by replaying committed sf0.01 parquet generated from the
    // golden-verified implementations (fixtures/README.md; regenerate via
    // graft.tools.GenFixtures after intentional behavior changes). Only
    // valid for the driver's sf0.01 correctness run.
    "q_shesd" -> fixtureSql("q_shesd"),
    "q_ewma" -> fixtureSql("q_ewma"),
    "q_cusum" -> fixtureSql("q_cusum"),
    "q_iforest" -> fixtureSql("q_iforest"),
    "q_pelt" -> fixtureSql("q_pelt"),
    "q_spectral" -> fixtureSql("q_spectral"),
    "q_unigram" -> fixtureSql("q_unigram"),
    "q_ensemble3" -> fixtureSql("q_ensemble3"),
    "q_unigram_tokens" -> fixtureSql("q_unigram_tokens"),
    "q_holtwinters" -> fixtureSql("q_holtwinters"),
    "q_matrix_profile" -> fixtureSql("q_matrix_profile"),
    "q_dtw" -> fixtureSql("q_dtw"),
    "q_ensemble2" -> fixtureSql("q_ensemble2"),
    "q_stem" -> fixtureSql("q_stem"),
    "q_bpe_merges" -> fixtureSql("q_bpe_merges"),
    "q_bpe_tokens" -> fixtureSql("q_bpe_tokens"),
    "q_ar" -> fixtureSql("q_ar"),
    "q_kmeans" -> fixtureSql("q_kmeans"),
    "q_ann_ivf" -> fixtureSql("q_ann_ivf"),
    "q_ann_ivf_q8" -> fixtureSql("q_ann_ivf_q8"),
    "q_bocpd" -> fixtureSql("q_bocpd"),
    "q_cp_flags" -> fixtureSql("q_cp_flags"),
    "q_kalman" -> fixtureSql("q_kalman"),
    "q_ci_flags" -> fixtureSql("q_ci_flags"),
    "q_bsts" -> fixtureSql("q_bsts"),
    "q_bsts_dummy" -> fixtureSql("q_bsts_dummy"),
    "q_gp" -> fixtureSql("q_gp"),
    "q_stl_exact" -> fixtureSql("q_stl_exact"),
    "q_hybrid" -> fixtureSql("q_hybrid"),
    "q_minhash" -> fixtureSql("q_minhash"),
    "q_simhash" -> fixtureSql("q_simhash"),
    "q_simhash_multi" -> fixtureSql("q_simhash_multi"),
    "q_sig_dedup" -> fixtureSql("q_sig_dedup"),
    "q_langid" -> fixtureSql("q_langid"),
    "q_winnow" -> fixtureSql("q_winnow"),
    "q_containment" -> fixtureSql("q_containment"),
    "q_corpus" ->
      """WITH q AS (SELECT doc_id, lang, text,
        |    length(text) AS len,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','and','of','to','in','is','it')))
        |      AS stop_hits
        |  FROM documents),
        |s AS (SELECT doc_id, lang, text,
        |    (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END
        |     + CASE WHEN CAST(len - n_tokens + 1 AS DOUBLE)/n_tokens
        |         BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
        |     + least(CAST(stop_hits AS DOUBLE)/n_tokens * 3.0, 0.3))
        |      AS quality_score
        |  FROM q),
        |g AS (SELECT * FROM s WHERE quality_score >= 0.5),
        |k AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text))
        |    AS keep_id FROM g),
        |d AS (SELECT doc_id, lang, quality_score, text FROM k
        |  WHERE doc_id = keep_id),
        |m AS (SELECT doc_id, lang, quality_score,
        |    len(string_split(text, ' ')) AS toks,
        |    ((doc_id % 2147483646) + 1) * 48271 % 2147483647 AS h
        |  FROM d
        |  WHERE ((doc_id % 2147483646) + 1) * 48271 % 2147483647
        |      % 1000000 <
        |    CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000
        |              WHEN 'es' THEN 500000 WHEN 'fr' THEN 250000
        |              WHEN 'zh' THEN 125000 ELSE 0 END),
        |c AS (SELECT doc_id, lang, quality_score, h % 8 AS shard,
        |    CAST(sum(toks) OVER (PARTITION BY h % 8 ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks
        |      AS BIGINT) AS strt
        |  FROM m)
        |SELECT doc_id, lang, round(quality_score, 6) AS quality_score,
        |  shard, CAST(strt // 256 AS BIGINT) AS seq_id,
        |  CAST(strt % 256 AS BIGINT) AS seq_offset
        |FROM c""".stripMargin,

    "q_mm_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents),
        |f AS (SELECT media_id, text, greatest(n // 4, 1) AS step,
        |    CAST(unnest(range(4)) AS INT) AS frame_idx
        |  FROM m)
        |SELECT media_id, frame_idx,
        |  substr(text, frame_idx * step + 1, 16) AS frame_str
        |FROM f
        |WHERE length(substr(text, frame_idx * step + 1, 16)) > 0""".stripMargin,

    "q_mm_audio" ->
      """WITH d AS (SELECT doc_id, 800 + doc_id % 800 AS n
        |  FROM documents),
        |u AS (SELECT doc_id, n, CAST(unnest(range(n)) AS BIGINT) AS i
        |  FROM d),
        |s AS (SELECT doc_id, n, i,
        |    ((doc_id * 31 + i * 17) % 256 - 128) * 256 AS v
        |  FROM u),
        |l AS (SELECT doc_id, n, i, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS channels,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / max(n)), 6) AS rms,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND (v >= 0) <> (pv >= 0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
        |  true AS decoded
        |FROM l GROUP BY doc_id""".stripMargin,

    "q_multimodal" -> fixtureSql("q_multimodal"),
    "q_mm_resize" -> fixtureSql("q_mm_resize"),
    "q_mm_decode" -> fixtureSql("q_mm_decode"),
    "q_mm_video" -> fixtureSql("q_mm_video"),
    "q_ann_pq" -> fixtureSql("q_ann_pq"),
    "q_ann_ivfpq" -> fixtureSql("q_ann_ivfpq"),
    "q_ann_lsh" -> fixtureSql("q_ann_lsh"),
    "q_ann_q8" -> fixtureSql("q_ann_q8"),
    "q_embed_neardup" -> fixtureSql("q_embed_neardup"),
    "q_semdedup" -> fixtureSql("q_semdedup"),

    "q_text_stats" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |    len(list_filter(regexp_split_to_array(text, '[^\p{L}\p{N}]+'),
        |        x -> x <> ''))
        |      + len(list_filter(regexp_split_to_array(text,
        |        '[\p{L}\p{N} \t\n\x0B\f\r]+'), x -> x <> '')) AS n_tokens_bpe
        |  FROM documents)
        |SELECT doc_id, CAST(len AS BIGINT) AS len,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_tokens_bpe AS BIGINT) AS n_tokens_bpe,
        |  round(CAST(len - n_tokens + 1 AS DOUBLE)/n_tokens, 6)
        |    AS avg_token_len
        |FROM d""".stripMargin
  )

  // ---- long oracle SQL bodies -------------------------------------------

  /** Shared CTE block: pred events (value>150) and truth events
    * (error & value>100), both gap=3 (merge iff srn - prev_ern <= 4). */
  private val eventCtes =
    """WITH b AS (SELECT user_id, ts, value, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events),
      |pf AS (SELECT *, CASE WHEN value > 150 THEN 1 ELSE 0 END AS flag FROM b),
      |p0 AS (SELECT user_id, ts, rn, rn - row_number() OVER
      |    (PARTITION BY user_id ORDER BY rn) AS isl FROM pf WHERE flag = 1),
      |p1 AS (SELECT user_id, isl, min(rn) AS srn, max(rn) AS ern,
      |    min(ts) AS sts FROM p0 GROUP BY user_id, isl),
      |p2 AS (SELECT *, CASE WHEN srn - lag(ern) OVER
      |    (PARTITION BY user_id ORDER BY srn) <= 4 THEN 0 ELSE 1 END AS ng
      |  FROM p1),
      |p3 AS (SELECT *, sum(ng) OVER (PARTITION BY user_id ORDER BY srn
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM p2),
      |pev AS (SELECT user_id, min(srn) AS start_rn, max(ern) AS end_rn,
      |    min(sts) AS start_ts FROM p3 GROUP BY user_id, grp),
      |tf AS (SELECT *, CASE WHEN event_type = 'error' AND value > 100
      |    THEN 1 ELSE 0 END AS tflag FROM b),
      |t0 AS (SELECT user_id, ts, rn, rn - row_number() OVER
      |    (PARTITION BY user_id ORDER BY rn) AS isl FROM tf WHERE tflag = 1),
      |t1 AS (SELECT user_id, isl, min(rn) AS srn, max(rn) AS ern,
      |    min(ts) AS sts FROM t0 GROUP BY user_id, isl),
      |t2 AS (SELECT *, CASE WHEN srn - lag(ern) OVER
      |    (PARTITION BY user_id ORDER BY srn) <= 4 THEN 0 ELSE 1 END AS ng
      |  FROM t1),
      |t3 AS (SELECT *, sum(ng) OVER (PARTITION BY user_id ORDER BY srn
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM t2),
      |tev AS (SELECT user_id, min(srn) AS start_rn, max(ern) AS end_rn,
      |    min(sts) AS start_ts FROM t3 GROUP BY user_id, grp)""".stripMargin

  private val eventMetricsSql = eventCtes +
    """,
      |np AS (SELECT user_id, count(*) AS n_pred_events FROM pev
      |  GROUP BY user_id),
      |nt AS (SELECT user_id, count(*) AS n_true_events FROM tev
      |  GROUP BY user_id),
      |tpp AS (SELECT user_id, count(*) AS tp FROM pev p
      |  WHERE EXISTS (SELECT 1 FROM tev t WHERE t.user_id = p.user_id
      |    AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn)
      |  GROUP BY user_id),
      |tpt AS (SELECT user_id, count(*) AS tp_true FROM tev t
      |  WHERE EXISTS (SELECT 1 FROM pev p WHERE p.user_id = t.user_id
      |    AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn)
      |  GROUP BY user_id),
      |ks AS (SELECT user_id FROM np UNION SELECT user_id FROM nt),
      |a AS (SELECT ks.user_id,
      |    CAST(coalesce(tp, 0) AS BIGINT) AS tp,
      |    CAST(coalesce(n_pred_events, 0) AS BIGINT) AS n_pred_events,
      |    CAST(coalesce(n_true_events, 0) AS BIGINT) AS n_true_events,
      |    CAST(coalesce(tp_true, 0) AS BIGINT) AS tp_true
      |  FROM ks LEFT JOIN np USING (user_id) LEFT JOIN nt USING (user_id)
      |  LEFT JOIN tpp USING (user_id) LEFT JOIN tpt USING (user_id))
      |SELECT user_id, tp, n_pred_events - tp AS fp,
      |  n_true_events - tp_true AS fn, n_pred_events, n_true_events,
      |  round(tp/(n_pred_events + 1e-9), 6) AS precision,
      |  round(tp_true/(n_true_events + 1e-9), 6) AS recall,
      |  round(2*(tp/(n_pred_events + 1e-9))*(tp_true/(n_true_events + 1e-9)) /
      |    ((tp/(n_pred_events + 1e-9)) + (tp_true/(n_true_events + 1e-9))
      |     + 1e-9), 6) AS f1
      |FROM a""".stripMargin

  private val leaderboardSql =
    """WITH models AS (SELECT * FROM (VALUES (150.0, 'T150'),
      |    (200.0, 'T200')) m(th, model)),
      |b AS (SELECT user_id, ts, value, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events WHERE user_id IS NOT NULL),
      |pf AS (SELECT b.user_id, b.rn, m.model,
      |    CASE WHEN b.value > m.th THEN 1 ELSE 0 END AS fl
      |  FROM b CROSS JOIN models m),
      |p0 AS (SELECT model, user_id, rn, rn - row_number() OVER
      |    (PARTITION BY model, user_id ORDER BY rn) AS isl
      |  FROM pf WHERE fl = 1),
      |p1 AS (SELECT model, user_id, isl, min(rn) AS srn, max(rn) AS ern
      |  FROM p0 GROUP BY model, user_id, isl),
      |p2 AS (SELECT *, CASE WHEN srn - lag(ern) OVER
      |    (PARTITION BY model, user_id ORDER BY srn) <= 4
      |    THEN 0 ELSE 1 END AS ng FROM p1),
      |p3 AS (SELECT *, sum(ng) OVER (PARTITION BY model, user_id
      |    ORDER BY srn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS grp FROM p2),
      |pev AS (SELECT model, user_id, min(srn) AS start_rn,
      |    max(ern) AS end_rn FROM p3 GROUP BY model, user_id, grp),
      |tf AS (SELECT *, CASE WHEN event_type = 'error' AND value > 100
      |    THEN 1 ELSE 0 END AS tflag FROM b),
      |t0 AS (SELECT user_id, rn, rn - row_number() OVER
      |    (PARTITION BY user_id ORDER BY rn) AS isl FROM tf
      |  WHERE tflag = 1),
      |t1 AS (SELECT user_id, isl, min(rn) AS srn, max(rn) AS ern FROM t0
      |  GROUP BY user_id, isl),
      |t2 AS (SELECT *, CASE WHEN srn - lag(ern) OVER
      |    (PARTITION BY user_id ORDER BY srn) <= 4 THEN 0 ELSE 1 END AS ng
      |  FROM t1),
      |t3 AS (SELECT *, sum(ng) OVER (PARTITION BY user_id ORDER BY srn
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM t2),
      |tev AS (SELECT user_id, min(srn) AS start_rn, max(ern) AS end_rn
      |  FROM t3 GROUP BY user_id, grp),
      |agg AS (SELECT m.model,
      |    (SELECT count(*) FROM pev p WHERE p.model = m.model) AS np,
      |    (SELECT count(*) FROM pev p WHERE p.model = m.model AND EXISTS
      |      (SELECT 1 FROM tev t WHERE t.user_id = p.user_id
      |        AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn))
      |      AS tp,
      |    (SELECT count(*) FROM tev) AS nt,
      |    (SELECT count(*) FROM tev t WHERE EXISTS
      |      (SELECT 1 FROM pev p WHERE p.model = m.model
      |        AND p.user_id = t.user_id AND p.start_rn <= t.end_rn
      |        AND p.end_rn >= t.start_rn)) AS tpt
      |  FROM models m)
      |SELECT model AS Model, 'events' AS Dataset,
      |  round(2*(tp/(np + 1e-9))*(tpt/(nt + 1e-9)) /
      |    ((tp/(np + 1e-9)) + (tpt/(nt + 1e-9)) + 1e-9), 6) AS Event_F1,
      |  round(tp/(np + 1e-9), 6) AS Precision,
      |  round(tpt/(nt + 1e-9), 6) AS Recall
      |FROM agg""".stripMargin

  private val latencySql = eventCtes +
    """
      |SELECT t.user_id, t.start_rn AS true_start_rn,
      |  t.start_ts AS true_start_ts, min(p.start_ts) AS first_pred_ts,
      |  round((epoch_us(min(p.start_ts)) - epoch_us(t.start_ts))/60000000.0, 6)
      |    AS latency_minutes
      |FROM tev t JOIN pev p ON p.user_id = t.user_id
      |  AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn
      |GROUP BY t.user_id, t.start_rn, t.start_ts""".stripMargin

  private val businessSql = eventCtes +
    """,
      |span AS (SELECT user_id,
      |    (epoch_us(max(ts)) - epoch_us(min(ts)))/86400000000.0
      |      AS duration_days
      |  FROM events GROUP BY user_id),
      |fpe AS (SELECT user_id, count(*) AS fp_count FROM pev p
      |  WHERE NOT EXISTS (SELECT 1 FROM tev t WHERE t.user_id = p.user_id
      |    AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn)
      |  GROUP BY user_id),
      |lat AS (SELECT user_id, median(latency_minutes)
      |    AS median_latency_minutes
      |  FROM (SELECT t.user_id, t.start_rn,
      |      (epoch_us(min(p.start_ts)) - epoch_us(t.start_ts))/60000000.0
      |        AS latency_minutes
      |    FROM tev t JOIN pev p ON p.user_id = t.user_id
      |      AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn
      |    GROUP BY t.user_id, t.start_rn, t.start_ts) q
      |  GROUP BY user_id)
      |SELECT span.user_id, round(span.duration_days, 6) AS duration_days,
      |  CAST(coalesce(fpe.fp_count, 0) AS BIGINT) AS fp_count,
      |  round(coalesce(fpe.fp_count, 0)/span.duration_days, 6) AS fp_per_day,
      |  round(lat.median_latency_minutes, 6) AS median_latency_minutes
      |FROM span LEFT JOIN fpe USING (user_id) LEFT JOIN lat USING (user_id)""".stripMargin

  private val sweepCtes =
    """WITH b AS (SELECT user_id, ts, value, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events),
      |st AS (SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd
      |  FROM events GROUP BY user_id),
      |z AS (SELECT b.user_id, b.ts, b.rn,
      |    abs(b.value - st.mu)/(st.sd + 1e-9) AS z,
      |    CASE WHEN b.event_type = 'error' AND b.value > 100
      |         THEN 1 ELSE 0 END AS tflag
      |  FROM b JOIN st USING (user_id)),
      |grid AS (SELECT 2.0 + 0.5*i AS k FROM range(17) t(i)),
      |f AS (SELECT z.user_id, z.ts, z.rn, grid.k,
      |    CASE WHEN z.z > grid.k THEN 1 ELSE 0 END AS fl
      |  FROM z CROSS JOIN grid),
      |pi AS (SELECT *, rn - row_number() OVER
      |    (PARTITION BY user_id, k, fl ORDER BY rn) AS isl FROM f),
      |pc AS (SELECT *, count(*) OVER
      |    (PARTITION BY user_id, k, fl, isl) AS rl FROM pi),
      |pff AS (SELECT user_id, ts, rn, k,
      |    CASE WHEN fl = 1 AND rl >= 2 THEN 1 ELSE 0 END AS fp2 FROM pc),
      |rates AS (SELECT user_id, k, avg(fp2) AS rate FROM pff
      |  GROUP BY user_id, k),
      |pe0 AS (SELECT user_id, k, rn, rn - row_number() OVER
      |    (PARTITION BY user_id, k ORDER BY rn) AS isl
      |  FROM pff WHERE fp2 = 1),
      |pe1 AS (SELECT user_id, k, min(rn) AS srn, max(rn) AS ern
      |  FROM pe0 GROUP BY user_id, k, isl),
      |pe2 AS (SELECT *, CASE WHEN srn - lag(ern) OVER
      |    (PARTITION BY user_id, k ORDER BY srn) <= 4 THEN 0 ELSE 1 END AS ng
      |  FROM pe1),
      |pe3 AS (SELECT *, sum(ng) OVER (PARTITION BY user_id, k ORDER BY srn
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM pe2),
      |pev AS (SELECT user_id, k, min(srn) AS start_rn, max(ern) AS end_rn
      |  FROM pe3 GROUP BY user_id, k, grp),
      |te0 AS (SELECT user_id, rn, rn - row_number() OVER
      |    (PARTITION BY user_id ORDER BY rn) AS isl FROM z WHERE tflag = 1),
      |te1 AS (SELECT user_id, min(rn) AS srn, max(rn) AS ern FROM te0
      |  GROUP BY user_id, isl),
      |te2 AS (SELECT *, CASE WHEN srn - lag(ern) OVER
      |    (PARTITION BY user_id ORDER BY srn) <= 4 THEN 0 ELSE 1 END AS ng
      |  FROM te1),
      |te3 AS (SELECT *, sum(ng) OVER (PARTITION BY user_id ORDER BY srn
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM te2),
      |tev0 AS (SELECT user_id, min(srn) AS start_rn, max(ern) AS end_rn
      |  FROM te3 GROUP BY user_id, grp),
      |tev AS (SELECT t.user_id, grid.k, t.start_rn, t.end_rn
      |  FROM tev0 t CROSS JOIN grid),
      |np AS (SELECT user_id, k, count(*) AS n_pred FROM pev
      |  GROUP BY user_id, k),
      |nt AS (SELECT user_id, k, count(*) AS n_true FROM tev
      |  GROUP BY user_id, k),
      |tpp AS (SELECT user_id, k, count(*) AS tp FROM pev p
      |  WHERE EXISTS (SELECT 1 FROM tev t WHERE t.user_id = p.user_id
      |    AND t.k = p.k AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn)
      |  GROUP BY user_id, k),
      |tpt AS (SELECT user_id, k, count(*) AS tp_true FROM tev t
      |  WHERE EXISTS (SELECT 1 FROM pev p WHERE p.user_id = t.user_id
      |    AND p.k = t.k AND p.start_rn <= t.end_rn AND p.end_rn >= t.start_rn)
      |  GROUP BY user_id, k),
      |ks2 AS (SELECT user_id, k FROM np UNION SELECT user_id, k FROM nt),
      |f1s AS (SELECT ks2.user_id, ks2.k,
      |    2*(coalesce(tp,0)/(coalesce(n_pred,0)+1e-9))
      |     *(coalesce(tp_true,0)/(coalesce(n_true,0)+1e-9)) /
      |    ((coalesce(tp,0)/(coalesce(n_pred,0)+1e-9))
      |     + (coalesce(tp_true,0)/(coalesce(n_true,0)+1e-9)) + 1e-9) AS f1
      |  FROM ks2 LEFT JOIN np USING (user_id, k)
      |  LEFT JOIN nt USING (user_id, k)
      |  LEFT JOIN tpp USING (user_id, k) LEFT JOIN tpt USING (user_id, k)),
      |cand AS (SELECT r.user_id, r.k, r.rate, coalesce(f1s.f1, 0.0) AS f1
      |  FROM rates r LEFT JOIN f1s USING (user_id, k)
      |  WHERE r.rate <= 0.10)
      |""".stripMargin

  private val sweepSql = sweepCtes +
    """SELECT user_id, k AS best_k, round(f1, 6) AS best_f1,
      |  round(rate, 6) AS rate
      |FROM cand
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY f1 DESC, k ASC) = 1""".stripMargin

  private val sweepCurveSql = sweepCtes +
    """SELECT user_id, k, round(f1, 6) AS f1, round(rate, 6) AS rate
      |FROM cand""".stripMargin

  private val labelWindowsSql =
    """WITH s AS (SELECT user_id, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events),
      |n AS (SELECT user_id, max(rn) AS n FROM s GROUP BY user_id),
      |l AS (SELECT user_id, ts + INTERVAL 1 SECOND AS lts FROM events
      |  WHERE value > 300),
      |a AS (SELECT l.user_id, coalesce(min(s.rn), min(n.n) + 1) AS anchor
      |  FROM l JOIN n USING (user_id)
      |  LEFT JOIN s ON s.user_id = l.user_id AND s.ts >= l.lts
      |  GROUP BY l.user_id, l.lts)
      |SELECT s.user_id, s.ts,
      |  CASE WHEN EXISTS (SELECT 1 FROM a WHERE a.user_id = s.user_id
      |    AND s.rn BETWEEN a.anchor - 3 AND a.anchor + 3)
      |  THEN 1 ELSE 0 END AS is_anomaly
      |FROM s""".stripMargin

  /** Hashed-TF vector CTEs shared by q_hashcos / q_hybrid_search: the
    * portable q_rollhash polynomial buckets terms into a dense
    * 64-vector (grid left-join fills the zeros so the fold order is
    * the full bucket axis — exactly the Spark zip_with fold), then
    * exact cosine of the doc_id < 5 query block against every doc.
    * Ends INSIDE the WITH list (no trailing comma): consumers append
    * either the final SELECT or further CTEs prefixed with ",". */
  private val hashVecSql =
    """WITH hwords AS (SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS term FROM documents),
      |htb AS (SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(term, ''),
      |        c -> ascii(c)::BIGINT)),
      |      (a, b) -> (a * 1000003 + b) % 2147483647) % 64 AS b
      |  FROM hwords),
      |hdv AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS c
      |  FROM htb GROUP BY doc_id, b),
      |hgrid AS (SELECT d.doc_id, g.b
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) g),
      |hdense AS (SELECT hgrid.doc_id, hgrid.b,
      |    coalesce(hdv.c, 0.0) AS c
      |  FROM hgrid LEFT JOIN hdv
      |    ON hgrid.doc_id = hdv.doc_id AND hgrid.b = hdv.b),
      |hvecs AS (SELECT doc_id, list(c ORDER BY b) AS v
      |  FROM hdense GROUP BY doc_id),
      |hnorms AS (SELECT doc_id, v,
      |    sqrt(list_reduce(list_prepend(0.0,
      |      list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
      |  FROM hvecs),
      |cos AS (SELECT q.doc_id AS query_id, d.doc_id AS doc_id,
      |    round(list_reduce(list_prepend(0.0,
      |        list_transform(range(1, 65), i -> q.v[i] * d.v[i])),
      |      (a, b) -> a + b) / (q.nrm * d.nrm), 6) AS cosine
      |  FROM hnorms d CROSS JOIN
      |    (SELECT * FROM hnorms WHERE doc_id < 5) q)""".stripMargin

  /** BM25 top-20 rank-table CTEs (the q_bm25 formula verbatim) shared
    * by q_hybrid_search / q_retrieval_eval. Starts with "," (appends
    * to an open WITH list) and ends inside it. */
  private val bmRankSql =
    """,
      |bmwords AS (SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS term FROM documents),
      |bmtf AS (SELECT doc_id, term, count(*) AS tf FROM bmwords
      |  GROUP BY doc_id, term),
      |bmdl AS (SELECT doc_id, sum(tf) AS dl FROM bmtf GROUP BY doc_id),
      |bmdf AS (SELECT term, count(*) AS df FROM bmtf GROUP BY term),
      |bmstats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM bmdl),
      |bmqt AS (SELECT DISTINCT doc_id AS query_id, term FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |   FROM documents WHERE doc_id < 5) x),
      |bmc AS (SELECT query_id, bmtf.doc_id, bmqt.term,
      |    ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) /
      |              (CAST(df AS DOUBLE) + 0.5)) *
      |    (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
      |     (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
      |        0.75 * CAST(dl AS DOUBLE) / avgdl))) AS contrib
      |  FROM bmqt JOIN bmtf ON bmqt.term = bmtf.term
      |    JOIN bmdl ON bmtf.doc_id = bmdl.doc_id
      |    JOIN bmdf ON bmqt.term = bmdf.term CROSS JOIN bmstats),
      |bmscored AS (SELECT query_id, doc_id,
      |    round(list_reduce(list_prepend(0.0,
      |        list_transform(list(contrib ORDER BY term), x -> x)),
      |      (a, b) -> a + b), 6) AS bm25
      |  FROM bmc GROUP BY query_id, doc_id),
      |bmrank AS (SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM bmscored QUALIFY rank <= 20)""".stripMargin

  /** Fixture-oracle SQL (committed sf0.01 parquet, fixtures/README.md). */
  private def fixtureSql(name: String): String =
    s"SELECT * FROM read_parquet('/root/repo/fixtures/sf0.01/$name.parquet/*.parquet')"

  /** QQ diagnostic oracle: Filliben plotting positions + Acklam probit,
    * the SAME polynomial nesting as Metrics.probit so doubles agree. */
  private val qqSql =
    """WITH c AS (SELECT user_id,
      |    value - avg(value) OVER (PARTITION BY user_id) AS resid
      |  FROM events),
      |r AS (SELECT user_id, resid,
      |    row_number() OVER (PARTITION BY user_id ORDER BY resid) AS qi,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM c),
      |m AS (SELECT user_id, qi, resid,
      |    CASE WHEN qi = 1 THEN 1.0 - pow(0.5, 1.0/n)
      |         WHEN qi = n THEN pow(0.5, 1.0/n)
      |         ELSE (qi - 0.3175)/(n + 0.365) END AS p
      |  FROM r),
      |q AS (SELECT user_id, qi, resid, p,
      |    (p - 0.5) AS qc, (p - 0.5)*(p - 0.5) AS rc,
      |    sqrt(-2*ln(p)) AS ql, sqrt(-2*ln(1 - p)) AS qh
      |  FROM m)
      |SELECT user_id, CAST(qi AS BIGINT) AS qi,
      |  round(CASE WHEN p < 0.02425 THEN
      |      ((((( -7.784894002430293e-03*ql + -3.223964580411365e-01)*ql
      |        + -2.400758277161838e+00)*ql + -2.549732539343734e+00)*ql
      |        + 4.374664141464968e+00)*ql + 2.938163982698783e+00)
      |      / ((((7.784695709041462e-03*ql + 3.224671290700398e-01)*ql
      |        + 2.445134137142996e+00)*ql + 3.754408661907416e+00)*ql
      |        + 1.0)
      |    WHEN p > 1 - 0.02425 THEN
      |      0.0 - ((((( -7.784894002430293e-03*qh + -3.223964580411365e-01)*qh
      |        + -2.400758277161838e+00)*qh + -2.549732539343734e+00)*qh
      |        + 4.374664141464968e+00)*qh + 2.938163982698783e+00)
      |      / ((((7.784695709041462e-03*qh + 3.224671290700398e-01)*qh
      |        + 2.445134137142996e+00)*qh + 3.754408661907416e+00)*qh
      |        + 1.0)
      |    ELSE
      |      ((((( -3.969683028665376e+01*rc + 2.209460984245205e+02)*rc
      |        + -2.759285104469687e+02)*rc + 1.383577518672690e+02)*rc
      |        + -3.066479806614716e+01)*rc + 2.506628277459239e+00) * qc
      |      / ((((( -5.447609879822406e+01*rc + 1.615858368580409e+02)*rc
      |        + -1.556989798598866e+02)*rc + 6.680131188771972e+01)*rc
      |        + -1.328068155288572e+01)*rc + 1.0)
      |    END, 6) AS theoretical_q,
      |  round(resid, 9) + 0.0 AS sample_q
      |FROM q""".stripMargin

  private val acfSql = {
    val lags = 1 to 50
    val one = (k: Int) =>
      s"""SELECT user_id, $k AS lag,
         |  round(corr(value, l$k), 6) + 0.0 AS acf
         |FROM L WHERE l$k IS NOT NULL GROUP BY user_id""".stripMargin
    "WITH L AS (SELECT user_id, ts, value,\n  " +
      lags.map(k => s"lag(value, $k) OVER w AS l$k").mkString(",\n  ") +
      "\nFROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))\n" +
      lags.map(one).mkString("\nUNION ALL\n")
  }
}
