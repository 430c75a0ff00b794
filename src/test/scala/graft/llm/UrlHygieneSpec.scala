package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** URL hygiene tier: normalization, eTLD+1, blocklist, domain cap. */
class UrlHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(UrlHygiene.normalizeUrl(col("u")))
      .collect().head.getString(0)

  private def dom(u: String): String =
    Seq(u).toDF("u")
      .select(UrlHygiene.registrableDomain(UrlHygiene.normalizeUrl(col("u"))))
      .collect().head.getString(0)

  test("normalization: case, ports, www, fragment, trackers, slashes") {
    assert(norm("HTTPS://WWW.Example.COM/Path/One") ===
      "https://example.com/Path/One")
    assert(norm("http://example.com:80/a") === "http://example.com/a")
    assert(norm("https://example.com:443/a") === "https://example.com/a")
    assert(norm("https://example.com:8080/a") ===
      "https://example.com:8080/a") // non-default port survives
    // default-port stripping is scheme-conditional: these are real,
    // distinct origins and must keep their ports
    assert(norm("http://example.com:443/a") ===
      "http://example.com:443/a")
    assert(norm("https://example.com:80/a") ===
      "https://example.com:80/a")
    assert(norm("https://example.com/a#section-2") ===
      "https://example.com/a")
    assert(norm("https://example.com/a?utm_source=x&ref=keep&utm_id=9") ===
      "https://example.com/a?ref=keep")
    assert(norm("https://example.com/a?utm_source=x&gclid=1") ===
      "https://example.com/a") // emptied query drops its '?'
    assert(norm("https://example.com/a///") === "https://example.com/a")
    assert(norm("https://example.com") === "https://example.com/")
    assert(norm("https://example.com/") === "https://example.com/")
    // path + query case preserved, only scheme/host folded
    assert(norm("HTTP://ExAmple.Com/CaSe?Q=UpPer") ===
      "http://example.com/CaSe?Q=UpPer")
  }

  test("registrable domain: eTLD+1 with multi-label suffixes") {
    assert(dom("https://a.b.example.co.uk/x") === "example.co.uk")
    assert(dom("https://news.example.com/x") === "example.com")
    assert(dom("https://example.com/x") === "example.com")
    assert(dom("https://www.example.org.uk/x") === "example.org.uk")
    assert(dom("https://localhost/x") === "localhost")
    assert(dom("https://deep.sub.site.example.com/x") === "example.com")
  }

  test("suffix set is resource-backed: entries beyond the old mini set") {
    // co.nz / gob.mx / com.sg were NOT in the pre-r13 hard-coded
    // 9-entry set — they resolve correctly only because the lookup now
    // reads graft/public_suffixes.txt (the data-file-swap contract)
    assert(dom("https://a.b.example.co.nz/x") === "example.co.nz")
    assert(dom("https://www.tramites.gob.mx/x") === "tramites.gob.mx")
    assert(dom("https://shop.example.com.sg/x") === "example.com.sg")
    // a host ON a multi-label suffix with no third label is returned
    // whole (too few labels to form eTLD+1)
    assert(dom("https://co.nz/x") === "co.nz")
    // sanity: the resource loaded a real set, not a stub
    assert(UrlHygiene.multiSuffixes.size > 100)
    assert(UrlHygiene.multiSuffixes.contains("co.uk"))
  }

  test("the q_url oracle SQL is GENERATED from the same resource set") {
    // the DuckDB side must agree with the engine on every suffix —
    // a hardcoded oracle copy would silently diverge on a data-file
    // swap (suffixes beyond the pre-r13 hard-coded 9 must be present)
    val sql = graft.SparkEntry.oracleSql("q_url")
    assert(!sql.contains("__MULTI_SUFFIXES__"), "placeholder unreplaced")
    assert(sql.contains("'gov.uk'") && sql.contains("'co.nz'") &&
      sql.contains("'gob.mx'"))
    assert(UrlHygiene.multiSuffixes.forall(x => sql.contains(s"'$x'")))
  }

  test("hygiene: blocklist drop + deterministic per-domain cap") {
    val rows = Seq(
      (1L, "https://a.example.com/1"),
      (2L, "https://b.example.com/2"),
      (3L, "https://WWW.example.com/3"),
      (4L, "https://c.example.com/4"),
      (5L, "https://blocked.org/5"),
      (6L, "https://sub.blocked.org/6"),
      (7L, "https://other.net/7")).toDF("doc_id", "url")
    val out = UrlHygiene.hygiene(rows, "url", "doc_id",
        Seq("blocked.org"), cap = 3)
      .select("doc_id", "domain", "domain_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // blocked.org rows (5, 6) gone; example.com capped to ids 1..3
    assert(out === Set((1L, "example.com", 1L),
      (2L, "example.com", 2L), (3L, "example.com", 3L),
      (7L, "other.net", 1L)))
  }

  test("cap keeps the smallest order values, not arbitrary rows") {
    val rows = (10 to 1 by -1).map(i =>
      (i.toLong, s"https://x$i.same.com/p")).toDF("doc_id", "url")
    val kept = UrlHygiene.hygiene(rows, "url", "doc_id", Nil, cap = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("hygiene is repartition-invariant") {
    val rows = (1 to 50).map(i =>
      (i.toLong, s"https://h${i % 7}.dom${i % 3}.com/p$i")).toDF("doc_id", "url")
    val a = UrlHygiene.hygiene(rows, "url", "doc_id", Seq("dom0.com"), 5)
      .select("doc_id", "domain", "domain_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = UrlHygiene.hygiene(rows.repartition(9), "url", "doc_id",
        Seq("dom0.com"), 5)
      .select("doc_id", "domain", "domain_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
