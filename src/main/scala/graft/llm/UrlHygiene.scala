package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain hygiene — the first stage of the web-scale corpus
  * pipelines (RefinedWeb §3.1 "URL filtering", Gopher/FineWeb crawl
  * curation): canonicalize URLs, extract the registrable domain
  * (eTLD+1), drop blocklisted domains, and cap documents per domain so
  * no single site dominates the mixture.
  *
  * Everything before the per-domain cap is PURE column expressions in
  * the Java-regex ∩ RE2 subset (codegen'd, map-only, runs inside the
  * scan stage); the cap is ONE window over the domain key — the only
  * exchange in the tier. At 100 TB the same shape holds: normalization
  * rides the scan, and the cap's shuffle is keyed by domain (skewed
  * mega-domains are exactly the rows the cap discards, so the window
  * can be pre-filtered by an approximate count if a domain exceeds the
  * cap by orders of magnitude).
  *
  * Normalization rules (each one oracle-mirrored):
  *  - scheme and host lowercased; path/query case PRESERVED;
  *  - fragment stripped; default ports stripped scheme-conditionally
  *    (:80 for http, :443 for https — http://h:443 keeps its port);
  *  - a leading `www.` stripped from the host;
  *  - tracking params removed (`utm_*`, `fbclid`, `gclid`) while real
  *    params survive; an emptied query string drops its `?`;
  *  - trailing slashes collapsed off the path (root stays `/`... and
  *    an empty path becomes `/`).
  *
  * eTLD+1 loads its multi-label public-suffix set from the bundled
  * resource `graft/public_suffixes.txt` (one suffix per line, `#`
  * comments) — a curated subset of the public suffix list
  * (publicsuffix.org). Swapping in the FULL list is a data-file
  * change only: the lookup compiles to a set-membership test on the
  * host's last two labels (Catalyst turns a large literal IN into an
  * O(1) hash-set `InSet`), so list size never changes the plan shape.
  */
object UrlHygiene {

  /** Multi-label public suffixes recognized by [[registrableDomain]] —
    * loaded once from the classpath resource (driver-side, plan
    * literal; ~200 entries here, ~9k for the full public list). */
  val multiSuffixes: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffixes.txt")
    require(in != null, "resource graft/public_suffixes.txt missing")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .toVector
    } finally in.close()
  }

  private val trackerRe = "^(utm_[^=]*|fbclid|gclid)="

  /** Canonical form of a raw URL (see rules above). Default-port
    * stripping is SCHEME-conditional (:80 for http, :443 for https) —
    * `http://h:443` is a distinct origin and keeps its port. */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostPort = when(scheme === "http",
        regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val host = regexp_replace(hostPort, "^www\\.", "")
    val pathRaw = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path0 = regexp_replace(pathRaw, "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qs = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = filter(split(qs, "&"), p => !p.rlike(trackerRe))
    val qPart = when(length(qs) > 0 && size(kept) > 0 &&
        array_join(kept, "&") =!= "",
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, qPart)
  }

  /** Host component of a normalized URL. */
  def hostOf(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)

  /** Registrable domain (eTLD+1) of a normalized URL's host: the
    * public suffix plus one label — `a.b.example.co.uk` →
    * `example.co.uk`, `sub.example.com` → `example.com`; a host with
    * too few labels is returned whole. */
  def registrableDomain(urlNorm: Column): Column = {
    val labels = split(hostOf(urlNorm), "\\.")
    val n = size(labels)
    val last2 = concat(element_at(labels, -2), lit("."),
      element_at(labels, -1))
    // set membership, NOT an OR-chain: Catalyst converts a >10-item
    // IN to an O(1) hash-set InSet, and an OR-chain of hundreds of
    // comparisons overflows janino's 64KB codegen method limit
    // (whole-stage codegen falls back to interpreted mode)
    val isMulti = last2.isin(multiSuffixes: _*)
    when(n <= 2, hostOf(urlNorm))
      .when(isMulti && n >= 3,
        concat(element_at(labels, -3), lit("."), last2))
      .otherwise(last2)
  }

  /** Full hygiene pass: normalize, extract domain, drop blocklisted
    * domains, keep at most `cap` docs per domain (deterministic: the
    * `cap` smallest `orderCol` values win). Adds `url_norm`, `domain`,
    * `domain_rank` (1-based within domain). */
  def hygiene(df: DataFrame, urlCol: String, orderCol: String,
              blockedDomains: Seq[String], cap: Int): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    val base = df
      .withColumn("url_norm", normalizeUrl(col(urlCol)))
      .withColumn("domain", registrableDomain(col("url_norm")))
    val blocked: Column = if (blockedDomains.isEmpty) lit(false)
      else blockedDomains.map(d => col("domain") === lit(d)).reduce(_ || _)
    base.filter(!blocked)
      .withColumn("domain_rank",
        row_number().over(
          Window.partitionBy("domain").orderBy(col(orderCol))).cast("long"))
      .filter(col("domain_rank") <= cap)
  }
}
