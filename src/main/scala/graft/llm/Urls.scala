package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-layer URL/domain operators (north-star extension): the layer
  * every web corpus actually starts from — URL normalization,
  * registrable-domain extraction over a frozen public-suffix snippet,
  * domain blocklists, per-domain stats. Everything is projection-level
  * column arithmetic (regex in the Java-regex ∩ RE2 common subset, so
  * the oracle replays the identical pattern text) plus at most one
  * broadcast join for the blocklist — trivially 100 TB-safe: URLs never
  * shuffle, only per-domain aggregates do.
  */
object Urls {

  /** Frozen public-suffix snippet (a deterministic stand-in for the full
    * publicsuffix.org list — same matching rule: LONGEST listed suffix
    * wins; the list is a build-time constant both engines carry as
    * literals). Multi-label entries must precede their single-label
    * parents at match time; [[suffixOrdered]] enforces that ordering.
    */
  val publicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "github.io", "blogspot.com",
    "com", "org", "net", "edu", "gov", "io", "uk", "au", "de", "fr", "jp")

  /** Match order: more labels first, then longer, then lexicographic —
    * the longest-match rule as a deterministic total order.
    */
  private def suffixOrdered: Seq[String] =
    publicSuffixes.sortBy(s => (-s.count(_ == '.'), -s.length, s))

  // ---- URL part extraction (fragment-stripped input) ----------------

  private def noFragment(u: Column): Column = regexp_replace(u, "#.*", "")
  private def schemeOf(nf: Column): Column =
    lower(regexp_extract(nf, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
  private def afterScheme(nf: Column): Column =
    regexp_replace(nf, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
  private def hostPort(rest: Column): Column = regexp_extract(rest, "^([^/?]*)", 1)

  /** Lowercased host of a URL (port stripped, fragment ignored). */
  def hostOf(u: Column): Column =
    lower(regexp_replace(hostPort(afterScheme(noFragment(u))), ":[0-9]+$", ""))

  /** Canonical URL form, the dedup/join key of crawl processing:
    * lowercased scheme and host, default ports dropped (http:80,
    * https:443), trailing path slashes removed (so `/a/` == `/a` and a
    * bare `/` == no path), query parameters sorted with empties dropped,
    * fragment removed. Pure single-pass column arithmetic.
    */
  def normalizeUrl(u: Column): Column = {
    val nf = noFragment(u)
    val scheme = schemeOf(nf)
    val rest = afterScheme(nf)
    val hp = hostPort(rest)
    val pq = regexp_replace(rest, "^[^/?]*", "")
    val host = lower(regexp_replace(hp, ":[0-9]+$", ""))
    val port = regexp_extract(hp, ":([0-9]+)$", 1)
    val portNorm = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_extract(pq, "^([^?]*)", 1), "/+$", "")
    val params = array_sort(filter(split(
      regexp_extract(pq, "^[^?]*\\?(.*)$", 1), "&"), x => x =!= ""))
    val qNorm = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    // a scheme-less input ("example.com/a") canonicalizes WITHOUT the
    // "://" glue — emitting "://example.com/a" would bucket every
    // scheme-less URL under a malformed join key
    val schemePart = when(scheme === "", lit("")).otherwise(concat(scheme, lit("://")))
    concat(schemePart, host, portNorm, path, qNorm)
  }

  /** Registrable ("eTLD+1") domain of a lowercased host: one label plus
    * the longest matching public suffix; a host that IS a bare suffix has
    * no registrable domain (NULL); an unlisted TLD falls back to the last
    * two labels (the publicsuffix `*` default rule). Generated as a
    * when-chain over the frozen snippet — [[registrableDomainSqlCase]]
    * emits the same decision chain as DuckDB SQL from the same list, so
    * there is exactly one matching order to drift.
    */
  def registrableDomain(host: Column): Column = {
    // bare-suffix check FIRST: a host that IS a listed suffix must not
    // fall through to a shorter suffix it happens to end with
    // ("github.io" ends with ".io")
    val chain = suffixOrdered.foldLeft(
        when(host.isin(publicSuffixes: _*), lit(null).cast("string"))) { (acc, s) =>
      val esc = s.replace(".", "\\.")
      acc.when(host.endsWith("." + s),
        concat(regexp_extract(host, "([^.]+)\\." + esc + "$", 1), lit("." + s)))
    }
    chain
      .when(host.rlike("\\."), regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
      // an unparseable URL extracts host '' — that is NOT a registrable
      // domain; mapping it to NULL keeps the documented NULL-domain
      // contract (blocklists, domainStats) applying to malformed URLs
      // instead of grouping them under an empty-string domain
      .when(host === "", lit(null).cast("string"))
      .otherwise(host)
  }

  /** The DuckDB CASE expression computing [[registrableDomain]] over the
    * SQL expression `hostExpr` — generated from the same frozen list and
    * ordering as the Column chain (the single-source-of-truth contract).
    */
  def registrableDomainSqlCase(hostExpr: String): String = {
    val whens = suffixOrdered.map { s =>
      val esc = s.replace(".", "\\.")
      s"WHEN $hostExpr LIKE '%.$s' THEN regexp_extract($hostExpr, '([^.]+)\\.$esc$$', 1) || '.$s'"
    }
    val bare = publicSuffixes.map(s => s"'$s'").mkString(", ")
    (s"CASE WHEN $hostExpr IN ($bare) THEN NULL " +
      s"${whens.mkString(" ")} " +
      s"WHEN $hostExpr LIKE '%.%' THEN regexp_extract($hostExpr, '([^.]+\\.[^.]+)$$', 1) " +
      s"WHEN $hostExpr = '' THEN NULL " +
      s"ELSE $hostExpr END")
  }

  /** Resolve an href against its page URL (the crawl-frontier step
    * between [[graft.llm.Html.linkCount]] and the per-domain edge
    * stats): any href CARRYING A SCHEME passes through — `scheme:` not
    * `scheme://`, so non-hierarchical URIs (mailto:, tel:, javascript:,
    * data:) are absolute too, never mangled into directory-relative
    * paths; scheme-relative `//host/...` adopts the page scheme;
    * root-relative `/path` joins scheme://host; `?query` keeps the full
    * page path and `#frag` / empty hrefs resolve to the page itself
    * (RFC 3986 §5.3); anything else joins the page DIRECTORY (the merge
    * rule without dot-segment normalization — a policy layer, not this
    * op).
    */
  def resolveUrl(pageUrl: Column, href: Column): Column =
    resolveUrlPrepared(resolveUrlPrep(pageUrl), href)

  /** The page-URL half of [[resolveUrl]] as a struct — compute it ONCE
    * per page (before exploding that page's hrefs) and feed the struct to
    * [[resolveUrlPrepared]]: the parse is ~7 regexps, and the one-arg
    * [[resolveUrl]] re-evaluates all of them per HREF row. Exactly the
    * expressions resolveUrl always used, factored, so results are
    * identical by construction.
    */
  def resolveUrlPrep(pageUrl: Column): Column = {
    val nf = noFragment(pageUrl)
    val scheme = schemeOf(nf)
    val host = hostPort(afterScheme(nf)) // host[:port] verbatim — resolution keeps ports
    val path = regexp_extract(regexp_replace(afterScheme(nf), "^[^/?]*", ""),
      "^([^?]*)", 1)
    val dir = regexp_replace(when(path === "", lit("/")).otherwise(path), "[^/]*$", "")
    struct(nf.as("nf"), scheme.as("scheme"), host.as("host"),
      path.as("path"), dir.as("dir"))
  }

  /** The per-href half of [[resolveUrl]] over a [[resolveUrlPrep]] struct. */
  def resolveUrlPrepared(parts: Column, href: Column): Column = {
    val nf = parts.getField("nf")
    val scheme = parts.getField("scheme")
    val host = parts.getField("host")
    val path = parts.getField("path")
    val dir = parts.getField("dir")
    // a scheme-less page URL resolves without the "://" glue (the same
    // malformed-key guard as normalizeUrl); a scheme-relative href on a
    // scheme-less base stays scheme-relative
    val glue = when(scheme === "", lit("")).otherwise(concat(scheme, lit("://")))
    when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
      .when(href.startsWith("//"),
        when(scheme === "", href).otherwise(concat(scheme, lit(":"), href)))
      .when(href.startsWith("/"), concat(glue, host, href))
      .when(href.startsWith("?"), concat(glue, host, path, href))
      .when(href === "" || href.startsWith("#"), nf)
      .otherwise(concat(glue, host, dir, href))
  }

  /** Anti-join a (broadcast) blocklist of registrable domains: rows whose
    * domain is NOT blocked. NULL domains (a bare-public-suffix host) are
    * KEPT — a blocklist matches known-bad names, it does not condemn the
    * unparseable (drop-NULLs is a separate policy filter); the q168
    * oracle encodes the same rule. At 100 TB a blocklist is millions of
    * rows — still broadcast-sized (domains are short), and the corpus
    * never shuffles for the decision.
    */
  def dropBlockedDomains(df: DataFrame, domainCol: String,
      blocklist: DataFrame): DataFrame =
    df.join(broadcast(blocklist.select(col(blocklist.columns.head).as("__blocked"))),
      col(domainCol) === col("__blocked"), "left_anti")

  /** Per-registrable-domain crawl stats: page count and token mass —
    * the rate table per-domain caps and crawl budgets are planned from.
    * One count-pair shuffle keyed by domain.
    */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame =
    df.select(registrableDomain(hostOf(col(urlCol))).as("domain"),
        TextAnalysis.tokenCountWs(col(textCol)).as("n_tok"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  // ---------------------------------------------------------------------
  // robots.txt — Robots Exclusion Protocol (RFC 9309, wildcard-free core)
  // ---------------------------------------------------------------------

  /** URL path (no query, no fragment; empty → "/" per REP matching). */
  def pathOf(u: Column): Column = {
    val pq = regexp_replace(afterScheme(noFragment(u)), "^[^/?]*", "")
    val p = regexp_extract(pq, "^([^?]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Parse robots.txt bodies into the applicable rule set for one crawler
    * agent — the RFC 9309 core without `*`/`$` wildcards (documented
    * simplification; rules are matched as literal path PREFIXES, the
    * dominant case in real robots files):
    *
    *  - lines are `Directive: value`; `#` comments stripped; directive
    *    names case-insensitive; unknown directives ignored,
    *  - consecutive `User-agent` lines form one group header; following
    *    Allow/Disallow rules belong to every agent in the header; a
    *    `User-agent` line after a rule line starts a NEW group,
    *  - rules before any group header are ignored (RFC: rules must
    *    belong to a group),
    *  - groups naming `agent` exactly (case-insensitive) win; only if a
    *    host has none do its `*` groups apply (RFC precedence); multiple
    *    matching groups merge,
    *  - empty rule values (`Disallow:` = allow-everything idiom) drop.
    *
    * Everything is line-explode + regex + two host-partitioned windows —
    * robots files are KB-sized per host, so the window partitions are
    * tiny and the output rule set is broadcast-sized by construction
    * (the blocklist argument, [[dropBlockedDomains]]).
    * Output: (host, rule_path, is_allow).
    */
  def robotsRules(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("ln", "raw")))
      .withColumn("clean", trim(regexp_replace(col("raw"), "#.*", "")))
      .withColumn("directive",
        lower(regexp_extract(col("clean"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("clean"), "^[A-Za-z-]+\\s*:(.*)$", 1)))
      .filter(col("directive").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("isua", col("directive") === "user-agent")
      .withColumn("newg",
        (col("isua") && !coalesce(lag(col("isua"), 1).over(w), lit(false))).cast("int"))
      .withColumn("grp", sum(col("newg")).over(w))
      .filter(col("grp") >= 1)
    val agents = grouped.filter(col("isua"))
      .select(col("host"), col("grp"), lower(col("value")).as("ua"))
    val rules = grouped.filter(!col("isua") && col("value") =!= "")
      .select(col("host"), col("grp"), col("value").as("rule_path"),
        (col("directive") === "allow").as("is_allow"))
    val gflag = agents.groupBy(col("host"), col("grp")).agg(
      max((col("ua") === lit(agent.toLowerCase)).cast("int")).as("specific"),
      max((col("ua") === "*").cast("int")).as("star"))
    val hostHasSpecific = gflag.groupBy(col("host"))
      .agg(max(col("specific")).as("has_specific"))
    val picked = gflag.join(hostHasSpecific, Seq("host"))
      .filter((col("has_specific") === 1 && col("specific") === 1) ||
        (col("has_specific") === 0 && col("star") === 1))
      .select(col("host"), col("grp"))
    rules.join(picked, Seq("host", "grp"))
      .select(col("host"), col("rule_path"), col("is_allow"))
  }

  /** Crawl-frontier verdict against a parsed [[robotsRules]] set:
    * longest-matching-rule wins, Allow wins length ties (the Google/RFC
    * tiebreak), no matching rule (or no robots at all for the host) ⇒
    * allowed. The rule set BROADCASTS (robots rules are KB per host);
    * the frontier itself shuffles only for the per-URL argmax, keyed by
    * the caller's id — at 100 TB the frontier streams through one
    * broadcast-join + one key-local aggregate, no all-rules scan per
    * row beyond the host's own rules. Output: id, url, host, path,
    * rule_path (NULL when unmatched), allowed.
    */
  def robotsFilter(frontier: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame): DataFrame = {
    val f = frontier.select(col(idCol).as("id"), col(urlCol).as("url"))
      .withColumn("host", hostOf(col("url")))
      .withColumn("path", pathOf(col("url")))
    val r = rules.select(col("host").as("r_host"), col("rule_path"), col("is_allow"))
    val cand = f.join(broadcast(r),
      col("host") === col("r_host") && col("path").startsWith(col("rule_path")))
    // lexicographic struct max = (longest rule, then Allow over Disallow,
    // then max path string) — fully deterministic tiebreak chain
    val best = cand.groupBy(col("id")).agg(
      max(struct(length(col("rule_path")).as("l"), col("is_allow"),
        col("rule_path"))).as("b"))
    f.join(best, Seq("id"), "left")
      .select(col("id"), col("url"), col("host"), col("path"),
        col("b.rule_path").as("rule_path"),
        coalesce(col("b.is_allow"), lit(true)).as("allowed"))
  }
}
