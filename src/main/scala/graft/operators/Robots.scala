package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt (REP, RFC 9309) parsing and URL filtering — the crawl
  * politeness/permission gate that sits between [[WebCuration]]'s URL
  * hygiene and any fetch or keep decision: a pre-training pipeline
  * re-checks crawl permissions when it re-publishes or re-filters a
  * corpus (C4 did exactly this over Common Crawl).
  *
  * Subset of RFC 9309 implemented (the decision core):
  *   - line syntax: `field: value`, `#` comments, blank-line-tolerant;
  *     unknown fields (crawl-delay, sitemap, …) are ignored;
  *   - groups: one or more consecutive `User-agent` lines followed by
  *     `Allow`/`Disallow` rules; a rule belongs to the nearest
  *     user-agent run above it; rules before any user-agent line
  *     belong to no group and are dropped (per spec);
  *   - group selection: the groups naming `agent` EXACTLY (agent
  *     names match case-insensitively) if any exist for the host,
  *     otherwise the `*` groups — the RFC's most-specific-agent rule
  *     restricted to the exact/wildcard two-level form;
  *   - rule matching: path-prefix with `*` wildcards and a `$` end
  *     anchor; LONGEST pattern (octet length) wins; on a tie, Allow
  *     wins; no matching rule (or an empty-pattern rule) → allowed;
  *   - decisions are per (host, path) — scheme/port politeness scoping
  *     is the fetcher's concern, not this operator's.
  *
  * Execution shape: parsing is per-robots-file line explode + two
  * host-partitioned windows (millions of small per-host groups — full
  * parallelism, the accepted keyed-window class); filtering broadcasts
  * the parsed rule set (robots corpora are host-scale — a few rules
  * per site — always small next to the URL corpus it gates) and joins
  * on host with the match predicate on top, then resolves
  * longest-match-wins with one aggregation. No UDF anywhere: patterns
  * compile to regexes with column ops and match via `rlike`.
  */
object Robots {

  /** Parse robots.txt bodies into per-host rule rows:
    * `(host, rule_type, pattern, pattern_len, rule_regex)` for the
    * groups that apply to `agent` (exact-match groups when the host
    * has any, else `*` groups). One explode + two per-host windows +
    * one per-group agent rollup. */
  def parseRules(df: DataFrame, agent: String = "*",
                 hostCol: String = "host",
                 robotsCol: String = "robots_txt"): DataFrame = {
    val lines = df.select(col(hostCol).as("host"),
        posexplode(split(col(robotsCol), "\r?\n"))
          .as(Seq("line_no", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(col("line") =!= "")
      .withColumn("field",
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1)))
      .filter(col("field").isin("user-agent", "allow", "disallow"))
    val byLine = Window.partitionBy(col("host")).orderBy(col("line_no"))
    // a user-agent line STARTS a new group iff the previous retained
    // line was not itself a user-agent line; rules inherit the running
    // group id (0 = before any group → dropped)
    val grouped = lines
      .withColumn("__ua", (col("field") === "user-agent").cast("int"))
      .withColumn("__starts",
        (col("__ua") === 1 &&
          coalesce(lag(col("__ua"), 1).over(byLine), lit(0)) === 0)
          .cast("int"))
      .withColumn("group_id", sum(col("__starts")).over(byLine))
      .filter(col("group_id") > 0)
    val agents = grouped.filter(col("field") === "user-agent")
      .groupBy(col("host"), col("group_id"))
      .agg(collect_set(lower(col("value"))).as("__agents"))
    // exact-agent groups win over * groups host-wide (RFC most-specific)
    val matched = agents
      .withColumn("__exact",
        array_contains(col("__agents"), agent.toLowerCase).cast("int"))
      .withColumn("__star", array_contains(col("__agents"), "*").cast("int"))
      .withColumn("__best", max(col("__exact"))
        .over(Window.partitionBy(col("host"))))
      .filter((col("__best") === 1 && col("__exact") === 1) ||
        (col("__best") === 0 && col("__star") === 1))
      .select(col("host"), col("group_id"))
    val esc = regexp_replace(col("value"),
      "([\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|\\\\])", "\\\\$1")
    // `*` is deliberately NOT in the escape class above: it opens up
    // to `.*` here; `$` IS escaped, and only a TRAILING one un-escapes
    // into the end anchor below
    val wild = regexp_replace(esc, "\\*", ".*")
    // a trailing (escaped) $ becomes the regex end anchor
    val rx = concat(lit("^"),
      when(col("value").endsWith("$"),
        concat(regexp_replace(wild, "\\\\\\$$", ""), lit("$")))
        .otherwise(wild))
    grouped.filter(col("field").isin("allow", "disallow"))
      .filter(col("value") =!= "") // empty pattern = no restriction
      .join(matched, Seq("host", "group_id"))
      .select(col("host"), col("field").as("rule_type"),
        col("value").as("pattern"),
        length(col("value")).as("pattern_len"), rx.as("rule_regex"))
  }

  /** Per-URL robots decision: `urls` + an `allowed` boolean resolved
    * against `rules` ([[parseRules]] output) by longest-match-wins /
    * allow-on-tie / allow-when-unmatched. Broadcast join on host with
    * the regex match on top; one keyed aggregation resolves the
    * winner. URLs with no canonical host are dropped (no robots
    * scope). */
  def filterAllowed(urls: DataFrame, rules: DataFrame,
                    urlCol: String = "url",
                    idCol: String = "doc_id"): DataFrame = {
    val u = urls.select(col(idCol), col(urlCol),
        WebCuration.hostCol(col(urlCol)).as("__host"),
        regexp_extract(col(urlCol),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1).as("__path"))
      .filter(col("__host") =!= "")
      .withColumn("__path",
        when(col("__path") === "", lit("/")).otherwise(col("__path")))
    val r = broadcast(rules.select(col("host").as("__host"),
      col("rule_type"), col("pattern_len"), col("rule_regex")))
    // rlike with a per-row (non-foldable) pattern: RLike caches the
    // last-compiled regex, and the broadcast side is rule-scale
    u.join(r, u("__host") === r("__host") &&
        expr("__path rlike rule_regex"), "left")
      .select(u(idCol), u(urlCol), u("__host").as("host"),
        u("__path").as("path"), r("rule_type"), r("pattern_len"))
      .groupBy(col(idCol), col(urlCol), col("host"), col("path"))
      .agg(max(when(col("rule_type").isNotNull,
          struct(col("pattern_len"),
            (col("rule_type") === "allow").as("is_allow"))))
        .as("__win"))
      .withColumn("allowed",
        coalesce(col("__win.is_allow"), lit(true)))
      .drop("__win")
  }
}
