package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl URL curation: canonicalization, URL-keyed dedup, and
  * registered-domain rollups/blocklists.
  *
  * Every large-scale pre-training corpus that starts from a crawl
  * (C4/mC4, RefinedWeb §3.1, FineWeb) begins with URL hygiene BEFORE
  * any content pass, because it is orders of magnitude cheaper:
  * canonicalizing `http://WWW.Site.COM:80/p//1/?utm_source=x&id=1#top`
  * down to `http://site.com/p/1?id=1` collapses the bulk of crawl
  * duplicates with ZERO content reads, and domain-level rollups drive
  * the blocklist/quality decisions that gate whole sites at once.
  *
  * Canonicalization is a single per-row projection (regex extracts +
  * higher-order array ops — no UDF, whole-stage codegen, zero
  * shuffles); dedup is ONE shuffle on the canonical string; the
  * domain rollup is one aggregation. At 100 TB the canonical pass is
  * embarrassingly parallel and the dedup shuffle moves only
  * (canonical_url, id) pairs, never document payloads.
  *
  * Canonical form (each step documented because dedup SEMANTICS are
  * the contract, not RFC 3986 fidelity):
  *   - scheme and host lowercased; userinfo (`user@`) dropped;
  *   - leading `www.` stripped; default ports (`:80` http, `:443`
  *     https) stripped;
  *   - path: duplicate `/` runs collapsed, trailing `/` stripped
  *     (root stays `/`, empty path becomes `/`);
  *   - fragment dropped;
  *   - query: tracking parameters removed (`utm_*`, `fbclid`,
  *     `gclid`, `msclkid`, `mc_eid`, `igshid`, `ref`, `ref_src`),
  *     remaining `k=v` pairs sorted lexicographically and rejoined —
  *     order-insensitive dedup without touching the values;
  *   - non-absolute inputs (no `scheme://` or empty host) → null.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no URL handling; this extends the mandated dedup family
  * (SURVEY §2B1/B2) with the crawl-curation entry stage.
  */
object WebCuration {

  /** Query parameters that never affect page identity (click/campaign
    * trackers). Kept as a plain regex alternation so the DuckDB oracle
    * can replay the exact same filter. */
  val TrackingParams: Seq[String] = Seq(
    "utm_[a-z0-9_]+", "fbclid", "gclid", "msclkid", "mc_eid", "igshid",
    "ref", "ref_src")

  private val trackingRe = s"^(${TrackingParams.mkString("|")})="

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased host of an absolute URL: userinfo dropped, leading
    * `www.` stripped, default port stripped ('' if not absolute).
    * Port handling is scheme-aware, so the raw authority is resolved
    * here rather than exposed. */
  def hostCol(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val auth = lower(regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^[^@]*@", ""))
    val noWww = regexp_replace(auth, "^www\\.", "")
    when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** Canonical URL (null for non-absolute inputs) — see object doc for
    * the normalization contract. Pure projection: codegen'd regex +
    * array ops, no UDF, no shuffle. */
  def canonicalUrlCol(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val host = hostCol(url)
    val rawPath =
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val squashed = regexp_replace(rawPath, "/{2,}", "/")
    val trimmed = regexp_replace(squashed, "^(.+?)/$", "$1")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val rawQuery = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = filter(split(rawQuery, "&"),
      p => p =!= "" && !lower(p).rlike(trackingRe))
    val query = concat_ws("&", array_sort(kept))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Registered domain (eTLD+1) of an absolute URL, by the standard
    * heuristic subset of the public-suffix list: hosts ending in
    * `<cc-sld>.<2-letter-cc>` (cc-sld ∈ co/com/org/net/gov/ac/edu —
    * `acme.co.uk` style) keep THREE labels, everything else keeps two;
    * bare or single-label hosts pass through. The full PSL is a data
    * file, not an algorithm — swap the heuristic for a broadcast PSL
    * join when exactness matters; the shape stays one projection. */
  def registeredDomainCol(url: Column): Column = {
    val host = hostCol(url)
    val labels = split(host, "\\.")
    val n = size(labels)
    val ccSld = element_at(labels, -2)
      .isin("co", "com", "org", "net", "gov", "ac", "edu")
    when(host === "", lit(null).cast("string"))
      .when(n <= 2, host)
      .when(ccSld && length(element_at(labels, -1)) === 2,
        concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  /** URL-keyed dedup: one row per canonical URL with the SMALLEST id
    * as survivor (deterministic, partition-independent) and the dup
    * count — `(canonical_url, idCol, n_dups)`. Non-absolute URLs are
    * dropped (they have no canonical identity). One shuffle on the
    * canonical string; only (url, id) pairs move. */
  def urlDedup(df: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame =
    df.select(canonicalUrlCol(col(urlCol)).as("canonical_url"),
        col(idCol))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Per-registered-domain crawl rollup:
    * `(domain, n_urls, n_canonical, n_hosts)` — raw rows, distinct
    * canonical pages, distinct hosts. The frame that drives blocklist
    * and per-site quality decisions; one aggregation, output is
    * domain-sized (million-ish rows at web scale), never corpus-sized. */
  def domainRollup(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.select(registeredDomainCol(col(urlCol)).as("domain"),
        canonicalUrlCol(col(urlCol)).as("__c"), hostCol(col(urlCol)).as("__h"))
      .filter(col("domain").isNotNull)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("__c")).as("n_canonical"),
        countDistinct(col("__h")).as("n_hosts"))

  /** Drop every row whose registered domain appears in `blocked`
    * (`domain` column) — broadcast left-anti join, so the corpus scans
    * once and the blocklist (always small relative to data) ships to
    * executors. */
  def filterBlockedDomains(df: DataFrame, blocked: DataFrame,
                           urlCol: String = "url"): DataFrame = {
    require(blocked.columns.contains("domain"),
      "blocklist needs a 'domain' column")
    df.withColumn("__dom", registeredDomainCol(col(urlCol)))
      .join(broadcast(blocked.select(col("domain").as("__dom")).distinct()),
        Seq("__dom"), "left_anti")
      .drop("__dom")
  }

  // ------------------------------------------- persisted URL seen-set

  /** The URL index's one frame: `seen` = (canonical_url, survivor id).
    * Append-only after the initial build (new canonical URLs arrive as
    * new parquet files), so only the build/rebuild needs the
    * [[IndexSwap]] generation guard. */
  val urlSeenFrames: Seq[String] = Seq("seen")

  private def fsOf(df: DataFrame, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  /** Persist the canonical-URL seen-set of a crawl corpus — the
    * incremental form of [[urlDedup]] that a continuously-fed frontier
    * needs: later batches probe/append WITHOUT rescanning the corpus.
    * `dir/seen` holds one (canonical_url, id) row per canonical URL
    * with the min-id survivor. A rebuild over a live index publishes
    * through [[IndexSwap]] as one generation.
    *
    * Survivorship contract: the index keeps the FIRST-SEEN id per
    * canonical URL across appends (within a build or batch, min id) —
    * equal to global min-id whenever ingestion is id-ordered, which is
    * the crawl reality (ids grow with arrival). At 100 TB the seen
    * frame is canonical-URL-scale (one short row per page, never
    * payloads) and every probe/append is one string-keyed anti-join;
    * bucketing `seen` by url hash co-locates that join when the frame
    * itself outgrows a shuffle. */
  def writeUrlIndex(df: DataFrame, dir: String, urlCol: String = "url",
                    idCol: String = "doc_id"): Unit = {
    val fs = fsOf(df, dir)
    IndexSwap.clean(fs, dir, urlSeenFrames)
    urlDedup(df, urlCol, idCol).select(col("canonical_url"), col(idCol))
      .write.mode("overwrite")
      .parquet(IndexSwap.stagedPath(dir, "seen"))
    IndexSwap.swapAll(fs, dir, urlSeenFrames)
  }

  /** Canonical URLs of `batch` NOT yet in the index — one
    * (canonical_url, id) row per new canonical URL, min-id survivor
    * within the batch. One projection + one anti-join against the
    * stored seen set; the batch never re-reads the corpus. */
  def newUrls(spark: org.apache.spark.sql.SparkSession, dir: String,
              batch: DataFrame, urlCol: String = "url",
              idCol: String = "doc_id"): DataFrame = {
    IndexSwap.recover(fsOf(batch, dir), dir, urlSeenFrames)
    urlDedup(batch, urlCol, idCol).drop("n_dups")
      .join(spark.read.parquet(s"$dir/seen").select(col("canonical_url")),
        Seq("canonical_url"), "left_anti")
  }

  /** Grow the index with `batch`'s new canonical URLs (the
    * [[newUrls]] frame appends as new files; known URLs anti-join
    * away, so a failure-replayed batch — foreachBatch is
    * at-least-once — re-appends as a NO-OP: the index is
    * effectively-once). The snapshot read of `seen` lists files
    * before the append writes new ones, the same read-while-append
    * discipline as [[Dedup.appendMinhashIndex]]'s shingle frame. */
  def appendUrlIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String, batch: DataFrame,
                     urlCol: String = "url",
                     idCol: String = "doc_id"): Unit =
    newUrls(spark, dir, batch, urlCol, idCol)
      .write.mode("append").parquet(s"$dir/seen")
}
