package graft.operators

import graft.SparkSpecBase

/** URL canonicalization contract (every normalization rule one by
  * one), registered-domain heuristic, dedup survivorship, rollup
  * counts, and the blocklist filter.
  */
class WebCurationSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def canon(url: String): Option[String] = {
    import spark.implicits._
    Seq(url).toDF("url")
      .select(WebCuration.canonicalUrlCol(col("url")).as("c"))
      .as[Option[String]].collect().head
  }

  private def domain(url: String): Option[String] = {
    import spark.implicits._
    Seq(url).toDF("url")
      .select(WebCuration.registeredDomainCol(col("url")).as("d"))
      .as[Option[String]].collect().head
  }

  test("each canonicalization rule, individually") {
    val base = Some("http://site.com/p/1?id=1")
    // case: scheme + host lowered, path case preserved
    assert(canon("HTTP://SITE.COM/p/1?id=1") === base)
    assert(canon("http://site.com/P/1") === Some("http://site.com/P/1"))
    // www + userinfo
    assert(canon("http://www.site.com/p/1?id=1") === base)
    assert(canon("http://alice@site.com/p/1?id=1") === base)
    // default ports stripped only for the matching scheme
    assert(canon("http://site.com:80/p/1?id=1") === base)
    assert(canon("https://site.com:443/x") === Some("https://site.com/x"))
    assert(canon("http://site.com:443/x") ===
      Some("http://site.com:443/x"))
    assert(canon("http://site.com:8080/x") ===
      Some("http://site.com:8080/x"))
    // path: slash runs collapse, trailing slash strips, root survives
    assert(canon("http://site.com//p//1?id=1") === base)
    assert(canon("http://site.com/p/1/?id=1") === base)
    assert(canon("http://site.com/") === Some("http://site.com/"))
    assert(canon("http://site.com") === Some("http://site.com/"))
    // fragment dropped
    assert(canon("http://site.com/p/1?id=1#sec-2") === base)
    // tracking params dropped, kept params sorted, values untouched
    assert(canon("http://site.com/p/1?utm_source=rss&id=1&fbclid=Z") ===
      base)
    assert(canon("http://site.com/p/1?z=2&id=1") ===
      Some("http://site.com/p/1?id=1&z=2"))
    assert(canon("http://site.com/p/1?id=UPPER") ===
      Some("http://site.com/p/1?id=UPPER"))
    // all-tracking query vanishes entirely
    assert(canon("http://site.com/p/1?utm_medium=email") ===
      Some("http://site.com/p/1"))
    // non-absolute inputs have no canonical identity
    assert(canon("site.com/p/1") === None)
    assert(canon("/relative/path") === None)
    assert(canon("mailto:a@b.com") === None)
  }

  test("registered-domain heuristic") {
    assert(domain("http://deep.sub.site.com/x") === Some("site.com"))
    assert(domain("http://www.site.com/x") === Some("site.com"))
    assert(domain("http://blog.acme.co.uk/x") === Some("acme.co.uk"))
    assert(domain("http://acme.co.uk/x") === Some("acme.co.uk"))
    // 2-letter-cc rule needs BOTH the cc-sld label and a 2-char tld
    assert(domain("http://a.b.co.com/x") === Some("co.com"))
    assert(domain("http://localhost/x") === Some("localhost"))
    assert(domain("not a url") === None)
  }

  test("urlDedup keeps the smallest id and counts dups") {
    import spark.implicits._
    val df = Seq(
      (10L, "http://www.site.com/p/1?utm_source=x&id=1"),
      (7L, "http://site.com:80/p/1/?id=1#frag"),
      (3L, "http://site.com/p/2"),
      (5L, "nonsense")).toDF("doc_id", "url")
    val out = WebCuration.urlDedup(df).orderBy("canonical_url")
      .as[(String, Long, Long)].collect()
    assert(out === Array(
      ("http://site.com/p/1?id=1", 7L, 2L),
      ("http://site.com/p/2", 3L, 1L)))
  }

  test("domainRollup counts urls, canonical pages and hosts") {
    import spark.implicits._
    val df = Seq(
      "http://a.site.com/1", "http://b.site.com/1/",
      "http://b.site.com/1", "http://blog.acme.co.uk/z",
      "garbage").toDF("url")
    val out = WebCuration.domainRollup(df).orderBy("domain")
      .as[(String, Long, Long, Long)].collect()
    assert(out === Array(
      ("acme.co.uk", 1L, 1L, 1L),
      // 4 urls? no: 3 rows for site.com; b.site.com/1/ and /1 share a
      // canonical page, a.site.com/1 is its own → 2 canonical, 2 hosts
      ("site.com", 3L, 2L, 2L)))
  }

  test("filterBlockedDomains drops the domain's every host") {
    import spark.implicits._
    val df = Seq(
      (1L, "http://a.bad.net/x"), (2L, "http://www.bad.net/y"),
      (3L, "http://good.org/z")).toDF("doc_id", "url")
    val blocked = Seq("bad.net").toDF("domain")
    val kept = WebCuration.filterBlockedDomains(df, blocked)
      .select("doc_id").as[Long].collect()
    assert(kept === Array(3L))
  }
}
