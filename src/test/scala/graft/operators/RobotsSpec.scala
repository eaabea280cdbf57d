package graft.operators

import graft.SparkSpecBase

/** robots.txt parsing and decision contract: grouping, agent
  * precedence, wildcard/$ patterns, longest-match/allow-tie,
  * unmatched-allow.
  */
class RobotsSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def rules(robots: String, agent: String = "*") = {
    import spark.implicits._
    Robots.parseRules(Seq(("h.com", robots)).toDF("host", "robots_txt"),
      agent)
  }

  private def decide(robots: String, path: String,
                     agent: String = "*"): Boolean = {
    import spark.implicits._
    val urls = Seq((1L, s"http://h.com$path")).toDF("doc_id", "url")
    Robots.filterAllowed(urls, rules(robots, agent))
      .select("allowed").collect().head.getBoolean(0)
  }

  test("lines parse: comments, unknown fields, empty patterns, rules " +
      "before any group are dropped") {
    val r = rules(
      "Disallow: /orphan\n# top comment\nUser-agent: *\n" +
        "Crawl-delay: 10\nDisallow: /a # trailing\nDisallow:\n" +
        "Sitemap: http://h.com/s.xml\nAllow: /a/b\n")
    val got = r.select("rule_type", "pattern").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got === Set(("disallow", "/a"), ("allow", "/a/b")))
  }

  test("exact-agent groups beat * groups; agent names match " +
      "case-insensitively; multi-UA runs share rules") {
    val txt = "User-agent: GraftBot\nUser-agent: other\nDisallow: /x\n\n" +
      "User-agent: *\nDisallow: /\n"
    assert(decide(txt, "/y", agent = "graftbot")) // exact group only
    assert(!decide(txt, "/x/1", agent = "graftbot"))
    assert(!decide(txt, "/y", agent = "stranger")) // falls to *
  }

  test("wildcard and $ anchor; longest match wins; allow wins ties") {
    val txt = "User-agent: *\nDisallow: /p/*.pdf\nAllow: /p/ok\n" +
      "Disallow: /p/ok/x$\n"
    assert(!decide(txt, "/p/a.pdf"))
    assert(!decide(txt, "/p/deep/b.pdf"))
    assert(decide(txt, "/p/a.pdfx") === false) // prefix semantics: still matches
    assert(decide(txt, "/p/ok/readme"))        // allow beats nothing
    assert(!decide(txt, "/p/ok/x"))            // $ rule (len 8) beats allow (len 5)
    assert(decide(txt, "/p/ok/xy"))            // $ anchor does NOT match
  }

  test("tie between allow and disallow of equal length → allow") {
    val txt = "User-agent: *\nDisallow: /ab\nAllow: /ab\n"
    assert(decide(txt, "/ab/c"))
  }

  test("no rules for host, or no match → allowed; regex metachars in " +
      "paths are literal") {
    assert(decide("User-agent: *\nDisallow: /x\n", "/free"))
    // a dot in the pattern must not act as regex-any
    val txt = "User-agent: *\nDisallow: /a.b\n"
    assert(!decide(txt, "/a.b/c"))
    assert(decide(txt, "/axb/c"))
  }
}
