package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpecBase {

  import spark.implicits._

  // (nation, segment) quasi-identifier; bal is the sensitive value.
  // Class (1, "A"): 3 records, 2 distinct bals; (1, "B"): 1 record;
  // (2, "A"): 2 records with a null sensitive value among them.
  private lazy val people = Seq(
    (1, "A", Some(10)), (1, "A", Some(10)), (1, "A", Some(20)),
    (1, "B", Some(30)),
    (2, "A", Some(40)), (2, "A", None)
  ).toDF("nation", "segment", "bal")

  test("kAnonymity reports class size, l-diversity and the k flag") {
    val out = Privacy.kAnonymity(people, Seq("nation", "segment"), "bal", k = 2L)
      .orderBy("nation", "segment")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("l_diversity"),
          r.getAs[Boolean]("anonymous"))).toMap
    assert(out((1, "A")) == ((3L, 2L, true)))
    assert(out((1, "B")) == ((1L, 1L, false)))
    // the null sensitive value doesn't count toward diversity
    assert(out((2, "A")) == ((2L, 1L, true)))
  }

  test("summary reports the dataset's actual k and below-k exposure") {
    val row = Privacy.kAnonymitySummary(
      people, Seq("nation", "segment"), "bal", k = 2L).head()
    assert(row.getAs[Long]("k_anonymity") == 1L)
    assert(row.getAs[Long]("l_diversity_min") == 1L)
    assert(row.getAs[Long]("n_classes") == 3L)
    assert(row.getAs[Long]("n_below_k") == 1L)
    assert(row.getAs[Long]("records_below_k") == 1L)
  }

  test("summary with no below-k classes reports zero exposure") {
    val row = Privacy.kAnonymitySummary(
      people.filter(col("segment") === "A"),
      Seq("nation", "segment"), "bal", k = 2L).head()
    assert(row.getAs[Long]("k_anonymity") == 2L)
    assert(row.getAs[Long]("n_below_k") == 0L)
    assert(row.getAs[Long]("records_below_k") == 0L)
  }

  test("entropyLDiversity: uniform class reaches entropy_l = #values, skewed class does not") {
    // uniform: 4 records, 4 distinct bals -> H = ln 4, entropy_l = 4
    // skewed: 100 records, 99 of one value -> distinct-l = 2 but the
    // entropy form sees the concentration
    val uniform = (1 to 4).map(i => (1, "U", Some(i * 10)))
    val skewed = Seq.fill(99)((1, "S", Some(10))) :+ ((1, "S", Some(20)))
    val out = Privacy.entropyLDiversity(
        (uniform ++ skewed).toDF("nation", "segment", "bal"),
        Seq("nation", "segment"), "bal", l = 3.0)
      .collect()
      .map(r => r.getString(1) ->
        (r.getAs[Long]("class_size"), r.getAs[Double]("entropy_h"),
          r.getAs[Double]("entropy_l"), r.getAs[Boolean]("diverse"))).toMap
    assert(out("U")._1 == 4L)
    assert(out("U")._2 == 1.386294) // ln 4, rounded to 6 dp
    assert(out("U")._3 == 3.999999) // exp of the ROUNDED H, itself rounded
    assert(out("U")._4)
    assert(out("S")._1 == 100L)
    // H = -(0.99 ln 0.99 + 0.01 ln 0.01) = 0.056002 -> entropy_l ~ 1.06
    assert(out("S")._2 == 0.056002)
    assert(out("S")._3 < 1.1)
    assert(!out("S")._4)
  }

  test("entropyLDiversity excludes null sensitive values from the class") {
    val out = Privacy.entropyLDiversity(people, Seq("nation", "segment"),
        "bal", l = 2.0)
      .orderBy("nation", "segment").collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getAs[Long]("class_size"), r.getAs[Boolean]("diverse"))).toMap
    // (2, "A") has one null bal: class counts only the non-null record
    assert(out((2, "A"))._1 == 1L)
    assert(!out((2, "A"))._2) // single value -> entropy_l = 1 < 2
    // (1, "A"): 3 records, p = (2/3, 1/3) -> entropy_l = exp(0.636514)
    assert(out((1, "A"))._1 == 3L)
    assert(!out((1, "A"))._2) // 1.889... < 2
  }

  private lazy val piiDocs = Seq(
    (1L, "mail me at jo.ann+x@sub.example.org or jo@ex.io thanks"),
    (2L, "server 10.0.255.3 answered, backup at 192.168.1.17"),
    (3L, "call +1 555 123 4567 ref 123456789 in row"),
    (4L, "nothing sensitive here, just 1234 and 10.5 percent"),
    (5L, "mixed: a@b.co from 8.8.8.8 id 999999999012")
  ).toDF("doc_id", "text")

  test("piiScan counts each rule on the original text") {
    val out = Privacy.piiScan(piiDocs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_ipv4"), r.getAs[Long]("n_idnum"),
          r.getAs[Long]("pii_total"))).toMap
    assert(out(1L) == ((2L, 0L, 0L, 0L, 2L)))
    assert(out(2L) == ((0L, 0L, 2L, 0L, 2L)))
    assert(out(3L) == ((0L, 1L, 0L, 1L, 2L)))
    // "1234" is too short for idnum; "10.5" has only two dot groups
    assert(out(4L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(out(5L) == ((1L, 0L, 1L, 1L, 3L)))
  }

  test("piiRedact replaces matches with typed placeholders in rule order") {
    val out = Privacy.piiRedact(piiDocs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted")).toMap
    assert(out(1L) == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(out(2L) == "server <IP> answered, backup at <IP>")
    assert(out(3L) == "call <PHONE> ref <ID> in row")
    assert(out(4L) == piiDocs.filter($"doc_id" === 4L).head.getString(1))
    assert(out(5L) == "mixed: <EMAIL> from <IP> id <ID>")
  }

  test("piiScrub email-first order keeps digit rules out of addresses") {
    // the email local part contains a 9-digit run and an IP-shaped
    // dotted quad; email redaction must win because it applies first
    val doc = Seq((1L, "x123456789@1.2.3.4mail.com end"))
      .toDF("doc_id", "text")
    val row = Privacy.piiScrub(doc).head()
    assert(row.getAs[String]("redacted") == "<EMAIL> end")
    assert(row.getAs[Long]("n_email") == 1L)
    assert(row.getAs[Long]("pii_total") >= 1L)
  }

  test("piiRedact rejects a placeholder a rule regex would re-bite") {
    // "found@example.com" matches the email rule — a later pass (or a
    // second scrub of already-redacted text) would mangle it, so the
    // idempotence require must fire before any plan is built
    val rules = Privacy.defaultPiiRules :+
      Privacy.PiiRule("custom", "\\bsecret\\b", "found@example.com")
    val doc = Seq((1L, "a secret here")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Privacy.piiRedact(doc, rules = rules) }
    assert(ex.getMessage.contains("idempotent"))
    // COMPOSITIONAL re-bite: 'ID-' alone matches nothing, but with the
    // surrounding text's digits ('ID-' + '123') a later digit-keyed
    // rule would bite it — the flanked probes must catch this class
    val comp = Seq(
      Privacy.PiiRule("tag", "\\bsecret\\b", "ID-"),
      Privacy.PiiRule("idish", "ID-\\d+", "<X>"))
    val ex2 = intercept[IllegalArgumentException] {
      Privacy.piiRedact(doc, rules = comp) }
    assert(ex2.getMessage.contains("idempotent"))
    // the defaults themselves pass their own check
    Privacy.piiRedact(doc)
  }

  test("piiRedact accepts rules that only bite the probe's flank, not " +
    "the placeholder (match-overlap guard, round-15 advice)") {
    // a bare \d+ rule matches the synthetic '0…0' flank of EVERY
    // placeholder probe, but never overlaps the digit-free placeholders
    // themselves — the rule set IS idempotent and must be accepted
    val rules = Seq(
      Privacy.PiiRule("email",
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      Privacy.PiiRule("anynum", "\\d+", "<NUM>"))
    val doc = Seq((1L, "call 5551234 or mail a@b.co")).toDF("doc_id", "text")
    val out = Privacy.piiRedact(doc, rules = rules)
      .select("redacted").collect().head.getString(0)
    assert(out == "call <NUM> or mail <EMAIL>")
    // …and re-redacting the output is a no-op (the property the guard
    // exists to protect)
    val again = Privacy.piiRedact(
        Seq((1L, out)).toDF("doc_id", "text"), rules = rules)
      .select("redacted").collect().head.getString(0)
    assert(again == out)
    // a digit INSIDE a placeholder still overlaps a \d+ match → rejected
    val bad = rules :+ Privacy.PiiRule("tag", "\\bx\\b", "<ID9>")
    val ex = intercept[IllegalArgumentException] {
      Privacy.piiRedact(doc, rules = bad) }
    assert(ex.getMessage.contains("idempotent"))
  }
}
