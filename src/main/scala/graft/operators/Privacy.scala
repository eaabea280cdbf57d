package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for training corpora: k-anonymity and
  * l-diversity over a quasi-identifier combination — "how small is the
  * smallest crowd each record hides in, and how varied is the sensitive
  * attribute inside that crowd?" (Sweeney 2002; Machanavajjhala et al.
  * 2007). Training-data releases run this BEFORE publishing: any
  * equivalence class below k is a linkage-attack surface.
  *
  * Scale: one hash aggregation on the quasi-identifier key (map-side
  * combinable — distinct sensitive values via a second-level group
  * rather than a per-class set), so the cost is one shuffle of
  * class-count rows, never a per-record state. Class cardinality is
  * bounded by the quasi-space, not the corpus.
  */
object Privacy {

  /** One row per equivalence class: `(quasiCols…, class_size,
    * l_diversity, anonymous)` where `anonymous` = class_size ≥ k.
    * `l_diversity` counts distinct non-null sensitive values.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 2, s"k must be >= 2, got $k")
    val gc = quasiCols.map(col)
    // two-level group: (quasi, sensitive) first, then quasi — exact
    // distinct counts with map-side combine at both levels, no
    // count_distinct set state carried through the shuffle
    df.groupBy(gc :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(gc: _*)
      .agg(sum(col("__c")).as("class_size"),
        count(when(col("__s").isNotNull, lit(1))).as("l_diversity"))
      .withColumn("anonymous", col("class_size") >= lit(k))
  }

  /** Corpus-level summary of [[kAnonymity]]: `(k_anonymity,
    * l_diversity_min, n_classes, n_below_k, records_below_k)` — one row.
    * `k_anonymity` is the smallest class size (the dataset's actual k).
    */
  def kAnonymitySummary(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String, k: Long): DataFrame =
    kAnonymity(df, quasiCols, sensitiveCol, k)
      .agg(min(col("class_size")).as("k_anonymity"),
        min(col("l_diversity")).as("l_diversity_min"),
        count(lit(1)).as("n_classes"),
        count(when(!col("anonymous"), lit(1))).as("n_below_k"),
        coalesce(sum(when(!col("anonymous"), col("class_size"))), lit(0L))
          .as("records_below_k"))

  /** Entropy ℓ-diversity (Machanavajjhala et al. 2007, def. 4.1):
    * distinct-count l-diversity ([[kAnonymity]]) is satisfied by a class
    * where one sensitive value covers 99% of records; the entropy form is
    * not. Per equivalence class over the non-null-sensitive records:
    * Shannon entropy H of the sensitive-value distribution (nats) and
    * `entropy_l` = exp(H), the effective number of sensitive values; the
    * class `diverse` iff entropy_l ≥ l, i.e. H ≥ ln(l).
    *
    * Same two-level hash-aggregation shape as [[kAnonymity]] (no per-class
    * set state through the shuffle); entropy terms DECIMAL(28,12)-
    * quantized before the order-free sum, H and exp(H) rounded to 6 dp
    * (exp applied to the ROUNDED H, so both values replay identically in
    * any engine).
    */
  def entropyLDiversity(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String, l: Double): DataFrame = {
    require(quasiCols.nonEmpty, "entropyLDiversity needs quasi-identifier columns")
    require(l >= 1.0, s"l must be >= 1, got $l")
    val gc = quasiCols.map(col)
    val cells = df.filter(col(sensitiveCol).isNotNull)
      .groupBy(gc :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val sizes = cells.groupBy(gc: _*).agg(sum(col("__c")).as("class_size"))
    val p = col("__c").cast("double") / col("class_size").cast("double")
    cells.join(sizes, quasiCols)
      .withColumn("__t", (-p * log(p)).cast("decimal(28,12)"))
      .groupBy(gc :+ col("class_size"): _*)
      .agg(round(sum(col("__t")).cast("double"), 6).as("entropy_h"))
      .withColumn("entropy_l", round(exp(col("entropy_h")), 6))
      .withColumn("diverse", col("entropy_l") >= lit(l))
  }

  /** One PII detector: `regex` finds it, `placeholder` replaces it.
    * Patterns must stay inside the Java∩RE2 common dialect (no
    * lookaround, no backreferences, no capturing groups) so the same
    * string runs under Spark's Java engine and an RE2-based oracle. */
  final case class PiiRule(name: String, regex: String, placeholder: String)

  /** The scrub rules every pre-training corpus release runs first
    * (C4 §2.2-style cleanup; emails/IPs/phones/long ID numbers).
    * Order matters for redaction: email first (its local part can
    * contain digits and dots that the looser numeric rules would
    * otherwise bite into), then phone, then IPv4, then bare 9+-digit
    * runs (SSN/account-number shaped).
    *
    * Relation to [[TextAnalysis.redactPiiCol]] (q50): that is the
    * fixed three-pattern redaction COLUMN (email/dashed-phone/SSN) for
    * inline use in select lists; this family is the rule-DRIVEN
    * release gate — caller-extensible ordered rules, per-type match
    * census, and the audit frame a corpus publication signs off on.
    */
  val defaultPiiRules: Seq[PiiRule] = Seq(
    PiiRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    PiiRule("phone", "\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}", "<PHONE>"),
    PiiRule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
      "<IP>"),
    PiiRule("idnum", "\\b\\d{9,}\\b", "<ID>"))

  /** Per-document PII census: adds one `n_<rule>` LONG per rule
    * (match count on the ORIGINAL text, so counts are independent of
    * redaction order) plus their sum `pii_total`.
    *
    * Scale: row-local `regexp_count` per rule — whole-stage codegen,
    * zero shuffles, zero state; the scan cost is one pass over the
    * text bytes regardless of corpus size, and Parquet column pruning
    * means only the text column is read.
    */
  def piiScan(df: DataFrame, textCol: String = "text",
              rules: Seq[PiiRule] = defaultPiiRules): DataFrame = {
    require(rules.nonEmpty, "piiScan needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "piiScan rule names must be unique")
    val counted = rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(s"n_${r.name}",
        regexp_count(col(textCol), lit(r.regex)).cast("long"))
    }
    counted.withColumn("pii_total",
      rules.map(r => col(s"n_${r.name}")).reduce(_ + _))
  }

  /** Typed-placeholder redaction: adds `redacted` = the text with each
    * rule's matches replaced by its placeholder, applied in rule order
    * (see [[defaultPiiRules]] for why order is part of the contract).
    * Row-local nested `regexp_replace` — codegen, no shuffle.
    *
    * Idempotence (re-redacting output is a no-op) holds only when no
    * placeholder can itself be bitten by a rule's regex — e.g. a
    * caller placeholder `<ID-9>` would be re-matched by a digit rule.
    * The require below probes each placeholder in isolation AND
    * flanked by digit/letter context ("0…0", "a…a"), which catches
    * the compositional class too (a placeholder like `ID-` that only
    * matches once the SURROUNDING text supplies the digits). A match
    * only fails the guard when its span OVERLAPS the placeholder's
    * characters — a rule like `\d+` biting the synthetic flank alone
    * is the rule doing its normal job on neighboring text, not a
    * threat to the placeholder, so such rule sets stay accepted. The
    * probe is a guard, not a proof — a regex keyed on characters
    * outside [0-9a-z] adjacency can still slip it, so keep
    * placeholders out of every rule's alphabet (the defaults' `<…>`
    * convention). */
  def piiRedact(df: DataFrame, textCol: String = "text",
                rules: Seq[PiiRule] = defaultPiiRules): DataFrame = {
    // compile each rule ONCE (O(rules)), not per (placeholder, flank) pair
    val compiled = rules.map(r => r -> r.regex.r.pattern)
    for (p <- rules; flank <- Seq("", "0", "a")) {
      val probe = flank + p.placeholder + flank
      val (lo, hi) = (flank.length, flank.length + p.placeholder.length)
      for ((r, pat) <- compiled) {
        val m = pat.matcher(probe)
        var overlap = false
        while (!overlap && m.find())
          overlap = m.start < hi && m.end > lo
        require(!overlap,
          s"placeholder '${p.placeholder}' of rule '${p.name}' matches " +
            s"rule '${r.name}' regex (probe '$probe') — redaction would " +
            "not be idempotent")
      }
    }
    df.withColumn("redacted",
      rules.foldLeft(col(textCol)) { (c, r) =>
        regexp_replace(c, lit(r.regex), lit(r.placeholder)) })
  }

  /** [[piiScan]] + [[piiRedact]] in one pass — the release-gate frame:
    * per-doc typed counts, total, and the scrubbed text. */
  def piiScrub(df: DataFrame, textCol: String = "text",
               rules: Seq[PiiRule] = defaultPiiRules): DataFrame =
    piiRedact(piiScan(df, textCol, rules), textCol, rules)
}
