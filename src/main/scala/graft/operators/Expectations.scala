package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/dbt-test shape): a
  * rule set evaluated against a frame into one (rule, n_violations,
  * passed) report — the gate a pipeline runs before promoting a data
  * drop.
  *
  * Scale design: every ROW-LOCAL rule (null, range, set, regex) is a
  * conditional counter inside ONE aggregation — one scan, map-side
  * combined, however many rules there are. Uniqueness rules are not
  * row-local (they need a key count) and each adds one hash-agg shuffle
  * over its key; their violation count is the number of EXTRA rows
  * (total - distinct keys), so a fully-unique key scores 0.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Violated when `column` is NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }
  /** Violated when non-null and outside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($column,$lo,$hi)"
  }
  /** Violated when non-null and not in `allowed`. */
  final case class OneOf(column: String, allowed: Seq[String]) extends Rule {
    val name = s"one_of($column)"
  }
  /** Violated when non-null and not FULLY matching `regex` (the pattern
    * is wrapped in `^(?:...)$`, so an unanchored pattern cannot silently
    * degrade to substring-find semantics).
    */
  final case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches($column)"
  }
  /** Violated (counted once per surplus row) when `columns` do not
    * uniquely identify rows.
    */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique(${columns.mkString(",")})"
  }

  private def violationCol(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case OneOf(c, allowed) =>
      col(c).isNotNull && !col(c).isin(allowed: _*)
    case Matches(c, re) =>
      // rlike is substring-FIND; anchor to enforce the documented
      // full-match contract regardless of the caller's pattern
      col(c).isNotNull && !col(c).rlike(s"^(?:$re)$$")
    case _: Unique =>
      throw new IllegalArgumentException("unique rules are not row-local")
  }

  /** Evaluate `rules`; returns (rule, n_violations, passed) — one row
    * per rule, deterministic rule order preserved via an index column
    * the caller can sort on.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    val rowLocal = rules.zipWithIndex.collect {
      case (r, i) if !r.isInstanceOf[Unique] => (r, i)
    }
    val uniques = rules.zipWithIndex.collect {
      case (r: Unique, i) => (r, i)
    }
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map { case (r, i) =>
          // index-keyed alias: rule names contain dots/parens, which
          // col() would parse as field access
          sum(when(violationCol(r), 1L).otherwise(0L)).as(s"__v_$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = rowLocal.map { case (r, i) =>
          struct(lit(i.toLong).as("rule_idx"), lit(r.name).as("rule"),
            coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"))
        }
        Some(one.select(explode(array(rows: _*)).as("r")).select(col("r.*")))
      }
    val uniqueReports = uniques.map { case (r, i) =>
      df.groupBy(r.columns.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
        .select(lit(i.toLong).as("rule_idx"), lit(r.name).as("rule"),
          col("n_violations"))
    }
    (localReport.toSeq ++ uniqueReports)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("n_violations") === 0L)
  }
}
