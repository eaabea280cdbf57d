package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Left as-of join: for each left row, attach the nearest right row on
  * the same key — `direction = "backward"` (default) takes the most
  * recent right row with `right.ts <= left.ts` (the event-time
  * feature-join every training-data pipeline needs; DuckDB spells it
  * `ASOF LEFT JOIN ... >=`), `direction = "forward"` the earliest right
  * row with `right.ts >= left.ts` (next-event lookup: conversion lag,
  * time-to-failure). An optional `toleranceUs` bound nulls the match
  * when the nearest row is farther than the given gap — since the
  * nearest row minimizes the gap, no other row could qualify either
  * (pandas `merge_asof(tolerance=...)` semantics).
  *
  * Spark has no native as-of join; rather than a custom `SparkStrategy`,
  * this composes existing operators (preference order (a) of the build
  * plan): tag both sides, union, and carry the nearest right payload
  * with `last(ignoreNulls = true)` over a (key, ts)-ordered running
  * window — right rows sort before left rows at equal timestamps, so
  * the match is inclusive in both directions. One shuffle on the key,
  * one sort; both scale horizontally (the window never crosses keys, so
  * 1000 executors shard cleanly — no broadcast, no quadratic term).
  *
  * Output: every left row + `asof_<payload>` columns (null when no right
  * row qualifies).
  */
object AsOfJoin {

  /** @param rightTieCol breaks ties among right rows sharing (key, ts):
    *   the greatest value wins (any column with a total order). Without
    *   it, equal-timestamp right rows resolve arbitrarily.
    * @param toleranceUs maximum |left.ts − right.ts| for a match to
    *   stand, in MICROSECONDS when `tsCol` is a timestamp, in the
    *   column's own units when it is numeric.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String], rightTieCol: Option[String] = None,
           direction: String = "backward",
           toleranceUs: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right-side payload column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    require(toleranceUs.forall(_ >= 0), "tolerance must be >= 0")
    val forward = direction == "forward"
    val leftCols = left.columns.toSeq
    val outPayload = payloadCols.map(c => s"asof_$c")

    // Left rows keep their columns; right rows contribute key, ts and
    // their payload wrapped in ONE struct — the struct is non-null for
    // every right row even when individual payload fields are null, so
    // `last(ignoreNulls)` selects the nearest right ROW (a per-column
    // carry would skip genuinely-null payload values and could stitch
    // fields from different right rows). The match's own ts rides in the
    // struct (`__mts`) for the tolerance check.
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema(tsCol).copy(name = "__mts") +:
        payloadCols.map(c => right.schema(c).copy(name = c)))
    val tieType = rightTieCol.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol).as("__ts"), col("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    // Null-ts right rows can never satisfy the as-of inequality (DuckDB
    // ASOF agrees); left in, they'd sort nulls-first and become a bogus
    // "nearest" payload for left rows with no true match.
    val r = right
      .filter(col(tsCol).isNotNull)
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol).as("__ts"), col("__side"),
        rightTieCol.map(col).getOrElse(lit(null).cast(tieType)).as("__tie"),
        struct(col(tsCol).as("__mts") +: payloadCols.map(col): _*)
          .as("__payload")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // backward: ascending ts, the running last() is the latest right row
    // at or before the left row. forward: DESCENDING ts, so the running
    // last() is the EARLIEST right row at or after it. Right sorts
    // before left at equal ts either way (inclusive match); among
    // equal-(ts, side) right rows the greatest tie value wins. Null-ts
    // LEFT rows must sort at the window START in both directions (a null
    // probe matches nothing) — descending order is nulls-LAST by
    // default, which would hand them the whole right side.
    val ord: Seq[Column] =
      if (forward) Seq(col("__ts").desc_nulls_first, col("__side"),
        col("__tie").asc_nulls_first)
      else Seq(col("__ts").asc_nulls_first, col("__side"),
        col("__tie").asc_nulls_first)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    // each operand converts by ITS OWN side's timestamp type — keying
    // both on the left type would compare micros against seconds when
    // the sides' ts types differ
    def toUnits(c: Column,
                dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case TimestampType    => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast("timestamp"))
      case _                => c.cast("long")
    }
    val gapOk = toleranceUs match {
      case None => lit(true)
      case Some(tol) =>
        abs(toUnits(col("__ts"), left.schema(tsCol).dataType) -
          toUnits(col("__matched.__mts"), right.schema(tsCol).dataType)) <= tol
    }

    l.unionByName(r)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__matched", when(gapOk, col("__matched")))
      .select(Seq(col(keyCol), col("__ts").as(tsCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payloadCols.zip(outPayload).map { case (c, o) =>
          col("__matched").getField(c).as(o) }: _*)
  }
}
