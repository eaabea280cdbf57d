package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the most recent right row
  * with `right.ts <= left.ts` on the same key (the event-time feature-join
  * every training-data pipeline needs; DuckDB spells it `ASOF LEFT JOIN`).
  *
  * Spark has no native as-of join; rather than a custom `SparkStrategy`,
  * this composes existing operators (preference order (a) of the build
  * plan): tag both sides, union, and carry the latest right payload
  * forward with `last(ignoreNulls = true)` over a
  * (key, ts)-ordered running window — right rows sort before left rows at
  * equal timestamps, so the match is inclusive. One shuffle on the key,
  * one sort; both scale horizontally (the window never crosses keys, so
  * 1000 executors shard cleanly — no broadcast, no quadratic term).
  *
  * Output: every left row + `asof_<payload>` columns (null when no right
  * row precedes it).
  */
object AsOfJoin {

  /** @param rightTieCol breaks ties among right rows sharing (key, ts):
    *   the greatest value wins (any column with a total order). Without
    *   it, equal-timestamp right rows resolve arbitrarily.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String], rightTieCol: Option[String] = None): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right-side payload column")
    val leftCols = left.columns.toSeq
    val outPayload = payloadCols.map(c => s"asof_$c")

    // Left rows keep their columns; right rows contribute key, ts and
    // their payload wrapped in ONE struct — the struct is non-null for
    // every right row even when individual payload fields are null, so
    // `last(ignoreNulls)` selects the most recent right ROW (a per-column
    // carry would skip genuinely-null payload values and could stitch
    // fields from different right rows).
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))
    val tieType = rightTieCol.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol).as("__ts"), col("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    // Null-ts right rows can never satisfy `right.ts <= left.ts` (DuckDB
    // ASOF agrees); left in, they'd sort nulls-first and become a bogus
    // "most recent" payload for left rows with no true predecessor.
    val r = right
      .filter(col(tsCol).isNotNull)
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol).as("__ts"), col("__side"),
        rightTieCol.map(col).getOrElse(lit(null).cast(tieType)).as("__tie"),
        struct(payloadCols.map(col): _*).as("__payload")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(r)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col("__ts").as(tsCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payloadCols.zip(outPayload).map { case (c, o) =>
          col("__matched").getField(c).as(o) }: _*)
  }
}
