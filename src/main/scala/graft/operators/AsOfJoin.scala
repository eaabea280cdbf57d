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

    // left rows keep their columns; right rows contribute only key, ts and
    // (renamed) payload; each side gets nulls for the other's columns
    val tieType = rightTieCol.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol).as("__ts"), col("__side"),
        lit(null).cast(tieType).as("__tie")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        outPayload.map(c => lit(null).cast(
          right.schema(payloadCols(outPayload.indexOf(c))).dataType).as(c)): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol).as("__ts"), col("__side"),
        rightTieCol.map(col).getOrElse(lit(null).cast(tieType)).as("__tie")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.zip(outPayload).map { case (c, o) => col(c).as(o) }: _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(r)
      .select(Seq(col(keyCol), col("__ts"), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        outPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .withColumnRenamed("__ts", tsCol)
      .drop("__side")
  }
}
