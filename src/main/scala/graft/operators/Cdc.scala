package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance over snapshot tables — the two
  * operations every lakehouse ingest pipeline performs without a table
  * format: latest-wins upsert/delete application ([[applyChanges]]) and
  * slowly-changing-dimension intervalization ([[scd2]]).
  *
  * Scale design: both are single-shuffle, key-local computations.
  * [[applyChanges]] reduces each key with `max_by(struct(...), version)`
  * — an aggregation, so the map side pre-reduces every partition to one
  * candidate row per key BEFORE the shuffle (a row_number window would
  * shuffle every change row and sort). [[scd2]] is two window passes
  * over one key-shuffle (change-collapse, then interval close), state
  * bounded by a key's history.
  */
object Cdc {

  /** Snapshot reconciliation diff: compare two versions of a table by
    * key and report every divergence — `added` (key only in `newDf`),
    * `removed` (only in `oldDf`), `changed` (present in both with at
    * least one compare column differing, null-safely), with the
    * differing column names in `changed_cols` (sorted,
    * comma-joined; empty for added/removed). Identical rows are NOT
    * emitted — the output is the (usually tiny) drift set, which is
    * what makes the operator usable at 100 TB: one key-shuffle full
    * outer join, no broadcast, output proportional to the drift.
    *
    * Contract: `keyCols` must be non-null and unique per side (the
    * usual reconciliation precondition — null keys never equi-join and
    * would surface as phantom added+removed pairs).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    val oldSel = oldDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__o_$c")) :+ lit(true).as("__in_old"): _*)
    val newSel = newDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__n_$c")) :+ lit(true).as("__in_new"): _*)
    // concat_ws drops the nulls of the unchanged columns' `when`s
    val changed = concat_ws(",", compareCols.sorted.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*)
    oldSel.join(newSel, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(changed =!= "", "changed"))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changed).otherwise(lit("")))
      .select(keyCols.map(col) :+ col("change_type") :+ col("changed_cols"): _*)
  }

  /** Apply a change stream onto a base snapshot, latest version wins.
    * `changes` carries `keyCol`, `versionCol` (monotone per key, unique
    * within a key — enforced upstream by the log's ordering), `opCol`
    * (`"upsert"` or `"delete"`) and the base's value columns. Base rows
    * participate at version `Long.MinValue` (any real change beats
    * them). A key whose latest op is `delete` disappears; keys never
    * touched survive unchanged.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   versionCol: String, opCol: String): DataFrame = {
    val valueCols = base.columns.filterNot(_ == keyCol).toSeq
    require(valueCols.nonEmpty, "base needs at least one non-key column")
    val baseAsChanges = base
      .withColumn(versionCol, lit(Long.MinValue))
      .withColumn(opCol, lit("upsert"))
      .select(col(keyCol) +: col(versionCol) +: col(opCol) +:
        valueCols.map(col): _*)
    val unioned = baseAsChanges
      .unionByName(changes.select(col(keyCol) +: col(versionCol) +:
        col(opCol) +: valueCols.map(col): _*))
    val packed = struct(col(opCol) +: valueCols.map(col): _*)
    unioned.groupBy(col(keyCol))
      .agg(max_by(packed, col(versionCol)).as("__latest"))
      .filter(col(s"__latest.$opCol") =!= "delete")
      .select(col(keyCol) +: valueCols.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** [[applyChanges]] variant where the BASE carries its own per-key
    * `versionCol` (a snapshot that remembers the version that produced
    * each row — [[graft.streaming.StreamingCdc]]'s layout): a change
    * only wins against a key when its version is higher than the stored
    * one, so late-arriving stale changes lose across batch boundaries.
    * Output keeps `versionCol` (the winning version per key). Deleted
    * keys drop entirely — a later lower-versioned change CAN resurrect
    * one (tombstones are not retained; retain the delete in the change
    * log if that matters).
    */
  def applyChangesVersioned(base: DataFrame, changes: DataFrame, keyCol: String,
                            versionCol: String, opCol: String): DataFrame = {
    val valueCols = base.columns
      .filterNot(c => c == keyCol || c == versionCol).toSeq
    require(valueCols.nonEmpty, "base needs at least one non-key column")
    val ordered = Seq(col(keyCol), col(versionCol), col(opCol)) ++ valueCols.map(col)
    val unioned = base.withColumn(opCol, lit("upsert")).select(ordered: _*)
      .unionByName(changes.select(ordered: _*))
    val packed = struct(col(opCol) +: valueCols.map(col): _*)
    unioned.groupBy(col(keyCol))
      .agg(max_by(packed, col(versionCol)).as("__latest"),
        max(col(versionCol)).as(versionCol))
      .filter(col(s"__latest.$opCol") =!= "delete")
      .select(col(keyCol) +: col(versionCol) +:
        valueCols.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Golden-record merge (column-level survivorship): one row per key
    * where EACH value column independently takes its value from the
    * latest version at which that column was NON-NULL — the classic MDM
    * merge of sparse change events ([[applyChanges]] is row-level: a
    * later row with a null column nulls the attribute; this keeps the
    * last known value instead). One aggregation, map-side combinable:
    * per column `max_by(col, version WHERE col IS NOT NULL)` plus the
    * overall latest version.
    */
  def goldenRecord(changes: DataFrame, keyCol: String,
                   versionCol: String): DataFrame = {
    val valueCols = changes.columns
      .filterNot(c => c == keyCol || c == versionCol).toSeq
    require(valueCols.nonEmpty, "changes need at least one value column")
    val aggs = valueCols.map { c =>
      // max_by skips rows whose ordering expression is null, so this is
      // "value at the latest version where the value was present"
      max_by(col(c), when(col(c).isNotNull, col(versionCol))).as(c)
    } :+ max(col(versionCol)).as("last_version")
    changes.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** SCD-2 intervalization: from a per-key change-event stream, build
    * `[valid_from, valid_to)` validity intervals for `attrCol`,
    * collapsing consecutive events that carry the SAME value (re-stating
    * an unchanged attribute opens no new interval). The newest interval
    * per key is open (`valid_to` NULL, `is_current` true). `orderCol`
    * must totally order a key's events.
    */
  def scd2(events: DataFrame, keyCol: String, orderCol: String,
           attrCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val collapsed = events
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
      // keep the first event and every value CHANGE (null-safe compare: a
      // real null attribute is distinct from "no previous row")
      .filter(col("__rn") === 1 || !(col(attrCol) <=> col("__prev")))
      .drop("__prev", "__rn")
    collapsed
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("is_current"))
  }
}
