package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Cdc

/** Streaming CDC apply: fold a micro-batch change stream onto a
  * versioned parquet snapshot — the keep-a-table-current loop run
  * WITHOUT a table format, via [[Cdc.applyChangesVersioned]]: the
  * snapshot stores each key's winning version, so late-arriving stale
  * changes lose across batch boundaries, not just within a batch.
  *
  * Snapshot layout: `dir/v=N/` per applied batch plus a `CURRENT`
  * pointer file, updated by write-temp-then-rename (atomic on HDFS and
  * POSIX). Readers resolve `CURRENT` and never see a half-written
  * version; old versions stay readable (cheap time travel) until a
  * retention sweep removes them. Writing a NEW directory per batch —
  * never overwriting the one being read — is what makes the
  * read-fold-write cycle safe: Spark cannot overwrite a parquet dir
  * that is an input of the running plan.
  *
  * Scale notes: each micro-batch rewrites the full snapshot (correct and
  * simple; the rewrite is one `applyChanges` shuffle over |snapshot| +
  * |batch| rows). At table sizes where a full rewrite per batch is too
  * much, partition the snapshot by key range and rewrite only the
  * partitions a batch touches — the fold itself is unchanged.
  */
object StreamingCdc {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed version number, or -1 before the first apply. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val cur = new Path(dir, "CURRENT")
    if (!f.exists(cur)) -1L
    else {
      val in = f.open(cur)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  /** Read the current snapshot (empty-with-schema before first apply
    * cannot exist — callers seed via [[apply]] with an initial batch or
    * check [[currentVersion]] first).
    */
  def readSnapshot(spark: SparkSession, dir: String,
                   version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else currentVersion(spark, dir)
    require(v >= 0, s"no committed snapshot under $dir")
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Apply one batch of changes; commits version `currentVersion + 1`
    * and atomically repoints `CURRENT`. The first apply treats upserts
    * as inserts into an empty base.
    */
  def apply(spark: SparkSession, dir: String, changes: DataFrame,
            keyCol: String, versionCol: String, opCol: String): Long = {
    val f = fs(spark, dir)
    val cur = currentVersion(spark, dir)
    // the snapshot KEEPS versionCol per key, so a later batch carrying a
    // stale (lower) version for a key loses against the stored row
    val snapshotCols = changes.columns.filterNot(_ == opCol).toSeq
    val base =
      if (cur >= 0) readSnapshot(spark, dir, cur)
      else changes.select(snapshotCols.map(org.apache.spark.sql.functions.col): _*)
        .limit(0)
    val next = Cdc.applyChangesVersioned(base, changes, keyCol, versionCol, opCol)
    val v = cur + 1
    next.write.mode("overwrite").parquet(s"$dir/v=$v")
    // atomic pointer swap: write CURRENT.tmp, rename over CURRENT
    val tmp = new Path(dir, "CURRENT.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val target = new Path(dir, "CURRENT")
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"could not commit CURRENT -> v=$v")
    v
  }

  /** `foreachBatch` hook: `changes.writeStream.foreachBatch(
    * StreamingCdc.applier(spark, dir, "k", "version", "op")).start()`.
    */
  def applier(spark: SparkSession, dir: String, keyCol: String,
              versionCol: String, opCol: String): (DataFrame, Long) => Unit =
    (batch, _) => { apply(spark, dir, batch, keyCol, versionCol, opCol); () }
}
