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
  * Snapshot layout: `dir/v=N/` per applied batch plus one immutable
  * `commit-N` marker file per committed version, created AFTER the
  * version directory is fully written (`FileSystem.create` of a new
  * file is atomic). Readers take the highest marker — there is no
  * mutable pointer to swap, so no window in which a reader can observe
  * "no current version" mid-commit, and a crash between data write and
  * marker creation simply leaves an uncommitted directory behind. Old
  * versions stay readable (cheap time travel) until a retention sweep
  * removes them. Writing a NEW directory per batch — never overwriting
  * the one being read — is what makes the read-fold-write cycle safe:
  * Spark cannot overwrite a parquet dir that is an input of the running
  * plan.
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

  /** Latest committed version number, or -1 before the first apply —
    * the highest `commit-N` marker present (one listing; markers are
    * immutable once created).
    */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) -1L
    else f.listStatus(p).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("commit-"))
      .map(_.stripPrefix("commit-").toLong)
      .foldLeft(-1L)(math.max)
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

  /** Apply one batch of changes as the next version. Two-phase commit
    * against racing writers: atomically CLAIM the version number first
    * (`claim-N` created with overwrite=false — the loser fails here,
    * BEFORE touching any data), then write `v=N/`, then create the
    * `commit-N` marker readers look for. A crash mid-apply leaves an
    * orphaned claim/dir that later writers skip past (the next version =
    * max over claims AND commits + 1) and never a marker pointing at
    * uncommitted bytes. The first apply treats upserts as inserts into
    * an empty base.
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
    // next version: one past every CLAIMED or committed version, so a
    // racing/crashed writer's claim is never reused
    val p = new Path(dir)
    if (!f.exists(p)) f.mkdirs(p)
    val taken = f.listStatus(p).iterator
      .map(_.getPath.getName)
      .collect {
        case n if n.startsWith("commit-") => n.stripPrefix("commit-").toLong
        case n if n.startsWith("claim-") => n.stripPrefix("claim-").toLong
      }
      .foldLeft(cur)(math.max)
    val v = taken + 1
    // phase 1: atomic claim — a concurrent writer targeting the same v
    // fails HERE, before any data is written, so it can never clobber a
    // committed directory
    f.create(new Path(dir, s"claim-$v"), false).close()
    // phase 2: data, then the immutable commit marker readers look for
    next.write.mode("overwrite").parquet(s"$dir/v=$v")
    f.create(new Path(dir, s"commit-$v"), false).close()
    v
  }

  /** Retention sweep: drop all committed versions except the newest
    * `keepLast` (the current version is always kept). The marker is
    * removed BEFORE the data directory, so a crashed sweep leaves
    * an orphaned (unreferenced) directory, never a marker pointing at
    * missing data. Time travel to vacuumed versions is gone by
    * definition. Returns the removed version numbers.
    */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else {
      val committed = f.listStatus(p).iterator
        .map(_.getPath.getName)
        .filter(_.startsWith("commit-"))
        .map(_.stripPrefix("commit-").toLong)
        .toSeq.sorted
      val drop = committed.dropRight(keepLast)
      drop.foreach { v =>
        f.delete(new Path(dir, s"commit-$v"), false)
        f.delete(new Path(dir, s"claim-$v"), false)
        f.delete(new Path(dir, s"v=$v"), true)
      }
      // orphaned claims (claimed but never committed — crashed writers)
      // older than the kept window are dead by construction: no current
      // or future writer will commit them
      val floor = committed.takeRight(keepLast).headOption.getOrElse(Long.MaxValue)
      f.listStatus(p).iterator
        .map(_.getPath.getName)
        .filter(n => n.startsWith("claim-") &&
          n.stripPrefix("claim-").toLong < floor &&
          !committed.contains(n.stripPrefix("claim-").toLong))
        .foreach { n =>
          f.delete(new Path(dir, n), false)
          f.delete(new Path(dir, "v=" + n.stripPrefix("claim-")), true)
        }
      drop
    }
  }

  /** `foreachBatch` hook: `changes.writeStream.foreachBatch(
    * StreamingCdc.applier(spark, dir, "k", "version", "op")).start()`.
    */
  def applier(spark: SparkSession, dir: String, keyCol: String,
              versionCol: String, opCol: String): (DataFrame, Long) => Unit =
    (batch, _) => { apply(spark, dir, batch, keyCol, versionCol, opCol); () }
}
