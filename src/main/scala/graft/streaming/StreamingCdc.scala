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

  /** Read a COMMITTED snapshot (the current one by default). An explicit
    * `version` must carry its commit marker — a claimed-but-uncommitted
    * directory (crashed or in-flight writer) is rejected, not silently
    * read as partial data.
    */
  def readSnapshot(spark: SparkSession, dir: String,
                   version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else currentVersion(spark, dir)
    require(v >= 0, s"no committed snapshot under $dir")
    require(fs(spark, dir).exists(new Path(dir, s"commit-$v")),
      s"version $v under $dir is not committed (claimed/vacuumed/partial)")
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Apply one batch of changes as the next version. Optimistic commit
    * against racing writers (the deployment contract is ONE writer —
    * Structured Streaming's `foreachBatch` — this protocol makes a
    * violation fail loudly instead of losing data):
    *
    *  1. read the base = latest committed snapshot;
    *  2. atomically CLAIM a version number (`claim-N`, overwrite=false —
    *     two writers targeting the same N serialize here, before any
    *     data is touched, so a committed directory can never be
    *     clobbered);
    *  3. write `v=N/`;
    *  4. VALIDATE that the base is still the latest commit — if another
    *     writer committed meanwhile, our fold is missing its changes:
    *     abort (remove our claim + data) and throw, never publishing a
    *     snapshot that silently drops a committed batch;
    *  5. create the immutable `commit-N` marker readers look for;
    *  6. RE-VALIDATE after creating the marker: step 4 alone has a
    *     window — two writers can both pass it before either marker
    *     exists — but both cannot pass step 6 (each re-lists strictly
    *     after creating its own marker, so at least one sees the
    *     other's). Markers record their BASE version, so the check can
    *     tell a legitimate successor (folded from our snapshot,
    *     base ≥ ours — not a conflict) from a racer (a commit between
    *     our base and our version, or a higher commit whose base
    *     predates us). On a genuine conflict we retract our marker +
    *     data and throw; a concurrent reader that already listed the
    *     retracted marker fails its scan loudly (files gone), it never
    *     reads partial rows.
    *
    * A crash mid-apply leaves an orphaned claim/dir that later writers
    * skip past (next version = max over claims AND commits + 1) and
    * never a marker pointing at uncommitted bytes. The first apply
    * treats upserts as inserts into an empty base. Net: under a
    * two-writer contract violation, every interleaving ends with at
    * least one writer throwing and no published chain silently missing
    * a batch whose writer saw success.
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
    f.create(new Path(dir, s"claim-$v"), false).close()
    next.write.mode("overwrite").parquet(s"$dir/v=$v")
    // commit-time validation: if a commit landed after our base read,
    // publishing would silently drop that batch's changes — abort loudly
    if (currentVersion(spark, dir) != cur) {
      f.delete(new Path(dir, s"v=$v"), true)
      f.delete(new Path(dir, s"claim-$v"), false)
      throw new java.io.IOException(
        s"concurrent writer detected under $dir (base was v=$cur, " +
          "another commit landed) - aborted without publishing; this " +
          "store requires a single writer, retry the batch")
    }
    // the marker RECORDS our base version, so a later writer's
    // re-validation can tell a successor commit (folded from ours,
    // base >= our version) from a racer (base below our version)
    val out = f.create(new Path(dir, s"commit-$v"), false)
    out.write(s"base=$cur\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // post-commit re-validation (docstring step 6): our marker now exists,
    // so any racing writer's re-list sees it — and ours sees theirs if it
    // landed first. Fatal-to-us commits are (a) one BETWEEN our base and
    // our version (our fold missed it) or (b) one ABOVE ours whose
    // recorded base predates us (a racer that missed our batch now owns
    // the chain head). A successor that folded our snapshot (base >= v)
    // is the normal single-writer continuation — NOT a conflict, and
    // retracting under it would delete a version the live chain was
    // built from.
    val conflicting = f.listStatus(p).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("commit-"))
      .map(_.stripPrefix("commit-").toLong)
      .exists(c => (c > cur && c < v) ||
        (c > v && commitBase(f, dir, c).forall(_ < v)))
    if (conflicting) {
      f.delete(new Path(dir, s"commit-$v"), false)
      f.delete(new Path(dir, s"v=$v"), true)
      f.delete(new Path(dir, s"claim-$v"), false)
      throw new java.io.IOException(
        s"concurrent commit detected under $dir after publishing v=$v " +
          s"(base was v=$cur) - retracted our marker; this store requires " +
          "a single writer, retry the batch")
    }
    v
  }

  /** The base version recorded inside a commit marker, None when the
    * marker is empty/unreadable (pre-metadata markers) — callers treat
    * None conservatively as "base unknown, assume it predates us".
    */
  private def commitBase(f: org.apache.hadoop.fs.FileSystem, dir: String,
                         c: Long): Option[Long] =
    try {
      val in = f.open(new Path(dir, s"commit-$c"))
      val bytes = try in.readAllBytes() finally in.close()
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim
      if (s.startsWith("base=")) Some(s.stripPrefix("base=").trim.toLong)
      else None
    } catch { case _: Exception => None }

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
      // STRICTLY below the oldest kept commit are dead: every live writer
      // claims above the newest commit, so anything under the kept window
      // can only be a crash leftover. With no commits at all there is no
      // such floor — an in-flight FIRST writer may hold claim-0 — so
      // nothing is swept.
      committed.takeRight(keepLast).headOption.foreach { floor =>
        f.listStatus(p).iterator
          .map(_.getPath.getName)
          .filter(n => n.startsWith("claim-") &&
            n.stripPrefix("claim-").toLong < floor &&
            !committed.contains(n.stripPrefix("claim-").toLong))
          .foreach { n =>
            f.delete(new Path(dir, n), false)
            f.delete(new Path(dir, "v=" + n.stripPrefix("claim-")), true)
          }
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
