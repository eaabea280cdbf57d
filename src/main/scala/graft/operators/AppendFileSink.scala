package graft.operators

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}

/** Append-mode rotating text-file sink — the one behavior Spark cannot
  * express natively (`df.write.mode("append")` adds *new* files; the
  * reference appends to *existing* files). Re-expresses, Spark-first, the
  * reference's `AppendOutputFormat` semantics
  * (ref `AppendOutputFormat.java:59-248`):
  *
  *  - candidate discovery: files named `prefix-<createTime>` that are
  *    smaller than the size threshold and younger than the age threshold
  *    (0 disables either) are eligible for reuse
  *    (ref `AppendOutputFormat.java:80-94`);
  *  - partition→file assignment: candidates sorted by createTime; task
  *    *i* reuses the *i*-th candidate, else creates a new timestamped file
  *    (ref `AppendOutputFormat.java:94-99`);
  *  - append-or-create lazily on first record
  *    (ref `AppendOutputFormat.java:208-221`);
  *  - size-based rotation with create-race retry
  *    (ref `AppendOutputFormat.java:223-242`).
  *
  * Scale design (100 TB / 1000 executors): candidate discovery runs ONCE on
  * the driver and the sorted list ships inside the closure — the reference
  * re-lists the directory in every task (`O(files × tasks)` namenode RPCs at
  * scale). Each task then opens exactly one stream and writes its partition
  * record-at-a-time with O(1) state; no shuffle is introduced (the sink
  * preserves upstream partitioning, like the reference's map-side
  * `BatchSink`).
  *
  * Commit semantics: like the reference's no-op committer, writes are
  * visible immediately and a retried task re-appends its partition
  * (at-least-once). `spark.speculation` MUST be off for this sink — a
  * speculative attempt would run a second concurrent writer against the
  * same candidate file (HDFS append-lease conflict / interleaved lines).
  * Exactly-once would require staging to temp files and renaming on task
  * commit, which forfeits true append-to-existing-file semantics.
  *
  * Documented divergences from reference behavior (SURVEY §4.2 "known
  * bugs"): (a) rotation honors the documented 0=unlimited semantics (the
  * reference's writer rotates after every record at threshold 0); (b) the
  * rotation counter starts at the reused file's current length, so
  * reused files are bounded by the threshold too; (c) commit semantics are
  * the reference's no-op committer (at-least-once, writes visible
  * immediately) — documented, not accidental.
  */
object AppendFileSink {

  /** Hadoop Configuration is not java-serializable; standard wrapper. */
  private final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
    }
  }

  private final case class FileInfo(name: String, createTime: Long, size: Long)

  /** Parse `prefix-<createTime>` names (ref `AppendOutputFormat.java:149-158`). */
  private def parseFileInfo(prefix: String, name: String, size: Long): Option[FileInfo] =
    if (!name.startsWith(prefix + "-")) None
    else name.substring(prefix.length + 1).toLongOption.map(FileInfo(name, _, size))

  /** Append-candidate discovery (ref `AppendOutputFormat.java:80-94`),
    * driver-side: prefix match AND size < sizeThreshold (0 = no limit) AND
    * age relative to `logicalStartTime` < ageThreshold (0 = no limit);
    * sorted by createTime then name for deterministic assignment.
    */
  private[graft] def discoverCandidates(
      fs: FileSystem, dir: Path, conf: AppendSinkConfig,
      logicalStartTime: Long): Seq[String] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .filter(_.isFile)
      .flatMap(st => parseFileInfo(conf.fileNamePrefix, st.getPath.getName, st.getLen))
      .filter(fi => conf.sizeThresholdBytes == 0 || fi.size < conf.sizeThresholdBytes)
      .filter(fi => conf.ageThresholdMs == 0 ||
        logicalStartTime - fi.createTime < conf.ageThresholdMs)
      .sortBy(fi => (fi.createTime, fi.name))
      .map(_.name)
  }

  /** Checksumming LocalFileSystem cannot `append()`; substitute the raw FS
    * (ref `AppendOutputFormat.java:65-72`, the local-FS shim).
    */
  private def appendableFs(path: Path, hconf: Configuration): FileSystem =
    path.getFileSystem(hconf) match {
      case lfs: LocalFileSystem => lfs.getRaw
      case fs => fs
    }

  /** Fail fast, not just document: a speculative attempt is a second
    * concurrent writer on the same candidate file (lease conflict on HDFS,
    * interleaved/duplicated lines on local FS). Speculation is a static
    * SparkContext conf, so checking once at write() entry is sound.
    */
  private[graft] def requireNoSpeculation(conf: org.apache.spark.SparkConf): Unit =
    require(!conf.getBoolean("spark.speculation", defaultValue = false),
      "AppendFileSink requires spark.speculation=false: a speculative task " +
        "attempt would append the same partition into the same file concurrently")

  /** Serialize `df` per [[LineSerializer]] and append the lines into
    * `conf.outputDir`, reusing eligible files. Throws on validation
    * failure (all failures accumulated into the message, mirroring the
    * reference's FailureCollector-then-throw —
    * ref `FileAppenderSink.java:63-68`).
    *
    * @param logicalStartTime the run's logical timestamp (the reference
    *   receives it from the pipeline framework,
    *   ref `FileAppenderSink.java:114-115`); new files are named
    *   `prefix-<time>` from it.
    */
  def write(df: DataFrame, conf: AppendSinkConfig,
            logicalStartTime: Long = System.currentTimeMillis()): Unit = {
    val failures = conf.validateAll(df.schema)
    if (failures.nonEmpty)
      throw new IllegalArgumentException(
        "Invalid append sink config: " + failures.map(_.message).mkString(" "))

    val spark = df.sparkSession
    requireNoSpeculation(spark.sparkContext.getConf)
    val dir = new Path(conf.outputDir)
    val hconfDriver = spark.sparkContext.hadoopConfiguration
    val driverFs = appendableFs(dir, hconfDriver)
    if (!driverFs.exists(dir)) driverFs.mkdirs(dir)
    val candidates = discoverCandidates(driverFs, dir, conf, logicalStartTime)

    val lines = LineSerializer.toLines(df, conf.fieldSeparator, conf.outputSchema,
      conf.quoted)
    val serConf = new SerializableConf(hconfDriver)
    val outputDir = conf.outputDir
    val prefix = conf.fileNamePrefix
    val sizeThreshold = conf.sizeThresholdBytes
    val lineDelim = "\n".getBytes(StandardCharsets.UTF_8)

    // Materialize the RDD ONCE and run foreachPartition on that same RDD:
    // `ds.foreachPartition` would trigger a second execution, and with AQE
    // the second run can finalize a different partition count than the one
    // `nParts` was read from — a task with partId >= nParts would then share
    // a residue class (partId mod nParts) with another task, re-opening the
    // same-millisecond create collision the residue scheme exists to prevent.
    val rdd = lines.select("line").as(Encoders.STRING).rdd
    val nParts = math.max(1, rdd.getNumPartitions)
    rdd.foreachPartition {
      iter: Iterator[String] =>
        if (iter.hasNext) {
          val partId = TaskContext.getPartitionId()
          val dirPath = new Path(outputDir)
          val fs = appendableFs(dirPath, serConf.value)

          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          var currentSize = 0L

          // Every name task `partId` creates — initial AND rotation — is
          // aligned to the residue class `t ≡ partId (mod nParts)`, so
          // concurrent tasks of one job can NEVER pick the same name even
          // when their wall-clocks coincide (LocalFileSystem create is
          // check-then-create, not atomic; T1+p1 == T2+p2 collisions were
          // possible with plain time+partId names). Names stay parseable
          // `prefix-<long>` and within nParts ms of the true time.
          def alignUp(t0: Long): Long =
            t0 + (((partId - t0) % nParts + nParts) % nParts)

          // Create a fresh `prefix-<time>` file; on a create race (a file
          // from a PREVIOUS run owns the name — same-run tasks are disjoint
          // by residue) retry with the next timestamp in this task's class
          // (ref `AppendOutputFormat.java:227-241`).
          def createNew(firstTime: Long): Unit = {
            var t = alignUp(firstTime)
            var attempts = 0
            while (out == null) {
              val p = new Path(dirPath, s"$prefix-$t")
              try {
                out = fs.create(p, false)
                currentSize = 0L
              } catch {
                case _: IOException if attempts < 10000 =>
                  attempts += 1
                  t = alignUp(math.max(System.currentTimeMillis(), t + 1))
              }
            }
          }

          // Partition-indexed assignment (ref `AppendOutputFormat.java:94-99`):
          // task i reuses candidate i if one exists, else creates a new
          // timestamped file in its own residue class.
          if (partId < candidates.length) {
            val p = new Path(dirPath, candidates(partId))
            currentSize = fs.getFileStatus(p).getLen
            out = fs.append(p)
          } else {
            createNew(logicalStartTime)
          }

          // Pre-write rotation check — files overshoot by at most one
          // record, matching the reference (ref `AppendOutputFormat.java:
          // 214-216`); 0 = unlimited per the documented semantics.
          try {
            iter.foreach { line =>
              if (sizeThreshold > 0 && currentSize > sizeThreshold) {
                out.close(); out = null
                createNew(System.currentTimeMillis())
              }
              val bytes = line.getBytes(StandardCharsets.UTF_8)
              out.write(bytes)
              out.write(lineDelim)
              currentSize += bytes.length + lineDelim.length
            }
          } finally {
            if (out != null) out.close()
          }
        }
    }
  }

  /** Compact the sink directory's many small files (the operational cost
    * of append-with-rotation at scale: every run leaves ≤ #partitions
    * part-files) into files of at most `maxRecordsPerFile` lines, named in
    * the sink's own `prefix-<createTime>` format so subsequent appends
    * discover and reuse them. MUST NOT run concurrently with writers
    * (same single-writer constraint as the sink itself: no commit
    * protocol, writes visible immediately).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, conf: AppendSinkConfig,
              maxRecordsPerFile: Long = 1000000L,
              compactTime: Long = System.currentTimeMillis()): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    val dir = new Path(conf.outputDir)
    val fs = appendableFs(dir, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    // only files the sink itself would recognize (same parse as candidate
    // discovery) — a foreign `part-<uuid>` from a plain df.write must not
    // be absorbed and deleted
    val originals = fs.listStatus(dir).toSeq.filter(_.isFile)
      .filter(st => parseFileInfo(conf.fileNamePrefix, st.getPath.getName,
        st.getLen).isDefined)
    if (originals.isEmpty) return
    val tmp = new Path(conf.outputDir + "__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // fan-in from the already-listed sizes (no extra read pass): aim for
    // files around the sink's own rotation threshold
    val targetBytes = if (conf.sizeThresholdBytes > 0) conf.sizeThresholdBytes
      else 128L * 1024 * 1024
    val totalBytes = originals.map(_.getLen).sum
    val nFiles = math.max(1L, math.ceil(totalBytes.toDouble / targetBytes).toLong).toInt
    spark.read.textFile(originals.map(_.getPath.toString): _*)
      .coalesce(nFiles)
      .write.option("maxRecordsPerFile", maxRecordsPerFile).text(tmp.toString)
    val parts = fs.listStatus(tmp).toSeq.filter(_.isFile)
      .map(_.getPath).filter(_.getName.startsWith("part-")).sortBy(_.getName)
    // crash-safety order: move the compacted copies IN first, delete the
    // originals after — any crash window leaves duplication (the sink's
    // documented at-least-once semantics), never loss. A failed rename
    // must abort before the deletes.
    //
    // Dest names must not collide with any ORIGINAL: rename() on
    // RawLocalFileSystem silently overwrites, so a dest that matched an
    // original's timestamp would clobber it and the delete pass below would
    // then remove the just-renamed compacted file — permanent loss. Start
    // past every original createTime (they can run ahead of the wall clock:
    // create names are time+residue, or a caller's future logicalStartTime)
    // and skip any name that still exists.
    val maxOrigTime = originals
      .flatMap(st => parseFileInfo(conf.fileNamePrefix, st.getPath.getName,
        st.getLen).map(_.createTime)).max
    var destTime = math.max(compactTime, maxOrigTime + 1)
    parts.foreach { p =>
      var dest = new Path(dir, s"${conf.fileNamePrefix}-$destTime")
      while (fs.exists(dest)) {
        destTime += 1
        dest = new Path(dir, s"${conf.fileNamePrefix}-$destTime")
      }
      if (!fs.rename(p, dest))
        throw new IOException(s"compact: rename $p -> $dest failed; originals untouched")
      destTime += 1
    }
    originals.foreach(st => fs.delete(st.getPath, false))
    fs.delete(tmp, true)
  }

  /** Structured-Streaming form of the sink: each micro-batch appends into
    * the same directory with the batch epoch as its logical start time —
    * exactly the reference's deployment pattern of repeated pipeline runs
    * appending to one FileSet (ref `PipelineTest.java:163-187`), expressed
    * as `writeStream.foreachBatch`. Usage:
    * {{{
    *   df.writeStream.foreachBatch(AppendFileSink.foreachBatchWriter(conf)).start()
    * }}}
    */
  def foreachBatchWriter(conf: AppendSinkConfig,
                         batchTime: Long => Long = _ => System.currentTimeMillis())
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => write(batch, conf, batchTime(batchId))

  /** Readback source (ref `FileAppenderSink.java:93`, A15): scan what the
    * sink wrote as a DataFrame of lines, or separator-split with a schema.
    */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.text(dir)

  def readCsv(spark: org.apache.spark.sql.SparkSession, dir: String,
              sep: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    // escape = '"' : RFC-4180 doubled-quote unescaping, matching what
    // LineSerializer's quoted mode writes (Spark's default escape is '\')
    spark.read.option("sep", sep).option("escape", "\"")
      .schema(schema).csv(dir)
}
