package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operations a long-lived lake needs around the
  * query engine — starting with small-file compaction: streaming
  * ingests and per-executor writers leave thousands of KB-scale
  * parquet files whose open/footer costs dominate scans long before
  * data volume does (the classic small-file problem).
  */
object Maintenance {

  /** Rewrite a parquet directory as ~`targetFileBytes`-sized files:
    * output file count = ⌈Σ input bytes / target⌉. Returns that count.
    *
    * The listing is driver-side metadata — one entry per INPUT file,
    * bounded by the very problem being fixed, and never row data. The
    * rewrite itself is one round-robin shuffle of the directory's data:
    * a compaction IS a full rewrite by definition — at 100 TB you run
    * it per partition directory (date=…/source=…), never over the
    * whole table at once, which also keeps each shuffle bounded.
    * Compression ratios shift when row groups merge, so output sizes
    * track the target approximately, not exactly.
    */
  /** Z-order (Morton) clustering value per row: each clustered column
    * maps to an equi-depth bucket in `[0, 2^bits)` via the distributed
    * range-rank core (one range shuffle per column — never a
    * single-task global window), and the buckets' bits interleave into
    * one `zorder` long. Sorting/range-partitioning the table by that
    * value gives every output file a tight min/max range on EVERY
    * clustered column simultaneously — multi-column data skipping,
    * where a plain sort only serves its leading column. Equi-depth
    * bucketing (rank-based, not value-based) makes the curve
    * skew-proof: a power-law column still spreads evenly over buckets.
    * (The rank passes are the price; for roughly-uniform keys the
    * bounds-quantized [[ZOrder.writeZOrdered]] gets the same rectangle
    * property from one min/max aggregate — pick by key shape.)
    *
    * `tieCols` must complete a total order (ranks — and so z-values —
    * are deterministic and engine-replayable only under one). Rows
    * with a null in any clustered column are dropped (no defined curve
    * position). Output: input columns + `bucket_<col>` per clustered
    * column + `zorder`.
    */
  def zorderValues(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
                   tieCols: Seq[String], bits: Int = 8): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2, "z-ordering needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits ($bits) x columns (${cols.size}) must fit a signed long")
    val k = cols.size
    val ranked = cols.zipWithIndex.foldLeft(
      df.filter(cols.map(col(_).isNotNull).reduce(_ && _))) {
      case (acc, (c, i)) => Ranking.rangeRank(acc, Nil, c +: tieCols, s"__r$i")
    }
    val total = ranked.agg(count(lit(1)).as("__n"))
    val bucketed = cols.indices.foldLeft(
      ranked.join(broadcast(total), lit(true))) { (acc, i) =>
      // 1-based rank r of n -> floor((r-1) * 2^bits / n): exact integer
      // arithmetic (DIV), identical in the SQL replay
      acc.withColumn(s"bucket_${cols(i)}",
        expr(s"((__r$i - 1) * ${1L << bits}) DIV __n"))
    }
    val z = (0 until bits).flatMap(b => cols.indices.map(j =>
      expr(s"shiftleft(shiftright(bucket_${cols(j)}, $b) & 1, ${b * k + j})")))
      .reduce(_ + _)
    bucketed.withColumn("zorder", z)
      .drop((cols.indices.map(i => s"__r$i") :+ "__n"): _*)
  }

  /** Write `df` z-ordered on `cols` into `nFiles` range-partitioned,
    * internally sorted parquet files — the layout step that turns
    * [[zorderValues]] into actual scan skipping.
    */
  def zorderWrite(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
                  tieCols: Seq[String], outDir: String, nFiles: Int,
                  bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    zorderValues(df, cols, tieCols, bits)
      .repartitionByRange(nFiles, col("zorder"))
      .sortWithinPartitions(col("zorder"))
      .write.mode("overwrite").parquet(outDir)
  }

  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    val in = new Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(in)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    require(totalBytes > 0, s"no parquet data under $inDir")
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Schema-drift report between two parquet snapshots — the
    * ingestion-side audit a lake runs before a new data drop joins the
    * table family (the batch complement of the sink's schema-subset
    * validation, SURVEY §2A4): full-outer on column name, each column
    * classified added / removed / same / retyped, with both snapshots'
    * type strings shown. Driver-side METADATA only — parquet footer
    * schemas, bounded by column count (the [[compactParquet]] listing
    * precedent) — so the report costs zero data IO at any table size.
    *
    * NESTED schemas flatten to LEAF paths before the join (`a.b.c`;
    * array-of-struct elements as `a[].b`), so a change deep inside a
    * struct surfaces as that one leaf's row — added/removed/retyped —
    * instead of the whole top-level column reading as one opaque
    * `retyped` blob (and a 40-field struct growing one field no longer
    * hides which). Arrays of scalars and maps stay leaves (their
    * simpleString is already atomic). Flat schemas flatten to
    * themselves, so the flat report is unchanged.
    */
  def schemaDiff(spark: SparkSession, dirA: String,
                 dirB: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def leaves(name: String,
               dt: org.apache.spark.sql.types.DataType): Seq[(String, String)] =
      dt match {
        case st: org.apache.spark.sql.types.StructType =>
          st.fields.toSeq.flatMap(f => leaves(s"$name.${f.name}", f.dataType))
        case org.apache.spark.sql.types.ArrayType(
            et: org.apache.spark.sql.types.StructType, _) =>
          et.fields.toSeq.flatMap(f => leaves(s"$name[].${f.name}", f.dataType))
        case other => Seq(name -> other.simpleString)
      }
    def fieldsOf(d: String) = spark.read.parquet(d).schema.fields
      .toSeq.flatMap(f => leaves(f.name, f.dataType))
    val a = fieldsOf(dirA).toDF("col_name", "type_a")
    val b = fieldsOf(dirB).toDF("col_name", "type_b")
    a.join(b, Seq("col_name"), "full_outer")
      .select(col("col_name"), col("type_a"), col("type_b"),
        when(col("type_a").isNull, lit("added"))
          .when(col("type_b").isNull, lit("removed"))
          .when(col("type_a") === col("type_b"), lit("same"))
          .otherwise(lit("retyped")).as("status"))
  }

  /** Referential-integrity audit between a document table and its
    * embedding store — the pre-flight every retrieval/dedup pipeline
    * needs before trusting joins on the id: per run, one row of
    * counts — docs without a vector (stale embedding job), vectors
    * without a doc (orphans from deleted docs), NULL vectors, vectors
    * whose dimension differs from the MODAL dimension (a mixed-model
    * drop — modal, not first-seen, so the majority defines "right"),
    * and vectors containing NaN components (a training-job blowup
    * that poisons every downstream cosine silently). `coverage6` =
    * embedded-doc share, 6 dp.
    *
    * Scale shape: two column-pruned anti-join counts on the id plus
    * one conditional-aggregate pass over the vector frame; the modal
    * dimension is a distinct-dimension-bounded argmax (min-struct on
    * (−count, dim) — ties to the smaller dim, deterministic).
    */
  def embeddingCoverage(docs: org.apache.spark.sql.DataFrame,
                        emb: org.apache.spark.sql.DataFrame,
                        idCol: String = "doc_id",
                        vecIdCol: String = "vec_id",
                        vecCol: String = "embedding"):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val d = docs.select(col(idCol).as("__id"))
    val v = emb.select(col(vecIdCol).as("__vid"), col(vecCol).as("__v"))
    val modal = v.filter(col("__v").isNotNull)
      .groupBy(size(col("__v")).as("__dim")).agg(count(lit(1)).as("__c"))
      .agg(min(struct((-col("__c")).as("nc"), col("__dim").as("d"))).as("m"))
      .select(col("m.d").as("__modal"))
    val stats = v.crossJoin(modal)
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_null_vec"),
        sum(when(col("__v").isNotNull &&
          size(col("__v")) =!= col("__modal"), 1L).otherwise(0L))
          .as("n_bad_dim"),
        sum(when(col("__v").isNotNull &&
          exists(col("__v"), x => isnan(x)), 1L).otherwise(0L))
          .as("n_nonfinite"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val nUnemb = d.join(v.select(col("__vid").as("__id")),
        Seq("__id"), "left_anti")
      .agg(count(lit(1)).as("n_unembedded"))
    val nOrph = v.select(col("__vid").as("__id"))
      .join(d, Seq("__id"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_vecs"))
    nDocs.crossJoin(stats).crossJoin(nUnemb).crossJoin(nOrph)
      .select(col("n_docs"), col("n_vecs"), col("n_unembedded"),
        col("n_orphan_vecs"), col("n_null_vec"), col("n_bad_dim"),
        col("n_nonfinite"),
        round((col("n_docs") - col("n_unembedded")).cast("double") /
          col("n_docs").cast("double"), 6).as("coverage6"))
  }

  /** Order-invariant corpus checksum: Σ over rows of the 52-bit
    * md5-ring fingerprint of the rendered row, plus the row count.
    * Verifies two copies of a dataset are identical — across
    * repartitions, replications, or engines — without sorting either
    * one: the Σ is commutative, every engine renders the same string,
    * and DuckDB replays it as
    * `sum(('0x' || substr(md5(render), 1, 13))::BIGINT)`.
    *
    * Rendering is injective per column list PROVIDED values contain
    * neither U+0001 nor U+0000: columns are joined with a U+0001
    * separator (so ("ab","c") and ("a","bc") fingerprint differently)
    * and a NULL column renders as the U+0000 sentinel (plain concat
    * is null-killing — one NULL would silently drop the whole row
    * from the Σ while n_rows still counts it, voiding the "two copies
    * are identical" guarantee). A value CONTAINING the separator
    * collides across column boundaries — ("a"+U+0001+"b", "c") and
    * ("a", "b"+U+0001+"c") render identically — and a literal
    * one-character U+0000 value collides with
    * NULL — real corpora do carry control characters (that is what
    * [[Cleaning.encodingAnomalies]] scans for), so run the checksum
    * on id/length/hash-like columns, or on text AFTER a control-char
    * scrub, when strict injectivity matters; the DuckDB mirror shares
    * the rendering, so the gate is unaffected either way.
    *
    * The sum accumulates in DECIMAL(38,0) (Σ of 52-bit values
    * overflows i64 beyond ~2¹¹ row-mass at petabyte counts; ANSI would
    * throw) and is emitted as STRING: the value exceeds 2⁵³, and a
    * DECIMAL survives parquet exactly but degrades to float64 on a
    * DuckDB→pandas hop (the q157 gate-typing precedent).
    */
  def corpusChecksum(df: org.apache.spark.sql.DataFrame,
                     cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "corpusChecksum needs at least one column")
    import org.apache.spark.sql.functions._
    df.select(rowFingerprint(cols).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(38,0)")).cast("string").as("checksum"))
  }

  /** The [[corpusChecksum]] rendering: 52-bit md5-ring fingerprint of
    * the U+0001-joined, U+0000-null-sentineled column renderings.
    */
  private def rowFingerprint(cols: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val parts = cols.map(c => coalesce(col(c).cast("string"), lit("\u0000")))
    conv(substring(md5(concat_ws("\u0001", parts: _*).cast("binary")),
      1, 13), 16, 10).cast("long")
  }

  /** Per-GROUP corpus checksums — the incremental form of
    * [[corpusChecksum]] and the actual 100 TB replica-audit primitive:
    * checksum each partition (source / date / shard) separately, diff
    * the two copies' frames on the group key, and re-sync ONLY the
    * groups whose (n_rows, checksum) differ — never re-reading the
    * whole table. Same order-invariant Σ and STRING gate type per
    * group; one map-side-combinable aggregation, |groups| output rows.
    */
  def partitionChecksums(df: org.apache.spark.sql.DataFrame,
                         groupCol: String,
                         cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "partitionChecksums needs at least one column")
    require(!cols.contains(groupCol),
      s"group column $groupCol is keyed by the grouping itself - " +
        "checksum the data columns only")
    import org.apache.spark.sql.functions._
    df.select(col(groupCol), rowFingerprint(cols).as("h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(38,0)")).cast("string").as("checksum"))
  }

  /** Diff two [[partitionChecksums]] frames: groups present in only
    * one copy or disagreeing on (n_rows, checksum) — the re-sync
    * worklist. `status` is missing_left / missing_right / mismatch.
    */
  def checksumDiff(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame,
                   groupCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val l = a.select(col(groupCol), col("n_rows").as("n_rows_a"),
      col("checksum").as("checksum_a"))
    val r = b.select(col(groupCol), col("n_rows").as("n_rows_b"),
      col("checksum").as("checksum_b"))
    l.join(r, Seq(groupCol), "full_outer")
      .withColumn("status",
        when(col("checksum_a").isNull, lit("missing_left"))
          .when(col("checksum_b").isNull, lit("missing_right"))
          .when(col("n_rows_a") =!= col("n_rows_b") ||
            col("checksum_a") =!= col("checksum_b"), lit("mismatch")))
      .filter(col("status").isNotNull)
  }

  /** On-disk inventory of a persisted index directory (any of the four
    * swap-managed families — MinHash bands, IVF, PQ, inverted): one
    * row per expected frame with presence, file/byte footprint, and
    * the two [[IndexSwap]] debris classes an operator pages on —
    * `staged_leftover` (a `__staged` dir: a rebuild died before its
    * swap, or an older generation's stage was never cleaned) and
    * `old_leftover` (an `__old` dir: a swap died mid-promote; readers
    * self-heal via recover, but the debris means the LAST mutation did
    * not complete cleanly). Driver-side listing only — bounded by the
    * index's own file count (parameter/key-scale), zero data read;
    * file-physical state, so the contract is spec-gated (the A12/A14
    * class), not oracle-gated.
    */
  def indexCard(spark: SparkSession, dir: String,
                frames: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(frames.nonEmpty, "indexCard needs the family's frame names")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def footprint(p: Path): (Long, Long) = {
      val it = fs.listFiles(p, true)
      var n = 0L; var b = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile) { n += 1L; b += f.getLen }
      }
      (n, b)
    }
    val rows = frames.map { f =>
      val live = new Path(s"$dir/$f")
      val present = fs.exists(live)
      val (n, b) = if (present) footprint(live) else (0L, 0L)
      // hive-partition count (`cell=N/` dirs): the cell/bucket fan-out
      // an IVF/inverted-list reader sizes probes by — 0 for
      // unpartitioned frames. Feeds the list-balance story (q354):
      // the card says HOW MANY cells, the balance frame how even.
      val nPart =
        if (!present) 0L
        else fs.listStatus(live).count(s =>
          s.isDirectory && s.getPath.getName.contains("=")).toLong
      (f, present, fs.exists(new Path(s"$dir/${f}__staged")),
        fs.exists(new Path(s"$dir/${f}__old")), n, b, nPart)
    }
    import spark.implicits._
    rows.toDF("frame", "present", "staged_leftover", "old_leftover",
      "n_files", "bytes", "n_partitions")
  }

  /** Heal-and-report companion of [[indexCard]]: the card DETECTS swap
    * debris, this runs the family's deterministic recovery
    * ([[IndexSwap.recover]] — finish a mid-promote swap, roll a
    * completed staged generation FORWARD, drop a torn one) and reports
    * what was found as one (frame, kind) row per debris dir, so the
    * operator action is auditable next to the card that prompted it.
    * After a sweep the card reads clean; sweeping a clean index
    * returns zero rows (recover is idempotent and metadata-cheap).
    * Driver-side FS metadata ops only — bounded by the frame list.
    *
    * CAUTION (frame-list overload): [[IndexSwap.recover]]'s
    * all-staged-complete check only spans the frames it is GIVEN.
    * Passing a subset of an index's family (e.g. bands+dropped
    * without shingles for a MinHash index) after a crashed full
    * rebuild can promote the listed frames while the unlisted frame's
    * complete `__staged` is later discarded — new bands paired with
    * old shingles, a silent generation tear. A partial list VOIDS the
    * one-generation guarantee; sweep with the family name (the
    * overload below) or the family's canonical list
    * ([[Dedup.minhashFrames]], [[Similarity.ivfAllFrames]]). */
  def sweepIndexDebris(spark: SparkSession, dir: String,
                       frames: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(frames.nonEmpty, "sweepIndexDebris needs the family's frames")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val found = frames.flatMap { f =>
      Seq("staged", "old").filter(k =>
        fs.exists(new Path(s"$dir/${f}__$k"))).map(k => (f, k))
    }
    IndexSwap.recover(fs, dir, frames)
    import spark.implicits._
    found.toDF("frame", "kind")
  }

  /** The canonical swap-managed frame families, by name — the safe
    * currency for [[sweepIndexDebris]]/[[indexCard]] callers who
    * should never hand-maintain a frame list. */
  val indexFamilies: Map[String, Seq[String]] = Map(
    "minhash" -> Dedup.minhashFrames,
    "ivf" -> Similarity.ivfAllFrames)

  /** Family-keyed [[sweepIndexDebris]]: sweeps the WHOLE canonical
    * family, so recovery's all-staged-complete check always spans
    * every frame a rebuild publishes together — the only form that
    * preserves the one-generation guarantee without the caller
    * knowing the family's frame names. */
  def sweepIndexFamily(spark: SparkSession, dir: String,
                       family: String): org.apache.spark.sql.DataFrame = {
    val frames = indexFamilies.getOrElse(family,
      throw new IllegalArgumentException(
        s"unknown index family '$family' — known: " +
          indexFamilies.keys.toSeq.sorted.mkString(", ")))
    sweepIndexDebris(spark, dir, frames)
  }
}
