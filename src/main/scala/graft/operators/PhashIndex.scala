package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted perceptual-hash near-dup index — the MULTIMODAL member of the
  * persisted-index family ([[Dedup.writeMinhashIndex]] for text shingles,
  * [[Similarity]]'s IVF frames for embeddings): hash a media corpus once
  * with [[Multimodal.perceptualHash]] (real dHash for images, real
  * envelope hash for PCM WAV), persist the signatures and their 16-bit
  * pigeonhole blocking keys, and let later batches dedup AGAINST the
  * corpus without re-decoding a single stored payload — the incremental
  * form a continuously-ingesting multimodal training pipeline needs.
  *
  * Layout under `dir` (all key-scale, NEVER payload bytes):
  *   sigs    = (doc, sig)        — one long per asset, the hamming-verify side
  *   chunks  = (chunk, ck, doc)  — 4 blocking keys per asset
  *   dropped = (chunk, ck)       — over-cap bucket keys, the recall ledger
  *
  * The same generation discipline as the text index: a build stages all
  * three frames and publishes them in one [[IndexSwap]] swap; an append
  * swaps chunks+dropped as one generation and appends sigs as new files
  * (sigs rows are never rewritten); [[Dedup.droppedAudit]]'s contract
  * applies unchanged via [[phashDroppedAudit]].
  *
  * Scale shape at 100 TB: payload decode happens exactly once per asset,
  * at build/append time, inside the zero-shuffle `perceptualHash` map;
  * everything persisted or probed afterwards is (long, long) keys. A
  * probe is two equi-joins (batch chunk keys vs stored chunks, then the
  * sig verify) — candidate-bounded, no corpus scan of anything wider
  * than the two-column key frames.
  */
object PhashIndex {

  /** Canonical frame family (see [[Dedup.minhashFrames]] for why this is
    * public): a rebuild rewrites all three as one generation; an append
    * swaps only chunks/dropped.
    */
  val phashFrames = Seq("sigs", "chunks", "dropped")
  private val phashAppendFrames = Seq("chunks", "dropped")

  /** (doc, sig) rows: real perceptual hashes of the batch, null-hash rows
    * (null/empty payloads) dropped.
    */
  private def sigsOf(assets: DataFrame, idCol: String): DataFrame =
    Multimodal.perceptualHash(assets)
      .filter(col("phash").isNotNull)
      .select(col(idCol).as("doc"), col("phash").as("sig"))

  /** The four 16-bit pigeonhole keys of a signature column. */
  private def chunkKeys(sigs: DataFrame): DataFrame =
    sigs.select(col("doc"), posexplode(
      transform(sequence(lit(0), lit(3)),
        k => call_function("shiftright", col("sig"), k * 16)
          .bitwiseAND(0xFFFFL)))
      .as(Seq("chunk", "ck")))

  /** Build the index: decode+hash the corpus once, persist signatures,
    * blocking keys (over-cap (chunk, ck) buckets dropped and their keys
    * recorded — the [[Dedup.writeMinhashIndex]] skew guard paid at build
    * time), and publish the three frames as one generation.
    */
  def write(assets: DataFrame, dir: String, idCol: String = "asset_id",
            maxChunkBucket: Long = 100000L): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(assets.sparkSession.sparkContext.hadoopConfiguration)
    IndexSwap.clean(fs, dir, phashFrames)
    val sigs = sigsOf(assets, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.write.mode("overwrite").parquet(IndexSwap.stagedPath(dir, "sigs"))
      val w = Window.partitionBy(col("chunk"), col("ck"))
      val counted = chunkKeys(sigs).withColumn("__n", count(lit(1)).over(w))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        counted.filter(col("__n") <= maxChunkBucket).drop("__n")
          .write.mode("overwrite")
          .parquet(IndexSwap.stagedPath(dir, "chunks"))
        counted.filter(col("__n") > maxChunkBucket)
          .select(col("chunk"), col("ck")).distinct()
          .write.mode("overwrite")
          .parquet(IndexSwap.stagedPath(dir, "dropped"))
      } finally counted.unpersist()
    } finally sigs.unpersist()
    IndexSwap.swapAll(fs, dir, phashFrames)
  }

  /** Incremental maintenance — hash ONLY the new batch and fold its keys
    * in, exactly [[Dedup.appendMinhashIndex]]'s algebra on the phash
    * domain: the result set-equals the index [[write]] would build over
    * corpus ∪ batch. Touched (chunk, ck) buckets are re-counted against
    * the cap (a bucket pushed past it is dropped whole and recorded),
    * build-time-dropped buckets stay dropped, ids already in the index
    * are skipped (`dedupeBatch`, default on — an at-least-once replayed
    * batch re-appends as a no-op), and chunks/dropped publish as one
    * generation before sigs append as new files.
    */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             idCol: String = "asset_id", maxChunkBucket: Long = 100000L,
             dedupeBatch: Boolean = true): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexSwap.recover(fs, dir, phashFrames)
    // Two shapes, picked by whether a just-run probe already decoded
    // the batch (the [[Dedup.appendMinhashIndex]] guard on the phash
    // domain — per-asset hashing commutes with the already-indexed
    // filter, so both compute the same rows):
    //  - PROBE-WARM (streaming probe-then-append,
    //    [[graft.streaming.StreamingPhashDedup.processBatch]]): the
    //    probe ([[nearDups]]) cached the full-batch (doc, sig) frame;
    //    hash the FULL batch (CacheManager substitutes the cache — the
    //    payload decode runs ONCE per micro-batch) and anti-join the
    //    hashed rows against the stored ids.
    //  - COLD (one-shot bulk append): decode only what survives — the
    //    raw-id anti-join runs first, so already-indexed payloads are
    //    never decoded (sign-first on this path was the r16 q312-class
    //    regression).
    // Registered via [[TrackedCaches.track]] (which dedupes against the
    // probe's registration) rather than persist/unpersist-in-finally: a
    // local unpersist here would sweep the probe's still-live shared
    // cache. Dataset.storageLevel does the CacheManager lookup
    // (sameResult on the canonicalized plan) via public API only.
    val probeWarm = sigsOf(batch, idCol).storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val bSigs =
      if (!dedupeBatch)
        TrackedCaches.track(sigsOf(batch, idCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else if (probeWarm)
        TrackedCaches.track(sigsOf(batch, idCol)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          .join(spark.read.parquet(s"$dir/sigs")
            .select(col("doc")), Seq("doc"), "left_anti")
      else
        // parallelize the BATCH side before the anti-join: the joined
        // frame's inputFiles includes the index dir, so perceptualHash's
        // internal un-starve check would see >= cores files and leave
        // the payload decode at the 1-task scan's width
        TrackedCaches.track(
          sigsOf(FrameOps.parallelized(batch)
              .join(spark.read.parquet(s"$dir/sigs")
                .select(col("doc").as(idCol)), Seq(idCol), "left_anti"),
            idCol)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    locally {
      val dropped0 = spark.read.parquet(s"$dir/dropped")
      val live = chunkKeys(bSigs)
        .join(dropped0, Seq("chunk", "ck"), "left_anti")
      val iChunks = spark.read.parquet(s"$dir/chunks")
      val touched = live.select(col("chunk"), col("ck")).distinct()
      val storedTouched = iChunks.join(touched, Seq("chunk", "ck"),
        "left_semi")
      val storedUntouched = iChunks.join(touched, Seq("chunk", "ck"),
        "left_anti")
      val w = Window.partitionBy(col("chunk"), col("ck"))
      // distinct before the recount: the crash window where a prior
      // append swapped chunks but its sigs-append did not lands the
      // replayed batch's keys on top of stored copies (same reasoning
      // as the text index)
      val counted = storedTouched
        .unionByName(live.select(iChunks.columns.map(col): _*))
        .dropDuplicates(iChunks.columns.toIndexedSeq)
        .withColumn("__n", count(lit(1)).over(w))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val newChunks = storedUntouched.unionByName(
          counted.filter(col("__n") <= maxChunkBucket).drop("__n"))
          .select(iChunks.columns.map(col): _*)
        val newDropped = dropped0.unionByName(
          counted.filter(col("__n") > maxChunkBucket)
            .select(col("chunk"), col("ck")).distinct())
        newChunks.write.mode("overwrite")
          .parquet(IndexSwap.stagedPath(dir, "chunks"))
        newDropped.write.mode("overwrite")
          .parquet(IndexSwap.stagedPath(dir, "dropped"))
      } finally counted.unpersist()
      IndexSwap.swapAll(fs, dir, phashAppendFrames)
      bSigs.write.mode("append").parquet(s"$dir/sigs")
    }
  }

  /** Near-dup pairs of a NEW batch against the index plus within the
    * batch itself — [[Dedup.nearDupsFromIndex]]'s shape on the hamming
    * domain: the batch is decoded+hashed once; candidates come from the
    * stored blocking keys (build-dropped buckets excluded on BOTH sides,
    * as a rebuild would) and the within-batch pigeonhole; the verify is
    * one xor+bit_count per candidate against the stored sigs. Ids must
    * be unique across corpus ∪ batch; pairs are oriented id_a < id_b
    * with batch×index pairs oriented (index doc, batch doc) by id order
    * like every near-dup output.
    */
  def nearDups(spark: SparkSession, dir: String, batch: DataFrame,
               idCol: String = "asset_id", maxHamming: Int = 3,
               maxChunkBucket: Long = 100000L): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes hamming <= 3")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexSwap.recover(fs, dir, phashFrames)
    // used by both the blocking and the verify legs; session-registered
    // so Bench's cold mode / Curation.report can sweep it after
    // materialization (the decode must not run twice per probe)
    val bSigs = TrackedCaches.track(sigsOf(batch, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dropped0 = spark.read.parquet(s"$dir/dropped")
    val bChunks = chunkKeys(bSigs)
      .join(dropped0, Seq("chunk", "ck"), "left_anti")
    // batch × index candidates: equi-join on the blocking key
    val crossCand = bChunks.select(col("chunk"), col("ck"),
        col("doc").as("doc_b"))
      .join(spark.read.parquet(s"$dir/chunks")
        .select(col("chunk"), col("ck"), col("doc").as("doc_a")),
        Seq("chunk", "ck"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    // within-batch candidates: the in-memory pigeonhole, cap applied
    val withinCand = Dedup.groupedPairs(bChunks, Seq("chunk", "ck"),
      maxChunkBucket)
    val allSigs = spark.read.parquet(s"$dir/sigs").unionByName(bSigs)
    // disjoint by construction (cross always has one index-side doc),
    // so a plain union needs no dedup
    crossCand.unionByName(withinCand)
      .join(allSigs.select(col("doc").as("doc_a"), col("sig").as("sig_a")),
        "doc_a")
      .join(allSigs.select(col("doc").as("doc_b"), col("sig").as("sig_b")),
        "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        col("hamming"))
  }

  /** The index's recall-cap ledger — [[Dedup.droppedAudit]]'s one-row
    * contract over the phash frames: kept vs dropped blocking-bucket
    * keys and their ratio. Key-frame scans only.
    */
  def droppedAudit(spark: SparkSession, dir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexSwap.recover(fs, dir, phashFrames)
    val kept = spark.read.parquet(s"$dir/chunks")
      .select(col("chunk"), col("ck")).distinct()
      .agg(count(lit(1)).as("n_buckets"))
    val dropped = spark.read.parquet(s"$dir/dropped")
      .agg(count(lit(1)).as("n_dropped"))
    kept.crossJoin(dropped)
      .select(col("n_buckets"), col("n_dropped"),
        round(col("n_dropped").cast("double") /
          (col("n_buckets") + col("n_dropped")).cast("double"), 6)
          .as("dropped_rate"))
  }
}
