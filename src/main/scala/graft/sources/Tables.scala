package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`/root/testdata/sf{N}/<name>.parquet`, see TESTDATA.md).
  *
  * Scale notes: `spark.read.parquet` is the Spark-native columnar scan —
  * vectorized reader, predicate pushdown and column pruning apply
  * automatically, so every downstream operator inherits
  * `PushedFilters`/`ReadSchema` pruning for free. At 100 TB the same call
  * works unchanged over a partitioned directory tree; nothing here assumes
  * single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** [[load]] memoized per (session, path): every `spark.read.parquet`
    * call builds a fresh InMemoryFileIndex (a directory listing) and
    * re-reads the footer schema — measurable fixed cost when a harness
    * runs 50+ queries over the same ten immutable tables, and pure waste
    * at 1000-executor scale where the listing is a namenode round-trip
    * per table per query. Reusing the analyzed relation also makes
    * `persist()` plan-cache hits reliable across queries (the CacheManager
    * keys on the logical plan). ONLY for immutable snapshot inputs: files
    * appended to the directory after first load are not picked up.
    */
  def loadCached(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // events dispatches to its ns-timestamp-aware loader HERE, not at
    // call sites: a raw read of events either crashes
    // (PARQUET_TYPE_ILLEGAL) or silently yields bigint-nanos ts
    // depending on whether someone already set the legacy conf — an
    // iteration-order hazard no caller should be able to reintroduce
    if (name == "events") events(spark, sfDir)
    else cachedRaw(spark, sfDir, name)

  /** MEASURED AND REJECTED as a default (kept opt-in for profiling):
    * blanket-repartitioning the corpus tables at load time un-starves
    * heavy per-row consumers of a single-file snapshot (guide §2.5),
    * but it taxes EVERY query over those tables with one extra
    * exchange + AQE stage — full battery 530.6 → 670.1 s at sf0.1
    * (median per-query ratio 1.22; the q66 bm25 control alone +60%),
    * because ~300 cheap tail queries pay ~0.3 s each for wins on a
    * handful of compute-heavy rows. The targeted fix lives at the
    * heavy per-row entry points instead ([[graft.operators.FrameOps
    * .parallelized]] at shingle/decode/train builds), which the
    * battery confirms as a net win. `SPARK_GRAFT_PARA_TABLES=1`
    * re-enables the blanket form for A/B.
    */
  private val parallelizedTables: Set[String] =
    if (sys.env.get("SPARK_GRAFT_PARA_TABLES").contains("1"))
      Set("documents", "embeddings")
    else Set.empty

  private def cachedRaw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      (k: (SparkSession, String)) => {
        val raw = k._1.read.parquet(k._2)
        if (parallelizedTables.contains(name))
          graft.operators.FrameOps.parallelized(raw)
        else raw
      })

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def region(spark: SparkSession, d: String): DataFrame     = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = load(spark, d, "lineitem")
  /** The events table's `ts` arrives in whatever physical form the data
    * generator chose — observed so far: nanosecond-precision int96-style
    * nanos surfaced as bigint (rejected by Spark's reader without the
    * legacy conf), plain `timestamp[us]` (read as TIMESTAMP_NTZ under
    * Spark 4's NTZ inference), or an already-zoned timestamp. Normalize
    * ALL of them to session-zone TimestampType at microsecond precision
    * (`ts div 1000` floor division for the nanos form — matching
    * DuckDB's `epoch_ns(ts)//1000`; a plain cast for NTZ, exact under
    * the UTC session zone every entrypoint sets), so every downstream
    * operator sees one stable type regardless of generator vintage.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = cachedRaw(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Spark 4's default inference for parquet timestamp[us]; exact
        // under the UTC session zone every entrypoint sets
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case other => // a NEW vintage must fail loudly, not silently
        // coerce (a numeric cast would read seconds, a string cast
        // would parse in the session zone — both quietly wrong)
        throw new IllegalStateException(
          s"events.ts arrived as unrecognized type $other; add an " +
            "explicit normalization for this generator vintage")
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
