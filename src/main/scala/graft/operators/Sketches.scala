package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via
  * Spark's built-in `hll_sketch_agg` family): the INCREMENTAL path for
  * corpus-wide cardinality at 100 TB. `approx_count_distinct` answers
  * one query in one pass but leaves nothing behind; a persisted sketch
  * frame (one binary column per partition/source/day) lets tomorrow's
  * job fold ONLY tomorrow's data and union register-wise — the same
  * additivity shape as [[Fingerprint]] checksums, for cardinality.
  *
  * Register-wise union takes the per-register MAX, so the merged
  * estimate is order- and partitioning-independent (deterministic for a
  * fixed input set, same as any one-pass build over the union — the
  * [[graft]] reproducibility bar), and sketch bytes survive a parquet
  * round trip losslessly.
  *
  * Accuracy is the standard HLL bound (~1.04/√2^lgK ≈ 1.6% relative
  * error at the default lgK=12, ~4 KB per sketch); exact distinct
  * stays available from [[Profile.profile]] where the corpus is small
  * enough to afford it.
  */
object Sketches {

  /** One row per group: `(groupCols…, sketch BINARY, estimate BIGINT)`.
    * Null keys are excluded (HLL counts values; `count_distinct`
    * semantics), matching the exact-distinct convention.
    */
  def distinctSketch(df: DataFrame, keyCol: String, groupCols: Seq[String],
                     lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of DataSketches range: $lgK")
    val gc = groupCols.map(col)
    val base = df.filter(col(keyCol).isNotNull)
      .groupBy(gc: _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))
    base.withColumn("estimate", hll_sketch_estimate(col("sketch")))
  }

  /** Fold a sketch frame down to one row per coarser group set (empty =
    * whole corpus): register-wise union, then the merged estimate —
    * runs on the SKETCH frame (∝ groups × 4 KB), never the corpus.
    */
  def mergeSketches(sketches: DataFrame,
                    groupCols: Seq[String] = Nil): DataFrame = {
    val merged =
      if (groupCols.isEmpty) sketches.groupBy()
        .agg(hll_union_agg(col("sketch")).as("sketch"))
      else sketches.groupBy(groupCols.map(col): _*)
        .agg(hll_union_agg(col("sketch")).as("sketch"))
    merged.withColumn("estimate", hll_sketch_estimate(col("sketch")))
  }

  // ----------------------------------------------- count-min (frequency)

  private def cmsFromBytes(b: Array[Byte]) =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(b))

  private def cmsToBytes(s: org.apache.spark.util.sketch.CountMinSketch) = {
    val bos = new java.io.ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }

  /** Mergeable FREQUENCY sketches (count-min, via Spark's built-in
    * `count_min_sketch` aggregate) — the heavy-hitter companion to the
    * HLL cardinality family: per-group serialized sketches that answer
    * "how often does key k appear" within `eps·N` overcount (never
    * under), persistable and additive so incremental loads never rescan
    * history. Keys are sketched AS STRINGS (one canonical byte form →
    * point queries and merges are representation-independent).
    */
  def freqSketch(df: DataFrame, keyCol: String, groupCols: Seq[String],
                 eps: Double = 0.001, confidence: Double = 0.99,
                 seed: Int = 42): DataFrame = {
    require(eps > 0 && eps < 1, s"eps out of (0,1): $eps")
    val gc = groupCols.map(col)
    df.filter(col(keyCol).isNotNull)
      .groupBy(gc: _*)
      .agg(count_min_sketch(col(keyCol).cast("string"), lit(eps),
        lit(confidence), lit(seed)).as("sketch"))
  }

  /** Counter-wise sum of CMS sketches (same eps/confidence/seed —
    * enforced by the library's incompatible-merge exception): the
    * merged sketch is BYTE-IDENTICAL to a one-pass build over the
    * union, the additivity law that makes per-day sketch frames
    * foldable. Runs on the sketch frame only.
    */
  def mergeFreqSketches(sketches: DataFrame,
                        groupCols: Seq[String] = Nil): DataFrame = {
    val merge = udaf(new org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = Array.emptyByteArray
      def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = merge(b, a)
      def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
        if (x.isEmpty) y else if (y.isEmpty) x
        else cmsToBytes(cmsFromBytes(x).mergeInPlace(cmsFromBytes(y)))
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
      def outputEncoder = org.apache.spark.sql.Encoders.BINARY
    })
    if (groupCols.isEmpty)
      sketches.groupBy().agg(merge(col("sketch")).as("sketch"))
    else sketches.groupBy(groupCols.map(col): _*)
      .agg(merge(col("sketch")).as("sketch"))
  }

  // ----------------------------------------------- quantiles (GK)

  /** Mergeable QUANTILE sketches — the percentile member completing the
    * incremental-monitoring family (HLL = cardinality, CMS = frequency,
    * GK = rank): one compressed Greenwald–Khanna summary per group as a
    * persistable binary column ([[graft.functions.QuantileSketchAgg]])
    * plus the exact row count. A query at fraction p returns a value
    * with rank within ±ε·n of target; the merge law preserves the bound
    * for the union, so per-day sketch frames fold without rescanning
    * history — [[Outliers.winsorize]]'s `exact=false` path computes the
    * same GK summaries transiently; this persists them.
    *
    * Unlike the HLL/CMS rows, GK merge output is order-dependent WITHIN
    * the error bound, so the family is spec-verified (rank-error law,
    * parquet round-trip, merged-n additivity), not hash-gated —
    * documented like the HLL q-less row.
    */
  def quantileSketch(df: DataFrame, valueCol: String, groupCols: Seq[String],
                     relativeError: Double = 0.01): DataFrame = {
    val gc = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .groupBy(gc: _*)
      .agg(graft.functions.QuantileSketchAgg
          .sketch(col(valueCol).cast("double"), relativeError).as("sketch"),
        count(lit(1)).as("n"))
  }

  /** GK merge of a quantile-sketch frame down to a coarser group set
    * (empty = whole corpus): runs on the sketch frame only. `n` stays
    * exact (plain sum).
    */
  def mergeQuantileSketches(sketches: DataFrame,
                            groupCols: Seq[String] = Nil): DataFrame = {
    val qs = graft.functions.QuantileSketchAgg
    val merge = udaf(new org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = Array.emptyByteArray
      def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = merge(b, a)
      def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
        if (x.isEmpty) y else if (y.isEmpty) x
        else qs.toBytes(qs.fromBytes(x).merge(qs.fromBytes(y)))
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
      def outputEncoder = org.apache.spark.sql.Encoders.BINARY
    })
    if (groupCols.isEmpty)
      sketches.groupBy().agg(merge(col("sketch")).as("sketch"),
        sum(col("n")).cast("long").as("n"))
    else sketches.groupBy(groupCols.map(col): _*)
      .agg(merge(col("sketch")).as("sketch"),
        sum(col("n")).cast("long").as("n"))
  }

  /** Quantile estimates from a sketch frame: one row per (sketch row ×
    * probe fraction). The whole probe list runs in ONE udf call per
    * sketch row (the [[estimateFrequencies]] one-deserialization
    * lesson). Empty sketches yield null values.
    */
  def estimateQuantiles(sketches: DataFrame,
                        probes: Seq[Double]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe fraction")
    require(probes.forall(p => p >= 0 && p <= 1),
      s"probe fractions out of [0,1]: $probes")
    val qs = graft.functions.QuantileSketchAgg
    val est = udf((bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty)
        probes.map(p => (p, Option.empty[Double]))
      else {
        val s = qs.fromBytes(bytes)
        probes.map(p => (p, s.query(p)))
      })
    sketches
      .withColumn("__qv", explode(est(col("sketch"))))
      .withColumn("q", col("__qv._1"))
      .withColumn("value", col("__qv._2"))
      .drop("sketch", "__qv")
  }

  /** Point-frequency estimates: one row per (sketch row × probe key),
    * with the CMS guarantee estimate ≥ true count. The probe set is
    * caller-bounded (heavy-hitter candidates, not the key universe).
    * The whole probe list is evaluated in ONE udf call per sketch row —
    * one deserialization serves all |probes| lookups — and the
    * (key, estimate) structs explode afterwards (round-7 advice: the
    * explode-before-udf order deserialized the sketch |probes| times).
    */
  def estimateFrequencies(sketches: DataFrame,
                          probes: Seq[String]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe key")
    val est = udf((bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty) probes.map(k => (k, 0L))
      else {
        val cms = cmsFromBytes(bytes)
        probes.map(k => (k, cms.estimateCount(k)))
      })
    sketches
      .withColumn("__kv", explode(est(col("sketch"))))
      .withColumn("key", col("__kv._1"))
      .withColumn("estimate", col("__kv._2"))
      .drop("sketch", "__kv")
  }
}
