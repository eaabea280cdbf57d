package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical feature encoding for training pipelines.
  *
  * Smoothed target (mean) encoding is the standard high-cardinality
  * categorical → numeric transform: category c maps to
  * `(Σ_c y + m·ȳ) / (n_c + m)` — the category mean shrunk toward the
  * global mean ȳ with pseudo-count weight `m`, so rare categories don't
  * memorize noise. The leave-one-out variant excludes each row's OWN
  * target from its encoding — `(Σ_c y − y_i + m·ȳ) / (n_c − 1 + m)` —
  * the train-time form that avoids direct target leakage.
  *
  * Relational plan: ONE map-side-combinable `groupBy(category)` pass for
  * (Σ_c, n_c), one one-row global aggregate (broadcast — structurally a
  * single row), and a null-safe equi-join of the category stats back
  * onto the rows. The stats frame scales with category cardinality, so
  * its join selection stays with Catalyst/AQE (broadcast when small,
  * shuffle when not) — no forced broadcast. Per-row arithmetic is a
  * fixed double tree over DECIMAL(30,6)-exact sums, rounded to 6 dp, so
  * results are order-free and engine-portable.
  */
object Encoding {

  /** Per-row smoothed target encoding. Output keeps `df`'s columns and
    * appends `enc` (smoothed category mean) and, when `loo`, `enc_loo`
    * (leave-one-out form; null for singleton categories where the
    * excluded row leaves nothing behind only if `m = 0`). Null targets
    * are excluded from the sums but still receive an encoding. A null
    * category is a real category (`<=>` join semantics).
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   m: Double, loo: Boolean = false): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val y = col(targetCol)
    val stats = df.groupBy(col(catCol).as(catCol))
      .agg(sum(y.cast("decimal(30,6)")).as("__sum_c"),
        count(y).as("__n_c"))
    val global = df.agg(
      sum(y.cast("decimal(30,6)")).as("__sum_g"),
      count(y).as("__n_g"))
    val gmean = col("__sum_g").cast("double") / col("__n_g").cast("double")
    // an all-null-target category has a NULL sum but a real encoding
    // (pure shrinkage toward the global mean)
    val sumC = coalesce(col("__sum_c"), lit(0)).cast("double")
    val nC = col("__n_c").cast("double")
    val joined = FrameOps.statsJoinOn(df, stats, Seq(catCol))
      .crossJoin(broadcast(global))
      .withColumn("enc",
        round((sumC + lit(m) * gmean) / (nC + lit(m)), 6))
    val out =
      if (!loo) joined
      else joined.withColumn("enc_loo",
        when(y.isNull, col("enc")).otherwise(
          when(nC - lit(1.0) + lit(m) > 0d,
            round((sumC - y.cast("double") + lit(m) * gmean) /
              (nC - lit(1.0) + lit(m)), 6))))
    out.drop("__sum_c", "__n_c", "__sum_g", "__n_g")
  }

  /** The hashing trick: text → fixed-width signed bag-of-words vector,
    * `value(bucket) = Σ_{terms hashing to bucket} sign(term)·tf` — the
    * unbounded-vocabulary featurizer (no dictionary to build, ship, or
    * grow stale; collisions cancel in expectation thanks to the sign
    * hash). Output is the SPARSE form, one row per (doc, non-zero
    * bucket) — the dense vector is `nBuckets` wide only on paper.
    *
    * Fully parallel: tokenize → per-(doc, term) tf (one shuffle) →
    * per-(doc, bucket) signed sum (one shuffle, map-side combined). The
    * hash family is the repo's portable md5 idiom: bucket from the
    * first 52 md5 bits mod `nBuckets`, sign from the 14th hex digit's
    * parity — deterministic and replayable in any engine with md5.
    */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
                   nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val h = conv(substring(md5(col("term").cast("binary")), 1, 13),
      16, 10).cast("long")
    val sign = when(conv(substring(md5(col("term").cast("binary")), 14, 1),
      16, 10).cast("long") % 2L === 0L, 1L).otherwise(-1L)
    TextAnalysis.docTerms(df, idCol, textCol)
      .withColumn("bucket", pmod(h, lit(nBuckets.toLong)))
      .withColumn("__sv", sign * col("tf"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sv")).as("value"))
      .filter(col("value") =!= 0L)
  }

  /** Dense fixed-width companion of [[hashFeatures]] for model
    * training: one row per document with columns `x1..x{nBuckets}`
    * (DOUBLE) holding the signed-hash bag-of-words bucket sums,
    * zero-filled where no term lands — the feature frame a
    * [[LogReg]] quality classifier trains on directly (the
    * fastText-lite / DataComp web-filter shape: hashed BoW + linear
    * model; no dictionary to build, ship, or grow stale). Same md5
    * bucket/sign family as [[hashFeatures]] — deterministic and
    * engine-replayable. Documents with no non-empty token produce no
    * terms and drop out, matching the sparse form.
    *
    * Scale: one shuffle to (doc, term) tf, then ONE map-side-
    * combinable aggregate to the dense row — the `nBuckets` per-bucket
    * sums ride a single groupBy(doc), never a pivot or nBuckets
    * passes. Bucket sums are bounded by document token count, far
    * inside [[LogReg.MaxFeatureAbs]] for any chunked corpus.
    */
  def hashFeatureVector(df: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1024,
      s"nBuckets must be in [2, 1024], got $nBuckets")
    val h = conv(substring(md5(col("term").cast("binary")), 1, 13),
      16, 10).cast("long")
    val sign = when(conv(substring(md5(col("term").cast("binary")), 14, 1),
      16, 10).cast("long") % 2L === 0L, 1L).otherwise(-1L)
    val base = TextAnalysis.docTerms(df, idCol, textCol)
      .withColumn("bucket", pmod(h, lit(nBuckets.toLong)))
      .withColumn("__sv", sign * col("tf"))
    val aggs = (1 to nBuckets).map { i =>
      coalesce(sum(when(col("bucket") === (i - 1).toLong, col("__sv"))),
        lit(0L)).cast("double").as(s"x$i")
    }
    base.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }
}
