package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic regression — the quality-classifier
  * TRAINING step of a training-data pipeline (label a small rule-derived
  * set, fit weights over interpretable text features, score and filter
  * the corpus; the fastText-classifier pattern of DataComp/CCNet-style
  * curation, re-expressed with a linear model the engine can both train
  * and REPLAY exactly).
  *
  * Determinism/oracle-portability (the PageRank/HITS/BPE recipe applied
  * to model training): gradient ascent on the log-likelihood with a
  * FIXED iteration count from an all-zero start. Per iteration each
  * row's residual terms `x_j · (y − p)` are 12-dp-quantized
  * ([[ExactSum]] digit-split sums — order-free, map-side-combinable,
  * long-speed), so the gradient is an exact integer both engines
  * recombine identically; every derived double (σ via `exp`, the /n,
  * the `lr·g` update) is a correctly-rounded IEEE op DuckDB reproduces
  * bit-for-bit. The whole training run is a pure function of the data —
  * an unrolled CTE chain replays it (q237's oracle).
  *
  * Scale shape: ONE aggregation job per iteration over the cached
  * feature frame — a handful of digit-split long sums, no shuffle
  * beyond the one-row partial-agg combine, no driver state beyond the
  * (d+1)-double weight vector (parameter-bounded, the Pq-codebook
  * precedent). At 100 TB each iteration is one corpus scan; `df` should
  * arrive pre-projected to the feature columns.
  */
object LogReg {

  /** A fitted model: feature names in training order, the z-score
    * standardization statistics (part of the model — scoring must apply
    * the TRAINING-set preprocessing), and the weight vector (intercept
    * first). Plain driver values, so the deployment pattern "train in a
    * batch job, apply anywhere" needs no frame round-trip — including a
    * Structured Streaming pipeline, where [[probability]] is a
    * stateless per-row expression
    * ([[graft.streaming.StreamingQualityFilter]]).
    */
  case class Model(featureCols: Seq[String], stats: Seq[(Double, Double)],
                   weights: Array[Double]) {
    /** σ(w·z(x)) over THIS frame's feature columns — z folds left over
      * (intercept, standardized features) in declared order, the exact
      * association the oracle mirrors.
      */
    def probability: Column = {
      val z = featureCols.zip(stats).zipWithIndex
        .foldLeft(lit(weights(0)): Column) { case (acc, ((f, (m, s)), j)) =>
          acc + lit(weights(j + 1)) * ((col(f) - lit(m)) / lit(s))
        }
      lit(1.0) / (lit(1.0) + exp(negate(z)))
    }
  }

  /** σ(w·x) as a column over ALREADY-standardized features: z folds
    * left over (intercept, features) in declared order — the exact
    * association the oracle mirrors.
    */
  private def sigmoid(w: Array[Double], feats: Seq[String]): Column = {
    val z = feats.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, j)) => acc + lit(w(j + 1)) * col(f)
    }
    lit(1.0) / (lit(1.0) + exp(negate(z)))
  }

  /** The per-row magnitude the 12-dp exact-sum pipeline can square
    * without overflowing a long (`quantize12`'s |v| ≲ 9e6 bound applied
    * to x²) — enforced by [[featureStats]] with an actionable error
    * instead of the opaque ANSI cast failure a raw char/token count
    * would otherwise hit (round-8 advice).
    */
  val MaxFeatureAbs = 3000.0

  // depth-bounded cause walk: a cyclic cause chain (initCause abuse)
  // must not stack-overflow inside error handling
  private def overflowCause(e: Throwable, depth: Int = 16): Boolean =
    depth > 0 && e != null && (e.isInstanceOf[ArithmeticException] ||
      (e.getMessage != null && (e.getMessage.contains("overflow") ||
        e.getMessage.contains("ARITHMETIC_OVERFLOW") ||
        e.getMessage.contains("CAST_OVERFLOW"))) ||
      overflowCause(e.getCause, depth - 1))

  /** Per-feature (mean, stddev) from one exact-sum pass — the
    * standardization statistics. σ floors at 1e-12 (constant features
    * contribute z-score 0 rather than a division blow-up); every
    * derived double (the /n, the subtract, `sqrt`, the floors) is a
    * correctly-rounded IEEE op the oracle mirrors term for term.
    * The same job checks max|x| per feature against [[MaxFeatureAbs]]
    * (free — it rides the stats aggregation) and names the offending
    * column when a feature is out of the exact-sum range.
    */
  private def featureStats(base: DataFrame,
                           feats: Seq[String]): Seq[(Double, Double)] = {
    val aggs = feats.flatMap { f =>
      ExactSum.aggsLong(s"s_$f", ExactSum.quantize12(col(f))) ++
        ExactSum.aggsLong(s"ss_$f", ExactSum.quantize12(col(f) * col(f))) :+
        max(abs(col(f))).as(s"mx_$f")
    } :+ count(lit(1)).as("__n")
    // the max|x| columns ride the same job as the quantized casts, so a
    // WILDLY out-of-range feature (|x| > ~3e3: x²·1e12 overflows the
    // long) kills this very aggregation with an opaque ANSI cast error —
    // catch it, probe the maxes in a fallback pass, and name the column
    val row = try {
      base.agg(aggs.head, aggs.tail: _*)
        .select(feats.flatMap(f => Seq(
          (ExactSum.total(s"s_$f").cast("double") / lit(1e12)).as(s"s_$f"),
          (ExactSum.total(s"ss_$f").cast("double") / lit(1e12)).as(s"ss_$f"),
          col(s"mx_$f")))
          :+ col("__n"): _*)
        .head() // 3d doubles + a count — parameter-bounded driver state
    } catch {
      case e: Throwable if overflowCause(e) =>
        val mxAggs = feats.map(f => max(abs(col(f))).as(f))
        val mxRow = base.agg(mxAggs.head, mxAggs.tail: _*).head()
        val bad = feats.filter(f => mxRow.getAs[Double](f) > MaxFeatureAbs)
        // no feature over the bound → the overflow came from somewhere
        // else; rethrow the original rather than misattribute it to an
        // empty feature list
        if (bad.isEmpty) throw e
        throw new IllegalArgumentException(
          s"feature(s) ${bad.mkString(", ")} exceed the 12-dp exact-sum " +
            s"range (|x| <= $MaxFeatureAbs: the square must stay a " +
            "long) — rescale them (e.g. log1p or /1000) before training", e)
    }
    val n = row.getAs[Long]("__n")
    require(n > 0, "logistic regression needs at least one labeled row")
    feats.foreach { f =>
      val mx = row.getAs[Double](s"mx_$f")
      require(mx <= MaxFeatureAbs,
        s"feature '$f' has |x| up to $mx, beyond the 12-dp exact-sum " +
          s"range (|x| <= $MaxFeatureAbs: its square must stay a long) — " +
          "rescale it (e.g. log1p or /1000) before training")
    }
    feats.map { f =>
      val m = row.getAs[Double](s"s_$f") / n
      val v = row.getAs[Double](s"ss_$f") / n - m * m
      (m, math.max(math.sqrt(math.max(v, 0.0)), 1e-12))
    }
  }

  /** `base` with each feature z-scored by the TRAINING statistics —
    * plain GD needs comparably-scaled features to converge in a fixed
    * small iteration count (unscaled, the largest-magnitude feature
    * monopolizes the gradient and the model degenerates to
    * majority-class predictions).
    */
  private def standardized(base: DataFrame, feats: Seq[String],
                           stats: Seq[(Double, Double)]): DataFrame =
    base.select(col("__y") +: feats.zip(stats).map {
      case (f, (m, s)) => ((col(f) - lit(m)) / lit(s)).as(f)
    }: _*)

  /** Weights after `iterations` full-batch gradient-ascent steps from
    * w = 0: `w ← w + lr · (Σ x·(y−p)) / n`. Returns the raw driver-side
    * vector (intercept first) plus the filtered row count — building
    * block for [[train]] / [[trainAndScore]].
    */
  private def fit(base: DataFrame, featureCols: Seq[String],
                  iterations: Int, lr: Double): (Array[Double], Long) = {
    var w = Array.fill(featureCols.length + 1)(0.0)
    var n = 0L
    for (_ <- 1 to iterations) {
      val r = col("__y") - sigmoid(w, featureCols)
      val aggCols = (ExactSum.aggsLong("g0", ExactSum.quantize12(r)) ++
        featureCols.zipWithIndex.flatMap { case (f, j) =>
          ExactSum.aggsLong(s"g${j + 1}", ExactSum.quantize12(col(f) * r))
        }) :+ count(lit(1)).as("__n")
      val row = base.agg(aggCols.head, aggCols.tail: _*)
        .select((0 to featureCols.length).map(j =>
          (ExactSum.total(s"g$j").cast("double") / lit(1e12)).as(s"g$j"))
          :+ col("__n"): _*)
        .head() // one row, d+1 doubles — parameter-bounded driver state
      n = row.getAs[Long]("__n")
      require(n > 0, "logistic regression needs at least one labeled row")
      w = w.zipWithIndex.map { case (wj, j) =>
        wj + lr * (row.getAs[Double](s"g$j") / n)
      }
    }
    (w, n)
  }

  private def cleanFrame(df: DataFrame, labelCol: String,
                         featureCols: Seq[String]): DataFrame =
    df.filter((col(labelCol) +: featureCols.map(col)).map(_.isNotNull)
        .reduce(_ && _))
      .select(col(labelCol).cast("double").as("__y") +:
        featureCols.map(f => col(f).cast("double").as(f)): _*)

  /** One-row training summary: (n, accuracy, log_loss, w0,
    * w_<feature>...) — weights and metrics rounded 6 dp. `labelCol`
    * must be 0/1-valued (boolean casts fine); rows with a null label or
    * feature are dropped. Log-loss probabilities are clamped at 1e-300
    * so a saturated σ can never evaluate ln 0.
    *
    * Precondition (all train entry points — train / trainAndScore /
    * fitModel / crossValidate): every feature must satisfy
    * |x| ≤ [[MaxFeatureAbs]] (the exact-sum pipeline squares it);
    * checked during the stats pass with an error naming the offending
    * column. Rescale bigger features (log1p, /1000) first.
    */
  def train(df: DataFrame, labelCol: String, featureCols: Seq[String],
            iterations: Int = 5, lr: Double = 1.0): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(featureCols.nonEmpty, "need at least one feature column")
    val raw = cleanFrame(df, labelCol, featureCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = featureStats(raw, featureCols)
      val base = standardized(raw, featureCols, stats)
      val (w, _) = fit(base, featureCols, iterations, lr)
      val p = sigmoid(w, featureCols)
      val ll = when(col("__y") >= 0.5, log(greatest(p, lit(1e-300))))
        .otherwise(log(greatest(lit(1.0) - p, lit(1e-300))))
      val aggSeq = Seq(count(lit(1)).as("n"),
        sum(when((p >= 0.5).cast("int") === col("__y").cast("int"), 1L)
          .otherwise(0L)).as("__ok")) ++
        ExactSum.aggsLong("ll", ExactSum.quantize12(ll))
      val outCols = Seq(col("n"),
        round(col("__ok").cast("double") / col("n").cast("double"), 6)
          .as("accuracy"),
        round((lit(0.0) - ExactSum.total("ll").cast("double") / lit(1e12))
          / col("n").cast("double"), 6).as("log_loss"),
        round(lit(w(0)), 6).as("w0")) ++
        featureCols.zipWithIndex.map { case (f, j) =>
          round(lit(w(j + 1)), 6).as(s"w_$f")
        }
      base.agg(aggSeq.head, aggSeq.tail: _*).select(outCols: _*)
    } finally raw.unpersist()
  }

  /** Per-row probability under a freshly-trained model: returns `df`
    * plus `probCol` (rounded 6 dp) and `predCol` (p ≥ threshold). The
    * train pass uses only rows where the label AND features are
    * non-null; scoring covers every row with non-null features.
    */
  def trainAndScore(df: DataFrame, labelCol: String,
                    featureCols: Seq[String], iterations: Int = 5,
                    lr: Double = 1.0, threshold: Double = 0.5,
                    probCol: String = "p_quality",
                    predCol: String = "pred_quality"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // ONE cache serves training and scoring: the feature columns are
    // typically derived (qualityFeatures' token scans), and the
    // train-only persist would leave the scoring pass recomputing them
    // from scratch. Session-tracked so long-lived batteries reclaim it.
    val scoped = TrackedCaches.track(
      df.filter(featureCols.map(col(_).isNotNull).reduce(_ && _))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val model = fitOn(scoped, labelCol, featureCols, iterations, lr)._1
    val p = model.probability
    scoped.withColumn(probCol, round(p, 6))
      .withColumn(predCol, p >= threshold)
  }

  /** Fit and return the [[Model]] — the batch-train half of the
    * train-offline / apply-anywhere deployment split. Same training
    * plan as [[train]] minus the metrics pass.
    */
  def fitModel(df: DataFrame, labelCol: String, featureCols: Seq[String],
               iterations: Int = 5, lr: Double = 1.0): Model = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(featureCols.nonEmpty, "need at least one feature column")
    val raw = df.filter((col(labelCol) +: featureCols.map(col))
        .map(_.isNotNull).reduce(_ && _))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitOn(raw, labelCol, featureCols, iterations, lr)._1
    finally raw.unpersist()
  }

  /** Shared fit path over an already-persisted frame. Returns the model
    * AND the training row count the gradient passes already measured —
    * callers that report n_train ride it instead of a fresh count() job
    * (round-8 verdict nit).
    */
  private def fitOn(persisted: DataFrame, labelCol: String,
                    featureCols: Seq[String], iterations: Int,
                    lr: Double): (Model, Long) = {
    val raw = cleanFrame(persisted, labelCol, featureCols)
    val stats = featureStats(raw, featureCols)
    val (w, n) = fit(standardized(raw, featureCols, stats), featureCols,
      iterations, lr)
    (Model(featureCols, stats, w), n)
  }

  /** k-fold cross-validated evaluation — the HELD-OUT accuracy [[train]]'s
    * in-sample number cannot give: for each fold f, fit on the other
    * folds (fresh standardization from the TRAIN split only — fitted
    * preprocessing must never see test rows) and score fold f. Output
    * one row per fold: (fold, n_train, n_test, test_accuracy).
    *
    * `foldCol` comes from a deterministic assigner
    * ([[Sampling.stratifiedKFold]]) so the whole evaluation is a pure
    * function of the data — q241's oracle replays all k training chains.
    *
    * Scale: one persisted pass over the labeled feature frame serves
    * every fold's stats/fit/eval aggregations; cost is k × the [[train]]
    * job count, driver state k weight vectors.
    */
  def crossValidate(df: DataFrame, foldCol: String, labelCol: String,
                    featureCols: Seq[String], k: Int,
                    iterations: Int = 5, lr: Double = 1.0): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val scoped = TrackedCaches.track(
      df.filter((col(labelCol) +: featureCols.map(col))
          .map(_.isNotNull).reduce(_ && _))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    (0 until k).map { f =>
      val train = scoped.filter(col(foldCol) =!= f)
      // n_train rides out of the gradient aggregations (fit counts every
      // iteration) — no per-fold count() job
      val (model, nTrain) = fitOn(train, labelCol, featureCols, iterations, lr)
      val p = model.probability
      scoped.filter(col(foldCol) === f)
        .agg(count(lit(1)).as("n_test"),
          sum(when((p >= 0.5).cast("int") === col(labelCol).cast("int"), 1L)
            .otherwise(0L)).as("__ok"))
        .select(lit(f.toLong).as("fold"), lit(nTrain).as("n_train"),
          col("n_test"),
          round(col("__ok").cast("double") / col("n_test").cast("double"), 6)
            .as("test_accuracy"))
    }.reduce(_.union(_))
  }
}
