package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed linear algebra over the embedding column: exact sample
  * covariance of the d-dimensional vectors, PCA via driver-side Jacobi
  * eigendecomposition of that (structurally small) d×d matrix, and
  * projection onto the leading components — the
  * dimensionality-reduction / whitening step of an embedding-curation
  * pipeline (compress before ANN indexing, decorrelate before cosine
  * thresholds).
  *
  * Scale split, mirroring the repo's oracle/production pattern:
  *   - `portable = true`: fully relational — explode to (row, dim,
  *     value), join the (dim) mean frame back, self-join the centered
  *     frame on the row id for (i ≤ j) pairs, DECIMAL(28,12)-quantized
  *     products summed order-free. Exact, engine-replayable (q135's
  *     DuckDB oracle), but the pair join materializes corpus × d(d+1)/2
  *     rows — the verification-scale twin.
  *   - `portable = false` (default): one `mapPartitions` pass
  *     accumulating (n, Σx, Σx·xᵀ upper triangle) in primitive double
  *     arrays — O(d²) state per partition, ZERO corpus shuffle, merged
  *     with `treeReduce`. The production path: at 100 TB the corpus is
  *     scanned once and only numPartitions × d(d+1)/2 doubles move.
  *     Double accumulation is partition-order-dependent in the last
  *     ulp — the documented trade (same as VectorAvg vs the decimal
  *     centroid path).
  *
  * The d×d covariance itself is STRUCTURALLY small (d is the model's
  * embedding width, not data cardinality) — `maxDim` guards the d²
  * driver state like `Ranking.maxDriverStateRows` guards group counts.
  */
object Embeddings {

  /** Upper-triangle sample covariance as a (i, j, n, cov) frame,
    * 0-based dims, `i <= j`, `cov = Σ(xᵢ−mᵢ)(xⱼ−mⱼ)/(n−1)` rounded
    * 6 dp. Rows with a null vector are dropped; all vectors must share
    * the same length (the portable path would silently misalign
    * otherwise — both paths `require` it via the first row).
    */
  def covariance(corpus: DataFrame, vecCol: String = "embedding",
                 portable: Boolean = false, maxDim: Int = 2048): DataFrame = {
    val vecs = widened(corpus.filter(col(vecCol).isNotNull)
      .select(col(vecCol).as("v")))
    if (portable) covarianceRelational(vecs) else covarianceOnePass(vecs, maxDim)
  }

  /** Each input row fans out to d(d+1)/2 pair terms, so a narrow scan
    * (one small parquet file = one partition) serializes the whole
    * d²-heavy chain into one task. Widen ONLY when the scan is narrower
    * than the session parallelism — a 100 TB scan already has thousands
    * of partitions and must not pay a corpus shuffle here.
    */
  private def widened(raw: DataFrame): DataFrame = {
    val target = raw.sparkSession.sessionState.conf.numShufflePartitions
    // internal-row RDD probe: one physical planning pass, no
    // row-deserializer lineage, no job (same fix as Stats.spreadNarrow)
    if (raw.queryExecution.toRdd.getNumPartitions < target)
      raw.repartition(target)
    else raw
  }

  private def covarianceRelational(vecs: DataFrame): DataFrame = {
    // enforce the equal-length contract the accumulator path checks per
    // row: ragged input would silently misalign per-dim means and emit
    // NaN/garbage covariances (one cheap column-pruned pre-pass)
    val dims = vecs.select(size(col("v")).as("d")).distinct()
      .limit(3).collect().map(_.getInt(0))
    require(dims.length == 1,
      s"ragged vectors: saw lengths ${dims.sorted.mkString(", ")}")
    // (i ≤ j) pairs from CHAINED posexplodes — one pipelined codegen
    // pass emitting d(d+1)/2 light rows per vector, no row-id self-join
    // (a cached self-join on a synthetic id measured ~8× slower here:
    // two concurrent scans of an in-flight cache plus a corpus-keyed
    // join the explode chain never needs). The pair stream feeds ONE
    // map-side-combinable agg: centering moves to the d(d+1)/2-row
    // RESULT via Σ(xi−mi)(xj−mj) = Σxixj − n·mi·mj, so no join ever
    // touches the corpus×d² rows (the joined-then-aggregated form
    // measured ~2.4× slower on q135).
    //
    // Exactness via [[ExactSum]] digit-split longs at 12-dp
    // quantization, not decimal sums: the earlier
    // `sum(cast(decimal(18,12)))` form boxed a Decimal per pair term
    // and dominated the q135 bench (21 s at sf0.1); the quantized-long
    // digits sum in codegen and recombine exactly (the oracle mirrors
    // the same floor(x*1e12+0.5) quantization, so the gate stays
    // hash-exact). Products of embedding coords are ≪ 1e6, far inside
    // quantize12's range.
    val pairAggs = ExactSum.aggsLong("sp",
      ExactSum.quantize12(col("xi").cast("double") * col("xj").cast("double")))
    val sums = vecs
      .select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"),
        posexplode(expr("slice(v, i + 1, size(v) - i)")).as(Seq("joff", "xj")))
      .select(col("i"), (col("i") + col("joff")).as("j"),
        col("xi"), col("xj"))
      .groupBy(col("i"), col("j"))
      .agg(pairAggs.head, (pairAggs.tail :+ count(lit(1)).as("n")): _*)
      .select(col("i"), col("j"), col("n"),
        (ExactSum.total("sp").cast("double") / lit(1000000000000d)).as("sp"))
    val meanAggs = ExactSum.aggsLong("sx",
      ExactSum.quantize12(col("x").cast("double")))
    val means = vecs.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(meanAggs.head, (meanAggs.tail :+ count(lit(1)).as("n")): _*)
      .withColumn("m",
        ExactSum.total("sx").cast("double") / lit(1000000000000d) / col("n"))
      .select(col("i"), col("m"))
    sums
      .join(means.select(col("i"), col("m").as("mi")), "i")
      .join(means.select(col("i").as("j"), col("m").as("mj")), "j")
      // + 0.0 normalizes IEEE negative zero (engine-dependent sign of a
      // rounded -1e-9), mirrored in the q135 oracle
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("n"),
        (round((col("sp") -
            (col("mi") * col("mj")) * col("n").cast("double")) /
          (col("n") - lit(1)).cast("double"), 6) + lit(0.0)).as("cov"))
  }

  /** The accumulator pass shared by [[covarianceOnePass]] (frame form)
    * and [[pca]] (which needs the raw arrays — rebuilding them from a
    * collected frame would round-trip d(d+1)/2 rows through an RDD for
    * nothing): returns (n, Σx per dim, Σx·xᵀ upper triangle).
    */
  private def covarianceArrays(vecs: DataFrame, maxDim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val acc = vecs.rdd.mapPartitions { it =>
      var n = 0L
      var d = -1
      var sums: Array[Double] = null
      var prods: Array[Double] = null // upper triangle, row-major
      it.foreach { r =>
        // accept any numeric element type (float embeddings, but also
        // the array<double> coords a projection emits); unbox ONCE per
        // row into a primitive array so the d² inner loop stays boxfree
        val v = r.getSeq[Number](0)
        if (d < 0) {
          d = v.length
          require(d <= maxDim,
            s"covariance keeps O(d^2) state per partition; dim $d exceeds maxDim=$maxDim")
          sums = new Array[Double](d)
          prods = new Array[Double](d * (d + 1) / 2)
        }
        require(v.length == d, s"ragged vectors: saw lengths $d and ${v.length}")
        n += 1
        val x = new Array[Double](d)
        var k = 0
        while (k < d) { x(k) = v(k).doubleValue(); k += 1 }
        var i = 0
        var t = 0
        while (i < d) {
          val xi = x(i)
          sums(i) += xi
          var j = i
          while (j < d) {
            prods(t) += xi * x(j)
            t += 1
            j += 1
          }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single((n, sums, prods))
    }
    val merged = acc.treeReduce { (l, r) =>
      require(l._2.length == r._2.length,
        s"ragged vectors across partitions: dims ${l._2.length} vs ${r._2.length}")
      var i = 0
      while (i < l._2.length) { l._2(i) += r._2(i); i += 1 }
      var t = 0
      while (t < l._3.length) { l._3(t) += r._3(t); t += 1 }
      (l._1 + r._1, l._2, l._3)
    }
    require(merged._1 >= 2, s"covariance needs at least 2 vectors, got ${merged._1}")
    merged
  }

  private def covarianceOnePass(vecs: DataFrame, maxDim: Int): DataFrame = {
    val spark = vecs.sparkSession
    val (n, sums, prods) = covarianceArrays(vecs, maxDim)
    val d = sums.length
    val out = new scala.collection.mutable.ArrayBuffer[Row](d * (d + 1) / 2)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // one-pass identity: Σ(xi−mi)(xj−mj) = Σxixj − n·mi·mj
        val cov = (prods(t) - sums(i) * sums(j) / n) / (n - 1).toDouble
        out += Row(i.toLong, j.toLong, n,
          BigDecimal(cov).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        t += 1
        j += 1
      }
      i += 1
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField("i", LongType, nullable = false),
        StructField("j", LongType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("cov", DoubleType, nullable = false))))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — the
    * textbook rotation scheme (public domain numerical analysis;
    * Golub & Van Loan §8.5): repeatedly zero the largest off-diagonal
    * entry with a Givens rotation until all are below `tol`.
    * Deterministic, O(d³) per sweep — fine for the structurally small
    * d×d covariance. Returns (eigenvalues, eigenvectors as columns),
    * sorted by descending eigenvalue with a deterministic sign
    * convention (largest-|component| entry of each vector is positive).
    */
  private[operators] def jacobiEigen(m: Array[Array[Double]],
                                     tol: Double = 1e-12,
                                     maxSweeps: Int = 100)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // branch, not signum: equal diagonals give theta = 0, where
            // the correct rotation is the full 45 degrees (t = 1) — a
            // signum(0) = 0 factor would silently skip it
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    require(off <= tol, s"Jacobi did not converge in $maxSweeps sweeps (off=$off)")
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { ci =>
      val colv = Array.tabulate(d)(r => v(r)(ci))
      // deterministic sign: the largest-magnitude entry is positive
      val pivot = colv.indices.maxBy(k => (math.abs(colv(k)), -k))
      if (colv(pivot) < 0) colv.map(-_) else colv
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Embedding-distribution drift per slice: cosine similarity between
    * each slice's mean embedding and a reference slice's — the cheap
    * first-line monitor for "did this source/day/shard start embedding
    * differently" (a centroid shift catches topic/language/pipeline
    * changes long before per-pair analyses). Means are per-(slice, dim)
    * DECIMAL(28,12) sums — exact, order-free, engine-replayable — and
    * the slice-cardinality frame stays hint-free (AQE decides).
    * Output: one row per slice — slice, n, cos_to_ref (6 dp; 1.0 for
    * the reference itself). Slices are dropped if the reference slice
    * is absent.
    */
  /** One-row embedding-GEOMETRY card — the QC an index owner reads
    * before trusting cosine anywhere (ANN, SemDeDup, decon): vector
    * count and width, the norm² envelope (mean/min/max — are vectors
    * normalized? any zero vectors?), the mean-vector norm² and
    * `anisotropy` = ‖μ‖² / mean‖x‖² (Ethayarajh 2019's cone effect:
    * ≈0 for a centered, isotropic space; → 1 as all vectors collapse
    * onto one direction — high values mean raw cosine is dominated by
    * the common component and centering should precede similarity).
    *
    * Exactness at scale: per-row norm² is the sequential codegen dot
    * (row-local, replayable); every cross-row sum routes through
    * DECIMAL(28,12) (order-free); μ comes from per-dim decimal sums
    * (d-bounded frame), its norm² from decimal-quantized squared
    * means. One corpus pass + one d-row rollup.
    */
  def geometryCard(corpus: DataFrame,
                   vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.filter(col(vecCol).isNotNull)
      .select(col(vecCol).as("x"))
    val n2 = vecs.select(size(col("x")).cast("long").as("d"),
      graft.functions.VectorMath.dot(col("x"), col("x")).as("n2"))
    val stats = n2.agg(count(lit(1)).as("n"), max(col("d")).as("d"),
      sum(col("n2").cast("decimal(28,12)")).as("s2"),
      min(col("n2")).as("mn"), max(col("n2")).as("mx"))
    val mu2 = vecs.select(posexplode(col("x")).as(Seq("j", "xi")))
      .groupBy(col("j"))
      .agg(sum(col("xi").cast("double").cast("decimal(28,12)")).as("sj"),
        count(lit(1)).as("nj"))
      .select((col("sj").cast("double") / col("nj").cast("double"))
        .as("m"))
      .agg(sum((col("m") * col("m")).cast("decimal(28,12)")).as("m2q"))
    stats.join(broadcast(mu2), lit(true))
      .select(col("n"), col("d"),
        round(col("s2").cast("double") / col("n"), 6).as("mean_norm2"),
        round(col("m2q").cast("double"), 6).as("mu_norm2"),
        round(col("m2q").cast("double") /
          (col("s2").cast("double") / col("n")), 6).as("anisotropy"),
        round(col("mn"), 6).as("min_norm2"),
        round(col("mx"), 6).as("max_norm2"))
  }

  def centroidDrift(corpus: DataFrame, sliceCol: String, refSlice: Any,
                    vecCol: String = "embedding"): DataFrame = {
    val el = corpus.filter(col(vecCol).isNotNull && col(sliceCol).isNotNull)
      .select(col(sliceCol).as("slice"), posexplode(col(vecCol)).as(Seq("j", "x")))
    val sums = el.groupBy(col("slice"), col("j"))
      .agg(sum(col("x").cast("double").cast("decimal(28,12)")).as("s"),
        count(lit(1)).as("nj"))
      .withColumn("m", col("s").cast("double") / col("nj"))
    val cents = sums.groupBy(col("slice"))
      .agg(max(col("nj")).as("n"),
        array_sort(collect_list(struct(col("j"), col("m")))).as("pc"))
      .select(col("slice"), col("n"),
        expr("transform(pc, p -> p.m)").as("centroid"))
    val ref = cents.filter(col("slice") === lit(refSlice))
      .select(col("centroid").as("__ref"))
    cents.join(ref, lit(true))
      .select(col("slice"), col("n"),
        round(graft.functions.VectorMath.cosine(col("centroid"), col("__ref")), 6)
          .as("cos_to_ref"))
  }

  /** Top-`k` principal components of the corpus: one covariance pass
    * (the production accumulator path), driver Jacobi on the d×d
    * result. Returns (component, eigenvalue, explained_ratio, vector) —
    * one row per component, `vector` an `array<double>` of length d.
    */
  def pca(corpus: DataFrame, vecCol: String = "embedding",
          k: Int = 8, maxDim: Int = 2048): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    // straight from the accumulator arrays — no frame round-trip, and
    // the eigen solver sees unrounded covariances
    val (n, sums, prods) = covarianceArrays(
      widened(corpus.filter(col(vecCol).isNotNull)
        .select(col(vecCol).as("v"))), maxDim)
    val d = sums.length
    val m = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = (prods(t) - sums(i) * sums(j) / n) / (n - 1).toDouble
        m(i)(j) = cov; m(j)(i) = cov
        t += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(m)
    val trace = values.sum
    val kk = math.min(k, d)
    val rows = (0 until kk).map { c =>
      Row(c.toLong, values(c),
        if (trace > 0) values(c) / trace else 0.0, vectors(c).toSeq)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("component", LongType, nullable = false),
        StructField("eigenvalue", DoubleType, nullable = false),
        StructField("explained_ratio", DoubleType, nullable = false),
        StructField("vector", ArrayType(DoubleType, containsNull = false),
          nullable = false))))
  }

  /** Project each corpus vector onto the PCA components: the component
    * frame is k rows (parameter-bounded — broadcast is structurally
    * safe), the per-row work is k dot products inside the join
    * projection, and the coordinates collapse back to one row per
    * input id via a k-bounded map-side aggregate. Output: (idCol,
    * coords array<double> in component order).
    */
  def project(corpus: DataFrame, components: DataFrame,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              whiten: Boolean = false,
              whitenEps: Double = 1e-9): DataFrame = {
    // whitening scales each coordinate by 1/√eigenvalue so the
    // projected cloud has unit variance per component (decorrelated
    // AND rescaled — the PCA-whitening preprocessing step); eps guards
    // a numerically-zero trailing eigenvalue
    val scale =
      if (whiten) lit(1.0) / sqrt(greatest(col("eigenvalue"), lit(whitenEps)))
      else lit(1.0)
    val comps = components.select(col("component"),
      col("vector").cast(ArrayType(FloatType)).as("__cv"),
      scale.as("__s"))
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).as("__v"))
      .join(broadcast(comps), lit(true))
      .withColumn("__coord",
        graft.functions.VectorMath.dot(col("__v"), col("__cv")) * col("__s"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("component"), col("__coord"))))
        .as("__pc"))
      .select(col(idCol), expr("transform(__pc, p -> p.__coord)").as("coords"))
  }

  /** Deterministic invariant frame for the PCA→project production path —
    * the q136 derived gate. The raw pipeline (double accumulation +
    * Jacobi eigendecomposition) is not SQL-replayable, but its
    * CORRECTNESS is fully characterized by invariants that are
    * hash-stable away from their tolerance boundaries:
    *
    *   - `norm_err`   = |‖v_c‖² − 1| (eigenvectors are unit length),
    *   - `max_cross`  = max_{j≠c} |⟨v_c, v_j⟩| (mutually orthogonal),
    *   - `eig_drop`   = λ_{c−1} − λ_c (spectrum sorted descending;
    *                    0.0 for the first component),
    *   - `var_rel_err` = |sampleVar(coord_c) − λ_c| / max(λ_c, eps) —
    *     the projection-side check: the sample variance of the data's
    *     c-th projected coordinate IS the c-th eigenvalue (Var⟨x,v⟩ =
    *     vᵀΣv), so this single number ties the executed projection back
    *     to the eigen solve through the real production plan.
    *
    * Output: one row per component, (component, n_vecs, eigenvalue,
    * norm_err, max_cross, eig_drop, var_rel_err). `n_vecs` counts the
    * projected rows — cross-checked against the oracle's `count(*)`.
    *
    * Scale: the component frame is k rows (parameter-bounded — the k²
    * driver-side dot products are on k·d doubles, same contract as
    * [[pca]]'s driver eigen solve); the corpus-side cost is the
    * [[project]] pass plus one (component)-keyed aggregation over the
    * k-fold coordinate explode — corpus-linear, no extra shuffle shape.
    */
  def pcaCheck(corpus: DataFrame, k: Int,
               vecCol: String = "embedding",
               idCol: String = "vec_id",
               eps: Double = 1e-12): DataFrame = {
    val spark = corpus.sparkSession
    val comps = pca(corpus, vecCol, k)
    // k rows by construction — a parameter-bounded collect
    val rows = comps.orderBy(col("component")).collect()
    val vecs = rows.map(_.getAs[Seq[Double]]("vector").toArray)
    val eigs = rows.map(_.getAs[Double]("eigenvalue"))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val metaRows = rows.indices.map { c =>
      val cross = rows.indices.filter(_ != c)
        .map(j => math.abs(dot(vecs(c), vecs(j))))
      Row(c.toLong, eigs(c),
        math.abs(dot(vecs(c), vecs(c)) - 1.0),
        if (cross.isEmpty) 0.0 else cross.max,
        if (c == 0) 0.0 else eigs(c - 1) - eigs(c))
    }
    val meta = spark.createDataFrame(
      spark.sparkContext.parallelize(metaRows, 1),
      StructType(Seq(
        StructField("component", LongType, nullable = false),
        StructField("eigenvalue", DoubleType, nullable = false),
        StructField("norm_err", DoubleType, nullable = false),
        StructField("max_cross", DoubleType, nullable = false),
        StructField("eig_drop", DoubleType, nullable = false))))
    val coordStats = project(corpus, comps, idCol, vecCol)
      .select(posexplode(col("coords")).as(Seq("component", "coord")))
      .groupBy(col("component").cast("long").as("component"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("coord")).as("s1"),
        sum(col("coord") * col("coord")).as("s2"))
      .select(col("component"), col("n_vecs"),
        ((col("s2") - col("s1") * col("s1") / col("n_vecs")) /
          (col("n_vecs") - 1)).as("proj_var"))
    // k-row meta side — hint-free equi-join, AQE broadcasts it
    coordStats.join(meta, Seq("component"))
      .select(col("component"), col("n_vecs"), col("eigenvalue"),
        col("norm_err"), col("max_cross"), col("eig_drop"),
        (abs(col("proj_var") - col("eigenvalue")) /
          greatest(col("eigenvalue"), lit(eps))).as("var_rel_err"))
  }

  /** Johnson–Lindenstrauss random projection to `k` dimensions — the
    * DATA-FREE dimensionality reduction next to [[pca]]'s data-derived
    * one: y_p = sqrt(3/k) · Σ_j x_j · R(p, j) with R entries drawn
    * uniform[−1, 1] from the md5 ring (`((md5_top64("rp:p:j") mod
    * 20001) − 10000)/10000` — the q19/q40 hyperplane recipe, real-valued
    * instead of sign-only), so the matrix needs no storage, no seed
    * state, and every engine regenerates it bit-identically. The
    * sqrt(3/k) factor unbiases (Var(U[−1,1]) = 1/3), making E‖y‖² =
    * ‖x‖² — the JL distance-preservation contract (Achlioptas 2003
    * database-friendly projections use the same sub-gaussian family).
    *
    * Per-term products are DECIMAL(28,12)-quantized before the
    * order-free per-(id, p) sum; the k×d component frame is generated,
    * parameter-bounded, and hint-free (AQE broadcasts it). Output long
    * form: (idCol, dim, value) — `dim` ∈ [0, k), value rounded 6 dp.
    *
    * Scale: one d-fold corpus explode, one (id, p)-keyed aggregation —
    * corpus-linear; no driver state at all.
    */
  def randomProjection(corpus: DataFrame, k: Int, dim: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = corpus.sparkSession
    val comps = spark.range(k).select(col("id").cast("int").as("p"))
      .crossJoin(spark.range(dim).select(col("id").cast("int").as("j")))
      .select(col("p"), col("j"),
        ((pmod(conv(substring(md5(concat(lit("rp:"), col("p").cast("string"),
          lit(":"), col("j").cast("string")).cast("binary")), 1, 16), 16, 10)
          .cast("decimal(20,0)"), lit(BigDecimal(20001))).cast("long")
          - lit(10000L)).cast("double") / 10000.0).as("c"))
    val scale = math.sqrt(3.0 / k)
    corpus
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("j", "x")))
      .join(comps, Seq("j"))
      .groupBy(col(idCol), col("p"))
      .agg(sum((col("x").cast("double") * col("c")).cast("decimal(28,12)"))
        .as("s"))
      .select(col(idCol), col("p").as("dim"),
        round(col("s").cast("double") * lit(scale), 6).as("value"))
  }

  /** Embedding-space health histogram: cosine similarity over a
    * deterministic pseudo-random pairing of the corpus — vectors
    * ranked by md5(id) (the house ring), each paired with its rank
    * successor — binned into `bins` equal slices of [−1, 1]. A healthy
    * embedding space puts random-pair mass near 0; mass piling at the
    * top bins is the classic EMBEDDING-COLLAPSE signal (all vectors
    * nearly parallel), the diagnostic to check before trusting any
    * cosine-threshold dedup (SemDeDup, q40) on a new encoder.
    *
    * Cosines use the q18 codegen expression rounded to 6 dp (the
    * established cross-engine contract with DuckDB's
    * `list_cosine_similarity` on `DOUBLE[]`). The md5 rank runs on an
    * (id, hash) projection through the rank core; vectors join back by
    * id, so the wide embedding column never enters the range exchange.
    * Output: `(bin, n_pairs)` — ≤ `bins` rows from n−1 pairs, one
    * map-side-combinable count.
    */
  def cosineHistogram(corpus: DataFrame, bins: Int = 20,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val ranked = Ranking.rangeRank(
        corpus.select(col(idCol),
          md5(col(idCol).cast("string").cast("binary")).as("__h")),
        Nil, Seq("__h", idCol), "r")
      .select(col(idCol), col("r"))
      .localCheckpoint()
    val pairs = ranked.select(col(idCol).as("__aid"), col("r"))
      .join(ranked.select(col(idCol).as("__bid"), (col("r") - 1).as("r")),
        Seq("r"))
    val cos = round(graft.functions.VectorMath.cosine(
      col("__ea"), col("__eb")), 6)
    pairs
      .join(corpus.select(col(idCol).as("__aid"), col(vecCol).as("__ea")),
        Seq("__aid"))
      .join(corpus.select(col(idCol).as("__bid"), col(vecCol).as("__eb")),
        Seq("__bid"))
      .select(least(floor((cos + lit(1.0)) * lit(bins / 2.0)).cast("long"),
        lit(bins.toLong - 1)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
  }
}
