package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row

class ProfileSpec extends SparkSpecBase {

  import spark.implicits._

  private def sample = Seq(
    (Some(1L), Some("a"), Some(10.0)),
    (Some(2L), None, Some(20.0)),
    (Some(2L), Some("b"), None)).toDF("id", "name", "value")

  test("single-pass profile: counts, nulls, distincts, numeric stats") {
    val out = Profile.profile(sample, Seq("id", "name", "value"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.keySet == Set("id", "name", "value"))
    out.values.foreach(r => assert(r.getAs[Long]("n_rows") == 3L))

    val id = out("id")
    assert(id.getAs[Long]("n_nulls") == 0L)
    assert(id.getAs[Long]("n_distinct") == 2L)
    assert(id.getAs[Double]("min_num") == 1.0)
    assert(id.getAs[Double]("max_num") == 2.0)
    assert(id.getAs[Double]("mean_num") == 5.0 / 3)

    val name = out("name")
    assert(name.getAs[Long]("n_nulls") == 1L)
    assert(name.getAs[Long]("n_distinct") == 2L)
    assert(name.isNullAt(name.fieldIndex("min_num")), "non-numeric min is null")
    assert(name.isNullAt(name.fieldIndex("mean_num")))

    val value = out("value")
    assert(value.getAs[Long]("n_nulls") == 1L)
    assert(value.getAs[Long]("n_distinct") == 2L)
    assert(value.getAs[Double]("mean_num") == 15.0)
  }

  test("approx distinct variant keeps the schema and lands near exact") {
    val exact = Profile.profile(sample, Seq("id", "name", "value"))
    val approx = Profile.profile(sample, Seq("id", "name", "value"),
      approxDistinct = true)
    assert(approx.schema == exact.schema)
    val nd = approx.collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    // HLL++ at single-digit cardinality: allow slack but catch nonsense
    nd.values.foreach(v => assert(v >= 1L && v <= 4L, s"implausible distinct $v"))
  }

  test("exactCorr: linear data hits ±1, matches builtin corr, stable") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000)
      .select(lit("g").as("k"), col("id").cast("double").as("x"),
        pmod(xxhash64(col("id")), lit(1000L)).cast("double").as("y"))
    val linear = df.withColumn("y", col("x") * 2 + 1)
    val r1 = Profile.exactCorr(linear, "x", "y", Seq("k")).head()
    assert(r1.getAs[Double]("corr_xy") == 1.0)
    val anti = df.withColumn("y", col("x") * -3)
    assert(Profile.exactCorr(anti, "x", "y", Seq("k")).head()
      .getAs[Double]("corr_xy") == -1.0)
    // vs the streaming builtin on hashed noise (tolerance: the builtin
    // is merge-order dependent, ours is exact)
    val ours = Profile.exactCorr(df, "x", "y", Seq("k")).head()
    val builtin = df.groupBy("k")
      .agg(corr(col("x"), col("y")).as("c"), covar_samp(col("x"), col("y")).as("v"))
      .head()
    assert(math.abs(ours.getAs[Double]("corr_xy") - builtin.getAs[Double]("c")) < 1e-6)
    assert(math.abs(ours.getAs[Double]("cov_samp") - builtin.getAs[Double]("v")) < 1e-3)
    // deterministic under repartitioning
    val repart = Profile.exactCorr(df.repartition(7), "x", "y", Seq("k")).head()
    assert(repart.getAs[Double]("corr_xy") == ours.getAs[Double]("corr_xy"))
    assert(repart.getAs[Double]("cov_samp") == ours.getAs[Double]("cov_samp"))
  }

  test("unknown column is rejected up front") {
    intercept[IllegalArgumentException] {
      Profile.profile(sample, Seq("id", "nope"))
    }
  }

  test("keySkew measures the head key; ties break high; nulls count as a key") {
    import spark.implicits._
    // key 7 x4 (head), key 9 x4 (tie, higher id wins), key 1 x1, null x2
    val df = (Seq.fill(4)(Some(7L)) ++ Seq.fill(4)(Some(9L)) ++
      Seq(Some(1L), None, None)).toDF("k")
    val r = Profile.keySkew(df, "k").head()
    assert(r.getAs[Long]("n_rows") == 11L)
    assert(r.getAs[Long]("n_keys") == 4L) // 7, 9, 1, null
    assert(r.getAs[Long]("max_cnt") == 4L)
    assert(r.getAs[Long]("heaviest_key") == 9L) // tie -> larger key
    val expectedRatio = BigDecimal(4.0 / (11.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("skew_ratio") == expectedRatio)
    // uniform keys -> ratio ~ 1
    val uni = (0L until 100L).toDF("k")
    assert(Profile.keySkew(uni, "k").head().getAs[Double]("skew_ratio") == 1.0)
  }

  test("spearman: +1 on any monotone relation, -1 on reversed, Pearson disagrees") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // y = x^3 is monotone but nonlinear: spearman exactly 1, pearson < 1
    val mono = (1L to 50L).map(i => ("g", i, (i * i * i).toDouble))
      .toDF("grp", "x", "y").withColumn("x", col("x").cast("double"))
    val rho = Profile.spearman(mono, "x", "y", Seq("grp"), Seq("x"))
      .head().getAs[Double]("spearman_rho")
    assert(rho == 1.0)
    val pearson = Profile.exactCorr(mono, "x", "y", Seq("grp"))
      .head().getAs[Double]("corr_xy")
    assert(pearson < 1.0)
    val anti = mono.withColumn("y", -col("y"))
    assert(Profile.spearman(anti, "x", "y", Seq("grp"), Seq("x"))
      .head().getAs[Double]("spearman_rho") == -1.0)
  }

  test("histogram: edges half-open, under/overflow buckets, nulls excluded") {
    import spark.implicits._
    val df = Seq(Some(-5.0), Some(0.0), Some(9.999999), Some(10.0),
      Some(25.0), Some(30.0), Some(31.0), None).toDF("x")
    val out = Profile.histogram(df, "x", lo = 0.0, hi = 30.0, nBuckets = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(4)))).toMap
    assert(out(-1L) == ((1L, None)))            // -5 underflows, no edge
    assert(out(0L) == ((2L, Some(0.0))))        // 0.0 and 9.999999
    assert(out(1L)._1 == 1L)                    // 10.0 is in [10, 20)
    assert(out(1L)._2.contains(10.0))
    assert(out(2L) == ((1L, Some(20.0))))       // 25.0
    assert(out(3L) == ((2L, None)))             // 30.0 (hi) and 31.0 overflow
    assert(out.values.map(_._1).sum == 7L)      // null excluded
  }

  test("sliceDeviation: the shifted slice carries the largest |z|; a " +
      "centered slice sits near zero; null dims drop from their own " +
      "dimension only") {
    import spark.implicits._
    // metric: a=10s, b=20s (global mean 15); dim2 mixes both evenly
    val df = (Seq.fill(50)(("a", "x", 10.0)) ++ Seq.fill(50)(("b", "y", 20.0)) ++
      Seq((null.asInstanceOf[String], "x", 15.0)))
      .toDF("d1", "d2", "metric")
    val out = Profile.sliceDeviation(df, "metric", Seq("d1", "d2"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("mean"), r.getAs[Double]("z"))).toMap
    // d1 drops its null row; d2 keeps all 101
    assert(out(("d1", "a"))._1 == 50L && out(("d1", "a"))._2 == 10.0)
    assert(out(("d2", "x"))._1 == 51L)
    val za = out(("d1", "a"))._3
    val zx = out(("d2", "x"))._3
    assert(za < 0 && math.abs(za) > math.abs(zx),
      s"pure-low slice must out-deviate the mixed slice: $za vs $zx")
    // d2=x mean: (50*10 + 15)/51 ≈ 10.098 -> also below global, but the
    // broken DIMENSION is identified by magnitude ordering per dimension
    assert(out(("d1", "b"))._3 > 0)
  }

  test("heavyHitters: threshold inclusive, nulls dropped, share exact") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++
      Seq(null.asInstanceOf[String])).toDF("k")
    val out = Profile.heavyHitters(df, "k", phi = 0.3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // null dropped: total 10; b sits EXACTLY on the 0.3 threshold
    assert(out == Map("a" -> ((5L, 0.5, 10L)), "b" -> ((3L, 0.3, 10L))))
  }

  test("corpusCard: hand-computed per-source datasheet") {
    import spark.implicits._
    val docs = Seq(
      ("web", "en", "the cat sat"),
      ("web", "en", "the cat sat"),  // exact dup
      ("web", "de", "der hund"),
      ("web", "en", ""),             // empty
      ("web", null, null),           // null text + lang
      ("tiny", "fr", "un deux trois"))
      .toDF("source", "lang", "text")
    val out = Profile.corpusCard(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val w = out("web")
    assert(w.getAs[Long]("n_docs") == 5L)
    assert(w.getAs[Long]("n_empty") == 2L) // "" and null
    // 3 non-empty texts, 2 distinct → dup rate 1/3
    assert(w.getAs[Double]("dup_rate") == math.rint(1e6 / 3.0) / 1e6)
    assert(w.getAs[Long]("n_tokens") == 8L) // 3 + 3 + 2
    assert(w.getAs[Long]("vocab") == 5L) // the cat sat der hund
    assert(w.getAs[String]("top_lang") == "en")
    assert(w.getAs[Double]("top_lang_share") == 0.75) // 3 of 4 labeled
    val t = out("tiny")
    assert(t.getAs[Double]("dup_rate") == 0.0)
    assert(t.getAs[Double]("mean_tokens") == 3.0)
    assert(t.getAs[String]("top_lang") == "fr")
  }

  test("containment: orphan fractions, full-FK case, empty child") {
    import spark.implicits._
    val child = Seq(1L, 2L, 3L, 3L).toDF("k")
    val parent = Seq(1L, 2L, 9L).toDF("p")
    val r = Profile.containment(child, "k", parent, "p").head()
    assert(r.getAs[String]("relation") == "k->p")
    assert(r.getAs[Long]("n_child_distinct") == 3L)
    assert(r.getAs[Long]("n_contained") == 2L)
    assert(r.getAs[Double]("containment") == 0.666667)
    val full = Profile.containment(Seq(1L, 2L).toDF("k"), "k",
      parent, "p").head()
    assert(full.getAs[Double]("containment") == 1.0)
    val empty = Profile.containment(
      Seq.empty[Long].toDF("k"), "k", parent, "p").head()
    assert(empty.getAs[Long]("n_child_distinct") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("containment")))
  }

  test("corpusCard: all-empty source carries nulls, not divisions by zero") {
    import spark.implicits._
    val docs = Seq(("dead", "en", ""), ("dead", "en", null))
      .toDF("source", "lang", "text")
    val r = Profile.corpusCard(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("n_empty") == 2L)
    assert(r.isNullAt(r.fieldIndex("dup_rate")))
    assert(r.isNullAt(r.fieldIndex("mean_tokens")))
    assert(r.getAs[Long]("n_tokens") == 0L)
  }
}
