package graft.functions

import graft.SparkSpecBase

class GraftFunctionsSpec extends SparkSpecBase {

  test("graft_vec_dot is callable from SQL and codegen'd") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT graft_vec_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F))")
      .head().getDouble(0)
    assert(v == 32.0)
  }

  test("graft_hyperplane_sig produces stable buckets from SQL") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_hyperplane_sig(array(1.0F, 0.0F), 8, 0) AS a,
        |       graft_hyperplane_sig(array(1.0F, 0.0F), 8, 0) AS b,
        |       graft_hyperplane_sig(array(0.0F, 1.0F), 8, 0) AS c""".stripMargin)
      .head()
    assert(rows.getLong(0) == rows.getLong(1), "deterministic")
    assert(rows.getLong(0) != rows.getLong(2), "distinct vectors bucket apart")
  }

  test("graft_vec_dot of mismatched lengths is NULL, matching the HOF fold") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_vec_dot(array(1.0F, 2.0F), array(3.0F)) AS native,
        |  aggregate(zip_with(array(1.0F, 2.0F), array(3.0F),
        |    (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)),
        |    cast(0.0 AS DOUBLE), (acc, v) -> acc + v) AS hof""".stripMargin).head()
    assert(rows.isNullAt(0), "native dot must be null on ragged input")
    assert(rows.isNullAt(1), "HOF reference semantics: ragged -> null")
  }

  test("non-literal numBits is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hyperplane_sig(array(1.0F), cast(rand()*8 AS INT), 0)")
        .head()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("graft_intersect_count and graft_count_in_set work from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
        |  graft_count_in_set(array('the', 'cat', 'the'), array('the', 'a')) AS cs
        |""".stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 2)
  }

  test("graft_count_in_set rejects a non-literal set with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_count_in_set(array('x'), split(string(rand()), ','))")
        .head()
    }
    assert(e.getMessage.contains("literal array"))
  }

  test("text-scan and hashing functions are callable from SQL and agree with the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_ws_token_count(' a  bb\tccc ') AS ws,
        |  graft_bpe_token_count('hello') AS bpe,
        |  size(graft_hashed_shingles(array('a','b','c','d'), 3)) AS nsh,
        |  graft_simhash64(array('a','b')) AS sh1,
        |  graft_simhash64(array('a','b')) AS sh2,
        |  size(graft_minhash_sigs(graft_hashed_shingles(array('a','b','c','d'), 2), 16)) AS nsig
        |""".stripMargin).head()
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) > 0)
    assert(r.getInt(2) == 2) // 4 tokens, 3-grams -> 2 shingles
    assert(r.getLong(3) == r.getLong(4), "simhash deterministic")
    assert(r.getInt(5) == 16)
    // cross-check against the Column API the operators use
    import spark.implicits._
    val df = Seq(" a  bb\tccc ").toDF("t")
    val viaCol = df.select(TextScan.wsTokenCount(org.apache.spark.sql.functions.col("t")))
      .head().getInt(0)
    assert(viaCol == 3)
  }

  test("md5Uniform equals the conv-hex-substring ring bit for bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 500).map(i => s"key-$i#${i % 7}").toDF("k")
    val rows = df.select(
      TextHashes.md5Uniform(col("k")).as("native"),
      ((conv(substring(md5(col("k").cast("binary")), 1, 13), 16, 10)
        .cast("double") + lit(1.0)) / lit(4503599627370496.0)).as("ring"))
      .collect()
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
    assert(rows.forall(r => r.getDouble(0) > 0.0 && r.getDouble(0) <= 1.0))
  }

  test("md5Uniforms2 lane parity: lane 0 equals md5Uniform, both lanes " +
    "equal their conv-hex-substring rings bit for bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ring(off: Int) =
      (conv(substring(md5(col("k").cast("binary")), off, 13), 16, 10)
        .cast("double") + lit(1.0)) / lit(4503599627370496.0)
    val rows = (1 to 500).map(i => s"key-$i#${i % 7}").toDF("k")
      .select(TextHashes.md5Uniforms2(col("k")).as("lanes"),
        TextHashes.md5Uniform(col("k")).as("lane0"),
        ring(1).as("ring0"), ring(17).as("ring1"))
      .collect()
    rows.foreach { r =>
      val lanes = r.getSeq[Double](r.fieldIndex("lanes"))
      assert(lanes.length == 2)
      assert(lanes(0) == r.getAs[Double]("lane0"))
      assert(lanes(0) == r.getAs[Double]("ring0"))
      assert(lanes(1) == r.getAs[Double]("ring1"))
      assert(lanes(1) > 0.0 && lanes(1) <= 1.0)
      // the two lanes are distinct digest bits — they must not collide
      assert(lanes(0) != lanes(1))
    }
  }

  test("graft_jaro_winkler and graft_damerau_levenshtein callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw,
        |  graft_damerau_levenshtein('CA', 'ABC') AS dl""".stripMargin).head()
    assert(r.getDouble(0) == 0.9611111111111111)
    assert(r.getInt(1) == 2)
  }
}
