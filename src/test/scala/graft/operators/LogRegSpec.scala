package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpecBase {

  import spark.implicits._

  // linearly separable in x: y = 1 iff x > 0; z is pure noise-free zero
  private def separable = (1 to 40).map { i =>
    val x = if (i % 2 == 0) 1.0 + i / 40.0 else -1.0 - i / 40.0
    (i.toLong, x, 0.5, if (x > 0) 1 else 0)
  }.toSeq.toDF("id", "x", "z_const", "label")

  test("separable data: high accuracy, positive weight on the signal, " +
    "EXACTLY zero weight on a constant feature") {
    val row = LogReg.train(separable, "label", Seq("x", "z_const"),
      iterations = 20, lr = 1.0).collect().head
    assert(row.getAs[Long]("n") == 40L)
    assert(row.getAs[Double]("accuracy") == 1.0)
    assert(row.getAs[Double]("w_x") > 1.0)
    // constant feature -> sigma floors at 1e-12 -> standardized x = 0
    // -> its gradient is identically 0 at every step
    assert(row.getAs[Double]("w_z_const") == 0.0)
    assert(row.getAs[Double]("log_loss") < 0.3)
  }

  test("training is invariant under repartitioning (exact-sum gradients)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      LogReg.train(df, "label", Seq("x"), iterations = 7, lr = 0.5)
        .collect().head.toSeq
    assert(run(separable) == run(separable.repartition(13)))
  }

  test("trainAndScore: probabilities round-trip the trained model and " +
    "threshold splits predictions") {
    val out = LogReg.trainAndScore(separable, "label", Seq("x"),
      iterations = 20, lr = 1.0, threshold = 0.5)
    val rows = out.select("id", "x", "p_quality", "pred_quality").collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val pos = r.getAs[Double]("x") > 0
      assert(r.getAs[Boolean]("pred_quality") == pos)
      if (pos) assert(r.getAs[Double]("p_quality") > 0.5)
      else assert(r.getAs[Double]("p_quality") < 0.5)
    }
  }

  test("null labels drop from training but scored output keeps " +
    "feature-complete rows") {
    val withNulls = separable
      .withColumn("label",
        when(col("id") <= 4L, lit(null)).otherwise(col("label")))
    val trained = LogReg.train(withNulls, "label", Seq("x"),
      iterations = 5, lr = 0.5).collect().head
    assert(trained.getAs[Long]("n") == 36L)
    assert(LogReg.trainAndScore(withNulls, "label", Seq("x"),
      iterations = 5, lr = 0.5).count() == 40L)
  }

  test("crossValidate: separable data stays separable out of fold; " +
    "train/test partition the rows") {
    val folded = Sampling.stratifiedKFold(separable, "label", "id", k = 4)
    val rows = LogReg.crossValidate(folded, "fold", "label", Seq("x"),
      k = 4, iterations = 20, lr = 1.0).orderBy("fold").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 40L)
      assert(r.getAs[Long]("n_test") == 10L) // stratified: exact quarters
      assert(r.getAs[Double]("test_accuracy") == 1.0,
        s"fold ${r.getAs[Long]("fold")} not separable out of sample")
    }
  }

  test("empty labeled set fails loudly") {
    val e = intercept[Exception] {
      LogReg.train(separable.filter(lit(false)), "label", Seq("x")).collect()
    }
    assert(e.getMessage.contains("at least one labeled row"))
  }

  test("out-of-range feature magnitudes fail with the column named, " +
    "not an opaque cast error") {
    import spark.implicits._
    // margin zone (3000 < |x| < ~3036): the quantized cast survives, the
    // stats-pass max check fires pre-emptively
    val margin = Seq((1L, 3010.0, 1), (2L, 1.0, 0))
      .toDF("id", "big_feat", "label")
    val e1 = intercept[IllegalArgumentException] {
      LogReg.train(margin, "label", Seq("big_feat")).collect()
    }
    assert(e1.getMessage.contains("big_feat") &&
      e1.getMessage.contains("rescale"), e1.getMessage)
    // far out of range: the aggregation itself overflows under ANSI —
    // the catch path probes the maxes and still names the column
    val wild = Seq((1L, 50000.0, 1), (2L, 1.0, 0))
      .toDF("id", "big_feat", "label")
    val e2 = intercept[IllegalArgumentException] {
      LogReg.train(wild, "label", Seq("big_feat")).collect()
    }
    assert(e2.getMessage.contains("big_feat") &&
      e2.getMessage.contains("rescale"), e2.getMessage)
  }
}
