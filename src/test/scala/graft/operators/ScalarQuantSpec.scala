package graft.operators

import graft.SparkSpecBase

/** Scalar int8 quantization: hand-computed codes, reconstruction
  * error, the constant-dimension guard, and endpoint exactness.
  */
class ScalarQuantSpec extends SparkSpecBase {

  private def q12(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong

  test("codes and errors replay the min-max formula by hand") {
    import spark.implicits._
    val vs = Seq((1L, Seq(0.0f)), (2L, Seq(0.5f)), (3L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val out = ScalarQuant.quantize(vs).orderBy("vec_id")
      .as[(Long, Long, Long, Long)].collect()
    // endpoints code to 0/255 and reconstruct exactly
    assert(out(0) === ((1L, 1L, 0L, 0L)))
    assert(out(2) === ((3L, 1L, 255L, 0L)))
    // midpoint: code 128, error (0.5 - 128/255)^2
    val xh = 0.0 + 128.0 / 255.0 * (1.0 - 0.0)
    assert(out(1) === ((2L, 1L, 128L, q12((0.5 - xh) * (0.5 - xh)))))
  }

  test("constant dimension codes to 0 with zero error") {
    import spark.implicits._
    val vs = Seq((1L, Seq(7.25f, 1.0f)), (2L, Seq(7.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = ScalarQuant.quantize(vs)
      .filter("j = 1").select("code", "err12")
      .as[(Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 0L), (0L, 0L)))
  }

  test("codes stay in [0, levels] and error is bounded by one step") {
    import spark.implicits._
    val vs = (0 until 50).map(i =>
      (i.toLong, Seq((math.sin(i) * 3).toFloat, (i * 0.1).toFloat)))
      .toDF("vec_id", "embedding")
    val rows = ScalarQuant.quantize(vs, levels = 15)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 15))
    // per-dim span ≤ 6.1 → max error (span/(2·15))² < 0.0414 → err12 bound
    assert(rows.forall(_._4 <= q12(0.0414)))
  }

  test("input validation") {
    import spark.implicits._
    val vs = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      ScalarQuant.quantize(vs, levels = 0)
    }
  }
}
