package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension min–max scalar quantization of embedding vectors —
  * the int8 compression every large-scale vector store applies before
  * (or instead of) product quantization ([[Pq]]): each dimension `j`
  * maps linearly onto `0..levels` by its corpus (min, max), one byte
  * per dimension, 4–8× smaller than float32 with bounded per-value
  * error `span_j / (2·levels)`.
  *
  *   code(x, j) = ⌊(x − min_j) / (max_j − min_j) · levels + 0.5⌋
  *   x̂         = min_j + code / levels · (max_j − min_j)
  *
  * A constant dimension (span 0) codes to 0 and reconstructs exactly
  * (x̂ = min_j), rather than dividing by zero. Codes, the
  * reconstruction, and the squared error are all exact mirrors of the
  * DuckDB oracle: float→double widening is exact, min/max involve no
  * arithmetic, and the quantized error term uses the house 12-dp
  * pattern ([[ExactSum.quantize12]] — per-dim errors are ≤
  * (span/levels)², far inside the long range).
  *
  * Scale design (100 TB): one corpus explode, one d-row (min, max)
  * stats aggregation (map-side combinable; d is a schema parameter),
  * one join of the stream back against that d-row frame (hint-free —
  * AQE broadcasts it), zero driver state. At production scale the
  * d-row stats frame is the persistable model, exactly like the PQ
  * codebook.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no vector ops; this extends the mandated similarity-search
  * family (SURVEY §2B3).
  */
object ScalarQuant {

  /** Quantize every (vector, dimension) to its code + reconstruction
    * error: `(idCol, j, code, err12)` with `j` 1-based, `code` a
    * BIGINT in [0, levels], `err12` the 12-dp-quantized (x − x̂)².
    */
  def quantize(corpus: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding",
               levels: Int = 255): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    val el = corpus.select(col(idCol),
        posexplode(col(vecCol)).as(Seq("__p", "__xf")))
      .select(col(idCol), (col("__p") + 1).as("j"),
        col("__xf").cast("double").as("x"))
    val st = el.groupBy(col("j"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val code = when(col("mx") === col("mn"), lit(0L))
      .otherwise(floor((col("x") - col("mn")) /
        (col("mx") - col("mn")) * lit(levels.toDouble) + lit(0.5))
        .cast("long"))
    el.join(st, Seq("j"))
      .withColumn("code", code)
      .withColumn("__xh", col("mn") +
        col("code").cast("double") / lit(levels.toDouble) *
          (col("mx") - col("mn")))
      .select(col(idCol), col("j").cast("long").as("j"), col("code"),
        ExactSum.quantize12(
          (col("x") - col("__xh")) * (col("x") - col("__xh")))
          .as("err12"))
  }
}
