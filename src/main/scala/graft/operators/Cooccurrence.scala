package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributional token statistics over the corpus: windowed
  * co-occurrence PMI and per-token dispersion.
  *
  * Windowed PMI (the distributional-semantics staple behind GloVe /
  * word2vec context matrices): for every unordered token pair within
  * `window` positions of each other,
  *
  *   pmi = ln( (c_ab / N_p) / ((c_a / N_w) · (c_b / N_w)) )
  *
  * where `c_ab` counts windowed pair observations, `N_p` their total,
  * `c_a` token occurrences, `N_w` their total — all exact BIGINTs, the
  * ln quantized once to 6 dp. High-PMI pairs are collocations; deeply
  * negative PMI at high count flags templated/boilerplate text.
  *
  * Token dispersion (variance-to-mean ratio of per-document counts,
  * zeros included, population form):
  *
  *   vmr = Σc² / tot − tot / D
  *
  * A token with VMR ≈ its mean spreads Poisson-like (topical); VMR ≫
  * mean marks bursty tokens (document-local jargon); combined with
  * doc-frequency it is the classic boilerplate detector.
  *
  * Scale design (100 TB): the pair stream is corpus-linear × window
  * (an offset-explode EQUI-join on (doc, pos + k) — never a range
  * self-join), the pair TYPE table vocabulary²-bounded; dispersion is
  * two map-side-combinable aggregations over (doc, word) counts. The
  * only broadcasts are one-row totals. No driver state.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no text statistics; this extends the mandated text-analysis
  * family (SURVEY §2B4).
  */
object Cooccurrence {

  private def positions(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(TextAnalysis.tokensCol(col(textCol)))
          .as(Seq("pos", "w")))

  /** Windowed unordered co-occurrence PMI: `(a, b, c_ab, pmi6)` for
    * pairs with `c_ab ≥ minCount`, `a ≤ b` lexicographically (a token
    * co-occurring with itself counts too). `pmi6` is the 6-dp-
    * quantized double; counts are exact.
    */
  def windowedPmi(docs: DataFrame, window: Int = 3, minCount: Long = 5,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val p = positions(docs, idCol, textCol)
    // offset explode → equi-join on (doc, pos + k): no range self-join
    val left = p.select(col(idCol), col("pos"), col("w").as("w1"),
        explode(expr(s"sequence(1, $window)")).as("k"))
      .withColumn("pos2", col("pos") + col("k"))
    val pairs = left.join(
        p.select(col(idCol), col("pos").as("pos2"), col("w").as("w2")),
        Seq(idCol, "pos2"))
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
    val cab = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
    val np = cab.agg(sum(col("c_ab")).as("np"))
    val cw = p.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nw = cw.agg(sum(col("c")).as("nw"))
    cab.filter(col("c_ab") >= minCount)
      .join(cw.select(col("w").as("a"), col("c").as("ca")), Seq("a"))
      .join(cw.select(col("w").as("b"), col("c").as("cb")), Seq("b"))
      .crossJoin(broadcast(np))
      .crossJoin(broadcast(nw))
      .select(col("a"), col("b"), col("c_ab"),
        (ExactSum.quantize6(log(
          (col("c_ab").cast("double") / col("np")) /
            ((col("ca").cast("double") / col("nw")) *
             (col("cb").cast("double") / col("nw")))))
          .cast("double") / lit(1000000.0)).as("pmi6"))
  }

  /** Per-token dispersion: `(word, df, tot, vmr)` — document
    * frequency, total count, and the variance-to-mean ratio of
    * per-document counts with zero-count documents included
    * (`vmr = Σc²/tot − tot/D`, population variance over all D docs).
    */
  def tokenDispersion(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
    val d = base.agg(count(lit(1)).as("d"))
    val dwc = positions(base, idCol, textCol)
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
    dwc.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tot"),
        sum(col("c") * col("c")).as("s2"))
      .crossJoin(broadcast(d))
      .select(col("w").as("word"), col("df"), col("tot"),
        (col("s2").cast("double") / col("tot") -
          col("tot").cast("double") / col("d")).as("vmr"))
  }
}
