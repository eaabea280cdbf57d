package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DataSelectionSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "tgt", "alpha beta alpha beta gamma"),
    (2L, "tgt", "alpha beta gamma delta"),
    (3L, "raw", "omega psi chi omega psi"),
    (4L, "raw", "omega chi phi"),
    (5L, "raw", "alpha beta gamma alpha beta")) // raw doc that LOOKS target
    .toDF("doc_id", "source", "text")

  test("dsirScores: target-like documents score above raw-like ones") {
    val out = DataSelection.dsirScores(docs, col("source") === "tgt")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("dsir_score"))).toMap
    // n_feats = unigrams + bigrams = 2*len - 1
    assert(out(1L)._1 == 9L)
    assert(out(4L)._1 == 5L)
    // the raw doc built from target vocabulary outscores true raw docs
    assert(out(5L)._2 > out(3L)._2)
    assert(out(5L)._2 > out(4L)._2)
    // target docs sit above the out-of-domain raw docs
    assert(out(1L)._2 > out(3L)._2 && out(2L)._2 > out(4L)._2)
  }

  test("dsirScores is invariant under repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      DataSelection.dsirScores(d, col("source") === "tgt")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_feats"),
          r.getAs[Double]("dsir_score"))).toSeq
    assert(run(docs) == run(docs.repartition(5)))
  }

  test("dsirScores: single-token docs yield one unigram feature, no bigram") {
    val tiny = Seq((1L, "tgt", "word"), (2L, "raw", "other"))
      .toDF("doc_id", "source", "text")
    val out = DataSelection.dsirScores(tiny, col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_feats")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("domainReweight: a vocabulary-distinct domain earns the highest " +
    "weight; weights sum to 1 and respect the smoothing floor") {
    // common: generic text the global model fits everywhere; exotic: a
    // private vocabulary the global model (diluted by the others)
    // predicts far worse than the domain-own model
    val docs = (
      (1 to 6).map(i => (i.toLong, "common_a", "the cat sat on the mat")) ++
      (7 to 12).map(i => (i.toLong, "common_b", "the dog sat on the rug")) ++
      (13 to 18).map(i =>
        (i.toLong, "exotic", "zyx wvu tsr qpo nml kji"))).toDF(
      "doc_id", "source", "text")
    val out = DataSelection.domainReweight(docs, eta = 2.0, smoothing = 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("excess_surprisal"), r.getAs[Double]("weight"))).toMap
    assert(out.keySet == Set("common_a", "common_b", "exotic"))
    assert(out("exotic")._1 > out("common_a")._1)
    assert(out("exotic")._2 > out("common_a")._2)
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-5, s"weights sum to $total")
    // uniform smoothing floors every weight at c/k = 0.2/3
    assert(out.values.forall(_._2 >= 0.2 / 3 - 1e-9))
  }

  test("domainReweight is invariant under repartitioning (quantized sums)") {
    val docs = (1 to 30).map(i =>
      (i.toLong, s"src${i % 3}", s"tok${i % 7} tok${i % 5} shared common"))
      .toDF("doc_id", "source", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      DataSelection.domainReweight(d).orderBy("domain").collect()
        .map(_.toSeq).toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("tokenBudgetPlan: hand-checked epochs and deficit; unweighted " +
    "domains drop") {
    // a: 2 docs × 3 tokens = 6; b: 1 doc × 4 tokens = 4; c unweighted
    val docs = Seq((1L, "a", "x y z"), (2L, "a", "p q r"),
      (3L, "b", "w x y z"), (4L, "c", "m n"))
      .toDF("doc_id", "source", "text")
    val out = DataSelection.tokenBudgetPlan(docs, "source",
        Map("a" -> 0.25, "b" -> 0.75), budgetTokens = 8L)
      .orderBy("domain").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"),
      "unweighted domain c must drop from the plan")
    val a = out(0); val b = out(1)
    // a: required = round(8·0.25) = 2 of 6 → 0.333333 epochs, no deficit
    assert(a.getAs[Long]("tokens_required") == 2L)
    assert(a.getAs[Double]("epochs") == 0.333333)
    assert(!a.getAs[Boolean]("deficit"))
    // b: required = round(8·0.75) = 6 of 4 → 1.5 epochs, deficit
    assert(b.getAs[Long]("tokens_required") == 6L)
    assert(b.getAs[Double]("epochs") == 1.5)
    assert(b.getAs[Boolean]("deficit"))
  }

  test("sourceKlMatrix: hand-replayed smoothed KL, asymmetric, >= 0") {
    import spark.implicits._
    def q12(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong
    // A: x x y (t=3)   B: y (t=1)   V=2
    val docs = Seq((1L, "A", "x x y"), (2L, "B", "y"))
      .toDF("doc_id", "source", "text")
    val out = DataSelection.sourceKlMatrix(docs)
      .orderBy("src_a", "src_b")
      .as[(String, String, Double)].collect()
    val pAx = 3.0 / 5; val pAy = 2.0 / 5
    val pBx = 1.0 / 3; val pBy = 2.0 / 3
    val klAB = (q12(pAx * math.log(pAx / pBx)) +
      q12(pAy * math.log(pAy / pBy))).toDouble / 1e12
    val klBA = (q12(pBx * math.log(pBx / pAx)) +
      q12(pBy * math.log(pBy / pAy))).toDouble / 1e12
    assert(out.toSeq === Seq(("A", "B", klAB), ("B", "A", klBA)))
    assert(klAB > 0 && klBA > 0 && klAB != klBA)
  }

  test("sourceKlMatrix: identical distributions give zero divergence") {
    import spark.implicits._
    val docs = Seq((1L, "A", "x y"), (2L, "B", "y x"))
      .toDF("doc_id", "source", "text")
    val out = DataSelection.sourceKlMatrix(docs)
      .as[(String, String, Double)].collect()
    assert(out.length === 2)
    assert(out.forall(_._3 === 0.0))
  }

  test("sourceKlMatrix topV: cap above |vocab| equals uncapped; a " +
      "truncating cap computes the proper truncated-support KL") {
    import spark.implicits._
    def q12(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong
    // corpus frequencies: x 4, y 3, z 1 — top-2 = {x, y}, the z tail
    // carries ALL the shift between A and B below the cap
    val docs = Seq((1L, "A", "x x y z"), (2L, "B", "x x y y"))
      .toDF("doc_id", "source", "text")
    val full = DataSelection.sourceKlMatrix(docs)
      .orderBy("src_a", "src_b").as[(String, String, Double)].collect()
    val capped = DataSelection.sourceKlMatrix(docs, topV = 1000)
      .orderBy("src_a", "src_b").as[(String, String, Double)].collect()
    assert(capped.toSeq === full.toSeq,
      "a cap above the vocabulary must reproduce the exact matrix")
    // top-2 support {x, y}: A sees (x 2, y 1, t 3), B (x 2, y 2, t 4),
    // V' = 2 — counts, totals AND |V| all restricted to the support
    val t2 = DataSelection.sourceKlMatrix(docs, topV = 2)
      .orderBy("src_a", "src_b").as[(String, String, Double)].collect()
    val pAx = 3.0 / 5; val pAy = 2.0 / 5
    val pBx = 3.0 / 6; val pBy = 3.0 / 6
    val klAB = (q12(pAx * math.log(pAx / pBx)) +
      q12(pAy * math.log(pAy / pBy))).toDouble / 1e12
    val klBA = (q12(pBx * math.log(pBx / pAx)) +
      q12(pBy * math.log(pBy / pAy))).toDouble / 1e12
    assert(t2.toSeq === Seq(("A", "B", klAB), ("B", "A", klBA)))
    // truncation bias, demonstrated: the full matrix sees the z shift,
    // the capped one cannot
    assert(full(0)._3 > t2(0)._3)
    intercept[IllegalArgumentException] {
      DataSelection.sourceKlMatrix(docs, topV = 0)
    }
  }

  test("replicateRecipe: hand-traced fractional epochs — integer domain " +
      "replicates exactly, fractional domain follows its md5 draws, " +
      "zero-weight domain drops") {
    import spark.implicits._
    // x ids chosen so the md5-uniform draws straddle 0.5 (u(6)=0.088,
    // u(9)=0.273 below; u(1)=0.769, u(4)=0.658 above)
    val docs = Seq((1L, "x"), (4L, "x"), (6L, "x"), (9L, "x"),
      (21L, "y"), (22L, "y"), (30L, "z")).toDF("doc_id", "source")
    // e_x = 0.6*10/4 = 1.5; e_y = 0.4*10/2 = 2.0 exactly; e_z = 0
    val weights = Seq(("x", 0.6), ("y", 0.4), ("z", 0.0))
      .toDF("domain", "weight")
    val out = DataSelection.replicateRecipe(docs, weights,
        budgetDocs = 10L).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).sorted.toSeq }
    (21L to 22L).foreach(id => assert(out(id) == Seq(1L, 2L)))
    assert(!out.contains(30L))
    Seq(1L, 4L, 6L, 9L).foreach { id =>
      val extra = graft.functions.TextHashes.md5UniformImpl(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          id.toString)) < 0.5
      assert(out(id) == (if (extra) Seq(1L, 2L) else Seq(1L)))
    }
    // the fractional branch must actually split the x domain
    assert(Seq(1L, 4L, 6L, 9L).map(id => out(id).size).toSet.size == 2,
      "expected both 1- and 2-replica docs in the fractional domain")
  }
}
