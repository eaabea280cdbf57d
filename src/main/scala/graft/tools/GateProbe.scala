package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, Similarity}
import graft.sources.Tables

/** Scratch probe: raw agreement/invariant values for the q127/q128/q136
  * derived gates at each SF, to pick thresholds with margin. Dev-only.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.loadCached(spark, dir, "embeddings")
      println(s"==== $sf  (n=${emb.count()}) ====")
      val qs = emb.filter(col("vec_id") < 20)
      val fast = Similarity.ivfTopK(emb, qs, k = 5, nProbe = 2)
      val exact = Similarity.bruteForceTopK(emb, qs, k = 5)
      println("-- q127 ivf-fast vs brute top-5 --")
      Similarity.topKAgreement(fast, exact).orderBy("query_id").show(25, false)
      val sub = emb.filter(col("vec_id") % 4 === 0)
      val lsh = Similarity.cosineNearDupsLsh(sub, threshold = 0.4, numBits = 4)
      val ex = Similarity.cosineNearDups(sub, threshold = 0.4)
      println("-- q128 lsh-fast vs exact pairs --")
      Similarity.pairAgreement(lsh, ex).show(false)
      println("-- q136 pca invariants --")
      Embeddings.pcaCheck(emb, k = 8).orderBy("component").show(20, false)
      println("-- q297 ivf-decon vs exact flags (nProbe sweep) --")
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      val evl = emb.filter(col("vec_id") % 50 === 0)
      val exF = graft.operators.Decontamination
        .semanticFlags(corpus, evl, threshold = 0.35)
        .select(col("vec_id"), col("contaminated").as("exf"))
      for (np <- Seq(2, 3, 4, 5)) {
        val ivF = graft.operators.Decontamination
          .ivfFlags(corpus, evl, threshold = 0.35, nProbe = np,
            portable = true)
          .select(col("vec_id"), col("contaminated").as("ivf"))
        exF.join(ivF, Seq("vec_id"))
          .agg(sum(col("exf")).as("n_exact"), sum(col("ivf")).as("n_ivf"),
            sum(col("exf") * col("ivf")).as("n_hit"))
          .select(lit(np).as("nProbe"), col("n_exact"), col("n_ivf"),
            col("n_hit"))
          .show(false)
      }
      println("-- q332 contrastive ivf-fast vs exact panel (nProbe sweep) --")
      val panel = emb.filter(col("vec_id") < 100)
      val exCp = Similarity.contrastivePairsFor(panel, emb, tau = 0.35)
        .select(col("anchor_id"), col("pos_id").as("__ep"),
          col("neg_id").as("__en"))
      for (np <- Seq(2, 3, 4)) {
        Similarity.contrastivePairsIvf(emb, tau = 0.35, nProbe = np)
          .join(exCp, Seq("anchor_id"))
          .agg(count(lit(1)).as("n_panel"),
            sum(when(col("pos_id") === col("__ep"), 1L).otherwise(0L))
              .as("pos_hit"),
            sum(when(col("__en").isNotNull, 1L).otherwise(0L)).as("n_strict"),
            sum(when(col("neg_id") === col("__en"), 1L).otherwise(0L))
              .as("neg_hit"))
          .select(lit(np).as("nProbe"), col("n_panel"), col("pos_hit"),
            col("n_strict"), col("neg_hit"))
          .show(false)
      }
      println("-- q353 sq8 vs float ivf top-5 agreement --")
      val idxF = s"/tmp/graft_probe/sq8f_$sf"
      val idxQ = s"/tmp/graft_probe/sq8q_$sf"
      Similarity.writeIvfIndex(emb, idxF, portable = true)
      Similarity.writeIvfIndex(emb, idxQ, portable = true,
        quantizeLists = true)
      val sqPanel = emb.filter(col("vec_id") < 100)
      val fTop = Similarity.ivfTopKFromIndex(spark, idxF, sqPanel,
        k = 5, nProbe = 2)
      val qTop = Similarity.ivfTopKFromIndex(spark, idxQ, sqPanel,
        k = 5, nProbe = 2)
      Similarity.topKAgreement(qTop, fTop)
        .agg(sum(col("n_approx")).as("n_slots"),
          sum(col("n_hit")).as("n_hit"))
        .withColumn("set_agree",
          col("n_hit").cast("double") / col("n_slots"))
        .show(false)
      fTop.select(col("query_id"), col("rank"),
          col("neighbor_id").as("__fn"))
        .join(qTop.select(col("query_id"), col("rank"),
          col("neighbor_id").as("__qn")), Seq("query_id", "rank"))
        .agg(count(lit(1)).as("n_slots"),
          sum(when(col("__fn") === col("__qn"), 1L).otherwise(0L))
            .as("rank_hit"))
        .withColumn("rank_agree",
          col("rank_hit").cast("double") / col("n_slots"))
        .show(false)
      println("-- q359 sized-cell recall@5 vs nProbe (100-query panel) --")
      val (szCells, szBits) = Similarity.sizedLabelPlaneCells(emb)
      val szPanel = emb.filter(col("vec_id") < 100)
      val szExact = Similarity.bruteForceTopK(emb, szPanel, k = 5)
      for (np <- Seq(1, 2, 3, 4)) {
        Similarity.topKAgreement(
            Similarity.ivfTopK(szCells, szPanel, k = 5, nProbe = np,
              coarseCol = "cell2", portable = true), szExact)
          .agg(count(lit(1)).as("nq"), sum(col("n_approx")).as("slots"),
            sum(col("n_hit")).as("hits"))
          .select(lit(szBits).as("bits"), lit(np).as("nProbe"),
            col("nq"), col("slots"), col("hits"),
            (col("hits").cast("double") / col("slots")).as("recall"))
          .show(false)
      }
    }
    spark.stop()
  }
}
