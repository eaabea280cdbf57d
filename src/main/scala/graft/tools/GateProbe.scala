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
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
    }
    spark.stop()
  }
}
