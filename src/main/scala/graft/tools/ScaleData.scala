package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regenerates the /tmp/sf1 scale-up fixture SCALING.md's measured rows
  * use: 10×-replicates sf0.1 with shifted keys and perturbed doc text
  * (the round-5 protocol, now committed so a container wipe doesn't lose
  * the recipe). Copy i > 0 shifts every id-like key by i·10⁹ (far past
  * any real key) and prepends a copy marker token to document text so
  * replicas are near-dups, not byte dups.
  *
  * Usage: `sbt "runMain graft.tools.ScaleData [srcDir] [outDir] [copies]"`
  * (defaults /root/testdata/sf0.1 → /tmp/sf1, 10 copies).
  */
object ScaleData {

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),  // keep n_regionkey intact (FK to small dim)
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  // small dims stay single-copy: replicating them would break FK shape
  private val replicated =
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings")
  private val asIs = Seq("region", "nation")

  def scaled(spark: SparkSession, srcDir: String, table: String,
             copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$srcDir/$table.parquet")
    if (asIs.contains(table)) return base
    val shift = 1000000000L
    (0 until copies).map { i =>
      val shifted = keyCols(table).foldLeft(base) { (df, k) =>
        if (i == 0) df else df.withColumn(k, col(k) + lit(i * shift))
      }
      if (table == "documents" && i > 0)
        shifted.withColumn("text", concat(lit(s"v$i "), col("text")))
      else shifted
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (replicated ++ asIs).foreach { t =>
      scaled(spark, srcDir, t, copies)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale] $t written")
    }
    spark.stop()
  }
}
