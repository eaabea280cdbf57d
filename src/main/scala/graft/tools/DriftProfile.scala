package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: per-stage wall-clock breakdown of the Drift rank-stat
  * family (the q119/q120/q123/q131 bench cluster). Not part of the
  * driver contract; run with
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.DriftProfile"`.
  */
object DriftProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", "32")
      .appName("graft-drift-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t) / 1e9}%.2fs")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("disc_band",
        when(col("l_discount") > 0.05, "hi").otherwise("lo"))
    li.count()
    val gc = Seq(col("l_returnflag"))
    time("occ groupBy(g,tag,v) count")(
      li.filter(col("l_extendedprice").isNotNull)
        .groupBy(col("l_returnflag"), col("disc_band"),
          col("l_extendedprice"))
        .agg(count(lit(1)).as("__c"))
        .write.format("noop").mode("overwrite").save())
    val occ = li.filter(col("l_extendedprice").isNotNull)
      .groupBy(col("l_returnflag"), col("disc_band"), col("l_extendedprice"))
      .agg(count(lit(1)).as("__c"))
    time("rangeRankMulti over occ")(
      graft.operators.Ranking.rangeRankMulti(occ,
        Seq("l_returnflag", "l_extendedprice", "disc_band"),
        Seq(Seq("l_returnflag"), Seq("l_returnflag", "disc_band")),
        Seq("__ks_ca", "__ks_ct"), weightCol = Some("__c"))
        .write.format("noop").mode("overwrite").save())
    val cum = graft.operators.Ranking.rangeRankMulti(occ,
      Seq("l_returnflag", "l_extendedprice", "disc_band"),
      Seq(Seq("l_returnflag"), Seq("l_returnflag", "disc_band")),
      Seq("__ks_ca", "__ks_ct"), weightCol = Some("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"), col("l_extendedprice"))
    time("window max over cum")(
      cum.withColumn("__c_all", max(col("__ks_ca")).over(w))
        .write.format("noop").mode("overwrite").save())
    time("full ksTest")(
      graft.operators.Drift.ksTest(li, "l_extendedprice", "disc_band",
        Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    time("full ksTest (again)")(
      graft.operators.Drift.ksTest(li, "l_extendedprice", "disc_band",
        Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    time("full mannWhitney")(
      graft.operators.Drift.mannWhitney(li, "l_extendedprice", "disc_band",
        Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    time("full aucByTag (shared path)")(
      graft.operators.Drift.aucByTag(li, "l_extendedprice", "disc_band",
        "hi", Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    time("full auc (private relabel)")(
      graft.operators.Drift.auc(
        li.withColumn("is_hi", col("l_discount") > 0.05),
        "l_extendedprice", "is_hi", Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    time("full psi")(
      graft.operators.Drift.psi(li, "l_extendedprice", "disc_band",
        refTag = "lo", cmpTag = "hi", groupCols = Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    graft.operators.TrackedCaches.release()
    spark.stop()
  }
}
