package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: per-stage wall-clock breakdown of q103 (Spearman — the
  * round-6 board's slowest query). Times each phase of the two-rank-pass
  * plan in isolation so SCALING.md can record where the floor is. Run
  * with `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.SpearmanProfile"`.
  */
object SpearmanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", "32")
      .appName("graft-spearman-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"$name%-34s ${(System.nanoTime() - t) / 1e9}%.2fs")
    }
    val tie = Seq("l_orderkey", "l_linenumber", "l_shipdate")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    val filtered = li
      .select((Seq("l_returnflag", "l_quantity", "l_extendedprice") ++ tie)
        .map(col): _*)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
    time("projection+filter (noop)")(
      filtered.write.format("noop").mode("overwrite").save())
    time("rank pass 1 (x) alone")(
      graft.operators.Ranking.rangeRank(filtered, Seq("l_returnflag"),
          "l_quantity" +: tie, "__rxl")
        .write.format("noop").mode("overwrite").save())
    val rx = graft.operators.Ranking.rangeRank(filtered, Seq("l_returnflag"),
      "l_quantity" +: tie, "__rxl")
    time("rank pass 2 (y) given pass 1")(
      graft.operators.Ranking.rangeRank(rx, Seq("l_returnflag"),
          "l_extendedprice" +: tie, "__ryl")
        .write.format("noop").mode("overwrite").save())
    time("full spearman (rangeRanks)")(
      graft.operators.Profile.spearman(li, "l_quantity", "l_extendedprice",
          Seq("l_returnflag"), tie)
        .write.format("noop").mode("overwrite").save())
    time("full spearman (again)")(
      graft.operators.Profile.spearman(li, "l_quantity", "l_extendedprice",
          Seq("l_returnflag"), tie)
        .write.format("noop").mode("overwrite").save())
    graft.operators.TrackedCaches.release()
    time("full spearman (window form)")(
      graft.operators.Profile.spearman(li, "l_quantity", "l_extendedprice",
          Seq("l_returnflag"), tie, rangeRanks = false)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
