package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage breakdown of q201's deterministic bootstrap — which
  * of scan/spread/explode-agg/window dominates at a given SF. Run with
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BootstrapProfile"`.
  */
object BootstrapProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bp] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("ship_us", unix_micros(col("l_shipdate").cast("timestamp")))
    time("warm scan count")(li.count())
    val base = li.filter(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("__x"),
        concat_ws("#", col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          col("ship_us").cast("string")).as("__k"))
    time("base noop")(base.write.format("noop").mode("overwrite").save())
    val spread = base.repartition(32)
    time("spread noop")(spread.write.format("noop").mode("overwrite").save())
    val b = 40
    val u = graft.functions.TextHashes.md5Uniform(
      concat(col("__k"), lit("#"), col("__b").cast("string")))
    val m = graft.operators.Stats.PoissonCdf.zipWithIndex
      .foldRight(lit(graft.operators.Stats.PoissonCdf.length)
        : org.apache.spark.sql.Column) { case ((c, k), other) =>
        when(u <= lit(c), lit(k)).otherwise(other)
      }
    val exploded = spread.withColumn("__b",
      explode(sequence(lit(0), lit(b - 1))))
    time("explode only noop")(
      exploded.select(col("__b")).write.format("noop").mode("overwrite").save())
    time("explode+u noop")(
      exploded.select(u.as("u")).write.format("noop").mode("overwrite").save())
    val resampled = exploded.withColumn("__m", m.cast("long"))
      .groupBy(col("l_returnflag"), col("__b"))
      .agg(sum(col("__m").cast("decimal(2,0)") *
          col("__x").cast("decimal(28,6)")).as("__sm"),
        sum(col("__m")).as("__nm"))
    time("full resample agg")(
      resampled.write.format("noop").mode("overwrite").save())
    time("whole operator")(
      graft.operators.Stats.bootstrapMeanCI(li, "l_extendedprice",
          Seq("l_orderkey", "l_linenumber", "ship_us"), Seq("l_returnflag"),
          b = 40)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
