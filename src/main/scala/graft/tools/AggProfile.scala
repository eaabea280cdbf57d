package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: isolate where corrMatrix-style wide aggregations spend
  * time — parquet scan, double sums, or decimal sums. Not part of the
  * driver contract; run with
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AggProfile"`.
  */
object AggProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", "32")
      .appName("graft-agg-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def cd(c: String) = col(c).cast("double")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    def time(name: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t) / 1e9}%.2fs")
    }
    // warmup
    li.count(); li.count()
    time("scan+count")(li.count())
    time("scan 4 cols")(li.select(cols.map(col): _*).write
      .format("noop").mode("overwrite").save())
    val dblAggs =
      cols.map(c => sum(cd(c)).as(s"s_$c")) ++
      cols.map(c => sum(cd(c) * cd(c)).as(s"ss_$c")) ++
      pairs.map { case (a, b) => sum(cd(a) * cd(b)).as(s"sp_${a}_$b") }
    time("14 double sums")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), dblAggs: _*)
        .write.format("noop").mode("overwrite").save())
    val d = "decimal(30,6)"
    val decAggs =
      cols.map(c => sum(cd(c).cast(d)).as(s"s_$c")) ++
      cols.map(c => sum((cd(c) * cd(c)).cast(d)).as(s"ss_$c")) ++
      pairs.map { case (a, b) => sum((cd(a) * cd(b)).cast(d)).as(s"sp_${a}_$b") }
    time("14 decimal(30,6) sums")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), decAggs: _*)
        .write.format("noop").mode("overwrite").save())
    time("14 decimal sums (again)")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), decAggs: _*)
        .write.format("noop").mode("overwrite").save())
    val d18 = "decimal(18,6)"
    val dec18Aggs =
      cols.map(c => sum(cd(c).cast(d18)).as(s"s_$c")) ++
      cols.map(c => sum((cd(c) * cd(c)).cast(d18)).as(s"ss_$c")) ++
      pairs.map { case (a, b) => sum((cd(a) * cd(b)).cast(d18)).as(s"sp_${a}_$b") }
    time("14 decimal(18,6) sums")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), dec18Aggs: _*)
        .write.format("noop").mode("overwrite").save())
    // portable micro-quantization: decimal(18,6) is long-backed, *1e6
    // cast to BIGINT is exact; sum as TWO longs (hi/lo split) so ANSI
    // never overflows, recombine per-group in decimal (k rows)
    def q6(e: org.apache.spark.sql.Column) =
      (e.cast("decimal(18,6)") * lit(1000000L)).cast("long")
    val B = 1000000000L
    def hiLo(e: org.apache.spark.sql.Column, name: String) = {
      val q = q6(e)
      val lo = pmod(q, lit(B))
      Seq(sum((q - lo) / lit(B)).as(s"hi_$name"), sum(lo).as(s"lo_$name"))
    }
    def recomb(name: String) =
      (col(s"hi_$name").cast("decimal(38,0)") * lit(B) +
        col(s"lo_$name").cast("decimal(38,0)")).cast("double") / 1e6
    val hlAggs =
      cols.flatMap(c => hiLo(cd(c), s"s_$c")) ++
      cols.flatMap(c => hiLo(cd(c) * cd(c), s"ss_$c")) ++
      pairs.flatMap { case (a, b) => hiLo(cd(a) * cd(b), s"sp_${a}_$b") }
    time("14 hi/lo long sums")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), hlAggs: _*)
        .write.format("noop").mode("overwrite").save())
    time("14 hi/lo long sums (again)")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), hlAggs: _*)
        .write.format("noop").mode("overwrite").save())
    // floor-quantized: pure double arithmetic (identical IEEE results
    // in any engine), no decimal cast at all
    def qf(e: org.apache.spark.sql.Column) =
      floor(e * 1000000d + 0.5d).cast("long")
    def hiLoF(e: org.apache.spark.sql.Column, name: String) = {
      val q = qf(e)
      val lo = pmod(q, lit(B))
      Seq(sum((q - lo) / lit(B)).as(s"hi_$name"), sum(lo).as(s"lo_$name"))
    }
    val hfAggs =
      cols.flatMap(c => hiLoF(cd(c), s"s_$c")) ++
      cols.flatMap(c => hiLoF(cd(c) * cd(c), s"ss_$c")) ++
      pairs.flatMap { case (a, b) => hiLoF(cd(a) * cd(b), s"sp_${a}_$b") }
    time("14 floor hi/lo long sums")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), hfAggs: _*)
        .write.format("noop").mode("overwrite").save())
    time("14 floor hi/lo (again)")(
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"), hfAggs: _*)
        .write.format("noop").mode("overwrite").save())
    // equality check vs the decimal path
    val dec = li.groupBy(col("l_returnflag"))
      .agg(decAggs.head, decAggs.tail: _*)
      .select(col("l_returnflag"),
        col(s"s_${cols.head}").cast("double").as("v"))
    val hl = li.groupBy(col("l_returnflag"))
      .agg(hlAggs.head, hlAggs.tail: _*)
      .select(col("l_returnflag"), recomb(s"s_${cols.head}").as("v2"))
    dec.join(hl, "l_returnflag")
      .select(col("l_returnflag"), col("v"), col("v2"),
        (col("v") - col("v2")).as("diff")).show()
    spark.stop()
  }
}
