package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: per-stage wall-clock breakdown of the curation pipeline
  * (the heaviest composite query in the bench). Not part of the driver
  * contract; run with
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.StageProfile"`.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", "32")
      .appName("graft-stage-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cfg = graft.operators.Curation.Config(
      mixFractions = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.5, "src3" -> 0.1),
      mixDefaultFraction = 0.25)
    // isolate the near-dup stage's two phases on the same input the
    // pipeline sees (post-quality, post-exact-dedup survivors differ
    // negligibly from raw docs for timing purposes)
    val tp = System.nanoTime()
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      0.5, 3, 5L)
    val nPairs = pairs.count()
    println(f"PAIRS n=$nPairs ${(System.nanoTime() - tp) / 1e9}%.2fs")
    val tc = System.nanoTime()
    val cc = graft.operators.Dedup.connectedComponents(pairs)
    println(f"CC n=${cc.count()} ${(System.nanoTime() - tc) / 1e9}%.2fs")
    graft.operators.Dedup.releaseCaches()

    val t0 = System.nanoTime()
    val built = graft.operators.Curation.stages(docs, cfg)
    println(f"BUILD(stages incl. eager CC) ${(System.nanoTime() - t0) / 1e9}%.2fs")
    built.foreach { case (name, df) =>
      val t = System.nanoTime()
      val n = df.count()
      println(f"STAGE $name%-20s n=$n%-8d ${(System.nanoTime() - t) / 1e9}%.2fs")
    }
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2fs")
    // second pass: all frames cached now - recount to see cache benefit
    built.foreach { case (name, df) =>
      val t = System.nanoTime()
      df.count()
      val inMem = df.queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }.size
      println(f"RECOUNT $name%-20s ${(System.nanoTime() - t) / 1e9}%.2fs " +
        s"level=${df.storageLevel} inMemRelations=$inMem")
    }
    graft.operators.Curation.unpersist(built)
    spark.stop()
  }
}
