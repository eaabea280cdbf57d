package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev utility (optimization rounds): run named bench queries under a
  * job listener and print one line per Spark job — wall time, task
  * count, and the first call-site frame — so multi-action gates
  * (streaming parity, index build/append families) can be attributed
  * job by job instead of as one opaque number. Not part of the driver
  * contract. Usage:
  * `sbt "runMain graft.tools.JobProfile <sfDir> <query> [query...]"`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // (jobId, startNs, callSite, nTasks)
    val open = scala.collection.concurrent.TrieMap.empty[Int, (Long, String, Int)]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        open(js.jobId) = (System.nanoTime(), site, nTasks)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        open.remove(je.jobId).foreach { case (t0, site, nTasks) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1e9, site, nTasks))
        }
    })
    // same warm-up as Bench so job 0 does not absorb session costs
    spark.range(0, 10000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          done.clear()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // drain: listener events are async; give the bus a beat
          Thread.sleep(300)
          val jobs = done.toArray(Array.empty[(Int, Double, String, Int)])
            .sortBy(_._1)
          println(f"\n===== $name total=$dt%.2fs jobs=${jobs.length} " +
            f"jobSum=${jobs.map(_._2).sum}%.2fs =====")
          jobs.foreach { case (id, sec, site, nTasks) =>
            println(f"  job=$id%-4d $sec%7.3fs tasks=$nTasks%-5d $site")
          }
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
