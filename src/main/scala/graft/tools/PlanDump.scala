package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dumps the EXECUTED plan of every action a query runs — unlike
  * [[graft.Plans]] (explain of the returned frame only), this catches
  * the internal writes (index builds, appends, streaming sinks) where
  * most optimization work lives. One `===== action N: <name> =====`
  * block per action, formatted explain, printed to stdout; redirect to
  * `plans/rNN/<query>_{before,after}.txt`.
  *
  * Usage: `sbt "runMain graft.tools.PlanDump <sfDir> <query> [query ...]"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = graft.GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = new AtomicInteger(0)
    val sb = new StringBuilder
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = sb.synchronized {
        sb.append(s"\n===== action ${n.incrementAndGet()}: $funcName " +
          f"(${durationNs / 1e9}%.3fs) =====\n")
        sb.append(qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        sb.append("\n")
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          sb.clear(); n.set(0)
          spark.listenerManager.register(listener)
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          finally spark.listenerManager.unregister(listener)
          // the listener bus is async — give it a beat before printing
          Thread.sleep(500)
          println(s"\n################ $name: ${n.get()} actions " +
            "################")
          println(sb.toString)
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
