package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpecBase {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compactParquet: many small files become few target-sized ones " +
      "with every row preserved") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val df = (1L to 5000L).map(i => (i, "v" * 100 + i)).toDF("id", "payload")
    df.repartition(40).write.parquet(s"$base/in")
    val nIn = parquetFiles(s"$base/in").length
    assert(nIn == 40)
    val totalBytes = parquetFiles(s"$base/in").map(_.length()).sum
    val target = totalBytes / 4
    val n = Maintenance.compactParquet(spark, s"$base/in", s"$base/out", target)
    assert(n >= 4 && n <= 5) // ceil division of ~4 targets
    assert(parquetFiles(s"$base/out").length == n)
    val back = spark.read.parquet(s"$base/out")
    assert(back.count() == 5000L)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("compactParquet: empty or data-free directories are rejected") {
    val base = java.nio.file.Files.createTempDirectory("compact_e").toString
    new java.io.File(s"$base/in").mkdirs()
    intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, s"$base/in", s"$base/out")
    }
  }
}
