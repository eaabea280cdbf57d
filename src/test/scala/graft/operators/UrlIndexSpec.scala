package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Persisted URL seen-set: build, probe, append, replay no-op,
  * append ≡ rebuild, and the streaming closure.
  */
class UrlIndexSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "url")
  }

  private def tmp() =
    java.nio.file.Files.createTempDirectory("urlidx").toString

  test("probe finds only unseen canonicals; surface variants of a " +
      "seen URL are not new; within-batch dedup keeps min id") {
    val dir = tmp()
    WebCuration.writeUrlIndex(
      df(1L -> "http://a.com/x", 2L -> "http://a.com/y"), dir)
    val batch = df(
      10L -> "HTTP://WWW.A.COM/x",        // variant of seen → not new
      11L -> "http://a.com/z?id=1",       // new
      12L -> "http://a.com/z/?id=1#f",    // same page as 11 → dedup
      13L -> "not a url")                 // no canonical identity
    val got = WebCuration.newUrls(spark, dir, batch)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("http://a.com/z?id=1", 11L)))
  }

  test("append grows the index; a replayed batch is a no-op on BOTH " +
      "the report and the index") {
    val dir = tmp()
    WebCuration.writeUrlIndex(df(1L -> "http://a.com/x"), dir)
    val batch = df(20L -> "http://b.com/p", 21L -> "http://a.com/x")
    WebCuration.appendUrlIndex(spark, dir, batch)
    assert(spark.read.parquet(s"$dir/seen").count() === 2L)
    assert(WebCuration.newUrls(spark, dir, batch).count() === 0L)
    WebCuration.appendUrlIndex(spark, dir, batch) // replay
    assert(spark.read.parquet(s"$dir/seen").count() === 2L)
  }

  test("append ≡ rebuild when ingestion is id-ordered") {
    val seed = df(1L -> "http://a.com/x", 2L -> "http://b.com/y?q=1")
    val batch = df(10L -> "http://b.com/y?q=1&utm_source=t", // seen
      11L -> "https://c.com/new", 12L -> "https://c.com/new")
    val inc = tmp(); val reb = tmp()
    WebCuration.writeUrlIndex(seed, inc)
    WebCuration.appendUrlIndex(spark, inc, batch)
    WebCuration.writeUrlIndex(seed.unionByName(batch), reb)
    val a = spark.read.parquet(s"$inc/seen")
    val b = spark.read.parquet(s"$reb/seen")
    assert(a.exceptAll(b).unionByName(b.exceptAll(a)).count() === 0L)
  }

  test("streaming: batch-2 finds batch-1's URLs already indexed; a " +
      "replayed batch reports zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    WebCuration.writeUrlIndex(df(1L -> "http://a.com/x"), dir)
    val got = scala.collection.mutable.Map.empty[Long, Set[(String, Long)]]
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingUrlDedup.start(
      input.toDF().toDF("doc_id", "url"), dir,
      (fresh, bid) => got(bid) = fresh.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet)
    try {
      input.addData((10L, "http://b.com/p"), (11L, "http://www.a.com/x"))
      q.processAllAvailable()
      assert(got(0L) === Set(("http://b.com/p", 10L)))
      // batch 1: b.com/p arrived in batch 0 — only findable as seen if
      // the append grew the index — plus one genuinely new page
      input.addData((20L, "http://b.com/p?utm_source=s"),
        (21L, "http://c.com/q"))
      q.processAllAvailable()
      assert(got(1L) === Set(("http://c.com/q", 21L)))
      // replay of batch 1's data: everything already seen
      input.addData((20L, "http://b.com/p?utm_source=s"),
        (21L, "http://c.com/q"))
      q.processAllAvailable()
      assert(got(2L) === Set.empty[(String, Long)])
    } finally q.stop()
    // seed a.com/x + batch-0's b.com/p + batch-1's c.com/q; the www
    // variant collapses to the seed's canonical and the replayed batch
    // appends nothing (effectively-once), so exactly 3 canonicals
    assert(spark.read.parquet(s"$dir/seen").count() === 3L)
  }
}
