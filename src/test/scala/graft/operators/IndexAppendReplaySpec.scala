package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Replay idempotence of all four persisted-index append paths:
  * foreachBatch delivery is at-least-once, so a failure-replayed batch
  * re-appends — with the r14 `dedupeBatch` guard each re-append is a
  * NO-OP (already-indexed ids drop out of the batch), upgrading the
  * streaming maintenance loop to effectively-once. Without the guard a
  * replay duplicates MinHash band keys, DOUBLE-MERGES the IVF decimal
  * moments (silently moving every touched centroid), duplicates PQ
  * code rows (double-scoring in ADC), and doubles inverted-index tf
  * and doc length (inflating BM25 for the replayed docs).
  */
class IndexAppendReplaySpec extends SparkSpecBase {

  private def dir() = Files.createTempDirectory("replay").toString

  test("appendMinhashIndex: replaying a batch is a no-op") {
    import spark.implicits._
    val a = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different document about engines"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    val d = dir()
    Dedup.writeMinhashIndex(a, d, "doc_id", "text")
    Dedup.appendMinhashIndex(spark, d, b, "doc_id", "text")
    def snap() = (
      spark.read.parquet(s"$d/bands").collect().map(_.toString).sorted.toSeq,
      spark.read.parquet(s"$d/shingles").count())
    val once = snap()
    Dedup.appendMinhashIndex(spark, d, b, "doc_id", "text") // replay
    assert(snap() == once)
    // dedupeBatch = false restores the raw (duplicating) append
    Dedup.appendMinhashIndex(spark, d, b, "doc_id", "text",
      dedupeBatch = false)
    assert(spark.read.parquet(s"$d/shingles").count() == once._2 + 1)
  }

  test("appendIvfIndex: replaying a batch leaves moments, centroids " +
      "and lists untouched") {
    val emb = Tables.embeddings(spark, sf())
    val a = emb.filter(col("vec_id") % 3 =!= 0L)
    val b = emb.filter(col("vec_id") % 3 === 0L).limit(20)
    val d = dir()
    Similarity.writeIvfIndex(a, d, portable = true)
    Similarity.appendIvfIndex(spark, d, b)
    def cents() = spark.read.parquet(s"$d/centroids").collect()
      .map(r => r.get(0) -> r.getSeq[Double](1)).toMap
    def counts() = (spark.read.parquet(s"$d/moments").count(),
      spark.read.parquet(s"$d/lists").count())
    val (c1, n1) = (cents(), counts())
    Similarity.appendIvfIndex(spark, d, b) // replay
    assert(cents() == c1 && counts() == n1,
      "a replayed IVF append must not re-merge moments or re-add lists")
  }

  test("appendPqIndex: replaying a batch adds no code rows") {
    val emb = Tables.embeddings(spark, sf())
    val a = emb.filter(col("vec_id") % 3 =!= 0L)
    val b = emb.filter(col("vec_id") % 3 === 0L).limit(20)
    val d = dir()
    Pq.writePqIndex(a, d)
    Pq.appendPqIndex(spark, d, b)
    val n1 = spark.read.parquet(s"$d/codes").count()
    Pq.appendPqIndex(spark, d, b) // replay
    assert(spark.read.parquet(s"$d/codes").count() == n1)
  }

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def partFiles(p: String): Set[String] =
    fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath.getName).filter(_.startsWith("part-")).toSet

  test("appendMinhashIndex: a crash AFTER the band swap but BEFORE the " +
      "shingle append heals on replay — bands never duplicate, the " +
      "missing shingles land") {
    import spark.implicits._
    val a = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    val d = dir()
    Dedup.writeMinhashIndex(a, d, "doc_id", "text")
    val before = partFiles(s"$d/shingles")
    Dedup.appendMinhashIndex(spark, d, b, "doc_id", "text")
    // simulate the crash window: un-append the batch's shingle files
    (partFiles(s"$d/shingles") -- before).foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$d/shingles/$f"), false))
    spark.catalog.refreshByPath(s"$d/shingles")
    val bandsAfterSwap = spark.read.parquet(s"$d/bands").collect()
      .map(_.toString).sorted.toSeq
    // replay: batch not in shingles -> not deduped -> its band keys
    // re-deliver; the distinct-before-recount keeps bands identical
    Dedup.appendMinhashIndex(spark, d, b, "doc_id", "text")
    assert(spark.read.parquet(s"$d/bands").collect()
      .map(_.toString).sorted.toSeq == bandsAfterSwap)
    assert(spark.read.parquet(s"$d/shingles")
      .filter(col("doc") === 10L).count() == 1L)
  }

  test("appendInvertedIndex: a crash BETWEEN the two frame appends " +
      "heals on replay — per-frame dedupe fills exactly the missing " +
      "frame") {
    import spark.implicits._
    val a = Seq((1L, "spark engines process data")).toDF("doc_id", "text")
    val b = Seq((10L, "spark queries scale out")).toDF("doc_id", "text")
    val d = dir()
    TextAnalysis.writeInvertedIndex(a, d)
    val before = partFiles(s"$d/lens")
    TextAnalysis.appendInvertedIndex(b, d)
    val wantBm25 = TextAnalysis.bm25FromIndex(spark, d, Seq("spark"))
      .collect().map(_.toString).sorted.toSeq
    // simulate: postings landed, the lens append was lost in the crash
    (partFiles(s"$d/lens") -- before).foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$d/lens/$f"), false))
    spark.catalog.refreshByPath(s"$d/lens")
    assert(spark.read.parquet(s"$d/lens").count() == 1L)
    TextAnalysis.appendInvertedIndex(b, d) // replay
    assert(spark.read.parquet(s"$d/lens").count() == 2L)
    // postings did NOT duplicate, and the healed index scores as the
    // uncrashed one did
    assert(spark.read.parquet(s"$d/postings")
      .filter(col("doc_id") === 10L).select("term").distinct().count() ==
      spark.read.parquet(s"$d/postings")
        .filter(col("doc_id") === 10L).count())
    assert(TextAnalysis.bm25FromIndex(spark, d, Seq("spark"))
      .collect().map(_.toString).sorted.toSeq == wantBm25)
  }

  test("appendInvertedIndex: replay adds nothing and BM25 is unchanged; " +
      "a mixed batch appends only its new docs") {
    import spark.implicits._
    val a = Seq((1L, "spark engines process data"),
      (2L, "ducks process queries")).toDF("doc_id", "text")
    val b = Seq((10L, "spark queries scale out")).toDF("doc_id", "text")
    val d = dir()
    TextAnalysis.writeInvertedIndex(a, d)
    TextAnalysis.appendInvertedIndex(b, d)
    def snap() = (spark.read.parquet(s"$d/lens").count(),
      spark.read.parquet(s"$d/postings").count(),
      TextAnalysis.bm25FromIndex(spark, d, Seq("spark", "process"))
        .collect().map(_.toString).sorted.toSeq)
    val once = snap()
    TextAnalysis.appendInvertedIndex(b, d) // replay
    assert(snap() == once)
    // mixed replay: one known doc + one new — only the new one lands
    val mixed = Seq((10L, "spark queries scale out"),
      (11L, "fresh document arrives")).toDF("doc_id", "text")
    TextAnalysis.appendInvertedIndex(mixed, d)
    assert(spark.read.parquet(s"$d/lens").count() == once._1 + 1)
    assert(spark.read.parquet(s"$d/lens")
      .filter(col("doc_id") === 11L).count() == 1L)
  }
}
