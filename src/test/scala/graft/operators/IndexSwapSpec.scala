package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Crash-state recovery for the staged index swap: every interruption
  * point of [[IndexSwap.swapAll]] must heal to ONE consistent
  * generation — never a missing frame, never frames from two
  * generations live together (the ADVICE-flagged holes of the old
  * delete-then-rename swap).
  */
class IndexSwapSpec extends SparkSpecBase {

  private val names = Seq("bands", "dropped")

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Lay out a fake index dir: gen-1 live frames, optionally gen-2
    * staged frames, then hand-mangle into a crash state.
    */
  private def freshDir(): String =
    Files.createTempDirectory("idxswap").toString

  private def writeFrame(dir: String, name: String, gen: Int,
                         success: Boolean = true): Unit = {
    import spark.implicits._
    Seq((gen, name)).toDF("gen", "frame")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    if (!success)
      fs.delete(new Path(s"$dir/$name/_SUCCESS"), false)
  }

  private def genOf(dir: String, name: String): Int =
    spark.read.parquet(s"$dir/$name").select("gen").head().getInt(0)

  private def stage(dir: String, gen: Int, success: Boolean = true): Unit =
    names.foreach(n => writeFrame(dir, s"${n}__staged", gen, success))

  private def liveGens(dir: String): Seq[Int] = names.map(genOf(dir, _))

  test("swapAll publishes both frames and leaves no debris") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 1))
    stage(dir, gen = 2)
    IndexSwap.swapAll(fs, dir, names)
    assert(liveGens(dir) == Seq(2, 2))
    names.foreach { n =>
      assert(!fs.exists(new Path(s"$dir/${n}__staged")))
      assert(!fs.exists(new Path(s"$dir/${n}__old")))
    }
  }

  test("swapAll refuses an incomplete staged frame") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 1))
    writeFrame(dir, "bands__staged", gen = 2)
    writeFrame(dir, "dropped__staged", gen = 2, success = false)
    assertThrows[IllegalArgumentException](IndexSwap.swapAll(fs, dir, names))
    assert(liveGens(dir) == Seq(1, 1)) // live generation untouched
  }

  test("recover rolls FORWARD from a crash between the two asides") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 1))
    stage(dir, gen = 2)
    // crash state: bands renamed aside, dropped still live
    assert(fs.rename(new Path(s"$dir/bands"), new Path(s"$dir/bands__old")))
    IndexSwap.recover(fs, dir, names)
    assert(liveGens(dir) == Seq(2, 2))
  }

  test("recover rolls FORWARD from a crash between the two promotes") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 1))
    stage(dir, gen = 2)
    // crash state: both assides done, bands promoted, dropped not
    names.foreach(n => assert(
      fs.rename(new Path(s"$dir/$n"), new Path(s"$dir/${n}__old"))))
    assert(fs.rename(new Path(s"$dir/bands__staged"), new Path(s"$dir/bands")))
    IndexSwap.recover(fs, dir, names)
    assert(liveGens(dir) == Seq(2, 2))
  }

  test("recover finishes the __old cleanup after a crash mid-delete") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 2))
    writeFrame(dir, "bands__old", gen = 1)
    IndexSwap.recover(fs, dir, names)
    assert(liveGens(dir) == Seq(2, 2))
    assert(!fs.exists(new Path(s"$dir/bands__old")))
  }

  test("recover rolls BACK a torn stage-write (no swap started)") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 1))
    writeFrame(dir, "bands__staged", gen = 2)
    writeFrame(dir, "dropped__staged", gen = 2, success = false) // torn
    IndexSwap.recover(fs, dir, names)
    assert(liveGens(dir) == Seq(1, 1))
    names.foreach(n => assert(!fs.exists(new Path(s"$dir/${n}__staged"))))
  }

  test("recover promotes a complete staged pair the writer never swapped") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 1))
    stage(dir, gen = 2)
    IndexSwap.recover(fs, dir, names)
    assert(liveGens(dir) == Seq(2, 2))
  }

  test("recover is a no-op on a clean index") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 1))
    IndexSwap.recover(fs, dir, names)
    assert(liveGens(dir) == Seq(1, 1))
  }

  test("clean drops staged/old leftovers before a rebuild") {
    val dir = freshDir()
    names.foreach(writeFrame(dir, _, gen = 2))
    writeFrame(dir, "bands__old", gen = 1)
    writeFrame(dir, "dropped__staged", gen = 3)
    IndexSwap.clean(fs, dir, names)
    assert(liveGens(dir) == Seq(2, 2))
    assert(!fs.exists(new Path(s"$dir/bands__old")))
    assert(!fs.exists(new Path(s"$dir/dropped__staged")))
  }

  test("rebuild over a LIVE index publishes one generation: a torn " +
      "rebuild rolls back whole, a completed staged set rolls forward, " +
      "and a clean rebuild leaves no debris") {
    import spark.implicits._
    val v1 = Seq((1L, "spark engines process data"),
      (2L, "ducks process queries")).toDF("doc_id", "text")
    val v2 = Seq((1L, "spark engines process data"),
      (2L, "ducks process queries"),
      (3L, "fresh document arrives")).toDF("doc_id", "text")
    val d = freshDir() + "/inv"
    TextAnalysis.writeInvertedIndex(v1, d)
    def lensCount() = spark.read.parquet(s"$d/lens").count()
    // torn rebuild: staged lens complete, staged postings torn, live
    // v1 untouched -> the next reader rolls the torn generation back
    spark.read.parquet(s"$d/lens")
      .write.parquet(IndexSwap.stagedPath(d, "lens"))
    spark.read.parquet(s"$d/postings").limit(1).write
      .parquet(IndexSwap.stagedPath(d, "postings"))
    fs.delete(new Path(IndexSwap.stagedPath(d, "postings") + "/_SUCCESS"),
      false)
    assert(TextAnalysis.bm25FromIndex(spark, d, Seq("process"))
      .count() == 2L) // v1 intact
    assert(lensCount() == 2L)
    names.foreach(_ => ()) // (minhash names unused here)
    assert(!fs.exists(new Path(IndexSwap.stagedPath(d, "lens"))))
    // clean rebuild over the live index: new corpus served, no debris
    TextAnalysis.writeInvertedIndex(v2, d)
    assert(lensCount() == 3L)
    Seq("lens", "postings").foreach { n =>
      assert(!fs.exists(new Path(IndexSwap.stagedPath(d, n))))
      assert(!fs.exists(new Path(s"$d/${n}__old")))
    }
    // PQ retrain over live: one generation, served consistently
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val pd = freshDir() + "/pq"
    Pq.writePqIndex(emb.filter(col("vec_id") < 100L), pd)
    Pq.writePqIndex(emb.filter(col("vec_id") < 200L), pd) // retrain
    assert(spark.read.parquet(s"$pd/codes")
      .select("vec_id").distinct().count() ==
      emb.filter(col("vec_id") < 200L).count())
    Seq("codebooks", "codes", "meta").foreach { n =>
      assert(!fs.exists(new Path(IndexSwap.stagedPath(pd, n))))
      assert(!fs.exists(new Path(s"$pd/${n}__old")))
    }
  }

  test("appendMinhashIndex after an injected mid-swap crash ≡ rebuild") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a completely different document about engines"),
      (2L, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
    val b1 = Seq((10L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val b2 = Seq((20L, "the quick brown fox jumps over a sleepy dog"))
      .toDF("doc_id", "text")
    val dir = freshDir() + "/idx"
    Dedup.writeMinhashIndex(corpus, dir, "doc_id", "text")
    Dedup.appendMinhashIndex(spark, dir, b1, "doc_id", "text")
    // inject the worst pre-fix crash: bands promoted, dropped stale.
    // Simulate by re-staging a DIFFERENT generation and tearing the
    // swap halfway (bands aside+promoted, dropped untouched).
    spark.read.parquet(s"$dir/bands")
      .write.parquet(IndexSwap.stagedPath(dir, "bands"))
    spark.read.parquet(s"$dir/dropped")
      .write.parquet(IndexSwap.stagedPath(dir, "dropped"))
    assert(fs.rename(new Path(s"$dir/bands"), new Path(s"$dir/bands__old")))
    // next append must self-heal, then produce the rebuild-identical index
    Dedup.appendMinhashIndex(spark, dir, b2, "doc_id", "text")
    val rebuilt = freshDir() + "/idx"
    Dedup.writeMinhashIndex(corpus.unionByName(b1).unionByName(b2),
      rebuilt, "doc_id", "text")
    def keys(d: String) = spark.read.parquet(s"$d/bands")
      .select("doc", "band", "bucket").collect().map(_.toString).sorted.toSeq
    assert(keys(dir) == keys(rebuilt))
  }
}
