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

  test("zorderValues: hand-computed interleave on a 4x4 grid") {
    import spark.implicits._
    // 16 rows over a 4x4 (x, y) grid, one row per cell: with bits = 2
    // the equi-depth buckets ARE the grid coordinates, so zorder is the
    // classic Morton number z = interleave(x, y)
    val df = (for { x <- 0 until 4; y <- 0 until 4 }
      yield (x * 4L + y, x, y)).toDF("id", "x", "y")
    val out = Maintenance.zorderValues(df, Seq("x", "y"), Seq("id"), bits = 2)
      .collect().map(r => (r.getAs[Int]("x"), r.getAs[Int]("y")) ->
        r.getAs[Long]("zorder")).toMap
    def morton(x: Int, y: Int): Long =
      (0 until 2).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum.toLong
    for (x <- 0 until 4; y <- 0 until 4)
      assert(out((x, y)) == morton(x, y), s"cell ($x, $y)")
  }

  test("zorderWrite: every file gets a bounded span on BOTH columns, " +
      "unlike a single-column sort") {
    import spark.implicits._
    // independent uniform columns: a z-ordered layout bounds both spans
    val rows = (0 until 4096).map { i =>
      (i.toLong, (i * 2654435761L % 4096L), (i * 40503L % 4096L))
    }
    val df = rows.toDF("id", "a", "b")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    Maintenance.zorderWrite(df, Seq("a", "b"), Seq("id"), s"$base/z",
      nFiles = 16)
    val spans = spark.read.parquet(s"$base/z")
      .groupBy(input_file_name())
      .agg((max(col("a")) - min(col("a"))).as("sa"),
        (max(col("b")) - min(col("b"))).as("sb"))
      .collect()
    assert(spans.length == 16)
    val avgA = spans.map(_.getAs[Long]("sa")).sum.toDouble / spans.length
    val avgB = spans.map(_.getAs[Long]("sb")).sum.toDouble / spans.length
    // random placement would give ~4095 span per file on each column; a
    // 16-file z-layout divides the curve into 16 tiles -> both columns'
    // average spans shrink well below that
    assert(avgA < 2200, s"avg span a $avgA")
    assert(avgB < 2200, s"avg span b $avgB")
  }

  test("compactParquet: empty or data-free directories are rejected") {
    val base = java.nio.file.Files.createTempDirectory("compact_e").toString
    new java.io.File(s"$base/in").mkdirs()
    intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, s"$base/in", s"$base/out")
    }
  }

  test("corpusChecksum is order- and partition-invariant") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"text$i")).toDF("id", "t")
    def ck(d: org.apache.spark.sql.DataFrame) =
      Maintenance.corpusChecksum(d, Seq("id", "t")).collect().head
    val base = ck(df)
    assert(base.getLong(0) === 100L)
    assert(ck(df.orderBy(org.apache.spark.sql.functions.col("t").desc))
      === base)
    assert(ck(df.repartition(7)) === base)
    // any single-row change moves the checksum
    val tweaked = (1L to 100L)
      .map(i => (i, if (i == 50) "TEXT50" else s"text$i")).toDF("id", "t")
    assert(ck(tweaked).getString(1) !== base.getString(1))
  }

  test("corpusChecksum replays the md5-ring fingerprint by hand") {
    import spark.implicits._
    val df = Seq((7L, "abc")).toDF("id", "t")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("7abc".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = java.lang.Long.parseLong(hex.take(13), 16)
    val r = Maintenance.corpusChecksum(df, Seq("id", "t")).collect().head
    assert(r.getLong(0) === 1L)
    assert(r.getString(1) === expected.toString)
    intercept[IllegalArgumentException] {
      Maintenance.corpusChecksum(df, Nil)
    }
  }

  test("partitionChecksums: a one-row change flips exactly its group; " +
      "checksumDiff emits the re-sync worklist") {
    import spark.implicits._
    def frame(tweak: Boolean) = (1L to 60L).map { i =>
      val t = if (tweak && i == 7) "CHANGED" else s"text$i"
      (i, "g" + (i % 3), t)
    }.toDF("id", "g", "t")
    val base = Maintenance.partitionChecksums(frame(false), "g", Seq("id", "t"))
    val tweaked = Maintenance.partitionChecksums(frame(true), "g", Seq("id", "t"))
    // doc 7 lives in g1: only that group's checksum moves
    val diff = Maintenance.checksumDiff(base, tweaked, "g").collect()
    assert(diff.length === 1)
    assert(diff.head.getAs[String]("g") === "g1")
    assert(diff.head.getAs[String]("status") === "mismatch")
    // group sums reconcile with the global checksum
    val global = Maintenance.corpusChecksum(frame(false), Seq("id", "t"))
      .collect().head.getString(1)
    val summed = base.collect().map(r => BigInt(r.getString(2))).sum
    assert(summed === BigInt(global))
    // a dropped group surfaces as missing
    val missing = Maintenance.checksumDiff(base,
      tweaked.filter(col("g") =!= "g2"), "g").collect()
    assert(missing.exists(r => r.getAs[String]("g") == "g2" &&
      r.getAs[String]("status") == "missing_right"))
    intercept[IllegalArgumentException] {
      Maintenance.partitionChecksums(frame(false), "g", Seq("g", "t"))
    }
  }

  test("corpusChecksum rendering is injective and null-safe") {
    import spark.implicits._
    def ck(rows: Seq[(String, String)]) =
      Maintenance.corpusChecksum(rows.toDF("a", "b"), Seq("a", "b"))
        .collect().head
    // separator: ("ab","c") vs ("a","bc") must fingerprint differently
    assert(ck(Seq(("ab", "c"))).getString(1)
      !== ck(Seq(("a", "bc"))).getString(1))
    // a NULL column keeps the row in the sum (n_rows == contributing
    // rows) and differs from the empty string
    val withNull = ck(Seq(("x", null), ("y", "z")))
    assert(withNull.getLong(0) === 2L)
    assert(withNull.getString(1) !== ck(Seq(("x", ""), ("y", "z"))).getString(1))
  }

  test("schemaDiff: added/removed/same/retyped from real footers; " +
      "identical snapshots report all-same") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sdiff").toString
    Seq((1L, "a", 1.5)).toDF("id", "name", "score")
      .write.parquet(s"$base/v1")
    Seq((1L, 2, true)).toDF("id", "score", "active")
      .selectExpr("CAST(id AS INT) AS id", "score", "active")
      .write.parquet(s"$base/v2")
    val out = Maintenance.schemaDiff(spark, s"$base/v1", s"$base/v2")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("id" -> "retyped", "name" -> "removed",
      "score" -> "retyped", "active" -> "added"))
    val same = Maintenance.schemaDiff(spark, s"$base/v1", s"$base/v1")
      .collect()
    assert(same.length == 3 && same.forall(_.getString(3) == "same"))
  }

  test("embeddingCoverage: each counter fires on a hand fixture; a " +
      "perfectly aligned store reads all-zero anomalies") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (1L to 6L).map(Tuple1(_)).toDF("doc_id")
    val emb = Seq(
      (1L, Seq(1f, 2f)),           // fine
      (2L, Seq(3f, 4f)),           // fine
      (3L, null),                  // null vector
      (4L, Seq(5f)),               // bad dim (modal is 2)
      (5L, Seq(Float.NaN, 6f)),    // NaN component
      (99L, Seq(7f, 8f))           // orphan; doc 6 unembedded
    ).toDF("vec_id", "embedding")
    val r = Maintenance.embeddingCoverage(docs, emb).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((6L, 6L, 1L, 1L, 1L, 1L, 1L)))
    assert(r.getDouble(7) == 0.833333)
    val clean = Maintenance.embeddingCoverage(docs,
      docs.select(col("doc_id").as("vec_id"),
        array(lit(1f), lit(2f)).as("embedding"))).head()
    assert((clean.getLong(2), clean.getLong(3), clean.getLong(4),
      clean.getLong(5), clean.getLong(6)) == ((0L, 0L, 0L, 0L, 0L)))
    assert(clean.getDouble(7) == 1.0)
  }

  test("schemaDiff flattens nested structs to leaf paths: a deep field " +
      "change classifies at its own a.b.c row, arrays of structs " +
      "descend as a[].b, scalar arrays stay atomic leaves") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sdiffn").toString
    Seq((1L, ("ann", 7), Seq(("k1", 1)), Seq(1.0)))
      .toDF("id", "meta", "tags", "ws")
      .select(col("id"),
        col("meta").cast("struct<author:string,year:int>").as("meta"),
        col("tags").cast("array<struct<k:string,v:int>>").as("tags"),
        col("ws"))
      .write.parquet(s"$base/v1")
    Seq((1L, (7L, "x"), Seq(("k1", 1)), Seq(1.0f)))
      .toDF("id", "meta", "tags", "ws")
      .select(col("id"),
        col("meta").cast("struct<year:bigint,tag:string>").as("meta"),
        col("tags").cast("array<struct<k:string,v:int>>").as("tags"),
        col("ws"))
      .write.parquet(s"$base/v2")
    val out = Maintenance.schemaDiff(spark, s"$base/v1", s"$base/v2")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map(
      "id" -> "same",
      "meta.author" -> "removed",
      "meta.year" -> "retyped",
      "meta.tag" -> "added",
      "tags[].k" -> "same",
      "tags[].v" -> "same",
      "ws" -> "retyped")) // array<double> -> array<float>: atomic leaf
  }

  test("indexCard: frame inventory, swap-debris flags, footprint") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_index_card").toString
    val corpus = Seq((1L, "a b c d e f"), (2L, "b c d e f g"))
      .toDF("doc_id", "text")
    Dedup.writeMinhashIndex(corpus, dir, "doc_id", "text")
    val frames = Seq("bands", "dropped")
    val clean = Maintenance.indexCard(spark, dir, frames).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4))).toMap
    assert(clean.keySet == frames.toSet)
    frames.foreach { f =>
      val (present, staged, old, n) = clean(f)
      assert(present && !staged && !old, s"$f should be clean")
      assert(n > 0L, s"$f should have files")
    }
    // a dead rebuild's staged dir and a dead swap's old dir are flagged
    java.nio.file.Files
      .createDirectory(java.nio.file.Paths.get(s"$dir/bands__staged"))
    java.nio.file.Files
      .createDirectory(java.nio.file.Paths.get(s"$dir/dropped__old"))
    val debris = Maintenance.indexCard(spark, dir, frames).collect()
      .map(r => r.getString(0) -> (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(debris("bands") == ((true, false)))
    assert(debris("dropped") == ((false, true)))
    // a missing frame reports absent with zero footprint
    val missing = Maintenance.indexCard(spark, dir, Seq("nosuch"))
      .collect().head
    assert(!missing.getBoolean(1) && missing.getLong(4) == 0L)
    // unpartitioned frames report zero partitions; a hive-partitioned
    // IVF lists frame reports its cell fan-out
    assert(clean.keySet.forall { f =>
      Maintenance.indexCard(spark, dir, Seq(f)).collect()
        .head.getLong(6) == 0L })
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft_index_card_ivf").toString
    graft.operators.Similarity.writeIvfIndex(
      Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 1))
        .toDF("vec_id", "embedding", "label"), ivfDir)
    assert(Maintenance.indexCard(spark, ivfDir, Seq("lists")).collect()
      .head.getLong(6) == 2L)
  }

  test("sweepIndexDebris: reports and heals what the card flags; a " +
      "clean index sweeps to zero rows") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sweep").toString
    val corpus = Seq((1L, "a b c d e f"), (2L, "b c d e f g"))
      .toDF("doc_id", "text")
    Dedup.writeMinhashIndex(corpus, dir, "doc_id", "text")
    // sweep by FAMILY NAME — the safe form; a hand-listed subset would
    // void the one-generation guarantee (see sweepIndexDebris caution)
    def sweep() = Maintenance.sweepIndexFamily(spark, dir, "minhash")
    val frames = Dedup.minhashFrames
    assert(sweep().count() == 0L)
    def files(f: String) = Maintenance.indexCard(spark, dir, Seq(f))
      .collect().head.getLong(4)
    val bandsFiles = files("bands")
    // state 1 — a writer died MID-STAGE (torn staged dir, no swap
    // started): sweep must report it and roll it BACK, live untouched
    java.nio.file.Files
      .createDirectory(java.nio.file.Paths.get(s"$dir/bands__staged"))
    assert(Maintenance.indexCard(spark, dir, frames).collect()
      .find(_.getString(0) == "bands").get.getBoolean(2),
      "card flags the torn stage")
    val swept1 = sweep().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(swept1 == Set(("bands", "staged")))
    assert(files("bands") == bandsFiles,
      "rollback must not touch the live frame")
    // state 2 — a swap died between aside-delete steps (an __old
    // leftover, live frames whole): sweep reports and clears it
    java.nio.file.Files
      .createDirectory(java.nio.file.Paths.get(s"$dir/dropped__old"))
    val swept2 = sweep().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(swept2 == Set(("dropped", "old")))
    val after = Maintenance.indexCard(spark, dir, frames).collect()
      .map(r => (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(after.forall { case (present, staged, old) =>
      present && !staged && !old }, "sweep heals; frames stay live")
    assert(files("bands") == bandsFiles && files("dropped") > 0L)
    // idempotent: the next sweep finds nothing
    assert(sweep().count() == 0L)
    // unknown family must fail loudly, not sweep nothing
    intercept[IllegalArgumentException] {
      Maintenance.sweepIndexFamily(spark, dir, "nope") }
    Dedup.releaseCaches()
  }
}
