package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  private lazy val assets = Multimodal.fromDocuments(Tables.documents(spark, sf()))

  /** A real in-memory PNG: `w`×`h`, left half black, right half white. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def imageAssets(ws: (Long, Int, Int)*) = {
    import org.apache.spark.sql.{Row => R}
    val rows = ws.map { case (id, w, h) =>
      R(id, pngBytes(w, h), "image", Map.empty[String, String], null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.schema)
  }

  test("decode reads REAL png dimensions via ImageIO") {
    val out = Multimodal.decode(imageAssets((1L, 64, 48), (2L, 10, 200)))
      .select("asset_id", "width", "height", "channels")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((64, 48, 3)))
    assert(out(2L) == ((10, 200, 3)))
  }

  test("resize really rescales the image payload and re-encodes png") {
    val out = Multimodal.resize(imageAssets((1L, 64, 48)), 224, 112)
    val r = out.head()
    assert(r.getAs[Map[String, String]]("meta")("resized") == "true")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
    assert(img.getWidth == 224 && img.getHeight == 112)
    // Content, not just dims: the source is left-half black / right-half
    // white, so a blank or partially-drawn result (the async
    // getScaledInstance hazard) fails one of these.
    assert((img.getRGB(10, 56) & 0xffffff) == 0x000000)
    assert((img.getRGB(213, 56) & 0xffffff) == 0xffffff)
  }

  test("extractFeatures computes a REAL grayscale grid for images") {
    val out = Multimodal.extractFeatures(imageAssets((1L, 64, 64)), dim = 4)
    val vec = out.head().getSeq[Float](Multimodal.schema.fieldIndex("embedding"))
    // left half black (luma 0), right half white (luma 1), 2x2 grid
    assert(vec.length == 4)
    assert(vec(0) < 0.05f && vec(2) < 0.05f, s"left cells dark: $vec")
    assert(vec(1) > 0.95f && vec(3) > 0.95f, s"right cells bright: $vec")
  }

  /** A real in-memory PCM WAV: mono 16-bit sine at `freq` Hz. */
  private def wavBytes(sampleRate: Int, nFrames: Int, freq: Double,
                       amp: Double = 0.9): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * amp * 32767).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def audioAssets(ws: (Long, Int, Int)*) = {
    import org.apache.spark.sql.{Row => R}
    val rows = ws.map { case (id, sr, n) =>
      R(id, wavBytes(sr, n, freq = 440.0), "audio", Map.empty[String, String], null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.schema)
  }

  test("decode reads REAL wav sample rate, frames and channels") {
    val out = Multimodal.decode(audioAssets((1L, 8000, 4000), (2L, 16000, 800)))
      .select(col("asset_id"), col("width"), col("height"), col("channels"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((8000, 4000, 1)))
    assert(out(2L) == ((16000, 800, 1)))
  }

  test("extractFeatures computes a REAL RMS envelope for wav audio") {
    val out = Multimodal.extractFeatures(audioAssets((1L, 8000, 8000)), dim = 8)
      .select(col("embedding")).head().getSeq[Float](0)
    assert(out.length == 8)
    // a constant-amplitude sine has RMS ≈ amp/√2 ≈ 0.636 in every window
    out.foreach(v => assert(math.abs(v - 0.636) < 0.05, s"window rms $v"))
  }

  test("non-PCM / truncated audio bytes fall back like any unknown payload") {
    import org.apache.spark.sql.{Row => R}
    val junkWav = "RIFFxxxxWAVEjunkjunkjunk".getBytes("UTF-8")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(R(9L, junkWav, "audio", Map.empty[String, String], null)), 1),
      Multimodal.schema)
    val r = Multimodal.decode(df).select("width", "height", "channels").head()
    // must land on the deterministic fake EXACTLY (not a lucky decode:
    // fake dims are in [256,1279] and channels is always 3)
    val (fw, fh, fc) = Multimodal.fakeDecode(junkWav)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((fw, fh, fc)))
  }

  test("zero-frame wav decodes to empty samples; features fall back, stable") {
    import org.apache.spark.sql.{Row => R}
    val empty = wavBytes(8000, 0, 440.0)
    val wi = Multimodal.decodeWav(empty)
    assert(wi.isDefined && wi.get.samples.isEmpty)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(R(9L, empty, "audio", Map.empty[String, String], null)), 1),
      Multimodal.schema)
    def emb() = Multimodal.extractFeatures(df, dim = 8)
      .select(col("embedding")).head().getSeq[Float](0)
    val a = emb()
    assert(a.length == 8, "hash-fallback vector keeps the requested dim")
    assert(a == emb(), "fallback embedding is deterministic")
  }

  test("documents lift to the multimodal schema") {
    assert(assets.schema.fieldNames.toSeq ==
      Seq("asset_id", "payload", "media_type", "meta", "embedding"))
    val r = assets.orderBy("asset_id").head()
    assert(r.getAs[String]("media_type") == "text")
    assert(r.getAs[Map[String, String]]("meta").contains("lang"))
    assert(new String(r.getAs[Array[Byte]]("payload")).nonEmpty)
  }

  test("decode adds deterministic dims and is stable across runs") {
    val a = Multimodal.decode(assets).select("asset_id", "width", "height", "channels")
      .orderBy("asset_id").collect()
    val b = Multimodal.decode(assets).select("asset_id", "width", "height", "channels")
      .orderBy("asset_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getInt(3) == 3))
  }

  test("extractFeatures fills a fixed-dim embedding and composes after decode") {
    val out = Multimodal.extractFeatures(Multimodal.decode(assets), dim = 8)
    assert(out.schema.fieldNames.contains("width"))
    val vecs = out.select("embedding").limit(5).collect()
      .map(_.getSeq[Float](0))
    assert(vecs.forall(_.length == 8))
  }

  test("resize records target dims in meta, payload untouched") {
    val r = Multimodal.resize(assets, 224, 224).orderBy("asset_id").head()
    val meta = r.getAs[Map[String, String]]("meta")
    assert(meta("resize_w") == "224" && meta("resize_h") == "224")
  }

  test("frame sampling emits n rows per asset with stable frame ids") {
    val n = assets.limit(3).count()
    val frames = Multimodal.sampleFrames(assets.limit(3), n = 4)
    assert(frames.count() == n * 4)
    val metas = frames.where(col("frame_no") === 2).select("meta").head()
      .getAs[Map[String, String]](0)
    assert(metas("frame") == "2")
  }

  /** A real animated GIF: one solid-color full-size frame per color. */
  private def gifBytes(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try { g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h) }
        finally g.dispose()
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  test("sampleFramesDecoded extracts REAL evenly-spaced GIF frames as PNG payloads") {
    import org.apache.spark.sql.{Row => R}
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff)
    val rows = Seq(R(1L, gifBytes(8, 6, colors), "video",
      Map.empty[String, String], null))
    val gifAssets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.schema)
    val out = Multimodal.sampleFramesDecoded(gifAssets, n = 3)
      .orderBy("frame_no").collect()
    assert(out.length == 3)
    // evenly spaced over 5 frames: indices 0, 1, 3
    val picked = out.map(_.getAs[Map[String, String]]("meta")("frame").toInt).toSeq
    assert(picked == Seq(0, 1, 3))
    assert(out.forall(_.getAs[Map[String, String]]("meta")("n_frames_total") == "5"))
    // each emitted payload is a standalone PNG of the right size and color
    out.zip(Seq(0xff0000, 0x00ff00, 0xffff00)).foreach { case (r, want) =>
      val png = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(png.getWidth == 8 && png.getHeight == 6)
      assert((png.getRGB(4, 3) & 0xffffff) == want,
        f"frame color ${png.getRGB(4, 3)}%06x vs $want%06x")
    }
  }

  /** A real MJPEG-in-AVI: RIFF('AVI ') { LIST(hdrl){avih}, LIST(movi)
    * {00dc JPEG frames} } — each frame a solid-color JPEG, the layout
    * any MJPEG encoder emits (minus the optional idx1 index).
    */
  private def aviBytes(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    def jpeg(c: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(cc: String, data: Array[Byte]): Array[Byte] =
      cc.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi",
      colors.toArray.flatMap(c => chunk("00dc", jpeg(c))))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("sampleFramesDecoded extracts REAL evenly-spaced MJPEG-AVI frames") {
    import org.apache.spark.sql.{Row => R}
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff)
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(R(1L, aviBytes(8, 6, colors),
        "video", Map.empty[String, String], null)), 1), Multimodal.schema)
    val out = Multimodal.sampleFramesDecoded(assets, n = 3)
      .orderBy("frame_no").collect()
    assert(out.length == 3)
    val picked = out.map(_.getAs[Map[String, String]]("meta")("frame").toInt).toSeq
    assert(picked == Seq(0, 1, 3)) // evenly spaced over 5 frames
    assert(out.forall(_.getAs[Map[String, String]]("meta")("frames_real") == "true"))
    assert(out.forall(_.getAs[Map[String, String]]("meta")("n_frames_total") == "5"))
    // each payload is a standalone PNG; JPEG is lossy, so compare
    // channel-dominance, not exact RGB
    out.zip(Seq((true, false, false), (false, true, false),
        (true, true, false))).foreach { case (r, (wantR, wantG, wantB)) =>
      val png = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(png.getWidth == 8 && png.getHeight == 6)
      val rgb = png.getRGB(4, 3)
      val (cr, cg, cb) = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
      assert((cr > 128) == wantR && (cg > 128) == wantG && (cb > 128) == wantB,
        f"frame color $rgb%06x vs dominance ($wantR, $wantG, $wantB)")
    }
  }

  test("truncated/malformed AVI falls back to the stub shape, not a crash") {
    import org.apache.spark.sql.{Row => R}
    val good = aviBytes(4, 4, Seq(0xff0000, 0x0000ff))
    val truncated = good.take(good.length / 2)
    // a hostile container of nothing but nested LIST headers — must hit
    // the depth cap, not the task stack
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val levels = 5000
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write("RIFF".getBytes("US-ASCII"))
    bomb.write(le32(4 + levels * 12))
    bomb.write("AVI ".getBytes("US-ASCII"))
    for (i <- levels to 1 by -1) {
      bomb.write("LIST".getBytes("US-ASCII"))
      bomb.write(le32(4 + (i - 1) * 12))
      bomb.write("nest".getBytes("US-ASCII"))
    }
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        R(1L, truncated, "video", Map.empty[String, String], null),
        R(2L, "RIFFxxxxAVI corrupted".getBytes("US-ASCII"), "video",
          Map.empty[String, String], null),
        R(3L, bomb.toByteArray, "video",
          Map.empty[String, String], null)), 1), Multimodal.schema)
    val out = Multimodal.sampleFramesDecoded(assets, n = 2).collect()
    assert(out.length == 6) // 2 stub rows each
    assert(out.forall(
      _.getAs[Map[String, String]]("meta")("frames_real") == "false"))
  }

  test("sampleFramesDecoded: non-GIF payloads fall back to the stub shape") {
    val out = Multimodal.sampleFramesDecoded(
      imageAssets((1L, 10, 10)), n = 4).collect()
    assert(out.length == 4)
    assert(out.forall(
      _.getAs[Map[String, String]]("meta")("frames_real") == "false"))
    // an animation SHORTER than n emits every frame exactly once
    import org.apache.spark.sql.{Row => R}
    val short = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(R(2L,
        gifBytes(4, 4, Seq(0xff0000, 0x0000ff)), "video",
        Map.empty[String, String], null)), 1), Multimodal.schema)
    val frames = Multimodal.sampleFramesDecoded(short, n = 10).collect()
    assert(frames.length == 2)
    assert(frames.map(_.getAs[Map[String, String]]("meta")("frame")).toSet ==
      Set("0", "1"))
  }

  /** PNG with a step edge at `frac` of the width (black left, white
    * right) — the dHash fixture: the hash sees the edge position, not
    * the pixel count.
    */
  private def edgePng(w: Int, h: Int, frac: Double,
                      invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val white = (x >= w * frac) != invert
      img.setRGB(x, y, if (white) 0xffffff else 0x000000)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash64 is scale-invariant on the REAL decode path: same scene " +
    "at different resolutions hashes identically, inverted scene far") {
    def h(bytes: Array[Byte]) = Multimodal.dHash64(
      Multimodal.decodeImage(bytes).get)
    val small = h(edgePng(64, 48, 0.5))
    val big = h(edgePng(200, 100, 0.5))
    val inverted = h(edgePng(64, 48, 0.5, invert = true))
    assert(small == big)
    assert(java.lang.Long.bitCount(small ^ inverted) > 3)
  }

  test("perceptualNearDups pairs re-rendered images, not different scenes") {
    import org.apache.spark.sql.{Row => R}
    val rows = Seq(
      R(1L, edgePng(64, 48, 0.5), "image", Map.empty[String, String], null),
      R(2L, edgePng(200, 100, 0.5), "image", Map.empty[String, String], null),
      R(3L, edgePng(64, 48, 0.5, invert = true), "image",
        Map.empty[String, String], null))
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.schema)
    val pairs = Multimodal.perceptualNearDups(assets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("edgeScenePng: dHash is rendition-invariant within a scene and " +
    ">3 hamming across scenes (the q360 fixture contract)") {
    def h(scene: Int, size: Int) = Multimodal.dHash64(
      Multimodal.decodeImage(Multimodal.edgeScenePng(scene, size)).get)
    val sizes = Seq(18, 27, 36, 45, 54, 63)
    for (scene <- 0 to 9) {
      val hs = sizes.map(h(scene, _)).distinct
      assert(hs.size == 1, s"scene $scene renditions must hash identically")
    }
    for (a <- 0 to 9; b <- (a + 1) to 9)
      assert(java.lang.Long.bitCount(h(a, 18) ^ h(b, 18)) > 3,
        s"scenes $a and $b must be >3 hamming apart")
    // the flat scene hashes to zero; an edge scene does not
    assert(h(9, 18) == 0L && h(0, 18) != 0L)
    intercept[IllegalArgumentException] { Multimodal.edgeScenePng(10, 18) }
    intercept[IllegalArgumentException] { Multimodal.edgeScenePng(0, 20) }
  }

  test("perceptualNearDups on the edge-scene fixture set finds exactly " +
    "the within-scene pairs at hamming 0") {
    import spark.implicits._
    val assets = (0L until 60L).map(id => (id, Multimodal.edgeScenePng(
        (id % 10).toInt, 18 + 9 * (id / 10).toInt)))
      .toDF("asset_id", "payload")
    val pairs = Multimodal.perceptualNearDups(assets, "asset_id").collect()
    assert(pairs.length == 10 * 15) // 10 scenes x C(6,2)
    assert(pairs.forall(r => r.getLong(0) % 10 == r.getLong(1) % 10))
    assert(pairs.forall(_.getInt(2) == 0))
  }

  test("grayVecPng roundtrips a 64-vector through the real decode path " +
    "to within the 1/255 pixel quantization (the q361 fixture contract)") {
    val v = Array.tabulate(64)(i => (0.1f + 0.8f * i / 63f))
    val img = Multimodal.decodeImage(Multimodal.grayVecPng(v)).get
    assert(img.getWidth == 8 && img.getHeight == 8)
    val back = Multimodal.grayGrid(img, 8)
    v.indices.foreach { i =>
      assert(math.abs(back(i) - v(i)) <= 1.0f / 255f + 1e-4f,
        s"component $i: ${back(i)} vs ${v(i)}")
    }
    // out-of-range values clamp instead of wrapping
    val clamped = Multimodal.grayGrid(Multimodal.decodeImage(
      Multimodal.grayVecPng(Array.fill(64)(2.0f))).get, 8)
    assert(clamped.forall(x => math.abs(x - 1.0f) < 1e-4f))
    intercept[IllegalArgumentException] {
      Multimodal.grayVecPng(Array.fill(16)(0.5f))
    }
  }

  test("perceptualHash fake path: non-image payloads collide only when " +
    "byte-identical; null payload hashes null") {
    import org.apache.spark.sql.{Row => R}
    val rows = Seq(
      R(1L, "same text".getBytes("UTF-8"), "text", Map.empty[String, String], null),
      R(2L, "same text".getBytes("UTF-8"), "text", Map.empty[String, String], null),
      R(3L, "other text".getBytes("UTF-8"), "text", Map.empty[String, String], null),
      R(4L, null, "text", Map.empty[String, String], null))
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.schema)
    val hashed = Multimodal.perceptualHash(assets)
      .select("asset_id", "phash").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashed(1L).isDefined && hashed(1L) == hashed(2L))
    assert(hashed(3L) != hashed(1L))
    assert(hashed(4L).isEmpty)
    val pairs = Multimodal.perceptualNearDups(assets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("audioHash64 scene WAVs: rendition-invariant, exact byte-replicated " +
    "code, >=32 hamming across scenes (the q362 fixture contract)") {
    def h(bytes: Array[Byte]) = Multimodal.audioHash64(
      Multimodal.decodeWav(bytes).get.samples)
    for (scene <- 0 to 9) {
      val want = Multimodal.audioSceneCodes(scene).toLong * 0x0101010101010101L
      val renditions = Seq(
        Multimodal.stepSceneWav(scene, spw = 40),
        Multimodal.stepSceneWav(scene, spw = 100, sampleRate = 16000),
        Multimodal.stepSceneWav(scene, spw = 73, sampleRate = 11025,
          gain = 0.6f))
      renditions.foreach(b => assert(h(b) == want,
        s"scene $scene rendition must hash to the replicated code"))
    }
    for (a <- 0 to 9; b <- (a + 1) to 9) {
      val d = java.lang.Long.bitCount(
        h(Multimodal.stepSceneWav(a, 40)) ^ h(Multimodal.stepSceneWav(b, 40)))
      assert(d >= 32, s"scenes $a and $b must be >=32 hamming apart, got $d")
    }
    intercept[IllegalArgumentException] { Multimodal.stepSceneWav(10, 40) }
    intercept[IllegalArgumentException] {
      Multimodal.stepSceneWav(0, 40, gain = 0.3f)
    }
  }

  test("perceptualHash routes PCM WAV to the REAL envelope hash; clips " +
    "shorter than one sample per window fall back to the md5 fake") {
    import org.apache.spark.sql.{Row => R}
    val real = Multimodal.stepSceneWav(3, spw = 40)
    val short = wavBytes(8000, 30, 440.0) // 30 samples < 65 windows
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        R(1L, real, "audio", Map.empty[String, String], null),
        R(2L, short, "audio", Map.empty[String, String], null)), 2),
      Multimodal.schema)
    val hashed = Multimodal.perceptualHash(assets)
      .select("asset_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) ==
      Multimodal.audioSceneCodes(3).toLong * 0x0101010101010101L)
    assert(hashed(2L) == graft.functions.TextHashes.md5Top64(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(short)))
  }

  test("perceptualNearDups on the audio scene fixture finds exactly the " +
    "within-scene pairs at hamming 0") {
    import spark.implicits._
    val assets = (0L until 60L).map { id =>
      val r = (id / 10).toInt
      (id, Multimodal.stepSceneWav((id % 10).toInt, spw = 40 + 15 * r,
        sampleRate = 8000 + 1000 * r, gain = 1.0f - 0.08f * r))
    }.toDF("asset_id", "payload")
    val pairs = Multimodal.perceptualNearDups(assets, "asset_id").collect()
    assert(pairs.length == 10 * 15) // 10 scenes x C(6,2)
    assert(pairs.forall(r => r.getLong(0) % 10 == r.getLong(1) % 10))
    assert(pairs.forall(_.getInt(2) == 0))
  }

  test("videoPerceptualNearDups pairs re-rendered GIF clips, not " +
    "different scenes or truncations (the q363 fixture contract)") {
    import org.apache.spark.sql.{Row => R}
    val rows = Seq(
      R(1L, Multimodal.edgeSceneGif(0, 18, 5), "video",
        Map.empty[String, String], null),
      R(2L, Multimodal.edgeSceneGif(0, 36, 5), "video",
        Map.empty[String, String], null),
      R(3L, Multimodal.edgeSceneGif(1, 18, 5), "video",
        Map.empty[String, String], null),
      // same scene but only 2 frames: samples 2 < 3 -> length-mismatch,
      // a truncation must NOT pair with the full clip
      R(4L, Multimodal.edgeSceneGif(0, 18, 2), "video",
        Map.empty[String, String], null))
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.schema)
    val pairs = Multimodal.videoPerceptualNearDups(assets, nFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("edgeSceneGif renditions sample identical per-frame dHash " +
    "sequences; distinct video scenes disagree at every aligned frame") {
    import org.apache.spark.sql.{Row => R}
    def frameHashes(scene: Int, size: Int): Seq[Long] = {
      val assets = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          R(1L, Multimodal.edgeSceneGif(scene, size, 5), "video",
            Map.empty[String, String], null)), 1),
        Multimodal.schema)
      Multimodal.perceptualHash(Multimodal.sampleFramesDecoded(assets, 3))
        .orderBy("frame_no").select("phash").collect().map(_.getLong(0)).toSeq
    }
    val a18 = frameHashes(0, 18)
    assert(a18.length == 3 && a18 == frameHashes(0, 45))
    val b18 = frameHashes(7, 18)
    a18.zip(b18).foreach { case (x, y) =>
      assert(java.lang.Long.bitCount(x ^ y) >= 8,
        "aligned frames of distinct scenes must be >=8 hamming apart")
    }
  }
}
