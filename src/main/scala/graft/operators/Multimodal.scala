package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata and optional embeddings, plus partition-batched
  * decode / feature-extract / resize / frame-sample operators.
  *
  * Schema contract (one row = one asset):
  *   payload   binary                 — the raw media bytes
  *   media_type string                — "image" | "audio" | "video" | "text"
  *   meta      map<string,string>     — typed key/value metadata
  *   embedding array<float>, nullable — optional feature vector
  *
  * The heavy per-asset work runs through `Dataset.mapPartitions` — the
  * Scala-native analogue of `mapInPandas`: one task per partition, assets
  * streamed through the worker in batches, schema declared up front so
  * Catalyst can prune and the exchange layout is stable. Partitioning
  * guidance at 100 TB: media payloads dominate row size, so repartition by
  * a content-id hash to level partition *bytes* (not row counts) before
  * mapping, and keep `spark.sql.files.maxPartitionBytes` at the default
  * 128 MB so a partition of assets fits executor memory.
  *
  * Codec status: the IMAGE path is REAL — `javax.imageio` (JDK built-in,
  * headless-safe) decodes/resizes/re-encodes PNG · JPEG · GIF · BMP with
  * no external libraries — and so are the AUDIO path for PCM WAV via
  * `javax.sound.sampled` (decode to mono samples, RMS energy-envelope
  * features) and the VIDEO frame-sample path for ANIMATED GIF via the
  * JDK GIF reader's multi-image API ([[sampleFramesDecoded]]: composited
  * canvases, evenly-spaced sampling). Payloads with no JDK codec
  * (MP4/WebM video, compressed audio, text) fall back to a deterministic
  * fake derived from the payload bytes, clearly marked below, so every
  * stage stays total and testable on any input; swap the fallback for an
  * ffmpeg binding in production without touching the plumbing.
  */
object Multimodal {

  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true),
    StructField("embedding", ArrayType(FloatType), nullable = true)))

  /** Lift the documents table into the multimodal schema (payload = UTF-8
    * bytes of the text) — exercises the full schema without real media.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("payload"),
      lit("text").as("media_type"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"),
      lit(null).cast(ArrayType(FloatType)).as("embedding"))

  /** Magic-byte sniff for the formats the JDK can decode (PNG, JPEG, GIF,
    * BMP, WBMP aside). Cheap O(1) guard so the per-row decode stage never
    * pays ImageIO's reader-discovery + stream setup for the overwhelmingly
    * non-image rows of a mixed corpus (measured ~2× on a text-only table).
    */
  private[graft] def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** Real image decode via the JDK's ImageIO; None when the bytes are not
    * a decodable image (non-image payloads).
    */
  private[graft] def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    if (payload == null || payload.isEmpty || !looksLikeImage(payload)) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

  /** RIFF/WAVE magic-byte sniff — same O(1) guard role as
    * [[looksLikeImage]].
    */
  private[graft] def looksLikeWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Decoded PCM WAV: format metadata plus channel-averaged samples in
    * [-1, 1]. `headerFrames` is what the RIFF header CLAIMS (may be -1
    * for streaming-style WAVs, or more than the payload actually holds);
    * `samples.length` is what was really decodable — stages report the
    * latter so metadata never promises frames the payload cannot back.
    */
  private[graft] case class WavInfo(sampleRate: Int, channels: Int,
                                    headerFrames: Long, samples: Array[Float])

  /** Real audio decode via the JDK's `javax.sound.sampled` for the
    * standard WAV shape (16-bit signed little-endian PCM); None for
    * anything else — the stage falls back like a non-image payload does.
    * All byte-count arithmetic is in Long and capped at `maxBytes` (so a
    * header claiming 4-billion frames or a 1000-channel format can
    * neither overflow an Int nor allocate unboundedly).
    */
  private[graft] def decodeWav(payload: Array[Byte],
                               maxBytes: Long = 1L << 24): Option[WavInfo] =
    if (!looksLikeWav(payload)) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          val pcm16le =
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f.getSampleSizeInBits == 16 && !f.isBigEndian
          val frameSize = f.getFrameSize
          if (!pcm16le || frameSize <= 0) None
          else {
            val headerFrames = ais.getFrameLength // -1 = NOT_SPECIFIED
            val wantFrames: Long =
              if (headerFrames < 0) maxBytes / frameSize
              else math.min(headerFrames, maxBytes / frameSize)
            val wantBytes = math.min(wantFrames * frameSize, Int.MaxValue.toLong).toInt
            val bytes = ais.readNBytes(wantBytes)
            val ch = f.getChannels
            val got = bytes.length / frameSize
            val out = new Array[Float](got)
            var i = 0
            while (i < got) {
              var acc = 0f
              var c = 0
              while (c < ch) {
                val off = i * frameSize + c * 2
                val s = (((bytes(off + 1): Int) << 8) | (bytes(off) & 0xff)).toShort
                acc += s / 32768.0f
                c += 1
              }
              out(i) = acc / ch
              i += 1
            }
            Some(WavInfo(f.getSampleRate.toInt, ch, headerFrames, out))
          }
        } finally ais.close()
      } catch { case _: Exception => None }

  /** DETERMINISTIC FAKE dimensions for payloads with no JDK codec (video,
    * compressed audio, text): pseudo (width, height, channels) from the
    * payload's top-64 md5 bits — a closed form an ANSI-SQL oracle replays
    * as `('0x' || substr(md5(payload), 1, 16))::UBIGINT` (dims in
    * [256, 1279], channels always 3). Exists so the decode stage is
    * total; the image and WAV paths never reach it.
    */
  private[graft] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    if (payload == null || payload.isEmpty) return (0, 0, 0)
    val u = graft.functions.TextHashes.md5Top64(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(payload))
    (256 + (u & 1023L).toInt, 256 + ((u >>> 10) & 1023L).toInt, 3)
  }

  /** DETERMINISTIC FAKE embedding slot `k` for codec-less payloads: md5 of
    * `payload ++ ":k"` → top 64 bits → signed offset in [−1, 1) with an
    * exact power-of-two denominator (float == double exactly, so the SQL
    * replay `((md5_u64 % 2048) − 1024) / 1024.0` matches bit-for-bit).
    */
  private[graft] def fakeEmbeddingSlot(payload: Array[Byte], k: Int): Float = {
    val keyed = payload ++ s":$k".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val u = graft.functions.TextHashes.md5Top64(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(keyed))
    ((java.lang.Long.remainderUnsigned(u, 2048L) - 1024L).toFloat / 1024.0f)
  }

  /** Decode stage: payload → dimension metadata columns, partition-batched.
    * Output schema = input schema + (width, height, channels). The columns
    * are modality-specific: images report (pixel width, pixel height,
    * color components); PCM WAV audio reports (sample rate, frames
    * ACTUALLY decoded — header claims a truncated payload can't back are
    * not reported, bounded by decodeWav's byte cap, channels); payloads
    * with no JDK codec get the documented deterministic fake.
    */
  def decode(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(assets.schema
      .add("width", IntegerType).add("height", IntegerType).add("channels", IntegerType))
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        val (w, h, c) = decodeImage(payload) match {
          case Some(img) => (img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents)
          case None => decodeWav(payload) match {
            // frame count = samples actually decoded, NOT the header
            // claim — a truncated payload must not report phantom frames
            // that extractFeatures then can't see
            case Some(wi) => (wi.sampleRate, wi.samples.length, wi.channels)
            case None => fakeDecode(payload)
          }
        }
        Row.fromSeq(r.toSeq ++ Seq(w, h, c))
      }
    }(enc)
  }

  /** Grayscale luma (0-1) of an image downsampled to a `side`×`side` grid
    * by box-averaging — a real, classical image feature.
    */
  private[graft] def grayGrid(img: BufferedImage, side: Int): Array[Float] = {
    val out = new Array[Float](side * side)
    val counts = new Array[Int](side * side)
    var y = 0
    while (y < img.getHeight) {
      val gy = y * side / img.getHeight
      var x = 0
      while (x < img.getWidth) {
        val gx = x * side / img.getWidth
        val rgb = img.getRGB(x, y)
        val luma = (0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) +
          0.114f * (rgb & 0xff)) / 255.0f
        out(gy * side + gx) += luma
        counts(gy * side + gx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < out.length) { if (counts(i) > 0) out(i) /= counts(i); i += 1 }
    out
  }

  /** RMS energy envelope over `dim` equal windows of the sample stream —
    * a real, classical audio feature (the audio analogue of [[grayGrid]]).
    */
  private[graft] def rmsEnvelope(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val counts = new Array[Int](dim)
    val n = samples.length
    var i = 0
    while (i < n) {
      val w = (i.toLong * dim / n).toInt
      out(w) += samples(i) * samples(i)
      counts(w) += 1
      i += 1
    }
    var j = 0
    while (j < dim) {
      if (counts(j) > 0) out(j) = math.sqrt(out(j) / counts(j)).toFloat
      j += 1
    }
    out
  }

  /** Feature-extract stage: payload → fixed-`dim` float embedding. Image
    * payloads get a real ⌊√dim⌋×⌊√dim⌋ box-averaged grayscale grid
    * (zero-padded / truncated to exactly `dim`); PCM WAV payloads get a
    * real RMS energy envelope over `dim` windows; payloads with no JDK
    * codec get a deterministic rolling-hash projection (FAKE with a real
    * vector shape — swap for a model call in production). Schema is taken
    * from the input so the stage composes after [[decode]] (extra columns
    * pass through untouched).
    */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val side = math.max(1, math.sqrt(dim).toInt)
    val enc = Encoders.row(StructType(assets.schema.fields.map {
      case f if f.name == "embedding" => f.copy(nullable = true)
      case f => f
    }))
    val embIdx = assets.schema.fieldIndex("embedding")
    // Deserialized rows inside mapPartitions may carry no schema — resolve
    // field positions on the driver, access by index on the executor.
    val payloadIdx = assets.schema.fieldIndex("payload")
    // same un-starving as [[perceptualHash]]: the decode is the stage
    FrameOps.parallelized(assets).mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        val vec = decodeImage(payload) match {
          case Some(img) => java.util.Arrays.copyOf(grayGrid(img, side), dim)
          case None => decodeWav(payload) match {
            case Some(wi) if wi.samples.nonEmpty => rmsEnvelope(wi.samples, dim)
            case _ =>
              val v = new Array[Float](dim)
              if (payload != null && payload.nonEmpty) {
                var k = 0
                while (k < dim) {
                  v(k) = fakeEmbeddingSlot(payload, k)
                  k += 1
                }
              }
              v
          }
        }
        Row.fromSeq(r.toSeq.updated(embIdx, vec.toSeq))
      }
    }(enc)
  }

  /** Resize stage: image payloads are REALLY resized (area-weighted
    * `getScaledInstance` → PNG re-encode, JDK-only) and their payload bytes
    * replaced; undecodable payloads pass through. Both record the target
    * dims in `meta`, so downstream stages can tell requested from applied
    * (`resized=true` only on the real path).
    */
  def resize(assets: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "target dims must be positive")
    val enc = Encoders.row(assets.schema)
    val payloadIdx = assets.schema.fieldIndex("payload")
    val metaIdx = assets.schema.fieldIndex("meta")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        val resized = decodeImage(payload).map { img =>
          val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          // Scale synchronously from the fully-realized BufferedImage:
          // getScaledInstance produces pixels asynchronously, and drawing it
          // with a null ImageObserver can return before production finishes,
          // silently emitting a blank/partial frame.
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, width, height, null)
          } finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          bos.toByteArray
        }
        val oldMeta = if (r.isNullAt(metaIdx)) Map.empty[String, String]
          else r.getAs[Map[String, String]](metaIdx)
        val newMeta = oldMeta ++ Map(
          "resize_w" -> width.toString, "resize_h" -> height.toString,
          "resized" -> resized.isDefined.toString)
        Row.fromSeq(r.toSeq
          .updated(payloadIdx, resized.getOrElse(payload))
          .updated(metaIdx, newMeta))
      }
    }(enc)
  }

  /** Frame-sample stage STUB for video payloads: emits `n` frame rows per
    * asset (payload passthrough — no general JDK video codec exists; a
    * production implementation decodes actual frames via ffmpeg). Shows
    * the 1→N explode shape with stable ids. For animated GIFs and
    * MJPEG-in-AVI the REAL decode-backed variant is
    * [[sampleFramesDecoded]].
    */
  def sampleFrames(assets: DataFrame, n: Int): DataFrame =
    assets
      .withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("meta",
        map_concat(coalesce(col("meta"), map()),
          map(lit("frame"), col("frame_no").cast("string"))))

  /** Sampled frames of an animated GIF payload, decoded with the JDK's
    * own multi-image GIF reader: returns (total frame count, the frames
    * at `wanted` indices, fully composited). Frames are composited onto
    * a running canvas sized from the LOGICAL SCREEN (each stored image
    * may cover only the changed rectangle under GIF frame optimization;
    * the first frame's extent is NOT the animation's extent), and only
    * the wanted indices are snapshotted — a 500-frame animation sampled
    * at 3 holds one canvas plus 3 copies, not 500. Compositing stops at
    * the last wanted index. Disposal modes restore-to-background/
    * previous are NOT applied (composite-over only) — documented
    * limitation of the JDK-only path.
    */
  private[operators] def decodeGifSampledFrames(
      payload: Array[Byte],
      wanted: Int => Set[Int]): Option[(Int, Vector[(Int, BufferedImage)])] = {
    if (payload == null || payload.length < 6 ||
        !(payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')) None
    else {
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        val in = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
        try {
          reader.setInput(in, false, false)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else {
            val want = wanted(n)
            require(want.nonEmpty && want.forall(i => i >= 0 && i < n),
              s"wanted frame indices out of [0, $n): $want")
            val last = want.max
            // canvas = logical screen; some encoders omit it -> fall back
            // to the max extent over the frames we will touch
            val (lsw, lsh) = gifLogicalScreen(reader).getOrElse {
              var (w, h) = (1, 1)
              for (i <- 0 to last) {
                val (x, y) = gifFrameOffset(reader.getImageMetadata(i))
                w = math.max(w, x + reader.getWidth(i))
                h = math.max(h, y + reader.getHeight(i))
              }
              (w, h)
            }
            val canvas = new BufferedImage(lsw, lsh, BufferedImage.TYPE_INT_ARGB)
            val frames = Vector.newBuilder[(Int, BufferedImage)]
            for (i <- 0 to last) {
              val raw = reader.read(i)
              val (x, y) = gifFrameOffset(reader.getImageMetadata(i))
              val g = canvas.createGraphics()
              try g.drawImage(raw, x, y, null) finally g.dispose()
              if (want.contains(i)) {
                val snap = new BufferedImage(lsw, lsh, BufferedImage.TYPE_INT_ARGB)
                val g2 = snap.createGraphics()
                try g2.drawImage(canvas, 0, 0, null) finally g2.dispose()
                frames += ((i, snap))
              }
            }
            Some((n, frames.result()))
          }
        } catch { case _: Exception => None }
        finally { try in.close() finally reader.dispose() }
      }
    }
  }

  private def gifLogicalScreen(reader: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val tree = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = tree.getElementsByTagName("LogicalScreenDescriptor")
      if (nodes.getLength == 0) None
      else {
        val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        val w = d.getAttribute("logicalScreenWidth").toInt
        val h = d.getAttribute("logicalScreenHeight").toInt
        if (w > 0 && h > 0) Some((w, h)) else None
      }
    } catch { case _: Exception => None }

  private def gifFrameOffset(md: javax.imageio.metadata.IIOMetadata): (Int, Int) =
    try {
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = tree.getElementsByTagName("ImageDescriptor")
      if (nodes.getLength == 0) (0, 0)
      else {
        val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        (d.getAttribute("imageLeftPosition").toInt,
          d.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Exception => (0, 0) }

  /** Sampled frames of an MJPEG-in-AVI payload — the second REAL video
    * path next to [[decodeGifSampledFrames]], still JDK-only: the AVI
    * container is plain RIFF chunked binary (fourcc + LE u32 size,
    * word-aligned; `LIST` chunks nest), and Motion-JPEG stores each
    * video frame chunk (`NNdc`/`NNdb`) as a standalone JPEG that
    * ImageIO decodes. Two passes: an INDEX walk over chunk headers
    * collects every frame's (offset, length) without touching pixel
    * data (so counting a 10k-frame clip costs header reads only), then
    * only the `wanted` indices decode. Malformed chunk sizes or an
    * undecodable wanted frame return None — the caller falls back to
    * the documented stub, keeping the stage total. (AVI1-style JPEGs
    * with stripped Huffman tables are not reconstructed — the one
    * MJPEG variant the JDK decoder cannot read; documented limitation.)
    */
  private[operators] def decodeAviSampledFrames(
      payload: Array[Byte],
      wanted: Int => Set[Int]): Option[(Int, Vector[(Int, BufferedImage)])] = {
    def cc(p: Int, s: String): Boolean =
      p + 4 <= payload.length && (0 until 4).forall(i => payload(p + i) == s(i))
    def leU32(p: Int): Long =
      (payload(p) & 0xFFL) | ((payload(p + 1) & 0xFFL) << 8) |
        ((payload(p + 2) & 0xFFL) << 16) | ((payload(p + 3) & 0xFFL) << 24)
    if (payload == null || payload.length < 12 ||
        !cc(0, "RIFF") || !cc(8, "AVI ")) None
    else {
      def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
      def isFrameChunk(p: Int): Boolean =
        isDigit(payload(p)) && isDigit(payload(p + 1)) &&
          payload(p + 2) == 'd' &&
          (payload(p + 3) == 'c' || payload(p + 3) == 'b')
      val frames = Vector.newBuilder[(Int, Int)]
      var malformed = false
      // depth cap: real AVIs nest ~3 LISTs deep; a hostile container of
      // nothing but nested LIST headers would otherwise recurse
      // payload/12 frames deep and overflow the task stack
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 16) { malformed = true; return }
        var p = start
        while (!malformed && p + 8 <= end) {
          val size = leU32(p + 4)
          val dataStart = p + 8
          if (size < 0 || dataStart + size > end) malformed = true
          else {
            if (cc(p, "LIST") && size >= 4)
              walk(dataStart + 4, dataStart + size.toInt, depth + 1)
            else if (isFrameChunk(p) && size > 0)
              frames += ((dataStart, size.toInt))
            p = dataStart + size.toInt + (size.toInt & 1) // word-aligned
          }
        }
      }
      walk(12, math.min(12L + leU32(4) - 4, payload.length.toLong).toInt, 0)
      val idx = frames.result()
      if (malformed || idx.isEmpty) None
      else {
        val want = wanted(idx.length)
        require(want.nonEmpty && want.forall(i => i >= 0 && i < idx.length),
          s"wanted frame indices out of [0, ${idx.length}): $want")
        val out = Vector.newBuilder[(Int, BufferedImage)]
        var failed = false
        want.toSeq.sorted.foreach { i =>
          if (!failed) {
            val (off, len) = idx(i)
            val img = try ImageIO.read(new ByteArrayInputStream(payload, off, len))
              catch { case _: Exception => null }
            if (img == null) failed = true else out += ((i, img))
          }
        }
        if (failed) None else Some((idx.length, out.result()))
      }
    }
  }

  /** REAL frame sampling for animated GIF and MJPEG-AVI payloads:
    * decode the frame sequence (JDK-only), pick `n` evenly spaced
    * frames (all of them when the animation is shorter), and emit one
    * row per sampled frame with the frame re-encoded as a standalone
    * PNG payload and `meta.frame` / `meta.n_frames_total` set. Other
    * payloads (mp4/webm — no JDK codec) fall back to [[sampleFrames]]'
    * documented stub shape (payload passthrough, `n` rows) so
    * mixed-asset frames keep one schema.
    *
    * Scale shape: per-row decode inside mapPartitions (the codec works
    * on one payload at a time; no shuffle), 1→≤n explode on the output
    * side.
    */
  def sampleFramesDecoded(assets: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val outSchema = StructType(assets.schema.fields ++ Seq(
      StructField("frame_no", IntegerType, nullable = false)))
    val enc = Encoders.row(outSchema)
    val payloadIdx = assets.schema.fieldIndex("payload")
    val metaIdx = assets.schema.fieldIndex("meta")
    assets.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        val oldMeta = if (r.isNullAt(metaIdx)) Map.empty[String, String]
          else r.getAs[Map[String, String]](metaIdx)
        // evenly spaced, first frame always included: index
        // floor(i * total / take) is strictly increasing for take<=total
        def sampleIdx(total: Int): Set[Int] = {
          val take = math.min(n, total)
          (0 until take).map(i => (i.toLong * total / take).toInt).toSet
        }
        decodeGifSampledFrames(payload, sampleIdx)
          .orElse(decodeAviSampledFrames(payload, sampleIdx)) match {
          case Some((total, frames)) =>
            frames.iterator.map { case (fi, img) =>
              val bos = new ByteArrayOutputStream()
              ImageIO.write(img, "png", bos)
              val meta = oldMeta ++ Map(
                "frame" -> fi.toString,
                "n_frames_total" -> total.toString,
                "frames_real" -> "true")
              Row.fromSeq(r.toSeq
                .updated(payloadIdx, bos.toByteArray)
                .updated(metaIdx, meta) :+ fi)
            }
          case None =>
            (0 until n).iterator.map { i =>
              val meta = oldMeta ++ Map(
                "frame" -> i.toString, "frames_real" -> "false")
              Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+ i)
            }
        }
      }
    }(enc)
  }

  /** 64-bit perceptual difference hash (dHash) of a decodable image:
    * 9×9 box-averaged grayscale grid, one bit per horizontal gradient
    * over the first 8 rows × 8 column steps — near-identical images
    * (resize, recompress, small edits) land within a few bits of each
    * other, unrelated images ~32 bits apart. REAL for every JDK-decodable
    * payload (PNG/JPEG/GIF/BMP); payloads with no image codec get the
    * DOCUMENTED md5-top-64 fake (`('0x' || substr(md5(payload), 1,
    * 16))::UBIGINT` in the oracle's terms) so the stage is total and the
    * relational plumbing stays oracle-gateable — a fake hash is uniform,
    * so only byte-identical payloads collide on it.
    */
  private[graft] def dHash64(img: BufferedImage): Long = {
    val g = grayGrid(img, 9)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** 64-bit perceptual hash of decoded PCM audio: RMS energy envelope
    * over 65 equal windows, one bit per consecutive-window loudness
    * gradient — the audio analogue of [[dHash64]] (temporal energy shape
    * instead of spatial luma shape). Invariant to sample rate, duration
    * and any strictly-monotone gain change (bits COMPARE adjacent
    * windows, they never measure them), so renditions of the same
    * recording hash identically while unrelated recordings land ~32 bits
    * apart. Needs at least one sample per window (≥ 65) to be
    * meaningful — shorter clips take the md5 fallback in
    * [[perceptualHash]].
    */
  private[graft] def audioHash64(samples: Array[Float]): Long = {
    val env = rmsEnvelope(samples, 65)
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (env(k + 1) > env(k)) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** Adds a `phash` LongType column: real dHash for decodable images,
    * real envelope hash ([[audioHash64]]) for decodable PCM WAV with at
    * least 65 samples, md5-top-64 fake otherwise (null payload → null).
    * mapPartitions, zero shuffle.
    */
  def perceptualHash(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(assets.schema.add("phash", LongType))
    val payloadIdx = assets.schema.fieldIndex("payload")
    // payload decode is the expensive per-row stage of every phash
    // consumer; a single-file asset table otherwise decodes the whole
    // corpus in ONE task (FrameOps.parallelized = the guide-§2.5
    // unsplittable-input fix, identity at production scan widths)
    FrameOps.parallelized(assets).mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        val h: Any =
          if (payload == null || payload.isEmpty) null
          else decodeImage(payload) match {
            case Some(img) => dHash64(img)
            case None => decodeWav(payload) match {
              case Some(wi) if wi.samples.length >= 65 =>
                audioHash64(wi.samples)
              case _ => graft.functions.TextHashes.md5Top64(
                org.apache.spark.unsafe.types.UTF8String.fromBytes(payload))
            }
          }
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** Near-duplicate pairs by perceptual hash — images via [[dHash64]],
    * PCM audio via [[audioHash64]] (both REAL decode paths; other
    * payloads carry the uniform md5 fake, so only byte-identical ones
    * pair): 16-bit pigeonhole blocking over the four phash chunks (a
    * pair within `maxHamming` ≤ 3 bits MUST share an untouched chunk),
    * hot chunks capped, then the exact hamming verify —
    * [[Dedup.simhashNearDups]]'s scale shape applied to the pixel and
    * loudness domains. Output: (id_a, id_b, hamming).
    */
  def perceptualNearDups(assets: DataFrame, idCol: String = "asset_id",
                         maxHamming: Int = 3,
                         maxChunkBucket: Long = 100000L): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes hamming <= 3")
    val sigs = perceptualHash(assets)
      .filter(col("phash").isNotNull)
      .select(col(idCol).as("doc"), col("phash").as("sig"))
    val chunked = sigs.select(col("doc"), posexplode(
      transform(sequence(lit(0), lit(3)),
        k => call_function("shiftright", col("sig"), k * 16).bitwiseAND(0xFFFFL)))
      .as(Seq("chunk", "ck")))
    Dedup.groupedPairs(chunked, Seq("chunk", "ck"), maxChunkBucket)
      .join(sigs.select(col("doc").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))
  }

  /** Near-duplicate VIDEO pairs on the real frame-decode path: sample
    * `nFrames` evenly spaced frames per asset ([[sampleFramesDecoded]] —
    * real for animated GIF and MJPEG-AVI), dHash each frame, and compare
    * videos by their aligned frame-hash sequences. Two videos pair iff
    * they sampled the SAME number of frames and the total hamming
    * distance summed over aligned positions is ≤ `maxHamming` — so a
    * re-encode/resize of the same clip (per-frame dHash is resolution-
    * invariant) qualifies while a clip that shares only some frames, or
    * a truncation, does not.
    *
    * Scale shape: candidate blocking is 16-bit pigeonhole over the FIRST
    * sampled frame's four hash chunks — sound because a qualifying
    * pair's first-frame hamming ≤ total ≤ `maxHamming` < 4, so one of
    * its four chunks is untouched. Per-video state is one `nFrames`-long
    * long array (never the frame pixels); the frame explode is 1→≤n;
    * hot chunks are capped like every banding path. Payloads with no
    * video codec fall through [[sampleFrames]]' passthrough stub and
    * carry uniform fake frame hashes — only byte-identical ones pair.
    * Output: (id_a, id_b, hamming).
    */
  def videoPerceptualNearDups(assets: DataFrame, idCol: String = "asset_id",
                              nFrames: Int = 3, maxHamming: Int = 3,
                              maxChunkBucket: Long = 100000L): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes hamming <= 3")
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val frameSigs = perceptualHash(sampleFramesDecoded(assets, nFrames))
      .filter(col("phash").isNotNull)
      .select(col(idCol).as("doc"), col("frame_no"), col("phash"))
    // one row per video: frame hashes ordered by frame index — alignment
    // is by sampled POSITION, so renditions that sample the same count
    // line up even when raw frame indices differ
    val vids = frameSigs.groupBy(col("doc"))
      .agg(array_sort(collect_list(struct(col("frame_no"), col("phash"))))
        .as("__fs"))
      .select(col("doc"),
        transform(col("__fs"), f => f.getField("phash")).as("sig"))
    val chunked = vids.select(col("doc"), posexplode(
      transform(sequence(lit(0), lit(3)),
        k => call_function("shiftright", element_at(col("sig"), 1), k * 16)
          .bitwiseAND(0xFFFFL)))
      .as(Seq("chunk", "ck")))
    Dedup.groupedPairs(chunked, Seq("chunk", "ck"), maxChunkBucket)
      .join(vids.select(col("doc").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(vids.select(col("doc").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .filter(size(col("sig_a")) === size(col("sig_b")))
      .withColumn("hamming", aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (a, b) => bit_count(a.bitwiseXOR(b))),
        lit(0), (acc, x) => acc + x))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))
  }

  // ---- fixture renderers (gates + specs) ---------------------------------
  // The synthetic corpus carries no image payloads, so the REAL-decode
  // gates build their own: deterministic JDK-rendered PNGs whose dHash /
  // grayGrid behavior is derivable by construction. These are fixture
  // GENERATORS, not operators — they live here because they are the
  // encode twins of this file's decode path and every byte they produce
  // flows straight into it.

  /** Step-edge scene PNG for the q360 image near-dup gate: scenes 0–8 are
    * black-left/white-right with the edge centered in dHash grid column
    * `scene` (edge pixel = (scene+0.5)·size/9, so every rendition size
    * puts the edge in the SAME grid cell → dHash is rendition-invariant
    * and scenes map to pairwise-distinct bit patterns ≥8 hamming apart);
    * scene 9 is all-white (dHash 0). `size` must be a multiple of 9 ≥ 18
    * so grid cells hold ≥2 pixels and the edge cell stays strictly
    * partial (its average luma in (0,1), never rounding to a flip).
    */
  private[graft] def edgeScenePng(scene: Int, size: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(edgeSceneImage(scene, size), "png", bos)
    bos.toByteArray
  }

  private def edgeSceneImage(scene: Int, size: Int): BufferedImage = {
    require(scene >= 0 && scene <= 9, s"scene must be 0..9, got $scene")
    require(size >= 18 && size % 9 == 0,
      s"size must be a multiple of 9 >= 18, got $size")
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val edge = if (scene == 9) 0.0 else (scene + 0.5) * size / 9.0
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        img.setRGB(x, y, if (x < edge) 0x000000 else 0xffffff)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Animated-GIF video scene for the q363 video near-dup gate: frame
    * `j` shows edge scene `(scene + j) % 10` at `size` px — so renditions
    * of a video scene (same `scene`, different `size`) sample IDENTICAL
    * per-frame dHashes (the [[edgeSceneImage]] rendition invariance),
    * while two distinct video scenes disagree at EVERY aligned frame by
    * ≥8 hamming (distinct image scenes mod 10, and an edge moving one
    * grid column flips one bit in all 8 rows — all four 16-bit chunks
    * touched, so cross-scene videos do not even share a blocking
    * bucket). Black/white frames survive the GIF palette losslessly.
    */
  private[graft] def edgeSceneGif(scene: Int, size: Int,
                                  nFrames: Int): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { j =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(
            edgeSceneImage((scene + j) % 10, size), null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** The ten 8-bit gradient codes behind [[stepSceneWav]]: each is
    * BALANCED (weight 4, so the amplitude walk returns to its start
    * after every 8 segments and stays within ±4 levels) and every pair
    * is ≥4 hamming apart — repeated 8× across the 64 envelope gradients
    * that makes distinct audio scenes ≥32 hamming apart while
    * [[audioHash64]] of scene `s` is exactly `code(s)` replicated in
    * each of the hash's 8 bytes.
    */
  private[graft] val audioSceneCodes: Array[Int] =
    Array(0x0F, 0xF0, 0x33, 0xCC, 0x55, 0xAA, 0x3C, 0xC3, 0x69, 0x96)

  /** Amplitude-ladder scene WAV for the q362 audio near-dup gate: 65
    * equal DC-valued segments whose 64 consecutive-segment loudness
    * gradients encode `audioSceneCodes(scene)` repeated 8 times. With
    * `spw` samples per segment the clip is exactly 65·spw samples, so
    * [[rmsEnvelope]]'s 65 windows align 1:1 with the segments and the
    * window RMS equals the segment amplitude — renditions varying `spw`,
    * `sampleRate` and `gain` (≥ 0.5, keeping adjacent levels ≥256
    * 16-bit quantization steps apart so strict ordering survives
    * PCM rounding) all hash identically by construction.
    */
  private[graft] def stepSceneWav(scene: Int, spw: Int,
                                  sampleRate: Int = 8000,
                                  gain: Float = 1.0f): Array[Byte] = {
    require(scene >= 0 && scene <= 9, s"scene must be 0..9, got $scene")
    require(spw >= 1, s"spw must be >= 1, got $spw")
    require(gain >= 0.5f && gain <= 1.0f,
      s"gain must be in [0.5, 1.0], got $gain")
    val code = audioSceneCodes(scene)
    val levels = new Array[Int](65)
    levels(0) = 32
    var k = 0
    while (k < 64) {
      levels(k + 1) = levels(k) +
        (if (((code >> (k & 7)) & 1) == 1) 1 else -1)
      k += 1
    }
    val pcm = new Array[Byte](65 * spw * 2)
    var w = 0
    while (w < 65) {
      val s = math.round(gain * levels(w) / 64.0f * 32767).toShort
      var i = 0
      while (i < spw) {
        val off = (w * spw + i) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, 65L * spw)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 8×8 gray PNG whose pixel (i mod 8, i div 8) carries `v(i)` as an
    * 8-bit gray level (clamped to [0,1], quantized to 1/255) — the
    * encode twin of [[extractFeatures]]'s dim=64 path: `grayGrid(img, 8)`
    * on an 8×8 image is one pixel per cell, so the decoded feature
    * vector recovers `v` to within the 1/255 quantization. Used by the
    * q361 cross-modal retrieval gate to roundtrip label centroids
    * through real pixels.
    */
  private[graft] def grayVecPng(v: Array[Float]): Array[Byte] = {
    require(v.length == 64, s"grayVecPng needs 64 values, got ${v.length}")
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val p = math.min(255, math.max(0, math.round(v(i) * 255f)))
      img.setRGB(i % 8, i / 8, (p << 16) | (p << 8) | p)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
