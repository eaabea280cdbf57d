package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
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
  * STUBS, clearly marked: the actual image/audio codecs are not available
  * in this container, so `decode*` produce a deterministic fake derived
  * from the payload bytes. The Spark-side plumbing — schema, encoders,
  * batching, partitioning — is real and tested; swap `fakeDecode` for a
  * real codec call in production.
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

  /** DETERMINISTIC FAKE of a media decode: derives (width, height,
    * channels) pseudo-dimensions from the payload bytes. Replace with a
    * real codec (e.g. javax.imageio / ffmpeg bindings) in production —
    * the surrounding plumbing does not change.
    */
  private[graft] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    if (payload == null || payload.isEmpty) return (0, 0, 0)
    var h = 1125899906842597L
    payload.foreach(b => h = h * 31 + b)
    (256 + (math.abs(h) % 1024).toInt, 256 + (math.abs(h >> 10) % 1024).toInt, 3)
  }

  /** Decode stage: payload → dimension metadata columns, partition-batched.
    * Output schema = input schema + (width, height, channels).
    */
  def decode(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(assets.schema
      .add("width", IntegerType).add("height", IntegerType).add("channels", IntegerType))
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = fakeDecode(
          if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq ++ Seq(w, h, c))
      }
    }(enc)
  }

  /** Feature-extract stage: payload → fixed-`dim` float embedding via a
    * deterministic rolling-hash projection (FAKE feature extractor with a
    * real vector shape — swap for a model call in production). Schema is
    * taken from the input so the stage composes after [[decode]] (extra
    * columns pass through untouched).
    */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val enc = Encoders.row(StructType(assets.schema.fields.map {
      case f if f.name == "embedding" => f.copy(nullable = true)
      case f => f
    }))
    val embIdx = assets.schema.fieldIndex("embedding")
    // Deserialized rows inside mapPartitions may carry no schema — resolve
    // field positions on the driver, access by index on the executor.
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        val vec = new Array[Float](dim)
        if (payload != null) {
          var h = 1469598103934665603L
          var i = 0
          while (i < payload.length) {
            h = (h ^ payload(i)) * 1099511628211L
            vec((i % dim)) += ((h % 1000L) / 1000.0f)
            i += 1
          }
        }
        Row.fromSeq(r.toSeq.updated(embIdx, vec.toSeq))
      }
    }(enc)
  }

  /** Resize stage STUB: records the requested target dims in `meta`
    * (payload passthrough; a real implementation rewrites the bytes).
    */
  def resize(assets: DataFrame, width: Int, height: Int): DataFrame =
    assets.withColumn("meta",
      map_concat(coalesce(col("meta"), map()),
        map(lit("resize_w"), lit(width.toString), lit("resize_h"), lit(height.toString))))

  /** Frame-sample stage STUB for video payloads: emits `n` frame rows per
    * asset (payload sliced deterministically — a real implementation
    * decodes actual frames). Shows the 1→N explode shape with stable ids.
    */
  def sampleFrames(assets: DataFrame, n: Int): DataFrame =
    assets
      .withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("meta",
        map_concat(coalesce(col("meta"), map()),
          map(lit("frame"), col("frame_no").cast("string"))))
}
