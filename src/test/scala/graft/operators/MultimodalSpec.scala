package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  private lazy val assets = Multimodal.fromDocuments(Tables.documents(spark, sf()))

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
}
