package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val row = media.filter(col("media_id") === 0L).head()
    assert(row.payload.nonEmpty)
    assert(row.kind.startsWith("img/"))
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("feature extraction is deterministic and batch-shaped") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val f1 = Multimodal.extractFeatures(spark, media)
      .select("media_id", "sig").as[(Long, String)].collect().toMap
    val f2 = Multimodal.extractFeatures(spark, media)
      .select("media_id", "sig").as[(Long, String)].collect().toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 32), "md5 hex signatures")
    val feats = Multimodal.extractFeatures(spark, media).head()
    assert(feats.feature.length === Multimodal.FakeCodec.featureDim)
  }

  test("frame sampling fans out one row per sampled frame") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf)).toDF()
    val sampled = Multimodal.sampleFrames(media, 10)
    val one = sampled.filter(col("media_id") === 29L) // frames = 29 % 30 + 1 = 30
    assert(one.count() === 3) // frames 0, 10, 20
    assert(sampled.count() >= media.count())
  }

  test("fitBox aspect-fits without upscaling or collapsing") {
    assert(Multimodal.fitBox(640, 480, 224, 224) === ((224, 168)))
    assert(Multimodal.fitBox(480, 640, 224, 224) === ((168, 224)))
    assert(Multimodal.fitBox(100, 50, 224, 224) === ((100, 50)))  // never upscale
    assert(Multimodal.fitBox(0, 480, 224, 224) === ((1, 224)))    // degenerate dim
    assert(Multimodal.fitBox(10000, 1, 224, 224) === ((224, 1)))  // floor clamps to >= 1
  }

  test("resize re-encodes payloads to the fitted byte budget per partition") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val resized = Multimodal.resize(spark, media, 224, 224).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.width >= 1 && r.width <= 224 && r.height >= 1 && r.height <= 224)
      assert(r.payload.length <= math.max(1, r.width * r.height / 256))
    }
  }
}
