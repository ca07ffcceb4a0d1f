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
}
