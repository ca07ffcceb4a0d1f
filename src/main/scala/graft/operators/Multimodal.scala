package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-item decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * transforms.
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] derives deterministic pseudo-features from the
  * payload digest. Everything around the stub — schema, encoders, batch
  * shape, partition sizing — is real: swap [[FakeCodec]] for a JNI/FFM codec
  * and the pipeline is production-shaped. At 100 TB the payloads stay
  * columnar in parquet (no driver round-trip) and the transform is
  * `mapPartitions`, so one task decodes a whole row-group batch.
  */
object Multimodal {

  /** Typed media row: payload + metadata. */
  case class MediaItem(media_id: Long, kind: String, payload: Array[Byte],
                       width: Int, height: Int, frames: Int, sample_rate: Int)

  /** Extracted feature row. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           sig: String, feature: Array[Float])

  /** STUB codec — deterministic fake decode so tests are reproducible.
    * A real deployment replaces `decode` with the actual library call;
    * the signature (bytes in, fixed-width feature vector out) is the
    * integration contract.
    */
  object FakeCodec {
    val featureDim = 8

    def decode(payload: Array[Byte]): Array[Float] = {
      // pseudo-features from the murmur of the payload — stable stand-in
      // for "decode then embed"
      val h = graft.functions.CassandraMurmur3.tokenOfBytes(payload)
      Array.tabulate(featureDim)(i => (((h >>> (i * 8)) & 0xff).toInt - 128) / 128.0f)
    }

    def signature(payload: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString

    /** STUB resample: the target-size byte budget (w·h/256, ≥1) prefix of
      * the payload — a real codec rescales pixels; the contract (bytes in,
      * target-sized bytes out) and the budget arithmetic are what the
      * pipeline relies on. `take` clamps to the payload length.
      */
    def resample(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      payload.take(math.max(1, w * h / 256))
  }

  /** Resized media row (payload re-encoded to the fitted dimensions). */
  case class ResizedItem(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int)

  /** Aspect-fit target size inside a maxW×maxH box — never upscales,
    * never collapses below 1×1 (degenerate source dims count as 1).
    */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    val w0 = math.max(w, 1); val h0 = math.max(h, 1)
    val scale = math.min(math.min(maxW.toDouble / w0, maxH.toDouble / h0), 1.0)
    (math.max(1, math.floor(w0 * scale).toInt), math.max(1, math.floor(h0 * scale).toInt))
  }

  /** Partition-local batch resize (same `mapPartitions` shape as
    * [[extractFeatures]] — codec init amortizes per partition; payloads
    * never leave the executors).
    */
  def resize(spark: SparkSession, media: Dataset[MediaItem],
             maxW: Int, maxH: Int): Dataset[ResizedItem] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h) = fitBox(m.width, m.height, maxW, maxH)
        ResizedItem(m.media_id, m.kind, FakeCodec.resample(m.payload, w, h), w, h)
      }
    }
  }

  /** Build a media table from the documents fixture (payload = UTF-8 bytes
    * of the text; real pipelines read image/audio files the same way:
    * `binaryFile` source → binary column + metadata).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        concat(lit("img/"), (col("doc_id") % 3).cast("string")).as("kind"),
        encode(col("text"), "UTF-8").cast("binary").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("doc_id") % 30 + 1).cast("int").as("frames"),
        lit(16000).as("sample_rate"))
      .as[MediaItem]
  }

  /** Partition-local batch feature extraction (the `mapPartitions` shape a
    * real decoder needs — amortizes codec init per partition, not per row).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          FakeCodec.signature(m.payload), FakeCodec.decode(m.payload))
      }
    }
  }

  /** Frame sampling plumbing: every `stride`-th frame index of each video,
    * exploded to one row per sampled frame (a real impl slices the payload;
    * the index arithmetic and fan-out shape are what matters at scale).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("frames"),
        // a frameless item (still image, frames = 0) yields zero rows —
        // sequence(0, -1) would throw on inconsistent boundaries
        explode(when(col("frames") > 0,
            sequence(lit(0), col("frames") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .withColumn("frame_key", concat_ws(":", col("media_id"), col("frame_idx")))
}
