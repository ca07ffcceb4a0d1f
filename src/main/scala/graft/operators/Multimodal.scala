package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ── Audio columns ─────────────────────────────────────────────────────
  //
  // Unlike image/video, 16-bit PCM needs NO codec library — the decode is
  // pure byte arithmetic — so this tier is stub-free end to end: a real
  // canonical RIFF/WAVE writer+parser, real sample decode, and the
  // standard audio-curation signals (duration, RMS energy, peak, silence
  // ratio, clipping ratio) computed per row inside the same
  // `mapPartitions` batch shape as [[extractFeatures]]. Payloads stay
  // columnar in parquet; window fan-out is metadata arithmetic that never
  // touches the bytes.

  /** Audio row: a WAV payload + its declared sample rate. */
  case class AudioItem(media_id: Long, payload: Array[Byte], sample_rate: Int)

  /** Audio curation signals (the per-clip quality row a training-data
    * pipeline filters on). Ratios are 6-dp rounded; duration is exact
    * integer microseconds.
    */
  case class AudioFeatures(media_id: Long, sample_rate: Int, n_samples: Int,
                           duration_us: Long, rms: Double, peak: Int,
                           silence_ratio: Double, clipping_ratio: Double)

  /** Samples with |x| below ~1% of full scale count as silence; at or
    * above ~99% they count as clipped (the usual loudness-gate defaults).
    */
  val silenceFloor = 328   // ceil(32768 * 0.01)
  val clipCeiling = 32440  // floor(32767 * 0.99)

  /** Build a canonical 44-byte-header mono 16-bit RIFF/WAVE payload. */
  def wavFromSamples(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                       // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)     // byte rate
      .putShort(2).putShort(16)                      // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL WAV parse: walk the RIFF chunks to the `data` chunk and decode
    * its 16-bit little-endian PCM samples; returns (sampleRate, samples).
    * Fails loudly on non-WAV bytes, non-PCM encodings, or bit depths
    * other than 16 — a silent skip would deflate every downstream ratio.
    */
  def wavDecode(payload: Array[Byte]): (Int, Array[Short]) = {
    require(payload.length >= 44 &&
      new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(payload, 8, 4, "US-ASCII") == "WAVE",
      "wavDecode: not a RIFF/WAVE payload")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1
    var out: Array[Short] = null
    while (pos + 8 <= payload.length && (rate < 0 || out == null)) {
      val tag = new String(payload, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      // long arithmetic: a crafted len near Int.MaxValue would wrap
      // pos+8+len negative and sneak past an int-typed bound check
      require(len >= 0 && pos.toLong + 8L + len.toLong <= payload.length,
        s"wavDecode: chunk '$tag' overruns the payload")
      tag match {
        case "fmt " =>
          require(bb.getShort(pos + 8) == 1, "wavDecode: not PCM")
          require(bb.getShort(pos + 22) == 16, "wavDecode: not 16-bit")
          rate = bb.getInt(pos + 12)
        case "data" =>
          out = Array.tabulate(len / 2)(i => bb.getShort(pos + 8 + i * 2))
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + len + (len & 1) // RIFF chunks pad to even
    }
    require(rate > 0 && out != null, "wavDecode: missing fmt/data chunk")
    (rate, out)
  }

  /** Plant deterministic audio rows from the documents fixture: each text
    * character LCG-scrambles to one full-range PCM sample (so silence and
    * clipping both actually occur), wrapped in a real WAV container. A
    * real pipeline reads audio files the same way (`binaryFile` source →
    * binary column + metadata).
    */
  def audioFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[AudioItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        // a null text plants an empty (0-sample) clip, not a crash —
        // the features path reports it as duration 0
        val samples = Option(text).getOrElse("")
          .toCharArray.map(c => sampleOfChar(c))
        AudioItem(id, wavFromSamples(samples, 16000), 16000)
    }
  }

  /** The planted-sample formula (spec for the fixture replica): LCG
    * scramble of the character code, middle 16 bits, centered.
    */
  def sampleOfChar(c: Char): Short =
    ((((c.toInt * 1103515245 + 12345) >>> 8) & 0xffff) - 32768).toShort

  /** Decode + signal extraction over WAV payload batches — the same
    * partition-local shape as [[extractFeatures]]. All arithmetic is
    * fixed-order per row (one sequential pass), so the signals are
    * engine-reproducible: duration in exact integer µs, RMS over
    * double-accumulated squares rounded 6 dp, ratios as exact counts
    * over n rounded 6 dp.
    */
  def audioFeatures(spark: SparkSession, audio: Dataset[AudioItem]): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions { it =>
      it.map { a =>
        val (rate, xs) = wavDecode(a.payload)
        val n = xs.length
        var sumSq = 0.0; var peak = 0; var silent = 0L; var clipped = 0L
        var i = 0
        while (i < n) {
          val v = xs(i).toInt
          val av = math.abs(v)
          sumSq += v.toDouble * v.toDouble
          if (av > peak) peak = av
          if (av < silenceFloor) silent += 1
          if (av >= clipCeiling) clipped += 1
          i += 1
        }
        def r6(d: Double): Double =
          BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        AudioFeatures(a.media_id, rate, n,
          if (n == 0) 0L else n.toLong * 1000000L / rate,
          if (n == 0) 0.0 else r6(math.sqrt(sumSq / n) / 32768.0),
          peak,
          if (n == 0) 0.0 else r6(silent.toDouble / n),
          if (n == 0) 0.0 else r6(clipped.toDouble / n))
      }
    }
  }

  /** REAL linear-interpolation rate conversion (the audio analog of the
    * image tier's [[resize]], and like the rest of the audio tier it
    * needs no codec): output sample k sits at exact rational source
    * position k·srcRate/targetRate; the value interpolates between the
    * two straddling samples with the fractional part, rounds half-up,
    * and clamps to 16-bit range. nOut = ⌊n·target/src⌋ (truncating —
    * never reads past the clip). All positions are exact integer
    * arithmetic and the single float op per sample is order-fixed, so
    * resampled payloads are bit-reproducible. Same-rate resample is the
    * identity. Runs in the [[extractFeatures]] mapPartitions batch
    * shape; payloads re-encode as canonical WAV at the target rate.
    */
  def audioResample(spark: SparkSession, audio: Dataset[AudioItem],
                    targetRate: Int): Dataset[AudioItem] = {
    import spark.implicits._
    require(targetRate > 0, s"audioResample: targetRate must be positive, got $targetRate")
    audio.mapPartitions { it =>
      it.map { a =>
        val (src, xs) = wavDecode(a.payload)
        val out =
          if (src == targetRate) xs
          else {
            val n = xs.length
            val nOut = (n.toLong * targetRate / src).toInt
            Array.tabulate(nOut) { k =>
              val num = k.toLong * src
              val i0 = (num / targetRate).toInt
              val frac = (num % targetRate).toDouble / targetRate
              val x0 = xs(i0).toDouble
              val x1 = xs(math.min(i0 + 1, n - 1)).toDouble
              val v = math.floor(x0 + (x1 - x0) * frac + 0.5)
              math.max(-32768.0, math.min(32767.0, v)).toShort
            }
          }
        AudioItem(a.media_id, wavFromSamples(out, targetRate), targetRate)
      }
    }
  }

  /** Per-window feature row ([[audioWindowFeatures]]). */
  case class AudioWindowFeatures(media_id: Long, window_idx: Long,
                                 start_sample: Long, end_sample: Long,
                                 rms: Double, peak: Int, zero_crossings: Int,
                                 silence_ratio: Double, clipping_ratio: Double)

  /** Per-window signal extraction over the REAL decode — the windowed
    * form of [[audioFeatures]] (speech pipelines filter on per-window
    * loudness/voicing, not whole-clip means): each clip decodes ONCE per
    * row inside the [[extractFeatures]] mapPartitions batch shape, then
    * emits one row per (windowMs, strideMs) hop that fits entirely in
    * the clip — the same hop arithmetic as [[audioWindows]] (whose
    * metadata-only fan-out is the planning face of this operator).
    * Signals per window: fixed-order RMS, peak, ZERO CROSSINGS (the
    * classic cheap voicing/noisiness cue — sign flips between adjacent
    * samples, zeros carry no sign), silence and clipping ratios. All
    * counts are exact integers and the RMS order is pinned, so the rows
    * are engine-reproducible and fixture-oracleable.
    */
  def audioWindowFeatures(spark: SparkSession, audio: Dataset[AudioItem],
                          windowMs: Int, strideMs: Int): Dataset[AudioWindowFeatures] = {
    import spark.implicits._
    require(windowMs > 0 && strideMs > 0,
      s"audioWindowFeatures: window/stride must be positive, got $windowMs/$strideMs")
    audio.flatMap { a =>
      val (rate, xs) = wavDecode(a.payload)
      val win = rate.toLong * windowMs / 1000
      val hop = rate.toLong * strideMs / 1000
      require(win >= 1 && hop >= 1,
        s"audioWindowFeatures: window/stride ($windowMs ms/$strideMs ms) " +
          s"is shorter than one sample at sample_rate $rate")
      val n = xs.length.toLong
      if (n < win) Iterator.empty
      else (0L to (n - win) / hop).iterator.map { wi =>
        val s0 = (wi * hop).toInt
        val s1 = s0 + win.toInt
        var sumSq = 0.0; var peak = 0; var silent = 0; var clipped = 0
        var zc = 0; var prevSign = 0
        var i = s0
        while (i < s1) {
          val v = xs(i).toInt
          val av = math.abs(v)
          sumSq += v.toDouble * v.toDouble
          if (av > peak) peak = av
          if (av < silenceFloor) silent += 1
          if (av >= clipCeiling) clipped += 1
          val sign = if (v > 0) 1 else if (v < 0) -1 else 0
          if (sign != 0) {
            if (prevSign != 0 && sign != prevSign) zc += 1
            prevSign = sign
          }
          i += 1
        }
        def r6(d: Double): Double =
          BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        val w = win.toDouble
        AudioWindowFeatures(a.media_id, wi, s0.toLong, s1.toLong,
          r6(math.sqrt(sumSq / w) / 32768.0), peak, zc,
          r6(silent / w), r6(clipped / w))
      }
    }
  }

  /** Window fan-out over audio METADATA (the [[sampleFrames]] analog):
    * one row per (windowMs, strideMs) hop that fits entirely inside the
    * clip — pure arithmetic on the sample count, the payload bytes are
    * never touched (at 100 TB the planner prunes them out of the scan).
    * By default n_samples derives from the CANONICAL 44-byte-header WAV
    * layout ([[wavFromSamples]]' output); payloads with extra RIFF
    * chunks need `nSamplesCol` — the sample-count metadata column a real
    * ingest carries — or the derived count silently includes chunk
    * bytes. Clips shorter than one window yield no rows; a sample_rate
    * too low for the stride (hop would truncate to 0 samples) fails
    * loudly at run time rather than silently emitting nothing.
    */
  def audioWindows(audio: DataFrame, windowMs: Int, strideMs: Int,
                   nSamplesCol: Option[Column] = None): DataFrame = {
    require(windowMs > 0 && strideMs > 0,
      s"audioWindows: window/stride must be positive, got $windowMs/$strideMs")
    val nSamples = nSamplesCol.getOrElse(
      ((length(col("payload")) - 44) / 2).cast("long"))
    val win = (col("sample_rate") * windowMs / 1000).cast("long")
    val hop0 = (col("sample_rate") * strideMs / 1000).cast("long")
    // the guard is fused INTO the hop value (assert_true returns null on
    // success, so the `when` passes hop through) — a standalone guard
    // column would be pruned out of the plan and never execute
    val hop = when(assert_true(hop0 >= 1 && win >= 1,
        lit(s"audioWindows: window/stride ($windowMs ms/$strideMs ms) is " +
          "shorter than one sample at this row's sample_rate")).isNull,
      hop0)
    audio
      .select(col("media_id"), col("sample_rate"), nSamples.as("n_samples"),
        win.as("_w"), hop.as("_h"))
      .select(col("media_id"), col("n_samples"),
        // `div`, not `/`: Column./ on longs is double division (loses
        // integral exactness; same fix as rangeJoin's bucket index)
        explode(when(col("n_samples") >= col("_w"),
            sequence(lit(0L),
              call_function("div", col("n_samples") - col("_w"), col("_h")),
              lit(1L)))
          .otherwise(array().cast("array<bigint>"))).as("window_idx"),
        (col("_h")).as("_hop"), col("_w").as("_win"))
      .select(col("media_id"), col("n_samples"), col("window_idx"),
        (col("window_idx") * col("_hop")).as("start_sample"),
        (col("window_idx") * col("_hop") + col("_win")).as("end_sample"))
  }
}
