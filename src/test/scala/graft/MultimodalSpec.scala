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

  test("WAV container round-trips: encode→decode is the identity on " +
    "samples and rate; unknown chunks skip; junk bytes reject loudly") {
    val xs = Array[Short](0, 1, -1, 32767, -32768, 100, -12345)
    val (rate, back) = Multimodal.wavDecode(Multimodal.wavFromSamples(xs, 22050))
    assert(rate === 22050 && back.toSeq === xs.toSeq)
    // empty clip round-trips too
    val (_, e) = Multimodal.wavDecode(Multimodal.wavFromSamples(Array.empty, 16000))
    assert(e.isEmpty)
    // a LIST chunk between fmt and data must be walked over, not choked on
    val canon = Multimodal.wavFromSamples(xs, 16000)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = canon.slice(0, 36) ++ listChunk ++ canon.drop(36)
    // RIFF size field grows by the inserted chunk
    val bb = java.nio.ByteBuffer.wrap(withList).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + listChunk.length)
    val (r2, back2) = Multimodal.wavDecode(withList)
    assert(r2 === 16000 && back2.toSeq === xs.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode("definitely not a wav payload ............".getBytes)
    }
  }

  test("audio features measure a crafted clip exactly: duration, RMS, " +
    "peak, silence and clipping ratios") {
    // 8 samples: 4 silent (|x| < 328), 2 clipped (|x| >= 32440), peak 32767
    val xs = Array[Short](0, 100, -200, 327, 32767, -32440, 1000, -1000)
    val audio = Seq(Multimodal.AudioItem(7L,
      Multimodal.wavFromSamples(xs, 16000), 16000)).toDS()
    val f = Multimodal.audioFeatures(spark, audio).head()
    assert(f.media_id === 7L && f.sample_rate === 16000 && f.n_samples === 8)
    assert(f.duration_us === 500L) // 8 / 16000 s = 500 µs
    assert(f.peak === 32767)
    assert(f.silence_ratio === 0.5)
    assert(f.clipping_ratio === 0.25)
    val expRms = BigDecimal(math.sqrt(
        xs.map(v => v.toDouble * v.toDouble).sum / 8) / 32768.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(f.rms === expRms)
    // planted docs decode end-to-end and stay deterministic
    val docs = Tables.documents(spark, sf).limit(50)
    val a1 = Multimodal.audioFeatures(spark,
      Multimodal.audioFromDocuments(spark, docs)).collect().sortBy(_.media_id)
    val a2 = Multimodal.audioFeatures(spark,
      Multimodal.audioFromDocuments(spark, docs)).collect().sortBy(_.media_id)
    assert(a1.toSeq === a2.toSeq)
    assert(a1.forall(f => f.n_samples > 0 && f.rms > 0.0))
  }

  test("audio window fan-out: exact hop count, short clips yield no " +
    "rows, bounds stay inside the clip, payload bytes never read") {
    def clip(id: Long, n: Int) = Multimodal.AudioItem(id,
      Multimodal.wavFromSamples(Array.fill[Short](n)(1), 16000), 16000)
    val audio = Seq(clip(1, 1000), clip(2, 400), clip(3, 399), clip(4, 0))
      .toDS().toDF()
    val w = Multimodal.audioWindows(audio, 25, 10) // win 400, hop 160
      .collect().groupBy(_.getLong(0))
    // clip 1: indices 0..floor((1000-400)/160)=3 → 4 windows
    assert(w(1L).length === 4)
    assert(w(1L).map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq ===
      Seq((0L, 0L, 400L), (1L, 160L, 560L), (2L, 320L, 720L), (3L, 480L, 880L)))
    // exactly one full window fits clip 2; clip 3 and the empty clip get none
    assert(w(2L).length === 1 && w(2L).head.getLong(4) === 400L)
    assert(!w.contains(3L) && !w.contains(4L))
    w(1L).foreach(r => assert(r.getLong(4) <= 1000L))
    // an explicit n_samples column overrides the canonical-layout
    // derivation (non-canonical containers carry their own metadata)
    val w2 = Multimodal.audioWindows(audio, 25, 10,
        nSamplesCol = Some(lit(400L)))
      .collect().groupBy(_.getLong(0))
    assert(Seq(1L, 2L, 3L, 4L).forall(id => w2(id).length === 1))
    // a sample_rate too low for the stride fails LOUDLY, not silently empty
    val lowRate = Seq(Multimodal.AudioItem(9L,
      Multimodal.wavFromSamples(Array.fill[Short](500)(1), 80), 80)).toDS().toDF()
    val ex = intercept[Exception] {
      Multimodal.audioWindows(lowRate, 25, 10).collect()
    }
    assert(ex.getMessage.contains("shorter than one sample") ||
      Option(ex.getCause).exists(_.getMessage.contains("shorter than one sample")),
      ex.toString)
  }

  test("audioResample: same-rate is the identity, a crafted ramp " +
    "interpolates to hand values, downsample count floors, and the " +
    "round-trip stays decodable at the target rate") {
    val xs = Array[Short](0, 1000)
    val clip = Seq(Multimodal.AudioItem(1L,
      Multimodal.wavFromSamples(xs, 2), 2)).toDS()
    // identity
    val same = Multimodal.audioResample(spark, clip, 2).head()
    val (rSame, sSame) = Multimodal.wavDecode(same.payload)
    assert(rSame === 2 && sSame.toSeq === xs.toSeq)
    // upsample 2 → 3: positions 0, 2/3, 4/3 → 0, 667, 1000 (k·src/target
    // exact rational; floor(v+0.5); tail clamps to the last sample)
    val up = Multimodal.audioResample(spark, clip, 3).head()
    val (r3, s3) = Multimodal.wavDecode(up.payload)
    assert(r3 === 3 && s3.toSeq === Seq[Short](0, 667, 1000))
    // downsample 16000 → 11025 on planted audio: count floors, payload
    // decodes, and resampling twice is deterministic
    val docs = Tables.documents(spark, sf).limit(20)
    val a = Multimodal.audioFromDocuments(spark, docs)
    val rs1 = Multimodal.audioResample(spark, a, 11025)
      .collect().sortBy(_.media_id)
    val rs2 = Multimodal.audioResample(spark, a, 11025)
      .collect().sortBy(_.media_id)
    assert(rs1.map(_.payload.toSeq).toSeq === rs2.map(_.payload.toSeq).toSeq)
    val srcN = Multimodal.audioFeatures(spark, a).collect()
      .map(f => f.media_id -> f.n_samples).toMap
    rs1.foreach { r =>
      val (rate, out) = Multimodal.wavDecode(r.payload)
      assert(rate === 11025)
      assert(out.length === (srcN(r.media_id).toLong * 11025 / 16000).toInt)
    }
  }

  test("audioWindowFeatures: per-window RMS/peak/zero-crossing/ratio " +
    "values match hand computation; window starts follow the hop; row " +
    "count equals the metadata fan-out") {
    // rate 1000 → windowMs counts samples directly: win 4, hop 3
    val xs = Array[Short](1000, -1000, 0, 20000, -32767, 32767, 0, 0, 5000, -5000)
    val audio = Seq(Multimodal.AudioItem(3L,
      Multimodal.wavFromSamples(xs, 1000), 1000)).toDS()
    val got = Multimodal.audioWindowFeatures(spark, audio, 4, 3)
      .collect().sortBy(_.window_idx)
    assert(got.map(w => (w.window_idx, w.start_sample, w.end_sample)).toSeq ===
      Seq((0L, 0L, 4L), (1L, 3L, 7L), (2L, 6L, 10L)))
    // window 0: [1000,-1000,0,20000] — zc: signs (+,-,+) → 2; silence: the 0
    val w0 = got(0)
    assert(w0.peak === 20000 && w0.zero_crossings === 2)
    assert(w0.silence_ratio === 0.25 && w0.clipping_ratio === 0.0)
    val rms0 = BigDecimal(math.sqrt(
        (1000.0 * 1000 + 1000.0 * 1000 + 0 + 20000.0 * 20000) / 4) / 32768.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(w0.rms === rms0)
    // window 1: [20000,-32767,32767,0] — two clipped, one silent, zc 2
    val w1 = got(1)
    assert(w1.peak === 32767 && w1.clipping_ratio === 0.5 &&
      w1.silence_ratio === 0.25 && w1.zero_crossings === 2)
    // window 2: [0,0,5000,-5000] — zeros carry no sign: one flip, two silent
    val w2 = got(2)
    assert(w2.zero_crossings === 1 && w2.silence_ratio === 0.5)
    // row count equals the metadata-only fan-out on the same parameters
    val docs = Tables.documents(spark, sf).limit(30)
    val a2 = Multimodal.audioFromDocuments(spark, docs)
    val nMeta = Multimodal.audioWindows(a2.toDF(), 25, 10).count()
    val nFeat = Multimodal.audioWindowFeatures(spark, a2, 25, 10).count()
    assert(nMeta === nFeat && nFeat > 0)
  }
}
