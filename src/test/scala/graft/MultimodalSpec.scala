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

  test("feature extraction decodes the real PNG payloads deterministically " +
    "and reports dims from the decode, not the metadata") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val f1 = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq)
    f1.foreach { f =>
      assert(f.channels === 3)
      val (w, h) = Multimodal.plantDims(f.media_id, 0) // width only needs id
      assert(f.width === w)
      assert(f.mean_r >= 0.0 && f.mean_r <= 255.0)
      assert(f.var_r >= 0.0 && f.edge_density >= 0.0 && f.edge_density <= 1.0)
    }
    // hand-check one image against a direct plant→measure replica
    val m0 = media.filter(col("media_id") === 5L).head()
    val img = graft.operators.Png.decode(m0.payload)
    val expected = Array.tabulate(img.width * img.height * 3)(i =>
      Multimodal.plantPixel(5L, i).toByte)
    assert(img.pixels.toSeq === expected.toSeq,
      "decode must invert the rotating-filter encode exactly")
    val stats = Multimodal.imageStats(img)
    val got = f1.find(_.media_id === 5L).get
    assert((got.mean_r, got.var_g, got.luma_mean, got.edge_density) ===
      ((stats(0), stats(4), stats(6), stats(7))))
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

  test("resize decodes, bilinearly resamples real pixels, and re-encodes " +
    "a decodable PNG at the fitted dims; oversize box is the identity") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val resized = Multimodal.resize(spark, media, 16, 16).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.width >= 1 && r.width <= 16 && r.height >= 1 && r.height <= 16)
      val back = graft.operators.Png.decode(r.payload)
      assert(back.width === r.width && back.height === r.height)
      assert(back.channels === 3)
    }
    // a box larger than every planted image (max 32x25) must be a pixel
    // identity: decode(resized payload) == the planted pixels
    val big = Multimodal.resize(spark, media, 256, 256).collect()
    big.foreach { r =>
      val back = graft.operators.Png.decode(r.payload)
      val expected = Array.tabulate(back.width * back.height * 3)(i =>
        Multimodal.plantPixel(r.media_id, i).toByte)
      assert(back.pixels.toSeq === expected.toSeq)
    }
  }

  test("imagePHash: deterministic, brightness-shift lands within the " +
    "near-dup radius, distinct noise images land far; phashPairs' " +
    "pigeonhole join equals brute force exactly") {
    val docs = Tables.documents(spark, sf).limit(60)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val h1 = Multimodal.imagePHash(spark, media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.imagePHash(spark, media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 === h2 && h1.size === 60)
    // ~half the bits set by the median construction
    h1.values.foreach { h =>
      val bits = java.lang.Long.bitCount(h)
      assert(bits >= 20 && bits <= 44, s"phash $h has $bits bits set")
    }
    // a brightness-shifted copy is a near-dup; a different noise image is
    // not (hand-check via the hash arithmetic directly)
    val m0 = media.filter(col("media_id") === 10L).head()
    val img = graft.operators.Png.decode(m0.payload)
    val shifted = img.pixels.map(p => math.min(255, (p & 0xff) + 3).toByte)
    val dNear = java.lang.Long.bitCount(
      Multimodal.pHashOf(img) ^
      Multimodal.pHashOf(graft.operators.Png.Image(img.width, img.height, 3, shifted)))
    assert(dNear <= 3, s"brightness shift drifted $dNear bits")
    val dFar = java.lang.Long.bitCount(h1(10L) ^ h1(11L))
    assert(dFar > 10, s"distinct noise images only $dFar bits apart")
    // pigeonhole exactness: engine pairs == brute force at the same radius
    import spark.implicits._
    val withVariant = media.union(
      Seq(Multimodal.MediaItem(900L, "img/0",
        graft.operators.Png.encode(img.width, img.height, 3, shifted),
        img.width, img.height, 1, 16000)).toDS())
    val hashes = Multimodal.imagePHash(spark, withVariant)
    val got = Multimodal.phashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = hashes.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = (for {
      i <- all.indices; j <- (i + 1) until all.length
      d = java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) if d <= 3
    } yield (all(i)._1, all(j)._1, d)).toSet
    assert(got === want && want.exists(p => p._1 == 10L && p._2 == 900L))
  }

  test("JPEG tier: the container sniff decodes planted baseline JPEGs " +
    "(gray/4:4:4/4:2:0, quality sweep, restart markers); a JPEG q90 twin " +
    "of a PNG image stays inside the cross-container pHash radius") {
    val docs = Tables.documents(spark, sf).limit(60)
    val media = Multimodal.jpegMediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === 60)
    feats.foreach { f =>
      assert(f.channels === (if (f.media_id % 3 == 0) 1 else 3), s"id ${f.media_id}")
      assert(f.mean_r >= 0 && f.mean_r <= 255 && f.var_r >= 0)
    }
    // resize round-trips through the sniff too (JPEG in → PNG out)
    val resized = Multimodal.resize(spark, media, 8, 8).collect()
    assert(resized.forall(r => r.width <= 8 && r.height <= 8))
    // cross-container twins: the same planted pixels as PNG and as JPEG
    // q90 4:4:4 must hash within the pigeonhole radius the dedup query
    // uses, while unrelated noise images stay ~32 bits apart
    val png = Multimodal.mediaFromDocuments(spark, docs)
    val twins = docs
      .select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .as[(Long, Int)].collect().toSeq.map { case (id, nChars) =>
        val (w, h) = Multimodal.plantDims(id, nChars)
        val px = Array.tabulate(w * h * 3)(i => Multimodal.plantPixel(id, i).toByte)
        Multimodal.MediaItem(id + 10000000L, "jpg/x",
          graft.operators.Jpeg.encode(w, h, 3, px, quality = 90), w, h, 1, 16000)
      }
    val hashes = Multimodal.imagePHash(spark, png.union(twins.toDS()))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = hashes.keys.filter(_ < 10000000L).toSeq.sorted
    val dists = ids.map(id => java.lang.Long.bitCount(hashes(id) ^ hashes(id + 10000000L)))
    info(s"cross-container twin hamming: max=${dists.max} " +
      f"mean=${dists.sum.toDouble / dists.size}%.2f " +
      s"histo=${dists.groupBy(identity).toSeq.sortBy(_._1).map(p => s"${p._1}:${p._2.size}").mkString(",")}")
    // tiny noise images are pHash-hostile (a 4×3 block artifact dominates
    // the 32×32 upscale), so the claim is distributional: ≥ 90% of twins
    // inside the radius-10 dedup gate, median at 0-2, never a wholesale
    // drift — while unrelated noise stays ~32 bits apart
    assert(dists.count(_ <= 10) * 10 >= dists.size * 9,
      s"only ${dists.count(_ <= 10)}/${dists.size} twins within hamming 10")
    assert(dists.sorted.apply(dists.size / 2) <= 2,
      s"median twin distance ${dists.sorted.apply(dists.size / 2)}")
    assert(dists.max < 24, s"a twin drifted ${dists.max} bits — decode suspect")
    val unrelated = ids.sliding(2).collect { case Seq(a, b) =>
      java.lang.Long.bitCount(hashes(a) ^ hashes(b)) }.toSeq
    assert(unrelated.min > 10, s"unrelated images only ${unrelated.min} bits apart")
  }

  test("GIF tier: stills and animations flow through the container " +
    "sniffs; an AVI re-encode of a GIF's composed frames is a frame-exact " +
    "video twin (cross-container video dedup at hamming 0)") {
    val docs = Tables.documents(spark, sf).limit(40)
    val stills = Multimodal.gifMediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(spark, stills).collect()
    assert(feats.length === 40 && feats.forall(_.channels == 3))
    // animated clips: composed frame count = 2 + id % 4, reported on
    // every per-frame row
    val clips = Multimodal.gifVideoFromDocuments(spark, docs)
    val vf = Multimodal.videoFrameFeatures(spark, clips, 1).collect()
    assert(vf.nonEmpty)
    vf.groupBy(_.media_id).foreach { case (id, rows) =>
      assert(rows.length === 2 + (id % 4).toInt, s"clip $id")
      assert(rows.forall(_.n_frames == rows.length))
    }
    // cross-container twins: decode each animated GIF, re-encode the
    // composed frames as uncompressed AVI — both containers must yield
    // byte-identical frames, so every twin pair matches at hamming 0
    val twins = clips.collect().toSeq.map { m =>
      val vid = Multimodal.decodeVideo(m.payload)
      Multimodal.MediaItem(m.media_id + 10000000L, "vid/x",
        graft.operators.Avi.encode(vid.width, vid.height,
          vid.microSecPerFrame, vid.frames),
        vid.width, vid.height, vid.frames.length, 16000)
    }
    val hashes = Multimodal.videoPHashes(spark, clips.union(twins.toDS()), 1)
    val dups = Multimodal.videoNearDups(hashes, maxHamming = 0, minMatched = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(dups.contains((id, id + 10000000L)),
        s"GIF clip $id and its AVI twin failed to pair")
    }
  }

  test("phashPairsBlocked equals phashPairs restricted to equal-dims " +
    "pairs — blocking changes the plan's scale curve, not the twin set") {
    val docs = Tables.documents(spark, sf).limit(50)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val twins = Multimodal.jpegMediaFromDocuments(spark, docs)
      .map(m => m.copy(media_id = m.media_id + 10000000L))
    val corpus = media.union(twins)
    val dims = Multimodal.imagePHashDims(spark, corpus)
    val blocked = Multimodal.phashPairsBlocked(dims, 10, Seq("width", "height"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val dimOf = dims.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val plain = Multimodal.phashPairs(Multimodal.imagePHash(spark, corpus), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => dimOf(p._1) == dimOf(p._2)).toSet
    assert(blocked === plain)
    assert(blocked.nonEmpty, "no equal-dims pairs formed at all")
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

  test("wavDecode accepts the common web variants — unsigned PCM8 and " +
    "IEEE float32 — and rejects stereo/exotic formats loudly") {
    def wavRaw(fmtCode: Int, nCh: Int, rate: Int, bits: Int,
               data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(44 + data.length + (data.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")); out.putInt(36 + data.length)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")); out.putInt(16)
      out.putShort(fmtCode.toShort); out.putShort(nCh.toShort)
      out.putInt(rate); out.putInt(rate * nCh * bits / 8)
      out.putShort((nCh * bits / 8).toShort); out.putShort(bits.toShort)
      out.put("data".getBytes("US-ASCII")); out.putInt(data.length); out.put(data)
      out.array()
    }
    // PCM8 is unsigned, 128-centered → scaled to 16-bit by << 8
    val (r8, s8) = Multimodal.wavDecode(wavRaw(1, 1, 8000, 8,
      Array[Byte](0, 128.toByte, 255.toByte, 200.toByte)))
    assert(r8 === 8000 && s8.toSeq === Seq[Short](-32768, 0, 32512, 18432))
    // float32: scale 2^15, round half-up, clamp to 16-bit range
    val fdata = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(0.5f, -1.0f, 2.0f, 1e-5f).foreach(fdata.putFloat)
    val (rf, sf32) = Multimodal.wavDecode(wavRaw(3, 1, 44100, 32, fdata.array()))
    assert(rf === 44100 && sf32.toSeq === Seq[Short](16384, -32768, 32767, 0))
    // stereo would silently interleave channels into the signal — reject
    val st = intercept[IllegalArgumentException] {
      Multimodal.wavDecode(wavRaw(1, 2, 16000, 16, new Array[Byte](8)))
    }
    assert(st.getMessage.contains("channel"))
    // exotic format codes reject by name
    val ex = intercept[IllegalArgumentException] {
      Multimodal.wavDecode(wavRaw(2, 1, 16000, 16, new Array[Byte](8)))
    }
    assert(ex.getMessage.contains("format code"))
  }

  test("G.711 expansion matches the JDK's own µ-law/A-law tables on all " +
    "256 codes, and G.711 WAVs decode through the container walk") {
    import javax.sound.sampled._
    val codes = Array.tabulate(256)(_.toByte)
    for (aLaw <- Seq(false, true)) {
      val enc = if (aLaw) AudioFormat.Encoding.ALAW else AudioFormat.Encoding.ULAW
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val conv = AudioSystem.getAudioInputStream(dst,
        new AudioInputStream(new java.io.ByteArrayInputStream(codes), src, 256))
      val out = conv.readAllBytes()
      assert(out.length === 512)
      (0 until 256).foreach { c =>
        val jdk = ((out(c * 2) & 0xff) | (out(c * 2 + 1) << 8)).toShort.toInt
        assert(Multimodal.g711Decode(c, aLaw) === jdk,
          s"code $c aLaw=$aLaw: ours ${Multimodal.g711Decode(c, aLaw)} vs JDK $jdk")
      }
      // and through the WAV container path end to end
      val (rate, xs) = Multimodal.wavDecode(Multimodal.wavFromG711(codes, 8000, aLaw))
      assert(rate === 8000 && xs.length === 256)
      (0 until 256).foreach(c => assert(xs(c).toInt === Multimodal.g711Decode(c, aLaw)))
    }
    // published anchors guard both conventions independently of the JDK
    assert(Multimodal.g711Decode(0x00, aLaw = false) === -32124)
    assert(Multimodal.g711Decode(0x80, aLaw = false) === 32124)
    assert(Multimodal.g711Decode(0x2a, aLaw = true) === -32256)
    assert(Multimodal.g711Decode(0x55, aLaw = true) === -8)
    assert(Multimodal.g711Decode(0xd5, aLaw = true) === 8)
  }

  test("IMA ADPCM: block re-anchoring is exact, reconstruction error is " +
    "step-bounded, fact truncation preserves odd lengths, and corrupt " +
    "streams reject by name") {
    // a 440 Hz sine at 16 kHz — ADPCM's home turf; the step adapts and
    // tracks within a small RMS error
    val sine = Array.tabulate(1000)(i =>
      (12000 * math.sin(2 * math.Pi * 440 * i / 16000)).toShort)
    for (ba <- Seq(256, 64, 32)) {
      val spb = (ba - 4) * 2 + 1
      val (rate, back) = Multimodal.wavDecode(
        Multimodal.wavFromImaAdpcm(sine, 16000, ba))
      assert(rate === 16000 && back.length === sine.length, s"ba=$ba")
      // every block's first sample is carried verbatim in the header
      (0 until sine.length by spb).foreach(k =>
        assert(back(k) === sine(k), s"ba=$ba block anchor $k"))
      // 4-bit companding lands ~20-25 dB SNR on a full-swing tone; gate
      // at 10% relative error (≈ 20 dB) so a tracking bug (which lands
      // orders of magnitude off) fails loudly without pinning the codec
      // to one step-table trajectory
      val rmsErr = math.sqrt(sine.indices
        .map(i => math.pow(back(i) - sine(i), 2)).sum / sine.length)
      val sigRms = math.sqrt(sine.map(s => s.toDouble * s).sum / sine.length)
      assert(rmsErr / sigRms < 0.1, s"ba=$ba sine relative RMS error ${rmsErr / sigRms}")
    }
    // full-scale noise: decode still returns, every nibble value occurs,
    // and the decode is deterministic
    val noise = Array.tabulate(777) { i =>
      var z = 42L * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z ^= (z >>> 31); z *= 0x94D049BB133111EBL
      ((z >>> 40) & 0xffff).toShort
    }
    val enc = Multimodal.wavFromImaAdpcm(noise, 16000, 64)
    val nibbles = {
      // data chunk trails the payload (fmt, fact, data layout)
      val dataPos = enc.length - (777 + 120) / 121 * 64 // ceil(777/121)=7 blocks
      enc.drop(dataPos).grouped(64).flatMap(_.drop(4))
        .flatMap(b => Seq(b & 0x0f, (b & 0xff) >> 4)).toSet
    }
    assert(nibbles === (0 to 15).toSet)
    val (_, d1) = Multimodal.wavDecode(enc)
    val (_, d2) = Multimodal.wavDecode(enc)
    assert(d1.toSeq === d2.toSeq && d1.length === 777)
    // a one-sample clip (nChars = 0 planting floor) round-trips its count
    val (_, one) = Multimodal.wavDecode(
      Multimodal.wavFromImaAdpcm(Array[Short](123), 16000, 32))
    assert(one.toSeq === Seq[Short](123))
    // corrupt step index (> 88) rejects by name
    val bad = enc.clone()
    bad(bad.length - 7 * 64 + 2) = 100 // first block's index byte
    assert(intercept[IllegalArgumentException](Multimodal.wavDecode(bad))
      .getMessage.contains("step index"))
    // the planting source feeds the shared feature pass
    val feats = Multimodal.audioFeatures(spark,
      Multimodal.imaAdpcmAudioFromDocuments(spark,
        Tables.documents(spark, sf).limit(20))).collect()
    assert(feats.length === 20)
    assert(feats.forall(f => f.sample_rate === 16000 && f.n_samples >= 1))
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

  test("fftInPlace matches a naive DFT to 1e-9 and spectral features " +
    "read crafted signals correctly: a pure tone centroids at its bin, " +
    "silence is flat, tone flatness is near zero") {
    // mathematical correctness: compare against an O(n^2) textbook DFT
    // (genuinely independent arithmetic — tolerance, not bit-equality)
    def dft(xs: Array[Double]): (Array[Double], Array[Double]) = {
      val n = xs.length
      val re = new Array[Double](n); val im = new Array[Double](n)
      for (k <- 0 until n; t <- 0 until n) {
        val ang = -2.0 * math.Pi * k * t / n
        re(k) += xs(t) * math.cos(ang)
        im(k) += xs(t) * math.sin(ang)
      }
      (re, im)
    }
    val rnd = new scala.util.Random(42)
    for (n <- Seq(8, 64, 512)) {
      val xs = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val re = xs.clone(); val im = new Array[Double](n)
      Multimodal.fftInPlace(re, im)
      val (er, ei) = dft(xs)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-9, s"n=$n re k=$k")
        assert(math.abs(im(k) - ei(k)) < 1e-9, s"n=$n im k=$k")
      }
    }
    // non-power-of-two sizes reject loudly
    intercept[IllegalArgumentException](
      Multimodal.fftInPlace(new Array[Double](12), new Array[Double](12)))
    // a pure tone exactly on bin 8 of a 512-sample window at 16 kHz
    // (32 ms → win == fftN == 512, no zero-padding smear): the line
    // spectrum sits in one bin, so centroid/rolloff pin to 250 Hz within
    // a bin (toShort quantization noise is the only leakage), flatness ≈ 0
    val rate = 16000; val freq = 250.0
    val tone = Array.tabulate[Short](512)(i =>
      (20000 * math.sin(2 * math.Pi * freq * i / rate)).toShort)
    val toneDs = Seq(Multimodal.AudioItem(1L,
      Multimodal.wavFromSamples(tone, rate), rate)).toDS()
    val tf = Multimodal.audioSpectralFeatures(spark, toneDs, 32, 10).head()
    assert(tf.fft_n === 512)
    assert(math.abs(tf.spectral_centroid_hz - freq) < rate.toDouble / 512,
      s"centroid ${tf.spectral_centroid_hz}")
    assert(tf.spectral_rolloff_hz === freq, s"rolloff ${tf.spectral_rolloff_hz}")
    assert(tf.spectral_flatness < 0.01, s"flatness ${tf.spectral_flatness}")
    // pure silence: centroid/rolloff 0 by contract, flatness exactly 1
    val silent = Seq(Multimodal.AudioItem(2L,
      Multimodal.wavFromSamples(new Array[Short](512), rate), rate)).toDS()
    val sf0 = Multimodal.audioSpectralFeatures(spark, silent, 32, 10).head()
    assert(sf0.spectral_centroid_hz === 0.0 && sf0.spectral_rolloff_hz === 0.0)
    assert(sf0.spectral_flatness === 1.0)
    // planted docs: deterministic and row-parity with the metadata fan-out
    val docs = Tables.documents(spark, sf).limit(30)
    val a = Multimodal.audioFromDocuments(spark, docs)
    val s1 = Multimodal.audioSpectralFeatures(spark, a, 25, 10)
      .collect().sortBy(r => (r.media_id, r.window_idx))
    val s2 = Multimodal.audioSpectralFeatures(spark, a, 25, 10)
      .collect().sortBy(r => (r.media_id, r.window_idx))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.length === Multimodal.audioWindows(a.toDF(), 25, 10).count())
    s1.foreach { w =>
      assert(w.spectral_flatness > 0.0 && w.spectral_flatness <= 1.0)
      assert(w.spectral_centroid_hz >= 0.0 && w.spectral_centroid_hz <= rate / 2.0)
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
