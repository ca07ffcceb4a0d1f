package graft

import graft.operators.AudioContainers

/** MP3/FLAC container-metadata spec: hand-checked frame/block walks,
  * bit-layout round trips, loud rejections, and the Spark ops.
  */
class AudioContainersSpec extends SparkSpec {
  import spark.implicits._

  test("mp3: encode→parse round-trips version/rate/mode/frames/duration " +
    "and detects CBR vs VBR; ID3v2 skipped by the syncsafe size") {
    val cbr = AudioContainers.mp3Encode(mpeg1 = true, srIdx = 0, _ => 9,
      _ % 3 == 0, channelMode = 1, frames = 50, id3Size = 123)
    val m = AudioContainers.mp3Parse(cbr)
    assert(m.mpeg_version === 1 && m.sample_rate === 44100)
    assert(m.channel_mode === "joint_stereo")
    assert(m.n_frames === 50L && !m.is_vbr)
    assert(m.id3_bytes === 133L) // 10-byte header + body
    assert(m.duration_ms === 50L * 1152 * 1000 / 44100)
    // frame lengths: 144000·128/44100 = 417 (+1 on padded frames)
    val plain = AudioContainers.mp3FrameLen(mpeg1 = true, 128, 44100, padding = false)
    assert(plain === 417)
    assert(m.audio_bytes === (0 until 50).map(f =>
      417L + (if (f % 3 == 0) 1 else 0)).sum)
    val vbr = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = false, srIdx = 0, f => 1 + f % 14, _ => false, 3, 30, 0))
    assert(vbr.mpeg_version === 2 && vbr.sample_rate === 22050)
    assert(vbr.is_vbr && vbr.channel_mode === "mono")
    assert(vbr.duration_ms === 30L * 576 * 1000 / 22050)
    assert(!vbr.has_xing && !vbr.has_id3v1)
  }

  test("mp3 ID3v2 text frames: TIT2/TPE1 parse across v2.3 (plain-BE " +
    "sizes, UTF-16/ISO encodings) and v2.4 (syncsafe, UTF-8); padding " +
    "and unknown frames skip; crafted tags reject by name") {
    val v4 = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = true, 0, _ => 9, _ => false, 1, 10, 80,
      id3Frames = Seq("TIT2" -> "Ünïcode Title", "TPE1" -> "The Band",
        "TALB" -> "ignored album")))
    assert(v4.title === "Ünïcode Title" && v4.artist === "The Band")
    assert(v4.id3_bytes === 90L)
    val v3 = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = true, 0, _ => 9, _ => false, 1, 10, 80,
      id3Frames = Seq("TIT2" -> "utf16 title", "TPE1" -> "iso artist"),
      id3Ver = 3))
    assert(v3.title === "utf16 title" && v3.artist === "iso artist")
    // no frames: tag is all padding, tags stay empty
    val pad = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = true, 0, _ => 9, _ => false, 1, 10, 40))
    assert(pad.title === "" && pad.artist === "")
    def rej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](
        AudioContainers.mp3Parse(p)).getMessage
      assert(m.contains(frag), m)
    }
    val good = AudioContainers.mp3Encode(mpeg1 = true, 0, _ => 9, _ => false,
      1, 10, 80, id3Frames = Seq("TIT2" -> "t"))
    // a frame size lying past the tag end
    val lying = good.clone(); lying(14) = 0x7f // TIT2 syncsafe size high byte
    rej(lying, "overruns the tag")
    // unsynchronised tags and v2.2 reject by name
    val unsync = good.clone(); unsync(5) = 0x80.toByte
    rej(unsync, "unsynchronised")
    val v22 = good.clone(); v22(3) = 2
    rej(v22, "ID3v2.2")
  }

  test("mp3 ID3v2 frame format flags honor the version's bit layout: " +
    "v2.3 compression/encryption at 0xC0, v2.4 at 0x0C; v2.4 " +
    "data-length-indicator and per-frame unsync are handled, not leaked") {
    // hand-built tag + a plant audio stream appended after it
    def tag(ver: Int, frames: Seq[(String, Int, Array[Byte])]): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      frames.foreach { case (fid, fflags, content) =>
        body.write(fid.getBytes("US-ASCII"))
        val n = content.length
        if (ver == 4) {
          body.write((n >> 21) & 0x7f); body.write((n >> 14) & 0x7f)
          body.write((n >> 7) & 0x7f); body.write(n & 0x7f)
        } else {
          body.write((n >> 24) & 0xff); body.write((n >> 16) & 0xff)
          body.write((n >> 8) & 0xff); body.write(n & 0xff)
        }
        body.write(0); body.write(fflags); body.write(content)
      }
      val bb = body.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write('I'); out.write('D'); out.write('3')
      out.write(ver); out.write(0); out.write(0)
      out.write((bb.length >> 21) & 0x7f); out.write((bb.length >> 14) & 0x7f)
      out.write((bb.length >> 7) & 0x7f); out.write(bb.length & 0x7f)
      out.write(bb)
      out.toByteArray
    }
    val audio = AudioContainers.mp3Encode(mpeg1 = true, 0, _ => 9, _ => false,
      1, 10, 0)
    def parse(t: Array[Byte]) = AudioContainers.mp3Parse(t ++ audio)
    def iso(s: String) = Array[Byte](0) ++ s.getBytes("ISO-8859-1")
    // v2.3 compressed (0x80) and encrypted (0x40) frames skip — the old
    // v2.4 mask would have decoded their payloads as text
    assert(parse(tag(3, Seq(("TIT2", 0x80, iso("zlib!")),
      ("TPE1", 0x40, iso("crypt"))))).title === "")
    // v2.3 with 0x0C set (undefined bits there) must NOT skip
    val v3ok = parse(tag(3, Seq(("TIT2", 0x0c, iso("kept")))))
    assert(v3ok.title === "kept")
    // v2.4 compressed/encrypted skip
    assert(parse(tag(4, Seq(("TIT2", 0x08, iso("z"))))).title === "")
    assert(parse(tag(4, Seq(("TIT2", 0x04, iso("e"))))).title === "")
    // grouping prefixes one group-id byte: v2.3 at 0x20, v2.4 at 0x40
    assert(parse(tag(3, Seq(("TIT2", 0x20,
      Array[Byte](0x63) ++ iso("g3"))))).title === "g3")
    assert(parse(tag(4, Seq(("TIT2", 0x40,
      Array[Byte](0x63) ++ iso("g4"))))).title === "g4")
    // v2.4 data-length indicator: 4-byte syncsafe prefix strips cleanly
    val dli = Array[Byte](0, 0, 0, 3) ++ iso("hi")
    assert(parse(tag(4, Seq(("TIT2", 0x01, dli)))).title === "hi")
    // v2.4 per-frame unsynchronisation: FF 00 unescapes to FF ('ÿ')
    val uns = Array[Byte](0, 'A', 0xff.toByte, 0x00)
    assert(parse(tag(4, Seq(("TIT2", 0x02, uns)))).title === "Aÿ")
    // truncated DLI frame rejects by name
    val m = intercept[IllegalArgumentException](
      parse(tag(4, Seq(("TIT2", 0x01, Array[Byte](0, 0)))))).getMessage
    assert(m.contains("data-length"), m)
  }

  test("mp3 wild-data tolerance: a leading Xing/Info header frame and a " +
    "trailing ID3v1 TAG block are recognized and excluded from the stats") {
    val bare = AudioContainers.mp3Parse(
      AudioContainers.mp3Encode(mpeg1 = true, 0, _ => 9, _ % 3 == 0, 1, 41, 0))
    // Xing spelling (odd frame count) — stats must equal the bare stream's
    val x = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = true, 0, _ => 9, _ % 3 == 0, 1, 41, 0, xing = true))
    assert(x.has_xing && !x.has_id3v1)
    assert(x.n_frames === bare.n_frames && x.duration_ms === bare.duration_ms)
    assert(x.audio_bytes === bare.audio_bytes && x.is_vbr === bare.is_vbr)
    // Info spelling (even frame count), MPEG-2 mono side-info offset
    val i = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = false, 0, _ => 7, _ => false, 3, 30, 0, xing = true))
    assert(i.has_xing && i.n_frames === 30L && !i.is_vbr)
    // ID3v1 trailer: 128 bytes at EOF, skipped instead of "lost sync"
    val v1 = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = true, 0, _ => 9, _ % 3 == 0, 1, 41, 57, id3v1 = true))
    assert(v1.has_id3v1 && v1.id3_bytes === 67L)
    assert(v1.n_frames === bare.n_frames && v1.audio_bytes === bare.audio_bytes)
    // both at once (the LAME-encoded shape)
    val both = AudioContainers.mp3Parse(AudioContainers.mp3Encode(
      mpeg1 = true, 0, _ => 9, _ % 3 == 0, 1, 41, 0, xing = true, id3v1 = true))
    assert(both.has_xing && both.has_id3v1 && both.n_frames === 41L)
    // a Xing frame with NO audio after it rejects by name
    val only = intercept[IllegalArgumentException](AudioContainers.mp3Parse(
      AudioContainers.mp3Encode(mpeg1 = true, 0, _ => 9, _ => false, 1, 0,
        0, xing = true))).getMessage
    assert(only.contains("no audio frames"), only)
  }

  test("mp3: crafted streams reject by name (lost sync, free-format, " +
    "reserved indices, truncation, 2.5)") {
    def rej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](AudioContainers.mp3Parse(p)).getMessage
      assert(m.contains(frag), m)
    }
    val good = AudioContainers.mp3Encode(mpeg1 = true, 0, _ => 9, _ => false, 0, 10, 0)
    rej("random bytes, definitely not mpeg audio....".getBytes, "sync")
    rej(good.take(good.length - 9), "overruns")
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte
    rej(free, "free-format")
    val resSr = good.clone(); resSr(2) = (resSr(2) | 0x0c).toByte
    rej(resSr, "reserved samplerate")
    val v25 = good.clone(); v25(1) = (v25(1) & ~0x18).toByte
    rej(v25, "MPEG-2.5")
    val layer2 = good.clone(); layer2(1) = ((layer2(1) & ~0x06) | 0x04).toByte
    rej(layer2, "layer 2")
    // an ID3 tag lying about its size
    val id3 = AudioContainers.mp3Encode(mpeg1 = true, 0, _ => 9, _ => false, 0, 3, 40)
    val lying = id3.clone(); lying(9) = 0x7f
    rej(lying.take(60), "overruns")
  }

  test("flac: encode→parse round-trips the STREAMINFO bit packing and " +
    "Vorbis comments (little-endian lengths); rejections by name") {
    val p = AudioContainers.flacEncode(48000, 2, 24, 1234567890L,
      "vend/1.0", Seq("TITLE" -> "a b", "ARTIST" -> "c", "DATE" -> "2026"),
      audioBytes = 99)
    val m = AudioContainers.flacParse(p)
    assert(m.sample_rate === 48000 && m.channels === 2 && m.bits_per_sample === 24)
    assert(m.total_samples === 1234567890L)
    assert(m.duration_ms === 1234567890L * 1000 / 48000)
    assert(m.min_block === 4096 && m.max_block === 4096)
    assert(m.n_comments === 3 && m.vendor === "vend/1.0")
    assert(m.title === "a b" && m.artist === "c")
    // lowercase field names resolve case-insensitively per the spec
    val lc = AudioContainers.flacParse(AudioContainers.flacEncode(
      32000, 1, 16, 7L, "v", Seq("title" -> "x"), 8))
    assert(lc.title === "x" && lc.artist === "")
    def rej(bytes: Array[Byte], frag: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        AudioContainers.flacParse(bytes)).getMessage
      assert(msg.contains(frag), msg)
    }
    rej("not a flac file at all..................................".getBytes, "magic")
    rej(p.take(50), "overruns") // cut mid-comment-block, past STREAMINFO
    // a 36-bit sample count boundary: 2^36 - 1 survives the packing
    val big = AudioContainers.flacParse(AudioContainers.flacEncode(
      44100, 1, 16, (1L << 36) - 1, "v", Nil, 8))
    assert(big.total_samples === (1L << 36) - 1)
  }

  test("ogg: encode→parse round-trips page framing, headers and tags " +
    "for both codecs; the Opus 48 kHz granule clock and preskip are " +
    "honored; crafted streams reject by name") {
    val opus = AudioContainers.oggParse(AudioContainers.oggEncode(
      opus = true, 2, 44100, 96000L, "v/1", Seq("TITLE" -> "t", "artist" -> "a"), 4))
    assert(opus.codec === "opus" && opus.channels === 2)
    assert(opus.sample_rate === 44100) // declared input rate
    assert(opus.duration_ms === 96000L * 1000 / 48000) // granule clock 48k
    assert(opus.n_pages === 6L && opus.n_comments === 2)
    assert(opus.vendor === "v/1" && opus.title === "t" && opus.artist === "a")
    val vorb = AudioContainers.oggParse(AudioContainers.oggEncode(
      opus = false, 1, 32000, 64000L, "v/2", Seq("ARTIST" -> "b"), 3))
    assert(vorb.codec === "vorbis" && vorb.channels === 1)
    assert(vorb.duration_ms === 64000L * 1000 / 32000) // media rate
    assert(vorb.title === "" && vorb.artist === "b")
    def rej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](
        AudioContainers.oggParse(p)).getMessage
      assert(m.contains(frag), m)
    }
    val good = AudioContainers.oggEncode(opus = true, 1, 48000, 48000L,
      "v", Seq("TITLE" -> "x"), 3)
    rej("definitely not an ogg stream at all, not even close".getBytes,
      "capture pattern")
    rej(good.take(good.length - 10), "overruns")
    // a flipped body byte breaks the page CRC
    val corrupt = good.clone(); corrupt(good.length - 3) = 0x55
    rej(corrupt, "CRC mismatch")
    // dropping the EOS page leaves the stream unterminated
    val lastPageAt = {
      var at = 0; var prev = 0
      while (at < good.length) {
        prev = at
        val nSegs = good(at + 26) & 0xff
        var body = 0
        (0 until nSegs).foreach(i => body += good(at + 27 + i) & 0xff)
        at += 27 + nSegs + body
      }
      prev
    }
    rej(good.take(lastPageAt), "no EOS")
    // a second serial rejects as multiplexed
    val muxed = good.clone()
    muxed(lastPageAt + 14) = (muxed(lastPageAt + 14) ^ 1).toByte
    rej(muxed, "multiplexed")
  }

  test("the Spark ops agree with the plant formulas on a doc sample") {
    val docs = Tables.documents(spark, sf).limit(25)
    val mp3 = AudioContainers.mp3Meta(spark,
      AudioContainers.mp3FromDocuments(spark, docs)).collect()
    val flac = AudioContainers.flacMeta(spark,
      AudioContainers.flacFromDocuments(spark, docs)).collect()
    docs.select("doc_id", "n_chars").as[(Long, Long)].collect().foreach {
      case (id, nc) =>
        val m = mp3.find(_.getLong(0) == id).get
        assert(m.getLong(4) === 40L + nc % 200, s"doc $id frames")
        assert(m.getInt(1) === (if (id % 5 != 0) 1 else 2))
        assert(m.getBoolean(8) === (id % 2 != 0), s"doc $id vbr")
        val f = flac.find(_.getLong(0) == id).get
        assert(f.getInt(1) === 32000 + (id % 3).toInt * 8000)
        assert(f.getString(10) === s"doc$id")
    }
  }
}
