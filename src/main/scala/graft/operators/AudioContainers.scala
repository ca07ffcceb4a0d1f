package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** MP3 and FLAC container metadata — the two big audio transports a
  * crawl serves outside MP4. Like the MP4 tier, curation never needs
  * the codec: duration, sample rate, channel layout, bitrate shape
  * (CBR/VBR) and tag metadata all come from headers, and the walk costs
  * header bytes, not audio bytes (FLAC metadata blocks sit before any
  * audio; MP3 frame HEADERS are 4 bytes each, stepped over by the frame
  * length arithmetic without reading payloads).
  *
  * Wire formats from the public specs: ISO 11172-3 / 13818-3 for the
  * MPEG audio frame header (sync, version, layer, bitrate/samplerate
  * tables, padding, channel mode) plus the ID3v2 syncsafe tag header,
  * and the FLAC format spec (fLaC magic, metadata-block framing,
  * STREAMINFO bit layout, Vorbis comments with little-endian lengths
  * inside a big-endian container — the classic trap, pinned by the
  * oracle). Outside the canonical subset rejects LOUDLY BY NAME:
  * MPEG-2.5, Layer I/II, free-format bitrates, reserved indices, lost
  * sync, truncated frames/blocks, and oversized comment counts. All
  * bounds in Long arithmetic.
  *
  * Reference behavior being matched: the reference stores such payloads
  * as opaque blobs; the walk is a pipeline extension per the brief.
  */
object AudioContainers {

  // =====================================================================
  // MP3
  // =====================================================================

  /** MPEG-1/2 Layer III bitrate tables (kbps), index 1..14; 0 is
    * free-format (rejected), 15 reserved (rejected).
    */
  private val BitrateM1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val BitrateM2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160)
  private val SampleRateM1 = Array(44100, 48000, 32000)
  private val SampleRateM2 = Array(22050, 24000, 16000)
  private val ChannelModes = Array("stereo", "joint_stereo", "dual_channel", "mono")

  /** Per-file metadata from the frame walk. `is_vbr` = more than one
    * distinct bitrate index across frames; `bitrate_kbps` is the exact
    * average over audio bytes (total·8 / duration, integer division);
    * `id3_bytes` counts the ID3v2 tag (0 when absent). Wild-data
    * tolerance (the two shapes nearly every real MP3 carries): a
    * trailing 128-byte ID3v1 `TAG` block is skipped (`has_id3v1`), and
    * a leading Xing/Info VBR header frame is recognized (`has_xing`)
    * and EXCLUDED from every audio stat — it carries no audio.
    */
  case class Mp3Meta(mpeg_version: Int, sample_rate: Int, channel_mode: String,
                     n_frames: Long, duration_ms: Long, audio_bytes: Long,
                     bitrate_kbps: Long, is_vbr: Boolean, id3_bytes: Long,
                     has_xing: Boolean, has_id3v1: Boolean,
                     title: String, artist: String)

  /** Frame byte length for Layer III (the stepping arithmetic). */
  def mp3FrameLen(mpeg1: Boolean, kbps: Int, sampleRate: Int, padding: Boolean): Int =
    (if (mpeg1) 144000 else 72000) * kbps / sampleRate + (if (padding) 1 else 0)

  /** Side-info byte count for Layer III — the fixed region between the
    * 4-byte header and the Xing/Info tag position (ISO 11172-3 layout:
    * MPEG-1 stereo 32 / mono 17; MPEG-2 stereo 17 / mono 9).
    */
  def mp3SideInfoLen(mpeg1: Boolean, mono: Boolean): Int =
    if (mpeg1) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }

  /** Write one file: optional ID3v2 tag, optional Xing VBR header frame
    * (a real frame whose payload carries "Xing" at the side-info
    * boundary and NO audio), then `frames` Layer III frames with the
    * given per-frame bitrate INDICES, then an optional ID3v1 `TAG`
    * trailer; payload bytes planted deterministic. `mpeg1` picks the
    * version; samplerate index 0.
    */
  def mp3Encode(mpeg1: Boolean, srIdx: Int, bitrateIdx: Int => Int,
                paddingOf: Int => Boolean, channelMode: Int, frames: Int,
                id3Size: Int, xing: Boolean = false,
                id3v1: Boolean = false,
                id3Frames: Seq[(String, String)] = Nil,
                id3Ver: Int = 4): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      require(id3Size < (1 << 28), "mp3Encode: id3 size over syncsafe range")
      require(id3Ver == 3 || id3Ver == 4, s"mp3Encode: ID3v2.$id3Ver")
      out.write('I'); out.write('D'); out.write('3')
      out.write(id3Ver); out.write(0)
      out.write(0) // flags
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      // real text frames (v2.4: syncsafe sizes + UTF-8 encoding byte 3;
      // v2.3: plain big-endian sizes, frame 0 UTF-16-with-BOM encoding 1,
      // later frames ISO-8859-1 encoding 0), zero-padded to id3Size
      val body = new java.io.ByteArrayOutputStream()
      id3Frames.zipWithIndex.foreach { case ((fid, text), k) =>
        require(fid.length == 4, s"mp3Encode: frame id '$fid'")
        val enc: Int = if (id3Ver == 4) 3 else if (k == 0) 1 else 0
        val tb = enc match {
          case 3 => text.getBytes("UTF-8")
          case 1 => Array[Byte](0xff.toByte, 0xfe.toByte) ++
            text.getBytes("UTF-16LE")
          case _ => text.getBytes("ISO-8859-1")
        }
        val fsz = 1 + tb.length
        body.write(fid.getBytes("US-ASCII"))
        if (id3Ver == 4) {
          body.write((fsz >> 21) & 0x7f); body.write((fsz >> 14) & 0x7f)
          body.write((fsz >> 7) & 0x7f); body.write(fsz & 0x7f)
        } else {
          body.write((fsz >> 24) & 0xff); body.write((fsz >> 16) & 0xff)
          body.write((fsz >> 8) & 0xff); body.write(fsz & 0xff)
        }
        body.write(0); body.write(0) // frame flags
        body.write(enc); body.write(tb)
      }
      val bb = body.toByteArray
      require(bb.length <= id3Size,
        s"mp3Encode: ${bb.length} bytes of frames exceed the $id3Size-byte tag body")
      out.write(bb)
      out.write(new Array[Byte](id3Size - bb.length)) // padding
    }
    val sr = (if (mpeg1) SampleRateM1 else SampleRateM2)(srIdx)
    def writeFrame(bi: Int, pad: Boolean, fill: Byte, tag: Option[String]): Unit = {
      require(bi >= 1 && bi <= 14, s"mp3Encode: bitrate index $bi")
      val kbps = (if (mpeg1) BitrateM1 else BitrateM2)(bi)
      val len = mp3FrameLen(mpeg1, kbps, sr, pad)
      val h0 = 0xff
      val h1 = 0xe0 | (if (mpeg1) 0x18 else 0x10) | (0x01 << 1) | 0x1 // vers, layer III, no CRC
      val h2 = (bi << 4) | (srIdx << 2) | ((if (pad) 1 else 0) << 1)
      val h3 = (channelMode << 6)
      out.write(h0); out.write(h1); out.write(h2); out.write(h3)
      val body = new Array[Byte](len - 4)
      java.util.Arrays.fill(body, fill)
      tag.foreach { t =>
        val off = mp3SideInfoLen(mpeg1, channelMode == 3)
        val tb = t.getBytes("US-ASCII")
        System.arraycopy(tb, 0, body, off, tb.length)
        // 4 flag bytes (frames/bytes/toc/quality all absent): zeros
        java.util.Arrays.fill(body, off + 4, off + 8, 0.toByte)
      }
      out.write(body)
    }
    // Xing header frames are written at the stream bitrate's first index
    // (LAME uses the target bitrate); "Xing" on odd frame counts, the
    // CBR spelling "Info" on even — both must be recognized
    if (xing) writeFrame(bitrateIdx(0), pad = false, 0.toByte,
      Some(if (frames % 2 == 1) "Xing" else "Info"))
    (0 until frames).foreach { f =>
      writeFrame(bitrateIdx(f), paddingOf(f), ((f * 31 + 7) & 0x7f).toByte, None)
    }
    if (id3v1) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      (3 until 128).foreach(i => tag(i) = ((i * 7) & 0x7f).toByte)
      out.write(tag)
    }
    out.toByteArray
  }

  /** The frame walk: skip ID3v2, then step frame to frame by the length
    * arithmetic — payload bytes are never read.
    */
  def mp3Parse(payload: Array[Byte]): Mp3Meta = {
    val n0 = payload.length.toLong
    var at = 0L
    var id3Bytes = 0L
    var title = ""
    var artist = ""
    if (n0 >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
      val size = ((payload(6) & 0x7fL) << 21) | ((payload(7) & 0x7fL) << 14) |
        ((payload(8) & 0x7fL) << 7) | (payload(9) & 0x7fL)
      id3Bytes = 10L + size
      require(id3Bytes <= n0, s"Mp3.parse: ID3v2 tag of $id3Bytes bytes " +
        s"overruns the ${n0}-byte payload")
      // text-frame walk (TIT2/TPE1 → title/artist): v2.3 plain-BE frame
      // sizes, v2.4 syncsafe; stops at the zero-byte padding. v2.2's
      // 3-byte frames and unsynchronised tags reject by name.
      val ver = payload(3) & 0xff
      require(ver == 3 || ver == 4,
        s"Mp3.parse: ID3v2.$ver not supported (v2.3/v2.4 frame layout only)")
      val tflags = payload(5) & 0xff
      require((tflags & 0x80) == 0,
        "Mp3.parse: unsynchronised ID3v2 tag not supported")
      var p = 10L
      if ((tflags & 0x40) != 0) { // extended header: skip by its size
        require(p + 4 <= id3Bytes, "Mp3.parse: truncated ID3v2 extended header")
        val esz =
          if (ver == 4) ((payload(p.toInt) & 0x7fL) << 21) |
            ((payload(p.toInt + 1) & 0x7fL) << 14) |
            ((payload(p.toInt + 2) & 0x7fL) << 7) | (payload(p.toInt + 3) & 0x7fL)
          else 4L + (((payload(p.toInt) & 0xffL) << 24) |
            ((payload(p.toInt + 1) & 0xffL) << 16) |
            ((payload(p.toInt + 2) & 0xffL) << 8) | (payload(p.toInt + 3) & 0xffL))
        require(p + esz <= id3Bytes, "Mp3.parse: ID3v2 extended header overruns the tag")
        p += esz
      }
      var walking = true
      while (walking && p + 10 <= id3Bytes) {
        if (payload(p.toInt) == 0) walking = false // padding
        else {
          val fid = new String(payload, p.toInt, 4, "ISO-8859-1")
          require(fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')),
            s"Mp3.parse: corrupt ID3v2 frame id '$fid' at offset $p")
          val fsz =
            if (ver == 4) ((payload(p.toInt + 4) & 0x7fL) << 21) |
              ((payload(p.toInt + 5) & 0x7fL) << 14) |
              ((payload(p.toInt + 6) & 0x7fL) << 7) | (payload(p.toInt + 7) & 0x7fL)
            else ((payload(p.toInt + 4) & 0xffL) << 24) |
              ((payload(p.toInt + 5) & 0xffL) << 16) |
              ((payload(p.toInt + 6) & 0xffL) << 8) | (payload(p.toInt + 7) & 0xffL)
          require(p + 10 + fsz <= id3Bytes,
            s"Mp3.parse: ID3v2 frame '$fid' of $fsz bytes overruns the tag")
          val fflags = payload(p.toInt + 9) & 0xff
          // compression/encryption flags live in different bits per
          // version: v2.3 puts them at 0x80/0x40 of the format byte,
          // v2.4 at 0x08/0x04 — testing the wrong mask would decode a
          // compressed frame's deflate bytes as "text"
          val skipContent =
            if (ver == 3) (fflags & 0xc0) != 0 else (fflags & 0x0c) != 0
          if (!skipContent && fsz >= 1 && fid.startsWith("T") && fid != "TXXX") {
            // v2.4 per-frame unsynchronisation (0x02): 0xFF 00 → 0xFF;
            // data-length indicator (0x01): a 4-byte syncsafe prefix
            // before the content — both are layout, not payload, so
            // handle rather than skip
            val rawG = java.util.Arrays.copyOfRange(payload,
              p.toInt + 10, (p + 10 + fsz).toInt)
            // grouping (v2.3: 0x20, v2.4: 0x40) prefixes one group-id
            // byte to the content — strip it or it lands on the
            // encoding-byte position
            val grouped = if (ver == 3) (fflags & 0x20) != 0
                          else (fflags & 0x40) != 0
            val raw0 =
              if (grouped) {
                require(rawG.length >= 1,
                  s"Mp3.parse: ID3v2 frame '$fid' too short for its " +
                    "group-id byte")
                java.util.Arrays.copyOfRange(rawG, 1, rawG.length)
              } else rawG
            val raw1 =
              if (ver == 4 && (fflags & 0x01) != 0) {
                require(raw0.length >= 4,
                  s"Mp3.parse: ID3v2.4 frame '$fid' too short for its " +
                    "data-length indicator")
                java.util.Arrays.copyOfRange(raw0, 4, raw0.length)
              } else raw0
            val raw =
              if (ver == 4 && (fflags & 0x02) != 0) {
                val out = new java.io.ByteArrayOutputStream(raw1.length)
                var i = 0
                while (i < raw1.length) {
                  out.write(raw1(i))
                  if ((raw1(i) & 0xff) == 0xff && i + 1 < raw1.length &&
                    raw1(i + 1) == 0) i += 2
                  else i += 1
                }
                out.toByteArray
              } else raw1
            require(raw.length >= 1,
              s"Mp3.parse: ID3v2 text frame '$fid' with no encoding byte")
            val enc = raw(0) & 0xff
            val tb = java.util.Arrays.copyOfRange(raw, 1, raw.length)
            val text = (enc match {
              case 0 => new String(tb, "ISO-8859-1")
              case 1 => new String(tb, "UTF-16") // BOM-routed
              case 2 => new String(tb, "UTF-16BE")
              case 3 => new String(tb, "UTF-8")
              case other => throw new IllegalArgumentException(
                s"Mp3.parse: ID3v2 text encoding $other (0..3)")
            }).takeWhile(_ != '\u0000') // strip the optional NUL terminator
            fid match {
              case "TIT2" => title = text
              case "TPE1" => artist = text
              case _ => ()
            }
          }
          p += 10 + fsz
        }
      }
      at = id3Bytes
    }
    // a trailing 128-byte ID3v1 'TAG' block (present on a huge share of
    // real MP3s) is metadata, not a lost frame — stop the walk before it
    val hasId3v1 = n0 - at >= 128 && payload((n0 - 128).toInt) == 'T' &&
      payload((n0 - 127).toInt) == 'A' && payload((n0 - 126).toInt) == 'G'
    val n = if (hasId3v1) n0 - 128 else n0
    require(at < n, "Mp3.parse: no audio frames after the ID3 tag")
    var mpeg1 = false
    var sampleRate = 0
    var channelMode = -1
    var frames = 0L
    var samplesTotal = 0L
    var audioBytes = 0L
    var hasXing = false
    var firstFrame = true
    val seenBitrates = scala.collection.mutable.Set.empty[Int]
    while (at < n) {
      require(at + 4 <= n, s"Mp3.parse: truncated frame header at offset $at")
      require((payload(at.toInt) & 0xff) == 0xff &&
        (payload(at.toInt + 1) & 0xe0) == 0xe0,
        s"Mp3.parse: lost frame sync at offset $at")
      val h1 = payload(at.toInt + 1) & 0xff
      val version = (h1 >> 3) & 0x3
      val layer = (h1 >> 1) & 0x3
      val isMpeg1 = version match {
        case 0x3 => true
        case 0x2 => false
        case 0x0 => throw new IllegalArgumentException(
          "Mp3.parse: MPEG-2.5 not supported (MPEG-1/2 Layer III only)")
        case _ => throw new IllegalArgumentException(
          s"Mp3.parse: reserved MPEG version at offset $at")
      }
      require(layer == 0x1,
        s"Mp3.parse: layer ${4 - layer} not supported (Layer III only)")
      val h2 = payload(at.toInt + 2) & 0xff
      val bi = (h2 >> 4) & 0xf
      require(bi >= 1 && bi <= 14,
        if (bi == 0) "Mp3.parse: free-format bitrate not supported"
        else s"Mp3.parse: reserved bitrate index at offset $at")
      val sri = (h2 >> 2) & 0x3
      require(sri <= 2, s"Mp3.parse: reserved samplerate index at offset $at")
      val sr = (if (isMpeg1) SampleRateM1 else SampleRateM2)(sri)
      val cm = (payload(at.toInt + 3) >> 6) & 0x3
      val kbps = (if (isMpeg1) BitrateM1 else BitrateM2)(bi)
      val len = mp3FrameLen(isMpeg1, kbps, sr, ((h2 >> 1) & 0x1) == 1)
      require(at + len <= n,
        s"Mp3.parse: frame of $len bytes at offset $at overruns the $n-byte payload")
      // a LEADING Xing/Info VBR header frame carries no audio: recognize
      // it by the tag at the side-info boundary and exclude it from every
      // stat (counting it skews duration and bitrate)
      val tagAt = at + 4 + mp3SideInfoLen(isMpeg1, cm == 3)
      val isXing = firstFrame && tagAt + 4 <= n && {
        val t = new String(payload, tagAt.toInt, 4, "US-ASCII")
        t == "Xing" || t == "Info"
      }
      firstFrame = false
      if (isXing) hasXing = true
      else {
        if (frames == 0) { mpeg1 = isMpeg1; sampleRate = sr; channelMode = cm }
        else {
          require(isMpeg1 == mpeg1, s"Mp3.parse: version change mid-stream at $at")
          require(sr == sampleRate, s"Mp3.parse: samplerate change mid-stream at $at")
        }
        seenBitrates += bi
        frames += 1
        samplesTotal += (if (isMpeg1) 1152L else 576L)
        audioBytes += len
      }
      at += len
    }
    require(frames > 0, "Mp3.parse: no audio frames (Xing header only)")
    val durMs = samplesTotal * 1000L / sampleRate
    Mp3Meta(if (mpeg1) 1 else 2, sampleRate, ChannelModes(channelMode),
      frames, durMs, audioBytes,
      if (durMs == 0) 0L else audioBytes * 8L / durMs,
      seenBitrates.size > 1, id3Bytes, hasXing, hasId3v1, title, artist)
  }

  // =====================================================================
  // FLAC
  // =====================================================================

  /** STREAMINFO + tags. `duration_ms` = total_samples·1000/sample_rate
    * (integer division). `title`/`artist` come from the Vorbis comments
    * (empty string when the tag is absent).
    */
  case class FlacMeta(sample_rate: Int, channels: Int, bits_per_sample: Int,
                      total_samples: Long, duration_ms: Long,
                      min_block: Int, max_block: Int,
                      n_comments: Int, vendor: String,
                      title: String, artist: String)

  /** Write one FLAC header stack: fLaC magic, STREAMINFO, VORBIS_COMMENT,
    * PADDING (marked last), then `audioBytes` planted opaque frame bytes.
    */
  def flacEncode(sampleRate: Int, channels: Int, bps: Int, totalSamples: Long,
                 vendor: String, comments: Seq[(String, String)],
                 audioBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: 34 bytes
    val si = new Array[Byte](34)
    def be16At(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = (v >> 8).toByte; a(off + 1) = v.toByte
    }
    be16At(si, 0, 4096); be16At(si, 2, 4096) // min/max block size
    // min/max frame size (24-bit): planted constants
    si(4) = 0; si(5) = 0x12; si(6) = 0x34
    si(7) = 0; si(8) = 0x56; si(9) = 0x78
    // 20 bits samplerate, 3 bits channels-1, 5 bits bps-1, 36 bits samples
    val packed: Long = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | (totalSamples & ((1L << 36) - 1))
    (0 until 8).foreach(i => si(10 + i) = (packed >> (56 - 8 * i)).toByte)
    // MD5: planted deterministic bytes
    (0 until 16).foreach(i => si(18 + i) = ((i * 17 + channels) & 0xff).toByte)
    out.write(0x00) // type 0, not last
    out.write(0); out.write(0); out.write(34)
    out.write(si)
    // VORBIS_COMMENT (type 4): little-endian lengths inside the
    // big-endian container — the spec's classic trap
    val vc = new java.io.ByteArrayOutputStream()
    def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    val vb = vendor.getBytes("UTF-8")
    le32(vc, vb.length); vc.write(vb)
    le32(vc, comments.length)
    comments.foreach { case (k, v) =>
      val kv = s"$k=$v".getBytes("UTF-8")
      le32(vc, kv.length); vc.write(kv)
    }
    val vcb = vc.toByteArray
    out.write(0x04)
    out.write((vcb.length >> 16) & 0xff); out.write((vcb.length >> 8) & 0xff)
    out.write(vcb.length & 0xff)
    out.write(vcb)
    // PADDING, last-flag set
    out.write(0x81)
    out.write(0); out.write(0); out.write(4)
    out.write(new Array[Byte](4))
    val audio = new Array[Byte](audioBytes)
    java.util.Arrays.fill(audio, 0x3c.toByte)
    out.write(audio)
    out.toByteArray
  }

  def flacParse(payload: Array[Byte]): FlacMeta = {
    val n = payload.length.toLong
    require(n >= 42 && new String(payload, 0, 4, "US-ASCII") == "fLaC",
      s"Flac.parse: no fLaC magic in $n bytes")
    var at = 4L
    var last = false
    var si: Option[(Int, Int, Int, Int, Long, Int)] = None
    var vendor = ""
    var comments = Vector.empty[(String, String)]
    while (!last) {
      require(at + 4 <= n, s"Flac.parse: truncated block header at offset $at")
      val h = payload(at.toInt) & 0xff
      last = (h & 0x80) != 0
      val tpe = h & 0x7f
      val len = ((payload(at.toInt + 1) & 0xffL) << 16) |
        ((payload(at.toInt + 2) & 0xffL) << 8) | (payload(at.toInt + 3) & 0xffL)
      require(at + 4 + len <= n,
        s"Flac.parse: metadata block of $len bytes at $at overruns the payload")
      val body = at + 4
      tpe match {
        case 0 =>
          require(len == 34, s"Flac.parse: STREAMINFO of $len bytes (want 34)")
          val minB = ((payload(body.toInt) & 0xff) << 8) | (payload(body.toInt + 1) & 0xff)
          val maxB = ((payload(body.toInt + 2) & 0xff) << 8) | (payload(body.toInt + 3) & 0xff)
          var packed = 0L
          (0 until 8).foreach(i => packed = (packed << 8) | (payload(body.toInt + 10 + i) & 0xffL))
          val sr = (packed >>> 44).toInt
          val ch = ((packed >> 41) & 0x7).toInt + 1
          val bps = ((packed >> 36) & 0x1f).toInt + 1
          val total = packed & ((1L << 36) - 1)
          require(sr > 0, "Flac.parse: STREAMINFO sample rate 0")
          si = Some((minB, maxB, sr, ch, total, bps))
        case 4 =>
          var p = body
          def le32v(): Long = {
            val v = (payload(p.toInt) & 0xffL) | ((payload(p.toInt + 1) & 0xffL) << 8) |
              ((payload(p.toInt + 2) & 0xffL) << 16) | ((payload(p.toInt + 3) & 0xffL) << 24)
            p += 4; v
          }
          val vlen = le32v()
          require(p + vlen <= body + len, "Flac.parse: vendor string overruns the comment block")
          vendor = new String(payload, p.toInt, vlen.toInt, "UTF-8"); p += vlen
          val count = le32v()
          require(count <= 10000, s"Flac.parse: $count comments (cap 10000)")
          (0L until count).foreach { _ =>
            val clen = le32v()
            require(p + clen <= body + len, "Flac.parse: comment overruns the block")
            val kv = new String(payload, p.toInt, clen.toInt, "UTF-8"); p += clen
            val eq = kv.indexOf('=')
            require(eq > 0, s"Flac.parse: comment without '=': '$kv'")
            // field names are case-insensitive per the Vorbis spec;
            // Locale.ROOT so a Turkish-locale JVM can't fold "title" to
            // "TİTLE" and silently lose the tag
            comments :+= (kv.substring(0, eq)
              .toUpperCase(java.util.Locale.ROOT) -> kv.substring(eq + 1))
          }
        case t =>
          require(t != 127, "Flac.parse: invalid metadata block type 127")
          () // PADDING/SEEKTABLE/etc: skipped per spec
      }
      at = body + len
    }
    val (minB, maxB, sr, ch, total, bps) = si.getOrElse(
      throw new IllegalArgumentException("Flac.parse: no STREAMINFO block " +
        "(the spec requires it first)"))
    FlacMeta(sr, ch, bps, total, total * 1000L / sr, minB, maxB,
      comments.length, vendor,
      comments.collectFirst { case ("TITLE", v) => v }.getOrElse(""),
      comments.collectFirst { case ("ARTIST", v) => v }.getOrElse(""))
  }

  // =====================================================================
  // Ogg (Opus / Vorbis) — the remaining major audio transport
  // =====================================================================

  /** Identification + comment headers and the granule arithmetic.
    * `sample_rate` is the media rate (Vorbis) or the declared input
    * rate (Opus — whose granule clock is ALWAYS 48 kHz, the spec's
    * trap: duration divides by 48000 regardless of input rate).
    */
  case class OggMeta(codec: String, channels: Int, sample_rate: Int,
                     duration_ms: Long, n_pages: Long,
                     n_comments: Int, vendor: String,
                     title: String, artist: String)

  /** Ogg page CRC-32: polynomial 0x04c11db7, UNreflected, init 0, no
    * final xor (RFC 3533 §6) — not the zlib CRC, so the JDK's CRC32
    * cannot stand in.
    */
  private val OggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = (r << 1) ^ (if ((r & 0x80000000) != 0) 0x04c11db7 else 0); j += 1
      }
      t(i) = r; i += 1
    }
    t
  }
  private def oggCrc(page: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < page.length) {
      // the CRC field itself (bytes 22..25) reads as zeros
      val b = if (i >= 22 && i < 26) 0 else page(i) & 0xff
      crc = (crc << 8) ^ OggCrcTable(((crc >>> 24) ^ b) & 0xff)
      i += 1
    }
    crc
  }

  private def wle16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def wle32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def wle64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    wle32(o, v & 0xffffffffL); wle32(o, (v >>> 32) & 0xffffffffL)
  }

  /** Write one Ogg page (header + CRC + body). `packets` become the
    * lacing run: each splits into 255-byte segments with a final
    * short segment (a multiple-of-255 packet gets its 0 terminator).
    */
  private def oggPage(headerType: Int, granule: Long, serial: Long,
                      seq: Long, packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = packets.flatMap { p =>
      val full = Array.fill(p.length / 255)(255)
      full.toSeq :+ (p.length % 255)
    }
    require(lacing.length <= 255, s"oggPage: ${lacing.length} segments (max 255)")
    val o = new java.io.ByteArrayOutputStream()
    o.write("OggS".getBytes("US-ASCII")); o.write(0) // version 0
    o.write(headerType)
    wle64(o, granule); wle32(o, serial); wle32(o, seq)
    wle32(o, 0L) // CRC placeholder
    o.write(lacing.length)
    lacing.foreach(o.write)
    packets.foreach(p => o.write(p))
    val page = o.toByteArray
    val crc = oggCrc(page)
    page(22) = (crc & 0xff).toByte; page(23) = ((crc >> 8) & 0xff).toByte
    page(24) = ((crc >> 16) & 0xff).toByte; page(25) = ((crc >> 24) & 0xff).toByte
    page
  }

  /** Write one Ogg Opus/Vorbis stream: BOS page with the identification
    * header, a comment page, then `audioPages` pages of planted packet
    * bytes whose granules step evenly to `totalSamples` (+preskip for
    * Opus), EOS on the last.
    */
  def oggEncode(opus: Boolean, channels: Int, sampleRate: Int,
                totalSamples: Long, vendor: String,
                comments: Seq[(String, String)], audioPages: Int): Array[Byte] = {
    require(audioPages >= 1, "oggEncode: need at least one audio page")
    val preskip = 312
    val idPacket = {
      val o = new java.io.ByteArrayOutputStream()
      if (opus) {
        o.write("OpusHead".getBytes("US-ASCII"))
        o.write(1); o.write(channels)
        wle16(o, preskip); wle32(o, sampleRate.toLong)
        wle16(o, 0); o.write(0) // gain, mapping family 0
      } else {
        o.write(0x01); o.write("vorbis".getBytes("US-ASCII"))
        wle32(o, 0L); o.write(channels); wle32(o, sampleRate.toLong)
        wle32(o, 0L); wle32(o, 0L); wle32(o, 0L) // bitrates
        o.write(0xB8) // blocksizes (2^8 / 2^11)
        o.write(0x01) // framing bit
      }
      o.toByteArray
    }
    val commentPacket = {
      val o = new java.io.ByteArrayOutputStream()
      if (opus) o.write("OpusTags".getBytes("US-ASCII"))
      else { o.write(0x03); o.write("vorbis".getBytes("US-ASCII")) }
      val vb = vendor.getBytes("UTF-8")
      wle32(o, vb.length.toLong); o.write(vb)
      wle32(o, comments.length.toLong)
      comments.foreach { case (k, v) =>
        val kv = s"$k=$v".getBytes("UTF-8")
        wle32(o, kv.length.toLong); o.write(kv)
      }
      if (!opus) o.write(0x01) // framing bit
      o.toByteArray
    }
    val serial = 0x6772616cL // deterministic
    val out = new java.io.ByteArrayOutputStream()
    out.write(oggPage(0x02, if (opus) 0L else 0L, serial, 0, Seq(idPacket)))
    out.write(oggPage(0x00, if (opus) 0L else 0L, serial, 1, Seq(commentPacket)))
    val granuleEnd = if (opus) preskip.toLong + totalSamples else totalSamples
    (0 until audioPages).foreach { k =>
      val granule = granuleEnd * (k + 1) / audioPages
      val body = new Array[Byte](40 + (k * 13) % 90)
      java.util.Arrays.fill(body, ((k * 29 + 5) & 0x7f).toByte)
      val ht = if (k == audioPages - 1) 0x04 else 0x00
      out.write(oggPage(ht, granule, serial, 2L + k, Seq(body)))
    }
    out.toByteArray
  }

  /** The page walk: capture pattern + CRC verified per page, single
    * logical stream only, identification + comment headers parsed from
    * the first two pages, duration from the final granule position.
    * Audio packet bytes are never interpreted — header-bytes cost only.
    */
  def oggParse(payload: Array[Byte]): OggMeta = {
    val n = payload.length
    require(n >= 28 + 19, s"Ogg.parse: $n bytes is smaller than a BOS page")
    var at = 0
    var pageIdx = 0L
    var serial = -1L
    var lastGranule = -1L
    var sawEos = false
    val headerPackets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (at < n) {
      require(!sawEos, s"Ogg.parse: page after the EOS page at offset $at " +
        "(chained streams not supported)")
      require(at + 27 <= n, s"Ogg.parse: truncated page header at offset $at")
      require(new String(payload, at, 4, "US-ASCII") == "OggS",
        s"Ogg.parse: lost capture pattern at offset $at")
      require(payload(at + 4) == 0, s"Ogg.parse: stream structure version " +
        s"${payload(at + 4)} (0 only)")
      val headerType = payload(at + 5) & 0xff
      var granule = 0L
      (0 until 8).foreach(i => granule |= (payload(at + 6 + i) & 0xffL) << (8 * i))
      var ser = 0L
      (0 until 4).foreach(i => ser |= (payload(at + 14 + i) & 0xffL) << (8 * i))
      if (pageIdx == 0) {
        require((headerType & 0x02) != 0, "Ogg.parse: first page is not BOS")
        serial = ser
      } else require(ser == serial,
        "Ogg.parse: multiplexed/grouped streams not supported (one serial only)")
      val nSegs = payload(at + 26) & 0xff
      require(at + 27 + nSegs <= n, s"Ogg.parse: truncated segment table at $at")
      var bodyLen = 0
      (0 until nSegs).foreach(i => bodyLen += payload(at + 27 + i) & 0xff)
      val pageLen = 27 + nSegs + bodyLen
      require(at + pageLen <= n,
        s"Ogg.parse: page of $pageLen bytes at offset $at overruns the payload")
      val page = java.util.Arrays.copyOfRange(payload, at, at + pageLen)
      val stored = (page(22) & 0xffL) | ((page(23) & 0xffL) << 8) |
        ((page(24) & 0xffL) << 16) | ((page(25) & 0xffL) << 24)
      require((oggCrc(page) & 0xffffffffL) == stored,
        s"Ogg.parse: page CRC mismatch at offset $at (corrupt page)")
      // the two header packets come whole from the first two pages
      // (canonical subset: header packets that span pages reject)
      if (pageIdx < 2) {
        require((headerType & 0x01) == 0,
          "Ogg.parse: header packet continued across pages not supported")
        var p = at + 27 + nSegs
        var seg = 0
        var packet = new java.io.ByteArrayOutputStream()
        while (seg < nSegs) {
          val l = payload(at + 27 + seg) & 0xff
          packet.write(payload, p, l)
          p += l
          if (l < 255) {
            headerPackets += packet.toByteArray
            packet = new java.io.ByteArrayOutputStream()
          }
          seg += 1
        }
        require(packet.size() == 0,
          "Ogg.parse: header packet continued across pages not supported")
      }
      if (granule != -1L) lastGranule = granule
      if ((headerType & 0x04) != 0) sawEos = true
      pageIdx += 1
      at += pageLen
    }
    require(sawEos, "Ogg.parse: no EOS page (truncated stream)")
    require(headerPackets.length >= 2,
      s"Ogg.parse: ${headerPackets.length} header packet(s), need " +
        "identification + comment")
    val id = headerPackets(0)
    def sub(b: Array[Byte], from: Int, len: Int) = new String(b, from, len, "US-ASCII")
    def le16at(b: Array[Byte], i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32at(b: Array[Byte], i: Int) = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    val (codec, channels, rate, preskip) =
      if (id.length >= 19 && sub(id, 0, 8) == "OpusHead") {
        require(id(8) == 1, s"Ogg.parse: OpusHead version ${id(8)} (1 only)")
        ("opus", id(9) & 0xff, le32at(id, 12).toInt, le16at(id, 10))
      } else if (id.length >= 30 && id(0) == 0x01 && sub(id, 1, 6) == "vorbis") {
        require(le32at(id, 7) == 0L, "Ogg.parse: vorbis version != 0")
        ("vorbis", id(11) & 0xff, le32at(id, 12).toInt, 0)
      } else throw new IllegalArgumentException(
        "Ogg.parse: unknown identification header (Opus/Vorbis only — " +
          "Theora/Speex/FLAC-in-Ogg reject)")
    require(rate > 0, s"Ogg.parse: $codec sample rate 0")
    val cm = headerPackets(1)
    val cmOff =
      if (codec == "opus") {
        require(cm.length >= 8 && sub(cm, 0, 8) == "OpusTags",
          "Ogg.parse: second packet is not OpusTags")
        8
      } else {
        require(cm.length >= 7 && cm(0) == 0x03 && sub(cm, 1, 6) == "vorbis",
          "Ogg.parse: second packet is not a vorbis comment header")
        7
      }
    var p = cmOff
    def take32(): Long = { val v = le32at(cm, p); p += 4; v }
    val vlen = take32()
    require(p + vlen <= cm.length, "Ogg.parse: vendor string overruns the comment header")
    val vendor = new String(cm, p, vlen.toInt, "UTF-8"); p += vlen.toInt
    val count = take32()
    require(count <= 10000, s"Ogg.parse: $count comments (cap 10000)")
    var comments = Vector.empty[(String, String)]
    (0L until count).foreach { _ =>
      val clen = take32()
      require(p + clen <= cm.length, "Ogg.parse: comment overruns the header")
      val kv = new String(cm, p, clen.toInt, "UTF-8"); p += clen.toInt
      val eq = kv.indexOf('=')
      require(eq > 0, s"Ogg.parse: comment without '=': '$kv'")
      comments :+= (kv.substring(0, eq)
        .toUpperCase(java.util.Locale.ROOT) -> kv.substring(eq + 1))
    }
    require(lastGranule >= 0, "Ogg.parse: no granule position in the stream")
    // Opus granules tick at 48 kHz no matter the input rate, and the
    // preskip samples are decoder warm-up, not audio
    val durMs =
      if (codec == "opus") math.max(0L, lastGranule - preskip) * 1000L / 48000L
      else lastGranule * 1000L / rate
    OggMeta(codec, channels, rate, durMs, pageIdx,
      comments.length, vendor,
      comments.collectFirst { case ("TITLE", v) => v }.getOrElse(""),
      comments.collectFirst { case ("ARTIST", v) => v }.getOrElse(""))
  }

  // =====================================================================
  // plant + Spark ops
  // =====================================================================

  /** MP3 plant (spec for the fixture replica): nf = 40 + (nc % 200)
    * frames; MPEG-2 on id%5==0 (else MPEG-1), samplerate index 0
    * (44100 / 22050); CBR at index 9 on even ids, VBR cycling index
    * 5 + 2·((id + f) mod 5) on odd; padding on f%3==0; channel mode
    * id%4; ID3v2 of 57 + id%100 body bytes on id%3==0, carrying real
    * text frames TIT2=song<id>, TPE1=band<id%8> — as ID3v2.3 (plain-BE
    * sizes, UTF-16-BOM + ISO encodings) on id%6==0, ID3v2.4 (syncsafe
    * sizes, UTF-8) otherwise. Wild-data shapes: a leading Xing/Info VBR
    * header frame on id%4==1 ("Xing" when nf is odd, "Info" when even)
    * and a trailing 128-byte ID3v1 TAG block on id%6==2 — both must be
    * recognized and EXCLUDED from the audio stats.
    */
  def mp3FromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Multimodal.MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions(_.map { case (id, nc) =>
        val nf = 40 + (math.max(nc, 0) % 200)
        val mpeg1 = id % 5 != 0
        val payload = mp3Encode(mpeg1, 0,
          f => if (id % 2 == 0) 9 else 5 + 2 * ((id + f) % 5).toInt,
          f => f % 3 == 0, (id % 4).toInt, nf,
          if (id % 3 == 0) 57 + (id % 100).toInt else 0,
          xing = id % 4 == 1, id3v1 = id % 6 == 2,
          id3Frames = if (id % 3 == 0)
            Seq("TIT2" -> s"song$id", "TPE1" -> s"band${id % 8}") else Nil,
          id3Ver = if (id % 6 == 0) 3 else 4)
        Multimodal.MediaItem(id, s"mp3/${id % 3}", payload, 0, 0, nf,
          if (mpeg1) 44100 else 22050)
      })
  }

  /** FLAC plant: samplerate 32000 + (id%3)·8000, channels 1 + id%2,
    * bps 24 on id%3==0 else 16, total samples 100000 + nc·31, vendor
    * "graft-flac", tags TITLE=doc<id>, ARTIST=corpus<id%7>, plus
    * GENRE=g<id%4> on id%2==0.
    */
  def flacFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Multimodal.MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions(_.map { case (id, nc) =>
        val sr = 32000 + (id % 3).toInt * 8000
        val tags = Seq("TITLE" -> s"doc$id", "ARTIST" -> s"corpus${id % 7}") ++
          (if (id % 2 == 0) Seq("GENRE" -> s"g${id % 4}") else Nil)
        val payload = flacEncode(sr, 1 + (id % 2).toInt,
          if (id % 3 == 0) 24 else 16, 100000L + math.max(nc, 0).toLong * 31,
          "graft-flac", tags, 64 + (id % 37).toInt)
        Multimodal.MediaItem(id, s"flac/${id % 3}", payload, 0, 0, 0, sr)
      })
  }

  /** Ogg plant: Opus on even ids, Vorbis on odd; channels 1 + id%2;
    * sample rate 48000/44100/32000 by id%3 (the Opus input rate — its
    * granule clock stays 48 kHz); total samples 96000 + nc·17; vendor
    * "graft-ogg"; tags TITLE=doc<id>, ARTIST=corpus<id%5>, plus
    * ENCODER=enc<id%3> on id%3==0; 3 + id%4 audio pages.
    */
  def oggFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Multimodal.MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions(_.map { case (id, nc) =>
        val sr = Array(48000, 44100, 32000)((id % 3).toInt)
        val tags = Seq("TITLE" -> s"doc$id", "ARTIST" -> s"corpus${id % 5}") ++
          (if (id % 3 == 0) Seq("ENCODER" -> s"enc${id % 3}") else Nil)
        val payload = oggEncode(opus = id % 2 == 0, 1 + (id % 2).toInt, sr,
          96000L + math.max(nc, 0).toLong * 17, "graft-ogg", tags,
          3 + (id % 4).toInt)
        Multimodal.MediaItem(id, s"ogg/${id % 3}", payload, 0, 0, 0, sr)
      })
  }

  def oggMeta(spark: SparkSession, media: Dataset[Multimodal.MediaItem]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val x = oggParse(m.payload)
      (m.media_id, x.codec, x.channels, x.sample_rate, x.duration_ms,
        x.n_pages, x.n_comments, x.vendor, x.title, x.artist)
    }).toDF("media_id", "codec", "channels", "sample_rate", "duration_ms",
      "n_pages", "n_comments", "vendor", "title", "artist")
  }

  def mp3Meta(spark: SparkSession, media: Dataset[Multimodal.MediaItem]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val x = mp3Parse(m.payload)
      (m.media_id, x.mpeg_version, x.sample_rate, x.channel_mode, x.n_frames,
        x.duration_ms, x.audio_bytes, x.bitrate_kbps, x.is_vbr, x.id3_bytes,
        x.has_xing, x.has_id3v1, x.title, x.artist)
    }).toDF("media_id", "mpeg_version", "sample_rate", "channel_mode",
      "n_frames", "duration_ms", "audio_bytes", "bitrate_kbps", "is_vbr",
      "id3_bytes", "has_xing", "has_id3v1", "title", "artist")
  }

  def flacMeta(spark: SparkSession, media: Dataset[Multimodal.MediaItem]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val x = flacParse(m.payload)
      (m.media_id, x.sample_rate, x.channels, x.bits_per_sample,
        x.total_samples, x.duration_ms, x.min_block, x.max_block,
        x.n_comments, x.vendor, x.title, x.artist)
    }).toDF("media_id", "sample_rate", "channels", "bits_per_sample",
      "total_samples", "duration_ms", "min_block", "max_block",
      "n_comments", "vendor", "title", "artist")
  }
}
