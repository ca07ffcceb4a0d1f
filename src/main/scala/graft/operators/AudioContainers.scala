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
    * `id3_bytes` counts the ID3v2 tag (0 when absent).
    */
  case class Mp3Meta(mpeg_version: Int, sample_rate: Int, channel_mode: String,
                     n_frames: Long, duration_ms: Long, audio_bytes: Long,
                     bitrate_kbps: Long, is_vbr: Boolean, id3_bytes: Long)

  /** Frame byte length for Layer III (the stepping arithmetic). */
  def mp3FrameLen(mpeg1: Boolean, kbps: Int, sampleRate: Int, padding: Boolean): Int =
    (if (mpeg1) 144000 else 72000) * kbps / sampleRate + (if (padding) 1 else 0)

  /** Write one file: optional ID3v2 tag, then `frames` Layer III frames
    * with the given per-frame bitrate INDICES; payload bytes planted
    * deterministic. `mpeg1` picks the version; samplerate index 0.
    */
  def mp3Encode(mpeg1: Boolean, srIdx: Int, bitrateIdx: Int => Int,
                paddingOf: Int => Boolean, channelMode: Int, frames: Int,
                id3Size: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      require(id3Size < (1 << 28), "mp3Encode: id3 size over syncsafe range")
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0) // v2.4.0
      out.write(0)               // flags
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      val body = new Array[Byte](id3Size)
      java.util.Arrays.fill(body, 0x54.toByte)
      out.write(body)
    }
    val sr = (if (mpeg1) SampleRateM1 else SampleRateM2)(srIdx)
    (0 until frames).foreach { f =>
      val bi = bitrateIdx(f)
      require(bi >= 1 && bi <= 14, s"mp3Encode: bitrate index $bi")
      val kbps = (if (mpeg1) BitrateM1 else BitrateM2)(bi)
      val pad = paddingOf(f)
      val len = mp3FrameLen(mpeg1, kbps, sr, pad)
      val h0 = 0xff
      val h1 = 0xe0 | (if (mpeg1) 0x18 else 0x10) | (0x01 << 1) | 0x1 // vers, layer III, no CRC
      val h2 = (bi << 4) | (srIdx << 2) | ((if (pad) 1 else 0) << 1)
      val h3 = (channelMode << 6)
      out.write(h0); out.write(h1); out.write(h2); out.write(h3)
      val body = new Array[Byte](len - 4)
      java.util.Arrays.fill(body, ((f * 31 + 7) & 0x7f).toByte)
      out.write(body)
    }
    out.toByteArray
  }

  /** The frame walk: skip ID3v2, then step frame to frame by the length
    * arithmetic — payload bytes are never read.
    */
  def mp3Parse(payload: Array[Byte]): Mp3Meta = {
    val n = payload.length.toLong
    var at = 0L
    var id3Bytes = 0L
    if (n >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
      val size = ((payload(6) & 0x7fL) << 21) | ((payload(7) & 0x7fL) << 14) |
        ((payload(8) & 0x7fL) << 7) | (payload(9) & 0x7fL)
      id3Bytes = 10L + size
      require(id3Bytes <= n, s"Mp3.parse: ID3v2 tag of $id3Bytes bytes " +
        s"overruns the $n-byte payload")
      at = id3Bytes
    }
    require(at < n, "Mp3.parse: no audio frames after the ID3 tag")
    var mpeg1 = false
    var sampleRate = 0
    var channelMode = -1
    var frames = 0L
    var samplesTotal = 0L
    var audioBytes = 0L
    val seenBitrates = scala.collection.mutable.Set.empty[Int]
    while (at < n) {
      require(at + 4 <= n, s"Mp3.parse: truncated frame header at offset $at")
      require((payload(at.toInt) & 0xff) == 0xff &&
        (payload(at.toInt + 1) & 0xe0) == 0xe0,
        s"Mp3.parse: lost frame sync at offset $at")
      val h1 = payload(at.toInt + 1) & 0xff
      val version = (h1 >> 3) & 0x3
      val layer = (h1 >> 1) & 0x3
      version match {
        case 0x3 => if (frames == 0) mpeg1 = true
          else require(mpeg1, s"Mp3.parse: version change mid-stream at $at")
        case 0x2 => if (frames == 0) mpeg1 = false
          else require(!mpeg1, s"Mp3.parse: version change mid-stream at $at")
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
      val sr = (if (mpeg1) SampleRateM1 else SampleRateM2)(sri)
      if (frames == 0) sampleRate = sr
      else require(sr == sampleRate, s"Mp3.parse: samplerate change mid-stream at $at")
      val cm = (payload(at.toInt + 3) >> 6) & 0x3
      if (frames == 0) channelMode = cm
      val kbps = (if (mpeg1) BitrateM1 else BitrateM2)(bi)
      val len = mp3FrameLen(mpeg1, kbps, sr, ((h2 >> 1) & 0x1) == 1)
      require(at + len <= n,
        s"Mp3.parse: frame of $len bytes at offset $at overruns the $n-byte payload")
      seenBitrates += bi
      frames += 1
      samplesTotal += (if (mpeg1) 1152L else 576L)
      audioBytes += len
      at += len
    }
    val durMs = samplesTotal * 1000L / sampleRate
    Mp3Meta(if (mpeg1) 1 else 2, sampleRate, ChannelModes(channelMode),
      frames, durMs, audioBytes,
      if (durMs == 0) 0L else audioBytes * 8L / durMs,
      seenBitrates.size > 1, id3Bytes)
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
            // field names are case-insensitive per the Vorbis spec
            comments :+= (kv.substring(0, eq).toUpperCase -> kv.substring(eq + 1))
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
  // plant + Spark ops
  // =====================================================================

  /** MP3 plant (spec for the fixture replica): nf = 40 + (nc % 200)
    * frames; MPEG-2 on id%5==0 (else MPEG-1), samplerate index 0
    * (44100 / 22050); CBR at index 9 on even ids, VBR cycling index
    * 5 + 2·((id + f) mod 5) on odd; padding on f%3==0; channel mode
    * id%4; ID3v2 of 57 + id%100 body bytes on id%3==0.
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
          if (id % 3 == 0) 57 + (id % 100).toInt else 0)
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

  def mp3Meta(spark: SparkSession, media: Dataset[Multimodal.MediaItem]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val x = mp3Parse(m.payload)
      (m.media_id, x.mpeg_version, x.sample_rate, x.channel_mode, x.n_frames,
        x.duration_ms, x.audio_bytes, x.bitrate_kbps, x.is_vbr, x.id3_bytes)
    }).toDF("media_id", "mpeg_version", "sample_rate", "channel_mode",
      "n_frames", "duration_ms", "audio_bytes", "bitrate_kbps", "is_vbr",
      "id3_bytes")
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
