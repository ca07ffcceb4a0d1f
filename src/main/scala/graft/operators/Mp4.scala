package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** MP4 / ISO-BMFF (ISO/IEC 14496-12) container tier — the box walk a
  * video-curation pipeline runs BEFORE deciding whether a clip is worth
  * decoding. A real crawl's video is overwhelmingly MP4, and most
  * curation never needs the codec: duration gates, resolution gates,
  * codec routing, bitrate caps and near-dup blocking keys all come from
  * `moov` metadata — a few KB of the file — while the `mdat` payload
  * (the expensive 99.9%) stays untouched. Full H.264/AAC decode is out
  * of pure-JVM scope by design; this tier is the CONTAINER discipline:
  * size+fourcc box framing (with 64-bit `largesize` and version-1 full
  * boxes), the moov→trak→mdia→minf→stbl descent, and the
  * stts/stsc/stsz/stco/co64/stss sample-table arithmetic that maps
  * sample index → (chunk, file offset, size, timestamp, sync flag).
  *
  * Determinism contract: the walk is pure integer arithmetic over
  * big-endian fields — no floats anywhere — so parse results are
  * bit-stable across JVMs. All box sizes and offsets are validated in
  * Long arithmetic (a crafted 32-bit size cannot wrap a bounds check);
  * anything outside the canonical subset rejects loudly BY NAME
  * (truncated box, missing moov/stbl, sample-count mismatches, chunk
  * data overrunning the payload). Unknown box TYPES are skipped — that
  * is spec behavior (14496-12 §4.2: readers ignore boxes they don't
  * recognize), not leniency.
  *
  * Reference behavior being matched: the reference stores such payloads
  * as opaque blobs (`serializers/BytesSerializer.java`); the MP4 walk is
  * a pipeline extension per the brief, wire format from the public
  * ISO/IEC 14496-12 spec.
  */
object Mp4 {

  /** One parsed track's container-level metadata. `n_sync` counts the
    * stss entries when the box is present; absent stss means EVERY
    * sample is a random-access point (spec), so n_sync = n_samples.
    * `duration_ms` is media duration scaled by the MEDIA timescale
    * (integer division toward zero — pinned, the replica must match).
    */
  case class Track(track_id: Long, handler: String, codec: String,
                   width: Int, height: Int, channels: Int, sample_rate: Int,
                   timescale: Long, duration: Long,
                   n_samples: Long, n_chunks: Long, n_sync: Long,
                   total_bytes: Long) {
    def durationMs: Long = if (timescale == 0) 0L else duration * 1000L / timescale
  }

  /** Whole-container metadata: ftyp major brand, movie-level timescale /
    * duration (mvhd), and the per-track rows.
    */
  case class Meta(brand: String, timescale: Long, duration: Long,
                  tracks: Seq[Track])

  /** One expanded sample-table row. `rel_offset` is the sample's file
    * offset minus the container's FIRST chunk offset (across all
    * tracks) — relative so the number reflects mdat layout, not the
    * incidental header size in front of it. `dts` is in the track's
    * media timescale (sum of preceding stts deltas).
    */
  case class SampleRow(track_id: Long, sample_idx: Long, chunk_idx: Long,
                       rel_offset: Long, size: Long, dts: Long,
                       is_sync: Boolean)

  // ---------------------------------------------------------------------
  // encode — the planted-fixture writer (ftyp, mdat, moov trailing so
  // chunk offsets are known when stco is written)
  // ---------------------------------------------------------------------

  /** A track to encode: opaque sample payloads plus the sample-table
    * shape. `samplesPerChunkRuns` is the stsc run list as
    * (first_chunk, samples_per_chunk) with 1-based first_chunk;
    * `syncEvery` > 0 writes an stss of samples 1, 1+k, 1+2k, …
    * (1-based, spec numbering); 0 omits stss (all-sync).
    */
  case class TrackSpec(trackId: Long, handler: String, codec: String,
                       width: Int, height: Int, channels: Int,
                       sampleRate: Int, timescale: Long, sampleDelta: Long,
                       sampleSizes: IndexedSeq[Int],
                       samplesPerChunkRuns: Seq[(Long, Long)],
                       syncEvery: Int)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def fourCC(s: String): Array[Byte] = {
    require(s.length == 4, s"fourCC '$s'"); s.getBytes("US-ASCII")
  }

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ fourCC(tpe) ++ body
  }
  /** size==1 + 64-bit largesize framing (spec §4.2) — the big-file form. */
  private def largeBox(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ fourCC(tpe) ++ be64(payload.length + 16L) ++ payload
  private def fullBox(tpe: String, version: Int, flags: Int,
                      payload: Array[Byte]*): Array[Byte] =
    box(tpe, Array(version.toByte, (flags >> 16).toByte, (flags >> 8).toByte,
      flags.toByte), payload.flatten.toArray)

  /** Expand a track's stsc runs against its sample count into the chunk
    * list: Seq of (samples-in-chunk). Shared by encode and the replica
    * spec — the run arithmetic exists in ONE place.
    */
  def chunksOf(nSamples: Long, runs: Seq[(Long, Long)]): Seq[Long] = {
    require(runs.nonEmpty && runs.head._1 == 1L,
      s"stsc runs must start at chunk 1, got $runs")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var remaining = nSamples
    var i = 0
    var chunk = 1L
    while (remaining > 0) {
      val per = runs(i)._2
      val runEnd = if (i + 1 < runs.length) runs(i + 1)._1 else Long.MaxValue
      require(per > 0, s"stsc run with $per samples per chunk")
      out += math.min(per, remaining)
      remaining -= math.min(per, remaining)
      chunk += 1
      if (chunk >= runEnd && i + 1 < runs.length) i += 1
    }
    out.toSeq
  }

  /** Write one container. Layout: ftyp, mdat (all tracks' samples
    * back-to-back in track order), moov. `use64` plants the version-1
    * mvhd/tkhd/mdhd forms; `useCo64` the 64-bit chunk-offset box;
    * `largeMdat` the size==1 largesize framing — each a real wire form
    * the parser must take, planted per-id so all paths sit inside the
    * oracle gate.
    */
  def encode(tracks: Seq[TrackSpec], movieTimescale: Long,
             use64: Boolean = false, useCo64: Boolean = false,
             largeMdat: Boolean = false,
             sampleByte: (Int, Long) => Byte = (_, _) => 0x5a): Array[Byte] = {
    require(tracks.nonEmpty, "encode: no tracks")
    val ftyp = box("ftyp", fourCC("isom"), be32(512),
      fourCC("isom"), fourCC("iso2"), fourCC("mp41"))
    // mdat payload: track-major, sample order; remember each track's
    // sample absolute offsets as we lay them out
    val mdatHeader = if (largeMdat) 16 else 8
    var cursor = ftyp.length.toLong + mdatHeader
    val mdatBody = new java.io.ByteArrayOutputStream()
    val offsets: Seq[IndexedSeq[Long]] = tracks.zipWithIndex.map { case (t, ti) =>
      t.sampleSizes.zipWithIndex.map { case (sz, si) =>
        val off = cursor
        val b = new Array[Byte](sz)
        java.util.Arrays.fill(b, sampleByte(ti, si.toLong))
        mdatBody.write(b)
        cursor += sz
        off
      }
    }
    val mdatBytes = mdatBody.toByteArray
    val mdat = if (largeMdat) largeBox("mdat", mdatBytes) else box("mdat", mdatBytes)

    def mvhd: Array[Byte] = {
      val dur = tracks.map(t =>
        t.sampleSizes.length.toLong * t.sampleDelta * movieTimescale / t.timescale).max
      val tail = be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++ be32(0) ++ be32(0) ++
        // unity matrix
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
        be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
        Array.fill(6 * 4)(0.toByte) ++ be32(tracks.map(_.trackId).max + 1)
      if (use64)
        fullBox("mvhd", 1, 0, be64(0), be64(0), be32(movieTimescale), be64(dur), tail)
      else
        fullBox("mvhd", 0, 0, be32(0), be32(0), be32(movieTimescale), be32(dur), tail)
    }

    def trak(t: TrackSpec): Array[Byte] = {
      val mediaDur = t.sampleSizes.length.toLong * t.sampleDelta
      val movieDur = mediaDur * movieTimescale / t.timescale
      val tkhdTail = be32(0) ++ be32(0) ++ be16(0) ++ be16(0) ++
        be16(if (t.handler == "soun") 0x0100 else 0) ++ be16(0) ++
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
        be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
        be32(t.width.toLong << 16) ++ be32(t.height.toLong << 16)
      val tkhd = if (use64)
        fullBox("tkhd", 1, 3, be64(0), be64(0), be32(t.trackId), be32(0),
          be64(movieDur), tkhdTail)
      else
        fullBox("tkhd", 0, 3, be32(0), be32(0), be32(t.trackId), be32(0),
          be32(movieDur), tkhdTail)
      val mdhd = if (use64)
        fullBox("mdhd", 1, 0, be64(0), be64(0), be32(t.timescale), be64(mediaDur),
          be16(0x55c4 /* 'und' packed */), be16(0))
      else
        fullBox("mdhd", 0, 0, be32(0), be32(0), be32(t.timescale), be32(mediaDur),
          be16(0x55c4), be16(0))
      val hdlrName = (t.handler match {
        case "vide" => "VideoHandler"; case "soun" => "SoundHandler"
        case other => other + "Handler"
      }) + "\u0000" // NUL-terminated handler name, the common wire form
      val hdlr = fullBox("hdlr", 0, 0, be32(0), fourCC(t.handler),
        be32(0), be32(0), be32(0), hdlrName.getBytes("US-ASCII"))
      val mhd = t.handler match {
        case "vide" => fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
        case "soun" => fullBox("smhd", 0, 0, be16(0), be16(0))
        case _ => fullBox("nmhd", 0, 0)
      }
      val dinf = box("dinf", fullBox("dref", 0, 0, be32(1),
        fullBox("url ", 0, 1))) // self-contained flag
      val sampleEntry = t.handler match {
        case "vide" =>
          // VisualSampleEntry (§12.1.3): 6 reserved + dref idx, then the
          // visual fields; compressorname is a 32-byte Pascal string
          box(t.codec, Array.fill(6)(0.toByte), be16(1),
            be16(0), be16(0), be32(0), be32(0), be32(0),
            be16(t.width), be16(t.height),
            be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
            Array.fill(32)(0.toByte), be16(24), be16(0xffff))
        case "soun" =>
          // AudioSampleEntry (§12.2.3): channelcount, samplesize 16,
          // samplerate as 16.16
          box(t.codec, Array.fill(6)(0.toByte), be16(1),
            be32(0), be32(0), be16(t.channels), be16(16),
            be16(0), be16(0), be32(t.sampleRate.toLong << 16))
        case _ =>
          box(t.codec, Array.fill(6)(0.toByte), be16(1))
      }
      val stsd = fullBox("stsd", 0, 0, be32(1), sampleEntry)
      val n = t.sampleSizes.length
      val stts = fullBox("stts", 0, 0, be32(1), be32(n.toLong), be32(t.sampleDelta))
      val stsc = fullBox("stsc", 0, 0, be32(t.samplesPerChunkRuns.length.toLong),
        t.samplesPerChunkRuns.flatMap { case (first, per) =>
          be32(first) ++ be32(per) ++ be32(1)
        }.toArray)
      val stsz = fullBox("stsz", 0, 0, be32(0), be32(n.toLong),
        t.sampleSizes.flatMap(s => be32(s.toLong)).toArray)
      val chunkSizes = chunksOf(n.toLong, t.samplesPerChunkRuns)
      val ti = tracks.indexWhere(_.trackId == t.trackId)
      val chunkOffsets = {
        var si = 0
        chunkSizes.map { cs =>
          val off = offsets(ti)(si)
          si += cs.toInt
          off
        }
      }
      val stcoBox =
        if (useCo64)
          fullBox("co64", 0, 0, be32(chunkOffsets.length.toLong),
            chunkOffsets.flatMap(be64).toArray)
        else
          fullBox("stco", 0, 0, be32(chunkOffsets.length.toLong),
            chunkOffsets.flatMap(be32).toArray)
      val stss = if (t.syncEvery > 0)
        Some(fullBox("stss", 0, 0,
          be32((0 until n by t.syncEvery).length.toLong),
          (0 until n by t.syncEvery).flatMap(s => be32(s + 1L)).toArray))
      else None
      val stbl = box("stbl",
        (Seq(stsd, stts, stsc, stsz, stcoBox) ++ stss.toSeq): _*)
      val minf = box("minf", mhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      box("trak", tkhd, mdia)
    }

    val moov = box("moov", (mvhd +: tracks.map(trak)): _*)
    ftyp ++ mdat ++ moov
  }

  /** Write a FRAGMENTED container (fMP4 — the DASH/CMAF layout streaming
    * video actually ships): ftyp, moov with EMPTY sample tables + mvex
    * (mehd movie duration, trex per-track defaults), then one
    * (moof, mdat) pair per `fragSamples`-sample run per track. The
    * planted trun shapes cover the real spectrum:
    *  - video: per-sample sizes in trun, duration from the tfhd default,
    *    first-sample-flags marking the fragment's leading keyframe sync
    *    while trex default flags mark the rest non-sync (the classic
    *    closed-GOP segment shape);
    *  - audio: size/duration/flags all from trex defaults (uniform
    *    packets, all sync) — the trun carries only a count + offset.
    */
  def encodeFragmented(tracks: Seq[TrackSpec], movieTimescale: Long,
                       fragSamples: Int,
                       sampleByte: (Int, Long) => Byte = (_, _) => 0x5a): Array[Byte] = {
    require(tracks.nonEmpty && fragSamples > 0, "encodeFragmented: bad args")
    val ftyp = box("ftyp", fourCC("iso5"), be32(512),
      fourCC("iso5"), fourCC("isom"), fourCC("mp41"))
    def emptyStblTrak(t: TrackSpec): Array[Byte] = {
      // reuse the progressive writer's boxes by building a spec with no
      // samples: stts/stsc/stsz/stco all zero-entry, mdhd duration 0
      val tkhdTail = be32(0) ++ be32(0) ++ be16(0) ++ be16(0) ++
        be16(if (t.handler == "soun") 0x0100 else 0) ++ be16(0) ++
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
        be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
        be32(t.width.toLong << 16) ++ be32(t.height.toLong << 16)
      val movieDur = t.sampleSizes.length.toLong * t.sampleDelta *
        movieTimescale / t.timescale
      val tkhd = fullBox("tkhd", 0, 3, be32(0), be32(0), be32(t.trackId),
        be32(0), be32(movieDur), tkhdTail)
      val mdhd = fullBox("mdhd", 0, 0, be32(0), be32(0), be32(t.timescale),
        be32(0), be16(0x55c4), be16(0))
      val hdlr = fullBox("hdlr", 0, 0, be32(0), fourCC(t.handler),
        be32(0), be32(0), be32(0), (t.handler match {
          case "vide" => "VideoHandler"; case "soun" => "SoundHandler"
          case other => other + "Handler"
        }).getBytes("US-ASCII") ++ Array(0.toByte))
      val mhd = t.handler match {
        case "vide" => fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
        case "soun" => fullBox("smhd", 0, 0, be16(0), be16(0))
        case _ => fullBox("nmhd", 0, 0)
      }
      val dinf = box("dinf", fullBox("dref", 0, 0, be32(1),
        fullBox("url ", 0, 1)))
      val sampleEntry = t.handler match {
        case "vide" =>
          box(t.codec, Array.fill(6)(0.toByte), be16(1),
            be16(0), be16(0), be32(0), be32(0), be32(0),
            be16(t.width), be16(t.height),
            be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
            Array.fill(32)(0.toByte), be16(24), be16(0xffff))
        case "soun" =>
          box(t.codec, Array.fill(6)(0.toByte), be16(1),
            be32(0), be32(0), be16(t.channels), be16(16),
            be16(0), be16(0), be32(t.sampleRate.toLong << 16))
        case _ => box(t.codec, Array.fill(6)(0.toByte), be16(1))
      }
      val stbl = box("stbl",
        fullBox("stsd", 0, 0, be32(1), sampleEntry),
        fullBox("stts", 0, 0, be32(0)),
        fullBox("stsc", 0, 0, be32(0)),
        fullBox("stsz", 0, 0, be32(0), be32(0)),
        fullBox("stco", 0, 0, be32(0)))
      box("trak", tkhd, box("mdia", mdhd, hdlr, box("minf", mhd, dinf, stbl)))
    }
    val movieDurTotal = tracks.map(t =>
      t.sampleSizes.length.toLong * t.sampleDelta * movieTimescale / t.timescale).max
    val mvex = box("mvex",
      (fullBox("mehd", 0, 0, be32(movieDurTotal)) +:
        tracks.map { t =>
          val (defDur, defSize, defFlags) = t.handler match {
            case "vide" => (0L, 0L, NonSyncFlag) // non-sync unless overridden
            case _ => (t.sampleDelta, t.sampleSizes.headOption.getOrElse(0).toLong, 0L)
          }
          fullBox("trex", 0, 0, be32(t.trackId), be32(1),
            be32(defDur), be32(defSize), be32(defFlags))
        }): _*)
    val mvhdTail = be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++ be32(0) ++ be32(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
      Array.fill(6 * 4)(0.toByte) ++ be32(tracks.map(_.trackId).max + 1)
    val moov = box("moov",
      (fullBox("mvhd", 0, 0, be32(0), be32(0), be32(movieTimescale),
        be32(0), mvhdTail) +: tracks.map(emptyStblTrak)) :+ mvex: _*)

    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    var seq = 1L
    tracks.zipWithIndex.foreach { case (t, ti) =>
      t.sampleSizes.grouped(fragSamples).foreach { sizes =>
        val isVideo = t.handler == "vide"
        val mfhd = fullBox("mfhd", 0, 0, be32(seq)); seq += 1
        // tfhd: default-base-is-moof (+ default duration for video)
        val tfhd =
          if (isVideo)
            fullBox("tfhd", 0, 0x020008, be32(t.trackId), be32(t.sampleDelta))
          else
            fullBox("tfhd", 0, 0x020000, be32(t.trackId))
        // trun flags: data-offset (+ per-sample sizes and
        // first-sample-flags for video)
        val trunFlags = if (isVideo) 0x1 | 0x4 | 0x200 else 0x1
        // 12 box+fullbox header, 8 count+data-offset, video adds
        // first-sample-flags + one u32 size per sample
        val trunLen = 12 + 8 + (if (isVideo) 4 + 4 * sizes.length else 0)
        val trafLen = 8 + tfhd.length + trunLen
        val moofLen = 8 + mfhd.length + trafLen
        val dataOffset = moofLen + 8 // into the following mdat's payload
        val trun = fullBox("trun", 0, trunFlags,
          be32(sizes.length.toLong), be32(dataOffset.toLong),
          (if (isVideo) be32(0L) else Array.empty[Byte]), // first-sample-flags: sync
          (if (isVideo) sizes.flatMap(s => be32(s.toLong)).toArray
           else Array.empty[Byte]))
        val moof = box("moof", mfhd, box("traf", tfhd, trun))
        require(moof.length == moofLen,
          s"encodeFragmented: moof size arithmetic drifted (${moof.length} vs $moofLen)")
        val data = new java.io.ByteArrayOutputStream()
        sizes.zipWithIndex.foreach { case (sz, si) =>
          val b = new Array[Byte](if (isVideo) sz
            else t.sampleSizes.headOption.getOrElse(0))
          java.util.Arrays.fill(b, sampleByte(ti, si.toLong))
          data.write(b)
        }
        out.write(moof)
        out.write(box("mdat", data.toByteArray))
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // parse — the strict box walk
  // ---------------------------------------------------------------------

  private def u16(p: Array[Byte], at: Long): Int = {
    val i = at.toInt
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
  }
  private def u32(p: Array[Byte], at: Long): Long = {
    val i = at.toInt
    ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
  }
  private def u64(p: Array[Byte], at: Long): Long =
    (u32(p, at) << 32) | u32(p, at + 4)
  private def tag(p: Array[Byte], at: Long): String =
    new String(p, at.toInt, 4, "US-ASCII")

  /** Internal per-track accumulator while descending one trak. */
  private final class TrackBuild {
    var trackId = -1L
    var handler = ""
    var codec = ""
    var width = 0; var height = 0
    var channels = 0; var sampleRate = 0
    var timescale = 0L; var duration = 0L
    var sttsRuns: IndexedSeq[(Long, Long)] = IndexedSeq.empty
    var stscRuns: IndexedSeq[(Long, Long)] = IndexedSeq.empty
    var sampleSizes: IndexedSeq[Long] = IndexedSeq.empty
    var uniformSize = -1L
    var nSamples = 0L
    var chunkOffsets: IndexedSeq[Long] = IndexedSeq.empty
    var syncSamples: Option[IndexedSeq[Long]] = None
  }

  /** Container boxes whose payload is child boxes (the descent set). */
  private val containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")

  /** Per-track accumulator over the movie FRAGMENTS (moof/traf/trun —
    * the fMP4/DASH layout streaming video actually ships): sample count,
    * summed duration (media timescale), summed bytes, sync count, and
    * trun count (the fragmented analog of a chunk).
    */
  private final class FragBuild {
    var nSamples = 0L
    var duration = 0L
    var bytes = 0L
    var nSync = 0L
    var nRuns = 0L
    /** (fragment ordinal for this track, absolute offset, size, duration,
      * sync) per sample — kept for [[sampleTable]]; metadata-only callers
      * pay a KB-scale list per clip, bounded by sample count.
      */
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Boolean)]
  }

  /** trex defaults per track id: (duration, size, flags). */
  private type TrexDefaults = Map[Long, (Long, Long, Long)]

  private val NonSyncFlag = 0x00010000L

  /** Walk one moof box: mfhd/traf/tfhd/trun per the 14496-12 fragment
    * model. Canonical subset: every trun must carry a data offset and
    * tfhd must use default-base-is-moof or an explicit base offset —
    * implicit continue-after-previous-trun layouts reject loudly.
    */
  private def walkMoof(payload: Array[Byte], moofAt: Long, body: Long, end: Long,
                       trex: TrexDefaults,
                       frags: scala.collection.mutable.Map[Long, FragBuild]): Unit = {
    val n = payload.length.toLong
    def frame(at: Long, limit: Long): (Long, Long, String) = {
      require(limit - at >= 8, s"Mp4.parse: truncated box header in moof at $at")
      val size0 = u32(payload, at)
      val tpe = tag(payload, at + 4)
      require(size0 >= 8 && at + size0 <= limit,
        s"Mp4.parse: box '$tpe' size $size0 overruns inside moof at $at")
      (at + 8, at + size0, tpe)
    }
    var at = body
    while (at < end) {
      val (tBody, tEnd, tTpe) = frame(at, end)
      if (tTpe == "traf") {
        var trackId = -1L
        var baseOffset = -1L
        var tfhdFlags = 0L
        var defDur = -1L
        var defSize = -1L
        var defFlags = -1L
        var tAt = tBody
        while (tAt < tEnd) {
          val (bBody, bEnd, bTpe) = frame(tAt, tEnd)
          bTpe match {
            case "tfhd" =>
              require(bEnd - bBody >= 8, "Mp4.parse: truncated tfhd")
              tfhdFlags = u32(payload, bBody) & 0xffffffL
              trackId = u32(payload, bBody + 4)
              val tfhdNeed = 8L +
                (if ((tfhdFlags & 0x1L) != 0) 8 else 0) +
                (if ((tfhdFlags & 0x2L) != 0) 4 else 0) +
                (if ((tfhdFlags & 0x8L) != 0) 4 else 0) +
                (if ((tfhdFlags & 0x10L) != 0) 4 else 0) +
                (if ((tfhdFlags & 0x20L) != 0) 4 else 0)
              require(bEnd - bBody >= tfhdNeed,
                s"Mp4.parse: tfhd declares $tfhdNeed bytes of fields in a " +
                  s"${bEnd - bBody}-byte box")
              var p = bBody + 8
              if ((tfhdFlags & 0x1L) != 0) { baseOffset = u64(payload, p); p += 8 }
              if ((tfhdFlags & 0x2L) != 0) p += 4 // sample-description-index
              if ((tfhdFlags & 0x8L) != 0) { defDur = u32(payload, p); p += 4 }
              if ((tfhdFlags & 0x10L) != 0) { defSize = u32(payload, p); p += 4 }
              if ((tfhdFlags & 0x20L) != 0) { defFlags = u32(payload, p); p += 4 }
              if ((tfhdFlags & 0x020000L) != 0) baseOffset = moofAt
              require(baseOffset >= 0,
                "Mp4.parse: tfhd without default-base-is-moof or an " +
                  "explicit base-data-offset (implicit bases not supported)")
            case "trun" =>
              require(trackId > 0, "Mp4.parse: trun before tfhd in traf")
              require(bEnd - bBody >= 12, "Mp4.parse: truncated trun")
              val fb = frags.getOrElseUpdate(trackId, new FragBuild)
              val trunFlags = u32(payload, bBody) & 0xffffffL
              val count = u32(payload, bBody + 4)
              var p = bBody + 8
              require((trunFlags & 0x1L) != 0,
                "Mp4.parse: trun without a data offset (continue-after-" +
                  "previous layouts not supported)")
              val dataOff = u32(payload, p).toInt.toLong; p += 4 // SIGNED 32
              var firstFlags = -1L
              if ((trunFlags & 0x4L) != 0) {
                require(bEnd - p >= 4, "Mp4.parse: truncated trun (first-sample-flags)")
                firstFlags = u32(payload, p); p += 4
              }
              val (dv, sv, fv, cv) =
                ((trunFlags & 0x100L) != 0, (trunFlags & 0x200L) != 0,
                 (trunFlags & 0x400L) != 0, (trunFlags & 0x800L) != 0)
              // gate the whole per-sample field region against the box end
              // BEFORE the expansion loop — a crafted count must reject by
              // name, not read sibling bytes or spin 4 billion iterations
              val perSample = 4L * (Seq(dv, sv, fv, cv).count(identity))
              if (perSample > 0)
                require(count <= (bEnd - p) / perSample,
                  s"Mp4.parse: trun sample count $count ($perSample B of " +
                    s"fields each) overruns its ${bEnd - p}-byte field region")
              else
                // all-default samples carry no fields, so the box length
                // can't vouch for the count — cap against the payload (a
                // real sample occupies at least a byte of mdat)
                require(count <= n,
                  s"Mp4.parse: trun sample count $count exceeds the $n-byte payload")
              val (trexDur, trexSize, trexFlags) =
                trex.getOrElse(trackId, (-1L, -1L, 0L))
              var off = baseOffset + dataOff
              fb.nRuns += 1
              var i = 0L
              while (i < count) {
                val dur = if (dv) { val v = u32(payload, p); p += 4; v }
                  else if (defDur >= 0) defDur
                  else { require(trexDur >= 0,
                    s"Mp4.parse: no sample duration for track $trackId " +
                      "(trun, tfhd and trex all silent)"); trexDur }
                val size = if (sv) { val v = u32(payload, p); p += 4; v }
                  else if (defSize >= 0) defSize
                  else { require(trexSize >= 0,
                    s"Mp4.parse: no sample size for track $trackId"); trexSize }
                val flags = if (fv) { val v = u32(payload, p); p += 4; v }
                  else if (i == 0 && firstFlags >= 0) firstFlags
                  else if (defFlags >= 0) defFlags
                  else trexFlags
                if (cv) p += 4 // composition-time offset: skipped
                require(off >= 0 && off + size <= n,
                  s"Mp4.parse: fragment sample of track $trackId at " +
                    s"[$off, ${off + size}) overruns the $n-byte payload")
                val sync = (flags & NonSyncFlag) == 0
                fb.samples += ((fb.nRuns, off, size, dur, sync))
                fb.nSamples += 1; fb.duration += dur; fb.bytes += size
                if (sync) fb.nSync += 1
                off += size
                i += 1
              }
            case _ => () // sbgp/subs/saiz/...: skipped per spec
          }
          tAt = bEnd
        }
      }
      at = tEnd
    }
  }

  /** Parse a whole container. Rejects BY NAME outside the canonical
    * subset; skips unknown box types (spec behavior). All bounds in
    * Long arithmetic.
    */
  def parse(payload: Array[Byte]): Meta = {
    val n = payload.length.toLong
    require(n >= 16 && tag(payload, 4) == "ftyp",
      s"Mp4.parse: not an ISO-BMFF payload (no ftyp at offset 4 in $n bytes)")
    val brand = tag(payload, 8)
    val ftypSize = u32(payload, 0)
    require(ftypSize >= 16 && ftypSize <= n,
      s"Mp4.parse: ftyp size $ftypSize overruns the $n-byte payload")

    var movieTimescale = 0L
    var movieDuration = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    var sawMoov = false

    // (box start, box end, payload start) for one framing step
    def frame(at: Long, limit: Long): (Long, Long, String) = {
      require(limit - at >= 8,
        s"Mp4.parse: truncated box header at offset $at (${limit - at} bytes left)")
      val size0 = u32(payload, at)
      val tpe = tag(payload, at + 4)
      val (end, body) =
        if (size0 == 1L) {
          require(limit - at >= 16, s"Mp4.parse: truncated largesize box '$tpe' at $at")
          val ls = u64(payload, at + 8)
          require(ls >= 16 && at + ls <= limit,
            s"Mp4.parse: box '$tpe' largesize $ls overruns at offset $at")
          (at + ls, at + 16)
        } else if (size0 == 0L) (limit, at + 8) // to end of enclosing scope
        else {
          require(size0 >= 8 && at + size0 <= limit,
            s"Mp4.parse: box '$tpe' size $size0 overruns at offset $at (limit $limit)")
          (at + size0, at + 8)
        }
      (body, end, tpe)
    }

    def fullHeader(at: Long): (Int, Long) = ((payload(at.toInt) & 0xff), at + 4)

    def parseTrak(from: Long, to: Long): Track = {
      val tb = new TrackBuild
      // every sample-table read is bounds-gated against ITS OWN box end
      // BEFORE any expansion: a crafted count (e.g. stsz 0xFFFFFFFF)
      // must reject by name, not materialize a 4-billion-element table
      // or read into sibling bytes
      def tbl(box: String, start: Long, count: Long, entrySize: Long,
              boxEnd: Long): Unit =
        require(start <= boxEnd && count <= (boxEnd - start) / entrySize,
          s"Mp4.parse: $box entry count $count ($entrySize B each) overruns " +
            s"its ${boxEnd - start}-byte box body")
      def walk(at0: Long, limit: Long): Unit = {
        var at = at0
        while (at < limit) {
          val (body, end, tpe) = frame(at, limit)
          tpe match {
            case t if containers.contains(t) => walk(body, end)
            case "tkhd" =>
              val (v, p) = fullHeader(body)
              // v1: 8+8 create/modify, id, reserved, 8 duration
              tb.trackId = if (v == 1) u32(payload, p + 16) else u32(payload, p + 8)
            case "mdhd" =>
              val (v, p) = fullHeader(body)
              if (v == 1) {
                tb.timescale = u32(payload, p + 16)
                tb.duration = u64(payload, p + 20)
              } else {
                tb.timescale = u32(payload, p + 8)
                tb.duration = u32(payload, p + 12)
              }
            case "hdlr" =>
              val (_, p) = fullHeader(body)
              tb.handler = tag(payload, p + 4)
            case "stsd" =>
              val (_, p) = fullHeader(body)
              val count = u32(payload, p)
              require(count >= 1, "Mp4.parse: empty stsd")
              // first entry only (multi-entry stsd is vanishingly rare
              // and would need per-sample sdi routing — reject loudly)
              require(count == 1,
                s"Mp4.parse: $count stsd entries not supported (single-codec tracks only)")
              val (eBody, _, codec) = frame(p + 4, to)
              tb.codec = codec
              tb.handler match {
                case "vide" =>
                  tb.width = u16(payload, eBody + 8 + 16)
                  tb.height = u16(payload, eBody + 8 + 18)
                case "soun" =>
                  tb.channels = u16(payload, eBody + 8 + 8)
                  tb.sampleRate = (u32(payload, eBody + 8 + 16) >> 16).toInt
                case _ => ()
              }
            case "stts" =>
              val (_, p) = fullHeader(body)
              val c = u32(payload, p)
              tbl("stts", p + 4, c, 8, end)
              tb.sttsRuns = (0L until c).map(i =>
                (u32(payload, p + 4 + i * 8), u32(payload, p + 8 + i * 8)))
            case "stsc" =>
              val (_, p) = fullHeader(body)
              val c = u32(payload, p)
              tbl("stsc", p + 4, c, 12, end)
              tb.stscRuns = (0L until c).map(i =>
                (u32(payload, p + 4 + i * 12), u32(payload, p + 8 + i * 12)))
            case "stsz" =>
              val (_, p) = fullHeader(body)
              tb.uniformSize = u32(payload, p)
              tb.nSamples = u32(payload, p + 4)
              if (tb.uniformSize == 0L) {
                tbl("stsz", p + 8, tb.nSamples, 4, end)
                tb.sampleSizes = (0L until tb.nSamples).map(i => u32(payload, p + 8 + i * 4))
              } else {
                // uniform-size stsz carries NO table, so the box length
                // can't vouch for the count — cap against the payload
                // itself (a sample can't be smaller than a byte)
                require(tb.nSamples <= n,
                  s"Mp4.parse: stsz sample count ${tb.nSamples} exceeds the $n-byte payload")
                tb.sampleSizes = IndexedSeq.fill(tb.nSamples.toInt)(tb.uniformSize)
              }
            case "stco" =>
              val (_, p) = fullHeader(body)
              val c = u32(payload, p)
              tbl("stco", p + 4, c, 4, end)
              tb.chunkOffsets = (0L until c).map(i => u32(payload, p + 4 + i * 4))
            case "co64" =>
              val (_, p) = fullHeader(body)
              val c = u32(payload, p)
              tbl("co64", p + 4, c, 8, end)
              tb.chunkOffsets = (0L until c).map(i => u64(payload, p + 4 + i * 8))
            case "stss" =>
              val (_, p) = fullHeader(body)
              val c = u32(payload, p)
              tbl("stss", p + 4, c, 4, end)
              tb.syncSamples = Some((0L until c).map(i => u32(payload, p + 4 + i * 4)))
            case _ => () // spec §4.2: skip unrecognized boxes
          }
          at = end
        }
      }
      walk(from, to)
      require(tb.trackId > 0, "Mp4.parse: trak without tkhd track id")
      require(tb.handler.nonEmpty, "Mp4.parse: trak without hdlr handler type")
      require(tb.timescale > 0, s"Mp4.parse: track ${tb.trackId} mdhd timescale 0")
      require(tb.codec.nonEmpty, s"Mp4.parse: track ${tb.trackId} has no stsd entry")
      require(tb.sampleSizes.length.toLong == tb.nSamples,
        s"Mp4.parse: track ${tb.trackId} stsz count mismatch")
      val sttsTotal = tb.sttsRuns.map(_._1).sum
      require(sttsTotal == tb.nSamples,
        s"Mp4.parse: track ${tb.trackId} stts covers $sttsTotal samples, stsz has ${tb.nSamples}")
      require(tb.stscRuns.nonEmpty && tb.chunkOffsets.nonEmpty || tb.nSamples == 0,
        s"Mp4.parse: track ${tb.trackId} missing stsc/stco")
      // every sample's data must sit inside the payload — walk chunks
      // (an EMPTY stbl is the fragmented-movie shape: samples arrive in
      // moof/trun boxes and are accounted for after the moov walk)
      val perChunk =
        if (tb.nSamples == 0) Seq.empty[Long]
        else chunksOf(tb.nSamples, tb.stscRuns.map(r => (r._1, r._2)))
      require(perChunk.length <= tb.chunkOffsets.length,
        s"Mp4.parse: track ${tb.trackId} needs ${perChunk.length} chunks, " +
          s"stco lists ${tb.chunkOffsets.length}")
      var si = 0
      perChunk.zipWithIndex.foreach { case (cs, ci) =>
        var off = tb.chunkOffsets(ci)
        (0L until cs).foreach { _ =>
          val sz = tb.sampleSizes(si)
          require(off >= 0 && off + sz <= n,
            s"Mp4.parse: track ${tb.trackId} sample ${si + 1} data " +
              s"[$off, ${off + sz}) overruns the $n-byte payload")
          off += sz; si += 1
        }
      }
      Track(tb.trackId, tb.handler, tb.codec, tb.width, tb.height,
        tb.channels, tb.sampleRate, tb.timescale, tb.duration,
        tb.nSamples, perChunk.length.toLong,
        tb.syncSamples.map(_.length.toLong).getOrElse(tb.nSamples),
        tb.sampleSizes.sum)
    }

    var trexDefaults: TrexDefaults = Map.empty
    var mehdDuration = -1L
    val frags = scala.collection.mutable.Map.empty[Long, FragBuild]

    var at = 0L
    while (at < n) {
      val (body, end, tpe) = frame(at, n)
      tpe match {
        case "moov" =>
          sawMoov = true
          var mAt = body
          while (mAt < end) {
            val (mBody, mEnd, mTpe) = frame(mAt, end)
            mTpe match {
              case "mvhd" =>
                val (v, p) = fullHeader(mBody)
                if (v == 1) {
                  movieTimescale = u32(payload, p + 16)
                  movieDuration = u64(payload, p + 20)
                } else {
                  movieTimescale = u32(payload, p + 8)
                  movieDuration = u32(payload, p + 12)
                }
              case "trak" => tracks += parseTrak(mBody, mEnd)
              case "mvex" =>
                // the fragmented-movie announcement: per-track defaults
                // (trex) + optional whole-movie duration (mehd)
                var xAt = mBody
                while (xAt < mEnd) {
                  val (xBody, xEnd, xTpe) = frame(xAt, mEnd)
                  xTpe match {
                    case "trex" =>
                      val (_, p) = fullHeader(xBody)
                      val tid = u32(payload, p)
                      trexDefaults = trexDefaults.updated(tid,
                        (u32(payload, p + 8), u32(payload, p + 12),
                          u32(payload, p + 16)))
                    case "mehd" =>
                      val (v, p) = fullHeader(xBody)
                      mehdDuration = if (v == 1) u64(payload, p) else u32(payload, p)
                    case _ => ()
                  }
                  xAt = xEnd
                }
              case _ => ()
            }
            mAt = mEnd
          }
        case "moof" =>
          require(sawMoov, "Mp4.parse: moof before moov (a media segment " +
            "without its initialization segment — concatenate init + media " +
            "segments before parsing)")
          walkMoof(payload, at, body, end, trexDefaults, frags)
        case _ => () // ftyp handled above; mdat/free/etc skipped
      }
      at = end
    }
    require(sawMoov, "Mp4.parse: no moov box (not a complete MP4, or a " +
      "media segment without its initialization segment)")
    require(movieTimescale > 0, "Mp4.parse: mvhd timescale 0")
    require(tracks.nonEmpty, "Mp4.parse: moov with no trak")
    // merge fragment stats into the moov-declared tracks (a progressive
    // head plus fragments is legal; the planted fMP4s have empty stbls)
    frags.keys.foreach { tid =>
      require(tracks.exists(_.track_id == tid),
        s"Mp4.parse: moof references track $tid with no trak in moov")
    }
    val merged = tracks.toSeq.map { t =>
      frags.get(t.track_id) match {
        case Some(fb) => t.copy(
          duration = t.duration + fb.duration,
          n_samples = t.n_samples + fb.nSamples,
          n_chunks = t.n_chunks + fb.nRuns,
          n_sync = t.n_sync + fb.nSync,
          total_bytes = t.total_bytes + fb.bytes)
        case None => t
      }
    }
    // fragmented movies commonly write mvhd duration 0 and announce the
    // whole-movie duration in mehd
    val dur = if (movieDuration == 0 && mehdDuration >= 0) mehdDuration
      else movieDuration
    Meta(brand, movieTimescale, dur, merged)
  }

  /** AVIF image metadata (HEIF stills share the ISO-BMFF framing this
    * tier already walks): brand, dimensions from the meta→iprp→ipco→
    * ispe property, alpha from a second av1C+ispe pair under an auxl
    * item (approximated by counting ispe properties), and the av1C
    * presence that routes decode elsewhere. Still images have NO moov —
    * [[parse]] correctly rejects them — so this is the still-image face
    * of the same box walk; AV1 payload decode is out of scope by codec
    * name, exactly like H.264 in [[parse]]'s movies.
    */
  case class AvifMeta(brand: String, width: Int, height: Int,
                      n_ispe: Int, has_av1c: Boolean)

  def avifMeta(payload: Array[Byte]): AvifMeta = {
    val n = payload.length.toLong
    require(n >= 16 && tag(payload, 4) == "ftyp",
      s"Mp4.avif: not an ISO-BMFF payload (no ftyp in $n bytes)")
    val brand = tag(payload, 8)
    require(brand == "avif" || brand == "avis" || brand == "mif1" ||
      brand == "heic" || brand == "heix",
      s"Mp4.avif: brand '$brand' is not a still-image brand " +
        "(avif/avis/mif1/heic/heix)")
    def frame(at: Long, limit: Long): (Long, Long, String) = {
      require(limit - at >= 8, s"Mp4.avif: truncated box header at $at")
      val size0 = u32(payload, at)
      val tpe = tag(payload, at + 4)
      require(size0 >= 8 && at + size0 <= limit,
        s"Mp4.avif: box '$tpe' size $size0 overruns at $at")
      (at + 8, at + size0, tpe)
    }
    var width = 0; var height = 0; var nIspe = 0; var av1c = false
    def walkIpco(from: Long, to: Long): Unit = {
      var at = from
      while (at < to) {
        val (body, end, tpe) = frame(at, to)
        tpe match {
          case "ispe" =>
            require(end - body >= 12, "Mp4.avif: truncated ispe")
            val w = u32(payload, body + 4)
            val h = u32(payload, body + 8)
            require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff,
              s"Mp4.avif: ispe $w x $h out of range")
            if (nIspe == 0) { width = w.toInt; height = h.toInt }
            nIspe += 1
          case "av1C" => av1c = true
          case _ => () // pixi/colr/clap/irot/...: skipped per spec
        }
        at = end
      }
    }
    def walkMeta(from: Long, to: Long): Unit = {
      // meta is a FULL box: 4 bytes of version/flags before its children
      var at = from + 4
      while (at < to) {
        val (body, end, tpe) = frame(at, to)
        if (tpe == "iprp") {
          var p = body
          while (p < end) {
            val (b2, e2, t2) = frame(p, end)
            if (t2 == "ipco") walkIpco(b2, e2)
            p = e2
          }
        }
        at = end
      }
    }
    var at = 0L
    while (at < n) {
      val (body, end, tpe) = frame(at, n)
      if (tpe == "meta") walkMeta(body, end)
      at = end
    }
    require(nIspe > 0, "Mp4.avif: no ispe property (no image dimensions)")
    AvifMeta(brand, width, height, nIspe, av1c)
  }

  /** Write one minimal AVIF skeleton for the plants: ftyp, meta(iprp(
    * ipco(ispe [+ av1C] [+ a second ispe for the alpha item]))), mdat
    * of planted payload bytes the walk never reads.
    */
  def avifEncode(width: Int, height: Int, withAv1c: Boolean,
                 alphaIspe: Boolean, payloadBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def box(tpe: String)(body: => Unit): Unit = {
      val tmp = out.size()
      be32(0); out.write(tpe.getBytes("US-ASCII"))
      body
      val size = out.size() - tmp
      val arr = out.toByteArray // patch the length in place via a copy
      arr(tmp) = ((size >> 24) & 0xff).toByte
      arr(tmp + 1) = ((size >> 16) & 0xff).toByte
      arr(tmp + 2) = ((size >> 8) & 0xff).toByte
      arr(tmp + 3) = (size & 0xff).toByte
      out.reset(); out.write(arr, 0, arr.length)
    }
    box("ftyp") { out.write("avifmif1".getBytes("US-ASCII")) }
    box("meta") {
      be32(0) // full-box version/flags
      box("iprp") {
        box("ipco") {
          box("ispe") { be32(0); be32(width.toLong); be32(height.toLong) }
          if (withAv1c) box("av1C") { be32(0x81000000L) }
          if (alphaIspe) box("ispe") { be32(0); be32(width.toLong); be32(height.toLong) }
        }
      }
    }
    box("mdat") {
      val b = new Array[Byte](payloadBytes)
      java.util.Arrays.fill(b, 0x6d.toByte)
      out.write(b)
    }
    out.toByteArray
  }

  /** AVIF plant (spec for the fixture replica): width 100 + (id%40)·8,
    * height 80 + (id%30)·8, av1C present except id%5==1, a second
    * (alpha-item) ispe on id%4==0, 300 + id%500 mdat bytes never read.
    */
  def avifFromDocuments(spark: org.apache.spark.sql.SparkSession,
                        docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Multimodal.MediaItem] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions(_.map { id =>
        val w = 100 + (id % 40).toInt * 8
        val h = 80 + (id % 30).toInt * 8
        val payload = avifEncode(w, h, withAv1c = id % 5 != 1,
          alphaIspe = id % 4 == 0, payloadBytes = 300 + (id % 500).toInt)
        Multimodal.MediaItem(id, s"avif/${id % 3}", payload, w, h, 1, 0)
      })
  }

  def avifMetaRows(spark: org.apache.spark.sql.SparkSession,
                   media: org.apache.spark.sql.Dataset[Multimodal.MediaItem]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val x = avifMeta(m.payload)
      (m.media_id, x.brand, x.width, x.height, x.n_ispe, x.has_av1c)
    }).toDF("media_id", "brand", "width", "height", "n_ispe", "has_av1c")
  }

  /** Expand one container's sample tables into per-sample rows — the
    * stsc×stco×stsz×stts×stss arithmetic (the thing a frame-level
    * consumer needs to fetch exactly one sample's bytes). Offsets are
    * reported relative to the container's first chunk offset; see
    * [[SampleRow]].
    */
  def sampleTable(payload: Array[Byte]): Seq[SampleRow] = {
    // re-walk with the same strict parse (validates bounds), then expand
    val meta = parse(payload)
    val out = scala.collection.mutable.ArrayBuffer.empty[SampleRow]
    // need the raw tables again — cheapest is a second targeted walk;
    // containers are KBs of moov, so the double walk is noise
    val raw = rawTables(payload)
    val frags = fragTables(payload)
    var base = Long.MaxValue
    raw.foreach { case (_, (_, _, offs, _, _)) =>
      if (offs.nonEmpty) base = math.min(base, offs.min)
    }
    frags.foreach { case (_, fb) =>
      if (fb.samples.nonEmpty)
        base = math.min(base, fb.samples.iterator.map(_._2).min)
    }
    meta.tracks.foreach { t =>
      val (stsc, sizes, offs, stts, stss) = raw(t.track_id)
      val stblSamples = sizes.length.toLong
      val perChunk =
        if (stblSamples == 0) Seq.empty[Long] else chunksOf(stblSamples, stsc)
      val syncSet = stss.map(_.toSet)
      // dts walk over stts runs
      val deltas = stts.iterator.flatMap { case (c, d) => Iterator.fill(c.toInt)(d) }
      var dts = 0L
      var si = 0
      perChunk.zipWithIndex.foreach { case (cs, ci) =>
        var off = offs(ci)
        (0L until cs).foreach { _ =>
          val sz = sizes(si)
          out += SampleRow(t.track_id, si + 1L, ci + 1L, off - base, sz, dts,
            syncSet.forall(_.contains(si + 1L)))
          dts += deltas.next()
          off += sz; si += 1
        }
      }
      // fragment samples continue AFTER the progressive head: sample and
      // chunk indices keep counting, dts keeps accumulating
      frags.get(t.track_id).foreach { fb =>
        fb.samples.foreach { case (run, off, sz, dur, sync) =>
          out += SampleRow(t.track_id, si + 1L, perChunk.length + run,
            off - base, sz, dts, sync)
          dts += dur; si += 1
        }
      }
    }
    out.toSeq
  }

  /** Re-walk only the fragment boxes (trex defaults + every moof) —
    * [[sampleTable]]'s fragmented face; [[parse]] is the validated one.
    */
  private def fragTables(payload: Array[Byte]): Map[Long, FragBuild] = {
    val n = payload.length.toLong
    var trex: TrexDefaults = Map.empty
    val frags = scala.collection.mutable.Map.empty[Long, FragBuild]
    def frame(at: Long, limit: Long): (Long, Long, String) = {
      val size0 = u32(payload, at)
      val tpe = tag(payload, at + 4)
      if (size0 == 1L) (at + 16, at + u64(payload, at + 8), tpe)
      else if (size0 == 0L) (at + 8, limit, tpe)
      else (at + 8, at + size0, tpe)
    }
    var at = 0L
    while (at < n) {
      val (body, end, tpe) = frame(at, n)
      tpe match {
        case "moov" =>
          var mAt = body
          while (mAt < end) {
            val (mBody, mEnd, mTpe) = frame(mAt, end)
            if (mTpe == "mvex") {
              var xAt = mBody
              while (xAt < mEnd) {
                val (xBody, xEnd, xTpe) = frame(xAt, mEnd)
                if (xTpe == "trex") {
                  val p = xBody + 4
                  trex = trex.updated(u32(payload, p),
                    (u32(payload, p + 8), u32(payload, p + 12), u32(payload, p + 16)))
                }
                xAt = xEnd
              }
            }
            mAt = mEnd
          }
        case "moof" => walkMoof(payload, at, body, end, trex, frags)
        case _ => ()
      }
      at = end
    }
    frags.toMap
  }

  // ---------------------------------------------------------------------
  // plant + Spark-facing ops (the Subtitles-tier shape: the plant spec
  // lives next to the operator so the fixture replica has one source of
  // truth to mirror)
  // ---------------------------------------------------------------------

  /** Planted container parameters (spec for the fixture replica). Per
    * doc id with n_chars `nc`:
    *  - video track 1, codec `avc1`: width 320 + (id%5)·64, height
    *    180 + (id%4)·90, nf = 24 + (nc % 96) samples, timescale 90000,
    *    delta 3600 (25 fps), size(s) = 600 + ((id·31 + s·97) mod 1400),
    *    sync every 6 + id%5 samples (stss), stsc runs [(1,5),(4,8)]
    *    when nf > 15 else [(1,5)];
    *  - audio track 2 on even ids, codec `mp4a`: same sample count,
    *    timescale 48000, delta 1024, channels 1 + ((id/2) mod 2),
    *    rate 48000, size(s) = 200 + ((id·13 + s·53) mod 300), single
    *    stsc run of 10, no stss (all-sync);
    *  - movie timescale 1000; version-1 boxes on id%7==0, co64 on
    *    id%9==0, largesize mdat on id%11==0 — every wire form the
    *    parser takes sits inside the oracle gate.
    */
  def plantParams(id: Long, nChars: Int): (Int, Int, Int, Boolean) = {
    val w = 320 + (id % 5).toInt * 64
    val h = 180 + (id % 4).toInt * 90
    val nf = 24 + (math.max(nChars, 0) % 96)
    (w, h, nf, id % 2 == 0)
  }
  def plantVideoSize(id: Long, s: Int): Int = 600 + ((id * 31 + s * 97) % 1400).toInt
  def plantAudioSize(id: Long, s: Int): Int = 200 + ((id * 13 + s * 53) % 300).toInt
  def plantSyncEvery(id: Long): Int = 6 + (id % 5).toInt

  /** Build the planted container table from the documents fixture.
    * The metadata scan is a few hundred KB but each row fans out to a
    * ~100 KB synthesized payload, so without a repartition the whole
    * plant (and every downstream parse) runs as ONE task — the sf0.1
    * fixture is a single parquet file. A real crawl's payloads arrive
    * pre-distributed; the repartition shuffles only (id, n_chars) pairs
    * and stands in for that distribution.
    */
  def mp4FromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Multimodal.MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h, nf, hasAudio) = plantParams(id, nChars)
          val videoRuns: Seq[(Long, Long)] =
            if (nf > 15) Seq((1L, 5L), (4L, 8L)) else Seq((1L, 5L))
          val video = TrackSpec(1L, "vide", "avc1", w, h, 0, 0,
            90000L, 3600L, (0 until nf).map(s => plantVideoSize(id, s)),
            videoRuns, plantSyncEvery(id))
          val audio = if (hasAudio)
            Some(TrackSpec(2L, "soun", "mp4a", 0, 0,
              1 + ((id / 2) % 2).toInt, 48000, 48000L, 1024L,
              (0 until nf).map(s => plantAudioSize(id, s)), Seq((1L, 10L)), 0))
          else None
          val payload = encode(Seq(video) ++ audio.toSeq, 1000L,
            use64 = id % 7 == 0, useCo64 = id % 9 == 0, largeMdat = id % 11 == 0)
          Multimodal.MediaItem(id, s"mp4/${id % 3}", payload, w, h, nf,
            if (hasAudio) 48000 else 0)
        }
      }
  }

  /** The FRAGMENTED face of [[mp4FromDocuments]]: the same planted dims
    * and video sample sizes (so the replica shares formulas) laid out as
    * fMP4 — fragment length 8 + id%5 samples per trun, audio samples
    * UNIFORM 256 bytes carried entirely by trex defaults (the trun is
    * just a count + offset), video sizes per-sample in the trun with
    * first-sample-flags marking each fragment's leading keyframe.
    */
  def fmp4FromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Multimodal.MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h, nf, hasAudio) = plantParams(id, nChars)
          val video = TrackSpec(1L, "vide", "avc1", w, h, 0, 0,
            90000L, 3600L, (0 until nf).map(s => plantVideoSize(id, s)),
            Seq((1L, 1L)), 0) // chunk runs/stss unused by the fragmented writer
          val audio = if (hasAudio)
            Some(TrackSpec(2L, "soun", "mp4a", 0, 0,
              1 + ((id / 2) % 2).toInt, 48000, 48000L, 1024L,
              IndexedSeq.fill(nf)(256), Seq((1L, 1L)), 0))
          else None
          val payload = encodeFragmented(Seq(video) ++ audio.toSeq, 1000L,
            fragSamples = 8 + (id % 5).toInt)
          Multimodal.MediaItem(id, s"fmp4/${id % 3}", payload, w, h, nf,
            if (hasAudio) 48000 else 0)
        }
      }
  }

  /** Per-track container metadata scan — the curation workhorse: one
    * `mapPartitions` pass parses ONLY box structure (moov is KBs; the
    * mdat payload bytes are never touched beyond the bounds check), so
    * at crawl scale this is I/O-bound on metadata, not video bytes.
    * Payloads never leave executors.
    */
  case class TrackMetaRow(media_id: Long, brand: String, movie_duration_ms: Long,
                          track_id: Long, handler: String, codec: String,
                          width: Int, height: Int, channels: Int,
                          sample_rate: Int, timescale: Long, duration_ms: Long,
                          n_samples: Long, n_chunks: Long, n_sync: Long,
                          total_bytes: Long)
  def trackMeta(spark: SparkSession, media: Dataset[Multimodal.MediaItem]): Dataset[TrackMetaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val meta = parse(m.payload)
        val movieMs =
          if (meta.timescale == 0) 0L else meta.duration * 1000L / meta.timescale
        meta.tracks.map { t =>
          TrackMetaRow(m.media_id, meta.brand, movieMs, t.track_id, t.handler,
            t.codec, t.width, t.height, t.channels, t.sample_rate,
            t.timescale, t.durationMs, t.n_samples, t.n_chunks, t.n_sync,
            t.total_bytes)
        }
      }
    }
  }

  /** Full sample-table expansion — per-sample (chunk, offset, size,
    * dts, sync) rows, the index a frame-level consumer uses to fetch
    * exactly one sample's bytes without demuxing the clip. Fan-out is
    * bounded by the sample COUNT (container metadata), never payload
    * size.
    */
  case class SampleTableRow(media_id: Long, track_id: Long, sample_idx: Long,
                            chunk_idx: Long, rel_offset: Long, size: Long,
                            dts: Long, is_sync: Boolean)
  def sampleRows(spark: SparkSession, media: Dataset[Multimodal.MediaItem]): Dataset[SampleTableRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        sampleTable(m.payload).map(r =>
          SampleTableRow(m.media_id, r.track_id, r.sample_idx, r.chunk_idx,
            r.rel_offset, r.size, r.dts, r.is_sync))
      }
    }
  }

  /** Container-level curation gate — duration window, resolution floor,
    * bitrate cap, audio-presence flag — everything a 100 TB crawl
    * decides BEFORE spending decode cycles, all from moov metadata.
    * Derived from [[trackMeta]] with one media_id-keyed aggregation.
    */
  def curationGate(tracks: DataFrame,
                   minDurationMs: Long, maxDurationMs: Long,
                   minWidth: Int, minHeight: Int,
                   maxBitrateBps: Long): DataFrame = {
    val vid = col("handler") === "vide"
    tracks.groupBy("media_id").agg(
      count(lit(1)).as("n_tracks"),
      max(when(col("handler") === "soun", 1).otherwise(0)).as("has_audio"),
      // single-video-track containers by plant; max() selects it and
      // stays correct (largest stream) if a multi-video clip appears
      max(when(vid, col("codec"))).as("video_codec"),
      max(when(vid, col("width")).otherwise(0)).as("width"),
      max(when(vid, col("height")).otherwise(0)).as("height"),
      max(when(vid, col("duration_ms")).otherwise(0L)).as("duration_ms"),
      sum(col("total_bytes")).as("total_bytes"))
    .withColumn("bitrate_bps",
      when(col("duration_ms") > 0,
        col("total_bytes") * 8L * 1000L / col("duration_ms")).otherwise(0L)
        .cast("long"))
    .withColumn("keep",
      col("duration_ms") >= minDurationMs && col("duration_ms") <= maxDurationMs &&
      col("width") >= minWidth && col("height") >= minHeight &&
      col("bitrate_bps") <= maxBitrateBps)
    .select("media_id", "n_tracks", "has_audio", "video_codec", "width",
      "height", "duration_ms", "total_bytes", "bitrate_bps", "keep")
  }

  /** Second walk pulling the raw per-track tables (stsc runs, sizes,
    * chunk offsets, stts runs, stss) keyed by track id. Kept private —
    * [[parse]] is the validated public face.
    */
  private def rawTables(payload: Array[Byte])
      : Map[Long, (IndexedSeq[(Long, Long)], IndexedSeq[Long], IndexedSeq[Long],
                   IndexedSeq[(Long, Long)], Option[IndexedSeq[Long]])] = {
    val n = payload.length.toLong
    val out = scala.collection.mutable.Map.empty[Long,
      (IndexedSeq[(Long, Long)], IndexedSeq[Long], IndexedSeq[Long],
       IndexedSeq[(Long, Long)], Option[IndexedSeq[Long]])]
    def frame(at: Long, limit: Long): (Long, Long, String) = {
      val size0 = u32(payload, at)
      val tpe = tag(payload, at + 4)
      if (size0 == 1L) (at + 16, at + u64(payload, at + 8), tpe)
      else if (size0 == 0L) (at + 8, limit, tpe)
      else (at + 8, at + size0, tpe)
    }
    def walkTrak(from: Long, to: Long): Unit = {
      var trackId = -1L
      var stsc: IndexedSeq[(Long, Long)] = IndexedSeq.empty
      var sizes: IndexedSeq[Long] = IndexedSeq.empty
      var offs: IndexedSeq[Long] = IndexedSeq.empty
      var stts: IndexedSeq[(Long, Long)] = IndexedSeq.empty
      var stss: Option[IndexedSeq[Long]] = None
      def walk(at0: Long, limit: Long): Unit = {
        var at = at0
        while (at < limit) {
          val (body, end, tpe) = frame(at, limit)
          tpe match {
            case t if containers.contains(t) => walk(body, end)
            case "tkhd" =>
              val v = payload(body.toInt) & 0xff
              trackId = if (v == 1) u32(payload, body + 4 + 16) else u32(payload, body + 4 + 8)
            case "stsc" =>
              val p = body + 4; val c = u32(payload, p)
              stsc = (0L until c).map(i =>
                (u32(payload, p + 4 + i * 12), u32(payload, p + 8 + i * 12)))
            case "stsz" =>
              val p = body + 4
              val uniform = u32(payload, p); val c = u32(payload, p + 4)
              sizes = if (uniform == 0L) (0L until c).map(i => u32(payload, p + 8 + i * 4))
                else IndexedSeq.fill(c.toInt)(uniform)
            case "stco" =>
              val p = body + 4; val c = u32(payload, p)
              offs = (0L until c).map(i => u32(payload, p + 4 + i * 4))
            case "co64" =>
              val p = body + 4; val c = u32(payload, p)
              offs = (0L until c).map(i => u64(payload, p + 4 + i * 8))
            case "stts" =>
              val p = body + 4; val c = u32(payload, p)
              stts = (0L until c).map(i =>
                (u32(payload, p + 4 + i * 8), u32(payload, p + 8 + i * 8)))
            case "stss" =>
              val p = body + 4; val c = u32(payload, p)
              stss = Some((0L until c).map(i => u32(payload, p + 4 + i * 4)))
            case _ => ()
          }
          at = end
        }
      }
      walk(from, to)
      out(trackId) = (stsc, sizes, offs, stts, stss)
    }
    var at = 0L
    while (at < n) {
      val (body, end, tpe) = frame(at, n)
      if (tpe == "moov") {
        var mAt = body
        while (mAt < end) {
          val (mBody, mEnd, mTpe) = frame(mAt, end)
          if (mTpe == "trak") walkTrak(mBody, mEnd)
          mAt = mEnd
        }
      }
      at = end
    }
    out.toMap
  }
}
