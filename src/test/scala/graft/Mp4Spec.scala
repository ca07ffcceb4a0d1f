package graft

import graft.operators.{Mp4, Multimodal}

/** MP4/ISO-BMFF tier spec: hand-checked encode→parse round trips across
  * every planted wire form (version-0/1 full boxes, stco/co64, plain and
  * largesize mdat), sample-table expansion arithmetic, loud rejection of
  * truncated/crafted containers, and the Spark-facing ops.
  */
class Mp4Spec extends SparkSpec {

  private def videoSpec(nf: Int, syncEvery: Int = 8) = Mp4.TrackSpec(
    1L, "vide", "avc1", 640, 360, 0, 0, 90000L, 3600L,
    (0 until nf).map(s => 700 + s * 3), Seq((1L, 5L), (4L, 8L)), syncEvery)
  private def audioSpec(nf: Int) = Mp4.TrackSpec(
    2L, "soun", "mp4a", 0, 0, 2, 48000, 48000L, 1024L,
    (0 until nf).map(s => 210 + s), Seq((1L, 10L)), 0)

  test("encode→parse round-trips track metadata on a two-track container " +
    "(v0 boxes, stco, plain mdat)") {
    val payload = Mp4.encode(Seq(videoSpec(40), audioSpec(40)), 1000L)
    val meta = Mp4.parse(payload)
    assert(meta.brand === "isom")
    assert(meta.timescale === 1000L)
    // movie duration = max over tracks of mediaDur·movieTs/trackTs:
    // video 40·3600·1000/90000 = 1600, audio 40·1024·1000/48000 = 853
    assert(meta.duration === 1600L)
    assert(meta.tracks.length === 2)
    val v = meta.tracks.find(_.handler == "vide").get
    assert(v.track_id === 1L && v.codec === "avc1")
    assert(v.width === 640 && v.height === 360)
    assert(v.timescale === 90000L && v.durationMs === 1600L)
    assert(v.n_samples === 40L)
    // chunks: 5,5,5 then 8s → 3 + ceil(25/8) = 3 + 4 chunks
    assert(v.n_chunks === 7L)
    assert(v.n_sync === 5L) // samples 1, 9, 17, 25, 33
    assert(v.total_bytes === (0 until 40).map(s => 700L + s * 3).sum)
    val a = meta.tracks.find(_.handler == "soun").get
    assert(a.codec === "mp4a" && a.channels === 2 && a.sample_rate === 48000)
    assert(a.n_sync === a.n_samples) // no stss → every sample is sync
    assert(a.n_chunks === 4L)
    assert(a.durationMs === 853L)
  }

  test("version-1 (64-bit) mvhd/tkhd/mdhd, co64 and largesize mdat parse " +
    "to the same metadata as the v0 forms") {
    val tracks = Seq(videoSpec(24), audioSpec(24))
    val base = Mp4.parse(Mp4.encode(tracks, 1000L))
    for (v64 <- Seq(false, true); co64 <- Seq(false, true);
         lm <- Seq(false, true) if v64 || co64 || lm) {
      val got = Mp4.parse(Mp4.encode(tracks, 1000L,
        use64 = v64, useCo64 = co64, largeMdat = lm))
      assert(got === base, s"use64=$v64 co64=$co64 largeMdat=$lm")
    }
  }

  test("sampleTable expands stsc×stco×stsz×stts×stss into per-sample " +
    "rows with exact offsets, timestamps and sync flags") {
    val payload = Mp4.encode(Seq(videoSpec(12, syncEvery = 4), audioSpec(12)), 1000L)
    val rows = Mp4.sampleTable(payload)
    val vid = rows.filter(_.track_id == 1L)
    val aud = rows.filter(_.track_id == 2L)
    assert(vid.length === 12 && aud.length === 12)
    // video samples lie first in mdat, so rel offsets are size cumsums
    val vsizes = (0 until 12).map(s => 700L + s * 3)
    assert(vid.map(_.rel_offset) === vsizes.scanLeft(0L)(_ + _).init)
    assert(vid.map(_.size) === vsizes)
    assert(vid.map(_.dts) === (0 until 12).map(_ * 3600L))
    assert(vid.map(_.is_sync) === (0 until 12).map(_ % 4 == 0))
    // chunks 5,5,2 under runs [(1,5),(4,8)] with only 12 samples
    assert(vid.map(_.chunk_idx) === Seq(1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3).map(_.toLong))
    // audio data follows all video bytes
    val vTotal = vsizes.sum
    val asizes = (0 until 12).map(s => 210L + s)
    assert(aud.map(_.rel_offset) === asizes.scanLeft(vTotal)(_ + _).init)
    assert(aud.forall(_.is_sync)) // stss absent
    assert(aud.map(_.dts) === (0 until 12).map(_ * 1024L))
  }

  test("crafted and truncated containers reject by name; unknown boxes " +
    "are skipped per spec") {
    val good = Mp4.encode(Seq(videoSpec(10)), 1000L)
    def rejects(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](Mp4.parse(p)).getMessage
      assert(m.contains(frag), m)
    }
    rejects("not an mp4 file at all, definitely not".getBytes, "ftyp")
    rejects(good.take(good.length - 20), "overruns")
    // a crafted 32-bit box size that would wrap an Int bounds check
    val crafted = good.clone()
    // first moov child: find moov and poison its size field
    val moovAt = {
      var at = 0; var found = -1
      while (found < 0 && at < crafted.length - 8) {
        val size = java.nio.ByteBuffer.wrap(crafted, at, 4).getInt
        val tpe = new String(crafted, at + 4, 4, "US-ASCII")
        if (tpe == "moov") found = at else at += size
      }
      found
    }
    java.nio.ByteBuffer.wrap(crafted, moovAt, 4).putInt(Int.MaxValue - 2)
    rejects(crafted, "overruns")
    // truncating INSIDE moov (the box header survives, its body is cut)
    rejects(good.take(moovAt + 10), "overruns")
    // cutting to less than a full box header rejects as truncated
    rejects(good.take(moovAt + 4), "truncated")
    // unknown top-level box between mdat and moov: skipped, parse succeeds
    val free = java.nio.ByteBuffer.allocate(16).putInt(16)
      .put("fre0".getBytes("US-ASCII")).put(Array.fill[Byte](8)(7)).array()
    val withFree = good.take(moovAt) ++ free ++ good.drop(moovAt)
    assert(Mp4.parse(withFree) === Mp4.parse(good))
    // chunk offsets pointing past the payload reject (a lying stco)
    val noMdat = good.take(moovAt).take(40) ++ good.drop(moovAt)
    intercept[IllegalArgumentException](Mp4.parse(noMdat))
  }

  test("AVIF stills: brand gate, ispe dims, av1C routing; movies reject " +
    "as non-still brands and stills reject in the movie parser") {
    val m = Mp4.avifMeta(Mp4.avifEncode(320, 240, withAv1c = true,
      alphaIspe = false, payloadBytes = 100))
    assert(m === Mp4.AvifMeta("avif", 320, 240, 1, true))
    val alpha = Mp4.avifMeta(Mp4.avifEncode(64, 48, withAv1c = false,
      alphaIspe = true, payloadBytes = 10))
    assert(alpha.n_ispe === 2 && !alpha.has_av1c)
    def rej(body: => Any, frag: String): Unit =
      assert(intercept[IllegalArgumentException](body).getMessage.contains(frag), frag)
    // a movie is not a still: brand gate fires
    rej(Mp4.avifMeta(Mp4.encode(Seq(videoSpec(5)), 1000L)), "brand")
    // a still is not a movie: the movie parser requires moov
    rej(Mp4.parse(Mp4.avifEncode(320, 240, withAv1c = true,
      alphaIspe = false, payloadBytes = 10)), "moov")
    rej(Mp4.avifMeta("garbage bytes, no ftyp anywhere...".getBytes), "ftyp")
    // a truncated meta box rejects with bounds, not silence
    val good = Mp4.avifEncode(320, 240, withAv1c = true, alphaIspe = false,
      payloadBytes = 10)
    rej(Mp4.avifMeta(good.take(40)), "overruns")
  }

  test("crafted sample-table entry counts reject by name BEFORE any " +
    "expansion (no OOM, no sibling-byte reads)") {
    val good = Mp4.encode(Seq(videoSpec(10)), 1000L)
    def findTag(p: Array[Byte], tag: String, from: Int): Int = {
      val t = tag.getBytes("US-ASCII")
      var i = from
      while (i < p.length - 4 &&
        !(p(i) == t(0) && p(i + 1) == t(1) && p(i + 2) == t(2) && p(i + 3) == t(3))) i += 1
      require(i < p.length - 4, s"fixture has no '$tag' box"); i
    }
    val moovAt = findTag(good, "moov", 0)
    // stsz: [size][tag][ver/flags][uniform][count] — count at tag+12
    locally {
      val p = good.clone()
      java.nio.ByteBuffer.wrap(p, findTag(p, "stsz", moovAt) + 12, 4).putInt(-1) // 0xFFFFFFFF
      val m = intercept[IllegalArgumentException](Mp4.parse(p)).getMessage
      assert(m.contains("stsz"), m)
    }
    // stts/stsc/stco: [size][tag][ver/flags][count] — count at tag+8
    for (tag <- Seq("stts", "stsc", "stco", "stss")) {
      val p = good.clone()
      java.nio.ByteBuffer.wrap(p, findTag(p, tag, moovAt) + 8, 4).putInt(Int.MaxValue)
      val m = intercept[IllegalArgumentException](Mp4.parse(p)).getMessage
      assert(m.contains(tag), m)
    }
    // trun in a fragmented container: count at tag+8
    val frag = Mp4.encodeFragmented(Seq(videoSpec(20)), 1000L, 5)
    val p = frag.clone()
    java.nio.ByteBuffer.wrap(p, findTag(p, "trun", 0) + 8, 4).putInt(Int.MaxValue)
    val m = intercept[IllegalArgumentException](Mp4.parse(p)).getMessage
    assert(m.contains("trun"), m)
  }

  test("fragmented MP4 (moof/traf/trun with trex defaults) parses to the " +
    "same track totals as the progressive layout of the same samples") {
    val tracks = Seq(videoSpec(40), audioSpec(40).copy(
      sampleSizes = IndexedSeq.fill(40)(256))) // trex default size → uniform
    val frag = Mp4.parse(Mp4.encodeFragmented(tracks, 1000L, fragSamples = 7))
    assert(frag.brand === "iso5")
    assert(frag.timescale === 1000L)
    // mvhd is 0 for fragmented movies; mehd announces the duration
    assert(frag.duration === 1600L)
    val v = frag.tracks.find(_.handler == "vide").get
    assert(v.codec === "avc1" && v.width === 640 && v.height === 360)
    assert(v.n_samples === 40L && v.durationMs === 1600L)
    // one trun per fragment: ceil(40/7) = 6
    assert(v.n_chunks === 6L)
    // first-sample-flags mark each fragment's leading keyframe; trex
    // default flags mark the rest non-sync
    assert(v.n_sync === 6L)
    assert(v.total_bytes === (0 until 40).map(s => 700L + s * 3).sum)
    val a = frag.tracks.find(_.handler == "soun").get
    assert(a.n_samples === 40L && a.n_sync === 40L) // trex flags 0: all sync
    assert(a.total_bytes === 256L * 40)
    assert(a.durationMs === 853L)
    // sample-table expansion over fragments: offsets, dts, sync flags
    val rows = Mp4.sampleTable(Mp4.encodeFragmented(tracks, 1000L, 7))
    val vr = rows.filter(_.track_id == 1L)
    assert(vr.length === 40)
    assert(vr.map(_.dts) === (0 until 40).map(_ * 3600L))
    assert(vr.map(_.size) === (0 until 40).map(s => 700L + s * 3))
    assert(vr.map(_.is_sync) === (0 until 40).map(_ % 7 == 0))
    assert(vr.map(_.chunk_idx) === (0 until 40).map(_ / 7 + 1L))
    // video fragments precede audio fragments per track-major layout,
    // and within a track offsets are contiguous per fragment's mdat
    assert(vr.head.rel_offset === 0L)
    val ar = rows.filter(_.track_id == 2L)
    assert(ar.forall(_.is_sync) && ar.map(_.dts) === (0 until 40).map(_ * 1024L))
    // a media segment without its init segment rejects by name
    val whole = Mp4.encodeFragmented(tracks, 1000L, 7)
    val moofAt = {
      var at = 0; var found = -1
      while (found < 0 && at < whole.length - 8) {
        val size = java.nio.ByteBuffer.wrap(whole, at, 4).getInt
        if (new String(whole, at + 4, 4, "US-ASCII") == "moof") found = at
        else at += size
      }
      found
    }
    val ftypLen = java.nio.ByteBuffer.wrap(whole, 0, 4).getInt
    val m = intercept[IllegalArgumentException](
      Mp4.parse(whole.take(ftypLen) ++ whole.drop(moofAt))).getMessage
    assert(m.contains("initialization segment"), m)
  }

  test("the Spark ops: planted containers → trackMeta / sampleRows / " +
    "curationGate agree with plant arithmetic on a sample of docs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(30)
    val media = Mp4.mp4FromDocuments(spark, docs)
    val tm = Mp4.trackMeta(spark, media).collect()
    val byId = tm.groupBy(_.media_id)
    docs.select("doc_id", "n_chars").as[(Long, Long)].collect().foreach {
      case (id, nc) =>
        val (w, h, nf, hasAudio) = Mp4.plantParams(id, nc.toInt)
        val rows = byId(id)
        assert(rows.length === (if (hasAudio) 2 else 1), s"doc $id")
        val v = rows.find(_.handler == "vide").get
        assert(v.width === w && v.height === h && v.n_samples === nf.toLong,
          s"doc $id")
        assert(v.duration_ms === nf.toLong * 3600 * 1000 / 90000, s"doc $id")
        assert(v.n_sync === (0 until nf by Mp4.plantSyncEvery(id)).length.toLong)
        assert(v.total_bytes ===
          (0 until nf).map(s => Mp4.plantVideoSize(id, s).toLong).sum, s"doc $id")
        if (hasAudio) {
          val a = rows.find(_.handler == "soun").get
          assert(a.channels === 1 + ((id / 2) % 2).toInt && a.sample_rate === 48000)
          assert(a.n_sync === a.n_samples)
        }
    }
    // the gate keeps exactly the clips its thresholds admit
    val gate = Mp4.curationGate(Mp4.trackMeta(spark, media).toDF(),
      minDurationMs = 1500, maxDurationMs = 600000,
      minWidth = 384, minHeight = 270, maxBitrateBps = 10000000).collect()
    gate.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      val manual = r.getAs[Long]("duration_ms") >= 1500 &&
        r.getAs[Long]("duration_ms") <= 600000 &&
        r.getAs[Int]("width") >= 384 && r.getAs[Int]("height") >= 270 &&
        r.getAs[Long]("bitrate_bps") <= 10000000
      assert(keep === manual)
    }
    assert(gate.exists(_.getAs[Boolean]("keep")) &&
      gate.exists(!_.getAs[Boolean]("keep")),
      "thresholds should split the planted corpus")
  }
}
