package graft

import graft.operators.{Avi, Multimodal, Png}
import org.apache.spark.sql.functions._

/** Pure-JVM AVI codec + video-tier spec: encode→decode identity across
  * the bottom-up/BGR/padded DIB storage (odd widths exercise the row
  * padding), loud rejection of junk/compressed/truncated payloads, and
  * the real frame-sampling feature pass against hand computation.
  */
class AviSpec extends SparkSpec {
  import spark.implicits._

  private def planted(w: Int, h: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      var z = seed * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z ^= (z >>> 31); z *= 0x94D049BB133111EBL
      ((z >>> 40) & 0xff).toByte
    }

  test("encode→decode is the identity on frames, dims and rate — " +
    "including odd widths where DIB rows pad to 4-byte multiples") {
    for (w <- Seq(3, 4, 5, 6, 7); h <- Seq(1, 2, 5)) {
      val frames = (0 until 3).map(f => planted(w, h, w * 100 + h * 10 + f))
      val v = Avi.decode(Avi.encode(w, h, 40000, frames))
      assert(v.width === w && v.height === h && v.microSecPerFrame === 40000)
      assert(v.frames.length === 3, s"${w}x$h")
      frames.indices.foreach(f =>
        assert(v.frames(f).toSeq === frames(f).toSeq, s"${w}x$h frame $f"))
    }
    // a zero-frame clip round-trips (header-only AVI)
    val empty = Avi.decode(Avi.encode(4, 3, 40000, Nil))
    assert(empty.frames.isEmpty && empty.width === 4)
    // stride arithmetic: 3·w rounded up to 4
    assert(Avi.strideOf(3) === 12 && Avi.strideOf(4) === 12 && Avi.strideOf(5) === 16)
  }

  test("decoder rejects junk, truncation, and compressed/non-24-bit " +
    "streams by name; skips unknown chunks") {
    intercept[IllegalArgumentException](
      Avi.decode("definitely not an avi payload .................".getBytes))
    val good = Avi.encode(5, 4, 40000, Seq(planted(5, 4, 1L)))
    intercept[IllegalArgumentException](Avi.decode(good.take(good.length - 10)))
    // flip biCompression to 1 (BI_RLE8) → loud reject naming compression
    val strfPos = {
      var p = -1
      for (i <- 0 until good.length - 4)
        if (p < 0 && new String(good, i, 4, "US-ASCII") == "strf") p = i
      p
    }
    val comp = good.clone()
    comp(strfPos + 8 + 16) = 1
    val ex = intercept[IllegalArgumentException](Avi.decode(comp))
    assert(ex.getMessage.contains("compressed"))
    // a JUNK chunk between hdrl and movi is skipped by size
    val moviPos = {
      var p = -1
      for (i <- 0 until good.length - 4)
        if (p < 0 && new String(good, i, 4, "US-ASCII") == "movi") p = i
      p - 8 // back to the LIST header
    }
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    val withJunk = good.slice(0, moviPos) ++ junk ++ good.drop(moviPos)
    val bb = java.nio.ByteBuffer.wrap(withJunk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + junk.length)
    assert(Avi.decode(withJunk).frames.head.toSeq === planted(5, 4, 1L).toSeq)
  }

  test("MJPEG AVI: container round trip equals the per-frame JPEG round " +
    "trip exactly; header dispatch reads biCompression; gray frames " +
    "expand to RGB") {
    for (w <- Seq(4, 7, 12); h <- Seq(3, 5); sub <- Seq(false, true)) {
      val frames = (0 until 3).map(f => planted(w, h, w * 100 + h * 10 + f))
      val v = Avi.decode(Avi.encodeMjpeg(w, h, 40000, frames, 80, sub))
      assert(v.width === w && v.height === h && v.microSecPerFrame === 40000)
      assert(v.frames.length === 3)
      // frame i must equal Jpeg.decode(Jpeg.encode(frame_i)) BYTE FOR
      // BYTE — the container adds nothing to (and loses nothing of) the
      // per-frame codec
      frames.indices.foreach { f =>
        val want = graft.operators.Jpeg.decode(
          graft.operators.Jpeg.encode(w, h, 3, frames(f), 80, sub)).pixels
        assert(v.frames(f).toSeq === want.toSeq, s"${w}x$h sub=$sub frame $f")
      }
    }
    // lossy but bounded on smooth content: a 32x24 gradient at q90 stays
    // within a few gray levels per sample
    val gw = 32; val gh = 24
    val grad = Array.tabulate(gw * gh * 3) { i =>
      val p = i / 3; ((p % gw) * 4 + (p / gw) * 3).toByte
    }
    val gv = Avi.decode(Avi.encodeMjpeg(gw, gh, 40000, Seq(grad), quality = 90))
    val maxErr = gv.frames.head.zip(grad)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 8, s"gradient error $maxErr")
    // a gray JPEG inside the movi expands to RGB triplets: splice a
    // grayscale frame into a hand-assembled minimal MJPEG container
    val gpx = Array.tabulate[Byte](4 * 3)(i => (i * 17).toByte)
    val gjpg = graft.operators.Jpeg.encode(4, 3, 1, gpx, 90)
    val mj = {
      def cc(s: String) = s.getBytes("US-ASCII")
      def le(v: Int) = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
      def chunk(tag: String, d: Array[Byte]) =
        cc(tag) ++ le(d.length) ++ d ++
          (if (d.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
      val avih = le(40000) ++ le(0) ++ le(0) ++ le(0) ++ le(1) ++ le(0) ++
        le(1) ++ le(0) ++ le(4) ++ le(3) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
      val strf = le(40) ++ le(4) ++ le(3) ++
        Array[Byte](1, 0, 24, 0) ++ le(Avi.MjpgFourCC) ++ le(0) ++
        le(0) ++ le(0) ++ le(0) ++ le(0)
      val hdrl = chunk("LIST", cc("hdrl") ++ chunk("avih", avih) ++
        chunk("LIST", cc("strl") ++ chunk("strf", strf)))
      val movi = chunk("LIST", cc("movi") ++ chunk("00dc", gjpg))
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le(body.length) ++ body
    }
    val gdec = Avi.decode(mj)
    val gray = graft.operators.Jpeg.decode(gjpg).pixels
    val want = gray.flatMap(p => Array(p, p, p))
    assert(gdec.frames.head.toSeq === want.toSeq)
    // dimension mismatch between header and frame rejects loudly
    val bad = Avi.encodeMjpeg(4, 3, 40000, Seq(planted(4, 3, 9L)))
    val badHdr = bad.clone()
    // avih width field: find 'avih', +8 (chunk hdr) +32
    val avihPos = {
      var p = -1
      for (i <- 0 until bad.length - 4)
        if (p < 0 && new String(bad, i, 4, "US-ASCII") == "avih") p = i
      p
    }
    java.nio.ByteBuffer.wrap(badHdr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(avihPos + 8 + 32, 5)
    val ex = intercept[IllegalArgumentException](Avi.decode(badHdr))
    assert(ex.getMessage.contains("header says"))
  }

  test("decodeStrided equals full-decode-then-sample on every container " +
    "— the sampling fast path is exact, not approximate") {
    val w = 6; val h = 5
    val frames = (0 until 7).map(f => planted(w, h, 9000 + f))
    for ((payload, name) <- Seq(
      (Avi.encode(w, h, 40000, frames), "raw AVI"),
      (Avi.encodeMjpeg(w, h, 40000, frames, 85), "MJPEG AVI"))) {
      for (stride <- Seq(1, 2, 3, 7, 10)) {
        val full = Avi.decode(payload)
        val (sw, sh, nf, sampled) = Multimodal.decodeVideoStrided(payload, stride)
        assert((sw, sh, nf) === ((w, h, 7)), s"$name stride=$stride")
        assert(sampled.map(_._1) === (0 until 7 by stride), s"$name stride=$stride")
        sampled.foreach { case (i, rgb) =>
          assert(rgb.toSeq === full.frames(i).toSeq, s"$name stride=$stride frame $i")
        }
      }
    }
    // GIF clips route through the full compose (frames are cumulative)
    val docs = Tables.documents(spark, sf).limit(6)
    val gifs = Multimodal.gifVideoFromDocuments(spark, docs).collect()
    gifs.foreach { m =>
      val full = Multimodal.decodeVideo(m.payload)
      val (_, _, nf, sampled) = Multimodal.decodeVideoStrided(m.payload, 2)
      assert(nf === full.frames.length)
      sampled.foreach { case (i, rgb) =>
        assert(rgb.toSeq === full.frames(i).toSeq, s"gif ${m.media_id} frame $i")
      }
    }
  }

  test("MJPEG clips flow through the unchanged feature/pHash operators: " +
    "an MJPEG re-encode of a raw clip near-dups with it frame-for-frame") {
    // smooth frames (shifted gradients) so q95 compression moves the
    // pHash by at most a couple of bits
    val gw = 32; val gh = 24
    def grad(f: Int) = Array.tabulate(gw * gh * 3) { i =>
      val p = i / 3; (((p % gw) * 4 + (p / gw) * 3 + f * 5) % 250).toByte
    }
    val frames = (0 until 4).map(grad)
    val raw = Multimodal.MediaItem(1L, "vid/0",
      Avi.encode(gw, gh, 40000, frames), gw, gh, 4, 0)
    val mj = Multimodal.MediaItem(2L, "vid/0",
      Avi.encodeMjpeg(gw, gh, 40000, frames, quality = 95), gw, gh, 4, 0)
    val hashes = Multimodal.videoPHashes(spark, Seq(raw, mj).toDS(), stride = 1)
    val dups = Multimodal.videoNearDups(hashes, maxHamming = 3, minMatched = 4)
      .collect()
    assert(dups.length === 1)
    assert(dups.head.getLong(0) === 1L && dups.head.getLong(1) === 2L)
  }

  test("cross-codec dedup at the planted dims: MJPEG q95 twins of raw " +
    "noise clips pair at radius 10, and every reported pair IS a twin") {
    val docs = Tables.documents(spark, sf).limit(30)
    val media = Multimodal.videoFromDocuments(spark, docs)
    val twinIds = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 5 == 0).toSet
    val variants = media.filter(m => twinIds.contains(m.media_id)).map { m =>
      val vid = Avi.decode(m.payload)
      Multimodal.MediaItem(m.media_id + 20000000L, m.kind,
        Avi.encodeMjpeg(vid.width, vid.height, 40000, vid.frames,
          quality = 95, subsample = false),
        m.width, m.height, m.frames, 0)
    }
    val hashes = Multimodal.videoPHashes(spark, media.union(variants), stride = 2)
    val dups = Multimodal.videoNearDups(hashes, maxHamming = 10, minMatched = 1,
        blockCols = Seq("width", "height"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // noise clips are mutually ~32 bits apart: any pair that forms must
    // be a raw/MJPEG twin
    dups.foreach { case (a, b) =>
      assert(b - a === 20000000L && twinIds.contains(a), s"non-twin pair ($a, $b)")
    }
    // and most twins survive q95 (pHash moves a few bits, not past 10)
    assert(dups.length * 2 >= twinIds.size,
      s"only ${dups.length} of ${twinIds.size} twins paired")
  }

  test("videoPHashes + videoNearDups: a brightness-shifted clip pairs " +
    "with its original on every sampled frame; independent clips don't; " +
    "the pigeonhole join equals brute force") {
    val docs = Tables.documents(spark, sf).limit(30)
    val media = Multimodal.videoFromDocuments(spark, docs)
    // variant of clip 5: every frame +3
    val m5 = media.filter(col("media_id") === 5L).head()
    val vid = graft.operators.Avi.decode(m5.payload)
    val shifted = vid.frames.map(f => f.map(p => math.min(255, (p & 0xff) + 3).toByte))
    val variant = Seq(Multimodal.MediaItem(905L, "vid/0",
      graft.operators.Avi.encode(vid.width, vid.height, 40000, shifted),
      vid.width, vid.height, shifted.size, 0)).toDS()
    val hashes = Multimodal.videoPHashes(spark, media.union(variant), stride = 2)
    val dups = Multimodal.videoNearDups(hashes, maxHamming = 3, minMatched = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getInt(5)))
    val hit = dups.find(p => p._1 == 5L && p._2 == 905L)
    assert(hit.isDefined, s"variant pair missing from ${dups.toSeq}")
    // both sides matched every sampled frame
    assert(hit.get._3 === hit.get._5.toLong && hit.get._4 === hit.get._6.toLong)
    // brute-force parity over the whole hash table
    val all = hashes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val byClip = all.groupBy(_._1).toSeq.sortBy(_._1)
    val want = (for {
      i <- byClip.indices; j <- (i + 1) until byClip.size
      (va, fa) = byClip(i); (vb, fb) = byClip(j)
      hits = for {
        a <- fa; b <- fb
        if java.lang.Long.bitCount(a._3 ^ b._3) <= 3
      } yield (a._2, b._2)
      if hits.nonEmpty
    } yield (va, vb, hits.map(_._1).distinct.length.toLong,
      hits.map(_._2).distinct.length.toLong, fa.head._4, fb.head._4)).toSet
    assert(dups.toSet === want)
  }

  test("audioFingerprints are amplitude-scale invariant and drive " +
    "time-aligned near-dup detection") {
    // clips need >= 2 windows (384 samples at 16 ms/8 ms) to fingerprint
    val docs = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 400).limit(20)
    val audio = Multimodal.audioFromDocuments(spark, docs)
    val fps = Multimodal.audioFingerprints(spark, audio, 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fps.nonEmpty)
    // window 0 never fingerprints (no predecessor)
    assert(fps.forall(_._2 >= 1L))
    // a scaled copy (x 0.9 with integer truncation) of a LONG clip
    // (synthetic 5000 samples — the doc fixtures top out ~560) shares
    // almost all aligned fingerprints
    def clip(id: Long, scaleNum: Int) = Multimodal.AudioItem(id,
      Multimodal.wavFromSamples(
        Array.tabulate(5000)(i =>
          ((Multimodal.sampleOfChar((i * 31 + 7).toChar).toInt * scaleNum) / 10)
            .toShort),
        16000), 16000)
    val pairDs = Seq(clip(100L, 10), clip(200L, 9)).toDS()
    val pairFps = Multimodal.audioFingerprints(spark, pairDs, 16, 8)
    val dups = Multimodal.audioNearDups(pairFps, minMatched = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dups.length === 1 && dups.head._1 === 100L && dups.head._2 === 200L)
    val total = pairFps.filter(col("media_id") === 100L).count()
    assert(dups.head._3 >= (total * 8) / 10,
      s"scaled copy matched only ${dups.head._3} of $total windows")
  }

  test("videoQuality gates: a black clip reads black=1/still=1/motion=0, " +
    "a frozen clip still=1, and a crafted 2-frame clip matches hand " +
    "arithmetic exactly") {
    def flat(v: Int): Array[Byte] = Array.fill[Byte](4 * 3 * 3)(v.toByte)
    def clip(id: Long, frames: Seq[Array[Byte]]) = Multimodal.MediaItem(
      id, "vid/0", graft.operators.Avi.encode(4, 3, 40000, frames),
      4, 3, frames.size, 0)
    val black = clip(1L, Seq(flat(0), flat(0), flat(0)))
    val frozen = clip(2L, Seq(flat(200), flat(200)))
    // f0 = rgb(10,10,10) → luma 10.000; f1 = rgb(12,13,14) → luma
    // 299·12+587·13+114·14 = 12.815; |Δ| = 2.815 per pixel
    val two = clip(3L, Seq(flat(10),
      Array.tabulate[Byte](4 * 3 * 3)(i => Seq(12, 13, 14)(i % 3).toByte)))
    val q = Multimodal.videoQuality(spark,
        Seq(black, frozen, two).toDS())
      .collect().map(v => v.media_id -> v).toMap
    assert(q(1L).black_frame_ratio === 1.0 && q(1L).still_ratio === 1.0 &&
      q(1L).motion_mean === 0.0 && q(1L).luma_mean === 0.0)
    assert(q(2L).black_frame_ratio === 0.0 && q(2L).still_ratio === 1.0 &&
      q(2L).motion_mean === 0.0 && q(2L).luma_mean === 200.0)
    val t = q(3L)
    assert(t.luma_mean === BigDecimal((10000.0 + 12815.0) / 2000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(t.black_frame_ratio === 1.0) // both frames under 16 gray levels
    assert(t.still_ratio === 0.0 && t.motion_mean === 2.815)
    // planted corpus: noise clips are never black or still
    val docs = Tables.documents(spark, sf).limit(30)
    val media = Multimodal.videoFromDocuments(spark, docs)
    Multimodal.videoQuality(spark, media).collect().foreach { v =>
      assert(v.black_frame_ratio === 0.0 && v.still_ratio === 0.0)
      assert(v.motion_mean > 10.0, s"noise motion ${v.motion_mean}")
    }
  }

  test("videoFrameFeatures samples every stride-th frame of the real " +
    "decode and measures the actual pixels; counts match the metadata " +
    "planner face") {
    val docs = Tables.documents(spark, sf).limit(40)
    val media = Multimodal.videoFromDocuments(spark, docs)
    // determinism + schema
    val f1 = Multimodal.videoFrameFeatures(spark, media, 2)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    val f2 = Multimodal.videoFrameFeatures(spark, media, 2)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    assert(f1.toSeq === f2.toSeq && f1.nonEmpty)
    // fan-out parity with the metadata-only planner face at the same stride
    val meta = Multimodal.sampleFrames(media.toDF(), 2).count()
    assert(f1.length.toLong === meta)
    // hand-check one frame: decode directly, stats must match the row
    val m = media.filter(col("media_id") === 7L).head()
    val vid = Avi.decode(m.payload)
    assert(vid.frames.length === m.frames)
    val expect = Multimodal.imageStats(
      Png.Image(vid.width, vid.height, 3, vid.frames(2)))
    val row = f1.find(r => r.media_id == 7L && r.frame_idx == 2).get
    assert((row.mean_r, row.var_g, row.luma_mean, row.edge_density) ===
      ((expect(0), expect(4), expect(6), expect(7))))
    // and the decoded frame equals the planted formula (container identity)
    val want = Array.tabulate(vid.width * vid.height * 3)(i =>
      Multimodal.plantFramePixel(7L, 2, i).toByte)
    assert(vid.frames(2).toSeq === want.toSeq)
    // stride 1 keeps every frame
    val all = Multimodal.videoFrameFeatures(spark, media, 1).count()
    val totalFrames = media.collect().map(_.frames.toLong).sum
    assert(all === totalFrames)
  }
}
