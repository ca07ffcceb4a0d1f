package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-item decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * transforms.
  *
  * Every decodable tier is STUB-FREE with the JDK alone: audio is real
  * RIFF/WAVE parse + 16-bit PCM arithmetic; images are real codecs for
  * all three web containers — PNG ([[Png]]: DEFLATE via `java.util.zip`,
  * all five scanline filters, CRC-verified chunks), JPEG ([[Jpeg]]: T.81
  * Huffman + pinned DCT, baseline and progressive, 4:2:0/4:4:4, restart
  * markers) and GIF ([[Gif]]: LZW, palettes, interlace) — sniffed per
  * payload by [[decodeImage]] and feeding the same real bilinear resize
  * and pixel statistics; video is uncompressed AVI or animated GIF
  * (composed disposal/transparency frames) behind [[decodeVideo]]. At
  * 100 TB the payloads stay columnar in parquet (no driver round-trip)
  * and every transform is `mapPartitions`, so one task decodes a whole
  * row-group batch and the bytes never leave the executors.
  */
object Multimodal {

  /** Typed media row: payload + metadata. */
  case class MediaItem(media_id: Long, kind: String, payload: Array[Byte],
                       width: Int, height: Int, frames: Int, sample_rate: Int)

  /** Per-image feature row over the REAL decode: per-channel mean and
    * population variance (row-major fixed-order accumulation), mean
    * BT.601 luminance, and edge density (fraction of interior pixels
    * whose central-difference luminance gradient exceeds
    * [[edgeThreshold]]). Gray images report the one channel in all three
    * slots; RGBA ignores alpha in the statistics (documented contract).
    * All ratios round 6 dp, all counts are exact integers.
    */
  case class ImageFeatures(media_id: Long, kind: String, width: Int, height: Int,
                           channels: Int, n_bytes: Int,
                           mean_r: Double, mean_g: Double, mean_b: Double,
                           var_r: Double, var_g: Double, var_b: Double,
                           luma_mean: Double, edge_density: Double)

  /** Edge gate: central-difference gradient (|dLx| + |dLy|) in integer
    * luma-millis (299r+587g+114b, no division) must exceed 32 gray levels
    * scaled by the same 1000.
    */
  val edgeThreshold = 32 * 1000

  /** Resized media row (payload re-encoded to the fitted dimensions). */
  case class ResizedItem(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int)

  /** Container-agnostic image decode: sniffs the payload magic — PNG
    * (`89 50`), JPEG (SOI `FF D8`), GIF (`GIF8`, first composed frame),
    * BMP (`BM`) or WebP (`RIFF....WEBP`, lossless VP8L; lossy rejects by
    * codec name inside [[Webp.decodeImage]]) — so the five image
    * containers mix freely in one media table, the way a real crawl's
    * image bytes do. Anything else rejects by name rather than guessing.
    */
  def decodeImage(payload: Array[Byte]): Png.Image = {
    require(payload != null && payload.length >= 4,
      "decodeImage: payload too short to carry an image container")
    if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P'.toByte) Png.decode(payload)
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      Jpeg.decode(payload)
    else if (payload(0) == 'G'.toByte && payload(1) == 'I'.toByte &&
      payload(2) == 'F'.toByte && payload(3) == '8'.toByte)
      Gif.decodeImage(payload)
    else if (payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
      Bmp.decode(payload)
    else if (payload.length >= 12 && payload(0) == 'R'.toByte &&
      payload(1) == 'I'.toByte && payload(2) == 'F'.toByte &&
      payload(3) == 'F'.toByte && payload(8) == 'W'.toByte &&
      payload(9) == 'E'.toByte && payload(10) == 'B'.toByte &&
      payload(11) == 'P'.toByte)
      Webp.decodeImage(payload)
    else if ((payload(0) == 'I'.toByte && payload(1) == 'I'.toByte &&
      payload(2) == 42 && payload(3) == 0) ||
      (payload(0) == 'M'.toByte && payload(1) == 'M'.toByte &&
        payload(2) == 0 && payload(3) == 42))
      Tiff.decode(payload)
    else throw new IllegalArgumentException(
      f"decodeImage: unrecognized image container (leading bytes " +
        f"0x${payload(0) & 0xff}%02X${payload(1) & 0xff}%02X; " +
        "PNG, JPEG, GIF, BMP, WebP and TIFF supported)")
  }

  /** Container-agnostic video decode: uncompressed AVI (`RIFF....AVI `),
    * animated WebP (`RIFF....WEBP`, full-canvas lossless ANMF frames) or
    * animated GIF (`GIF8`, composed per the pinned contract — delays are
    * centiseconds, so µs/frame = first delay ·10⁴, floored at one tick).
    * All yield the same top-down RGB [[Avi.Video]] shape, so every
    * frame operator is container-blind.
    */
  def decodeVideo(payload: Array[Byte]): Avi.Video = {
    require(payload != null && payload.length >= 4,
      "decodeVideo: payload too short to carry a video container")
    if (payload(0) == 'R'.toByte && payload(1) == 'I'.toByte &&
      payload(2) == 'F'.toByte && payload(3) == 'F'.toByte) {
      if (payload.length >= 12 && payload(8) == 'W'.toByte &&
        payload(9) == 'E'.toByte && payload(10) == 'B'.toByte &&
        payload(11) == 'P'.toByte) Webp.decodeAnim(payload)
      else Avi.decode(payload)
    }
    else if (payload(0) == 'G'.toByte && payload(1) == 'I'.toByte &&
      payload(2) == 'F'.toByte && payload(3) == '8'.toByte) {
      val anim = Gif.decode(payload)
      Avi.Video(anim.width, anim.height,
        math.max(anim.delaysCs.head, 1) * 10000, anim.frames)
    } else throw new IllegalArgumentException(
      f"decodeVideo: unrecognized video container (leading bytes " +
        f"0x${payload(0) & 0xff}%02X${payload(1) & 0xff}%02X; " +
        "AVI, animated WebP and animated GIF supported)")
  }

  /** Strided video decode — the frame-sampling fast path behind
    * [[videoFrameFeatures]] and [[videoPHashes]]: AVI chunks are
    * independent, so [[Avi.decodeStrided]] pixel-converts ONLY the
    * sampled frames (for MJPEG that skips the Huffman+IDCT on every
    * skipped frame — at stride s, ~1/s of the decode cost; at crawl
    * scale the stride IS the cost knob). GIF frames compose
    * cumulatively (disposal/transparency), so GIF takes the full decode
    * and samples after — correctness over speed where the format allows
    * no better. Returns (width, height, totalFrames, sampled
    * (index, rgb) pairs).
    */
  def decodeVideoStrided(payload: Array[Byte], stride: Int): (Int, Int, Int, IndexedSeq[(Int, Array[Byte])]) = {
    require(payload != null && payload.length >= 4,
      "decodeVideoStrided: payload too short to carry a video container")
    if (payload(0) == 'R'.toByte && payload(1) == 'I'.toByte &&
      payload(2) == 'F'.toByte && payload(3) == 'F'.toByte)
      Avi.decodeStrided(payload, stride)
    else {
      val vid = decodeVideo(payload)
      (vid.width, vid.height, vid.frames.length,
        (0 until vid.frames.length by stride).map(i => (i, vid.frames(i))))
    }
  }

  /** Apply an EXIF orientation (1..8) to decoded pixels — the transform
    * a crawl pipeline MUST run before features/hashing, or a rotated
    * phone photo near-dups with nothing. Pinned inverse maps (output
    * (x, y) reads the input at, with W×H the input dims; 5-8 swap dims):
    * 1 (x,y) · 2 (W−1−x, y) · 3 (W−1−x, H−1−y) · 4 (x, H−1−y) ·
    * 5 (y, x) · 6 (y, H−1−x) · 7 (W−1−y, H−1−x) · 8 (W−1−y, x).
    */
  def orientImage(img: Png.Image, orientation: Int): Png.Image = {
    require(orientation >= 1 && orientation <= 8,
      s"orientImage: orientation $orientation out of 1..8")
    if (orientation == 1) return img
    val Png.Image(w, h, ch, px) = img
    val swap = orientation >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Byte](px.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val (sx, sy) = orientation match {
          case 2 => (w - 1 - x, y)
          case 3 => (w - 1 - x, h - 1 - y)
          case 4 => (x, h - 1 - y)
          case 5 => (y, x)
          case 6 => (y, h - 1 - x)
          case 7 => (w - 1 - y, h - 1 - x)
          case 8 => (w - 1 - y, x)
        }
        var c = 0
        while (c < ch) {
          out((y * ow + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Png.Image(ow, oh, ch, out)
  }

  /** Aspect-fit target size inside a maxW×maxH box — never upscales,
    * never collapses below 1×1 (degenerate source dims count as 1).
    */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    val w0 = math.max(w, 1); val h0 = math.max(h, 1)
    val scale = math.min(math.min(maxW.toDouble / w0, maxH.toDouble / h0), 1.0)
    (math.max(1, math.floor(w0 * scale).toInt), math.max(1, math.floor(h0 * scale).toInt))
  }

  /** REAL aspect-fit batch resize: PNG decode → bilinear resample of the
    * actual pixels ([[Png.resizeBilinear]]) → canonical PNG re-encode.
    * Same `mapPartitions` shape as [[extractFeatures]] — codec state
    * amortizes per partition; payloads never leave the executors. The
    * reported width/height are the decoded-and-fitted truth, not the
    * caller's metadata (a lying metadata column can't skew the output).
    */
  def resize(spark: SparkSession, media: Dataset[MediaItem],
             maxW: Int, maxH: Int): Dataset[ResizedItem] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = decodeImage(m.payload)
        val (w, h) = fitBox(img.width, img.height, maxW, maxH)
        val fitted = if (w == img.width && h == img.height) img
                     else Png.resizeBilinear(img, w, h)
        ResizedItem(m.media_id, m.kind,
          Png.encode(fitted.width, fitted.height, fitted.channels, fitted.pixels),
          w, h)
      }
    }
  }

  /** The planted-pixel formula (spec for the fixture replica): a
    * splitmix-style mix of (doc id, flat sample index) → one 8-bit
    * sample. Closed-form, so the replica needs no sequential state.
    */
  def plantPixel(docId: Long, i: Long): Int = {
    var z = docId * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
    z ^= (z >>> 31); z *= 0x94D049BB133111EBL
    ((z >>> 40) & 0xff).toInt
  }

  /** Planted image dimensions from the documents fixture row (spec for
    * the fixture replica): small enough that 60k payloads stay a few MB,
    * varied enough that no two defilter/resize paths collapse.
    */
  def plantDims(docId: Long, nChars: Int): (Int, Int) =
    (4 + (docId % 29).toInt, 3 + (nChars % 23))

  /** Build a media table from the documents fixture: each row plants a
    * deterministic RGB noise image (pixel = [[plantPixel]], dims =
    * [[plantDims]]) wrapped in a REAL PNG container whose scanline filter
    * rotates through all five types ((doc_id + y) mod 5) — so every
    * defilter path sits inside the oracle gate. A real pipeline reads
    * image files the same way (`binaryFile` source → binary column +
    * metadata).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h) = plantDims(id, nChars)
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) { px(i) = plantPixel(id, i).toByte; i += 1 }
          MediaItem(id, s"img/${id % 3}",
            Png.encode(w, h, 3, px, y => ((id + y) % 5).toInt),
            w, h, (id % 30 + 1).toInt, 16000)
        }
      }
  }

  /** JPEG planting parameters (spec for the fixture replica): grayscale
    * for doc_id % 3 == 0 else RGB; 4:2:0 subsampling when doc_id % 3 == 2
    * (so 4:4:4 color and gray both stay covered); quality
    * 35 + (doc_id % 13)·5 (35..95, sweeping the quant-table scaling);
    * restart interval 2 MCUs when doc_id % 4 == 0 (so DRI/RST sits
    * inside the oracle gate). Returns (channels, subsample, quality,
    * restartMcus).
    */
  def jpegPlantParams(docId: Long): (Int, Boolean, Int, Int) = (
    if (docId % 3 == 0) 1 else 3,
    docId % 3 == 2,
    35 + (docId % 13).toInt * 5,
    if (docId % 4 == 0) 2 else 0)

  /** The JPEG face of [[mediaFromDocuments]]: the same planted noise
    * pixels ([[plantPixel]] / [[plantDims]]) wrapped in a REAL baseline
    * JPEG container with per-id channel/sampling/quality/restart variety
    * ([[jpegPlantParams]]) — every marker and entropy path the encoder
    * can emit sits inside the oracle gate. Downstream operators don't
    * know or care: [[decodeImage]] sniffs the container.
    */
  def jpegMediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h) = plantDims(id, nChars)
          val (ch, sub, quality, rst) = jpegPlantParams(id)
          val px = new Array[Byte](w * h * ch)
          var i = 0
          while (i < px.length) { px(i) = plantPixel(id, i).toByte; i += 1 }
          MediaItem(id, s"jpg/${id % 3}",
            Jpeg.encode(w, h, ch, px, quality, sub, rst),
            w, h, (id % 30 + 1).toInt, 16000)
        }
      }
  }

  /** GIF planting parameters (spec for the fixture replica):
    * palette size 4/16/64/256 by doc_id % 4; palette bytes =
    * [[plantPixel]](doc_id + 9·10⁶, k); background index =
    * [[plantPixel]](doc_id + 13, 0) mod size; interlace when
    * doc_id % 5 == 0; a transparent index ([[plantPixel]](doc_id + 77, 0)
    * mod size) when doc_id % 3 == 1 — those pixels show the background
    * color on the first frame. Returns (paletteSize, palette, bgIndex,
    * interlace, transparentIdx).
    */
  def gifPlantParams(docId: Long): (Int, Array[Byte], Int, Boolean, Option[Int]) = {
    val ps = Seq(4, 16, 64, 256)((docId % 4).toInt)
    val pal = Array.tabulate(ps * 3)(k => plantPixel(docId + 9000000L, k).toByte)
    val bg = plantPixel(docId + 13, 0) % ps
    val trans = if (docId % 3 == 1) Some(plantPixel(docId + 77, 0) % ps) else None
    (ps, pal, bg, docId % 5 == 0, trans)
  }

  /** The GIF face of [[mediaFromDocuments]]: planted palette indices
    * (index i = [[plantPixel]](doc_id, i) mod paletteSize) in a REAL
    * GIF89a container with per-id palette-size/interlace/transparency
    * variety ([[gifPlantParams]]) — LZW, sub-block framing and the
    * interlace row order all sit inside the oracle gate.
    */
  def gifMediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h) = plantDims(id, nChars)
          val (ps, pal, bg, inter, trans) = gifPlantParams(id)
          val idx = Array.tabulate(w * h)(i => (plantPixel(id, i) % ps).toByte)
          MediaItem(id, s"gif/${id % 3}",
            Gif.encode(w, h, pal, Seq(Gif.FrameSpec(0, 0, w, h, idx,
              transparent = trans, interlace = inter)), bgIndex = bg),
            w, h, 1, 16000)
        }
      }
  }

  /** BMP planting parameters (spec for the fixture replica), sweeping
    * every decoder path: doc_id % 3 picks 24-bit bottom-up / 24-bit
    * TOP-DOWN (negative biHeight) / 8-bit palettized; the palette
    * variant sizes 4/16/64/256 by doc_id % 4 with palette bytes
    * [[plantPixel]](doc_id + 7·10⁶, k), indices
    * [[plantPixel]](doc_id, p) mod size, and top-down storage when
    * doc_id % 5 == 0. Returns (variant, paletteSize, palette, topDown).
    */
  def bmpPlantParams(docId: Long): (Int, Int, Array[Byte], Boolean) = {
    val ps = Seq(4, 16, 64, 256)((docId % 4).toInt)
    val pal = Array.tabulate(ps * 3)(k => plantPixel(docId + 7000000L, k).toByte)
    ((docId % 3).toInt, ps, pal, docId % 5 == 0)
  }

  /** The BMP face of [[mediaFromDocuments]]: the same planted pixels
    * wrapped in a REAL BMP per [[bmpPlantParams]] — both row orders,
    * both depths and all palette sizes sit inside the oracle gate. BMP
    * is lossless, so the replica is the planted formula itself (24-bit)
    * or one palette lookup (8-bit). [[decodeImage]] sniffs 'BM'.
    */
  def bmpMediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h) = plantDims(id, nChars)
          val (variant, ps, pal, topDown) = bmpPlantParams(id)
          val payload = variant match {
            case 0 | 1 =>
              val px = new Array[Byte](w * h * 3)
              var i = 0
              while (i < px.length) { px(i) = plantPixel(id, i).toByte; i += 1 }
              Bmp.encode(w, h, px, topDown = variant == 1)
            case _ =>
              val idx = Array.tabulate(w * h)(i => (plantPixel(id, i) % ps).toByte)
              Bmp.encodePalette(w, h, idx, pal, topDown = topDown)
          }
          MediaItem(id, s"bmp/${id % 3}", payload, w, h, (id % 30 + 1).toInt, 16000)
        }
      }
  }

  /** Animated-GIF planting (spec for the fixture replica): frame count
    * 2 + doc_id % 4; frame 0 covers the screen, frame f > 0 draws the
    * sub-rectangle (left = f mod max(w/2,1), top = f mod max(h/2,1),
    * w−left × h−top); frame f's indices are
    * [[plantPixel]](doc_id·31 + f, i) mod paletteSize; disposal
    * (doc_id + f) mod 4; a transparent index
    * ([[plantPixel]](doc_id + f, 7) mod size) when (doc_id + f) % 3 == 0.
    * Palette/background from [[gifPlantParams]]; delay 4 cs everywhere.
    */
  def gifVideoFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h) = plantDims(id, nChars)
          val (ps, pal, bg, _, _) = gifPlantParams(id)
          val n = 2 + (id % 4).toInt
          val frames = (0 until n).map { f =>
            val (left, top) =
              if (f == 0) (0, 0)
              else (f % math.max(w / 2, 1), f % math.max(h / 2, 1))
            val fw = w - left; val fh = h - top
            val idx = Array.tabulate(fw * fh)(i =>
              (plantPixel(id * 31 + f, i) % ps).toByte)
            Gif.FrameSpec(left, top, fw, fh, idx,
              transparent = if ((id + f) % 3 == 0)
                Some(plantPixel(id + f, 7) % ps) else None,
              disposal = ((id + f) % 4).toInt)
          }
          MediaItem(id, s"gifv/${id % 3}",
            Gif.encode(w, h, pal, frames, bgIndex = bg), w, h, n, 16000)
        }
      }
  }

  /** REAL per-image feature extraction: container-sniffed decode
    * (PNG or baseline JPEG via [[decodeImage]]) then one fixed-order
    * row-major pass for the channel statistics and one integer-luma pass
    * for the edge density (the `mapPartitions` shape amortizes any codec
    * state per partition, not per row).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaItem]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = decodeImage(m.payload)
        val f = imageStats(img)
        ImageFeatures(m.media_id, m.kind, img.width, img.height, img.channels,
          m.payload.length,
          f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }
    }
  }

  /** The feature arithmetic (shared spec for the fixture replica):
    * returns (mean_r, mean_g, mean_b, var_r, var_g, var_b, luma_mean,
    * edge_density), each rounded 6 dp LAST — intermediate sums accumulate
    * in row-major order so the doubles are bit-reproducible.
    */
  def imageStats(img: Png.Image): Array[Double] = {
    val Png.Image(w, h, ch, px) = img
    val n = w * h
    // channel → RGB slot map: gray broadcasts, RGBA drops alpha
    def chanAt(idx: Int, slot: Int): Int =
      if (ch == 1) px(idx) & 0xff else px(idx * ch + slot) & 0xff
    val sum = new Array[Double](3); val sumSq = new Array[Double](3)
    var lumaSum = 0.0
    val luma = new Array[Int](n) // integer luma-millis for the edge pass
    var i = 0
    while (i < n) {
      val r = chanAt(i, 0); val g = chanAt(i, 1); val b = chanAt(i, 2)
      sum(0) += r; sum(1) += g; sum(2) += b
      sumSq(0) += r.toDouble * r; sumSq(1) += g.toDouble * g; sumSq(2) += b.toDouble * b
      val lm = 299 * r + 587 * g + 114 * b
      luma(i) = lm
      lumaSum += lm / 1000.0
      i += 1
    }
    var edges = 0L
    if (w > 2 && h > 2) {
      var y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          val gx = math.abs(luma(y * w + x + 1) - luma(y * w + x - 1))
          val gy = math.abs(luma((y + 1) * w + x) - luma((y - 1) * w + x))
          if (gx + gy > edgeThreshold) edges += 1
          x += 1
        }
        y += 1
      }
    }
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val interior = (w - 2).toLong * (h - 2).toLong
    Array(
      r6(sum(0) / n), r6(sum(1) / n), r6(sum(2) / n),
      r6(sumSq(0) / n - (sum(0) / n) * (sum(0) / n)),
      r6(sumSq(1) / n - (sum(1) / n) * (sum(1) / n)),
      r6(sumSq(2) / n - (sum(2) / n) * (sum(2) / n)),
      r6(lumaSum / n),
      if (interior <= 0) 0.0 else r6(edges.toDouble / interior))
  }

  /** Perceptual hash (pHash family, DCT variant) over the REAL decode —
    * IMAGE near-duplicate detection for a training corpus, the visual
    * analog of SimHash. The whole chain is pinned so the hash is
    * engine-reproducible (this doc comment is the fixture-replica spec):
    *   1. gray: per pixel g = (299r + 587g + 114b + 500) / 1000, integer
    *      division, clamped 0..255 (gray inputs pass through; alpha
    *      ignored);
    *   2. [[Png.resizeBilinear]] the 1-channel image to 32×32;
    *   3. separable 2-D DCT-II, rows then columns, plain cosine sums in
    *      ascending index order, no normalization: C(u,v) = Σ_y Σ_x
    *      p(y,x)·cos((2x+1)uπ/64)·cos((2y+1)vπ/64);
    *   4. take the low-frequency 8×8 block, EXCLUDE the DC term, sort
    *      the remaining 63 coefficients ascending, median = element 31;
    *   5. bit u·8+v of the hash is set iff C(u,v) > median (the DC bit
    *      position stays 0) — ~half the bits set by construction, so
    *      random images land ~32 hamming apart while brightness shifts
    *      (pure DC) land at 0.
    */
  def imagePHash(spark: SparkSession, media: Dataset[MediaItem]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m => (m.media_id, pHashOf(decodeImage(m.payload))) }
    }.toDF("media_id", "phash")
  }

  /** [[imagePHash]] + the DECODED dims — the blocking key for
    * [[phashPairsBlocked]]. Dims come from the decode, not the metadata
    * columns, so a mislabeled row can't cross blocks.
    */
  def imagePHashDims(spark: SparkSession, media: Dataset[MediaItem]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = decodeImage(m.payload)
        (m.media_id, img.width, img.height, pHashOf(img))
      }
    }.toDF("media_id", "width", "height", "phash")
  }

  /** The pinned hash arithmetic (shared spec for the fixture replica). */
  def pHashOf(img: Png.Image): Long = {
    val Png.Image(w, h, ch, px) = img
    val gray = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val (r, g, b) =
        if (ch == 1) { val v = px(i) & 0xff; (v, v, v) }
        else ((px(i * ch) & 0xff), (px(i * ch + 1) & 0xff), (px(i * ch + 2) & 0xff))
      val lm = (299 * r + 587 * g + 114 * b + 500) / 1000
      gray(i) = math.min(255, lm).toByte
      i += 1
    }
    val small = Png.resizeBilinear(Png.Image(w, h, 1, gray), 32, 32).pixels
    // separable DCT-II: rows, then columns (ascending index order). Only
    // u, v < 8 are ever read, so the row pass stops at 8 — coefficients
    // are exactly the full transform's low block either way.
    val rows = new Array[Double](32 * 8)
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 32) {
          s += (small(y * 32 + x) & 0xff) * math.cos((2 * x + 1) * u * math.Pi / 64)
          x += 1
        }
        rows(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](8 * 8)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 32) {
          s += rows(yy * 8 + u) * math.cos((2 * yy + 1) * v * math.Pi / 64)
          yy += 1
        }
        coef(u * 8 + v) = s
        u += 1
      }
      v += 1
    }
    val ac = coef.indices.filter(_ != 0).map(coef).sorted
    val median = ac(31)
    var hash = 0L
    var k = 1
    while (k < 64) {
      if (coef(k) > median) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** Near-duplicate image pairs from [[imagePHash]] signatures: exact
    * pigeonhole candidate join — the 64 bits split into maxHamming+1
    * contiguous chunks (widths differ by at most one), so any pair within
    * maxHamming hamming distance shares at least one identical chunk —
    * then the hamming filter runs inside the bounded pair expansion.
    * Same one-narrow-shuffle bucket shape as SimHash
    * (`Dedup.simhashPairs`): the corpus shuffles once on (chunk index,
    * chunk value), buckets expand locally, output is (a, b, hamming)
    * with a < b.
    */
  def phashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"phashPairs: maxHamming must be in [0, 63], got $maxHamming")
    phashChunked(hashes, maxHamming)
      .groupBy("ci", "cv")
      .agg(sort_array(collect_set(struct(col("media_id"), col("phash")))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(Dedup.pairsOf(col("ms"))).as("p"))
      .select(col("p.a.media_id").as("a"), col("p.b.media_id").as("b"),
        bit_count(col("p.a.phash").bitwiseXOR(col("p.b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[phashPairs]] with a metadata BLOCKING key — the scale design for
    * wide radii. At radius r the pigeonhole chunks carry only
    * 64/(r+1) bits (radius 10 → ~6-bit chunks, 64 buckets), so bucket
    * populations grow linearly with the corpus and the within-bucket
    * pairing quadratically — ScaleProof measured the unblocked radius-10
    * join at 17× on 10× data. Codec twins (the radius-10 use case)
    * always share DECODED dims, so blocking on (width, height) — or any
    * twin-invariant metadata — multiplies the bucket key space by the
    * corpus's dims diversity (thousands of distinct sizes in a real
    * crawl) and restores the near-linear curve. Pairs are exact within a
    * block; cross-dims near-dups (true resizes) are [[phashPairs]] at
    * the tight radius or the embedding path's job.
    */
  def phashPairsBlocked(hashes: DataFrame, maxHamming: Int,
                        blockCols: Seq[String]): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"phashPairsBlocked: maxHamming must be in [0, 63], got $maxHamming")
    require(blockCols.nonEmpty,
      "phashPairsBlocked: no blocking columns (use phashPairs)")
    phashChunked(hashes.select((Seq("media_id", "phash") ++ blockCols)
        .map(col): _*), maxHamming, keep = blockCols)
      .groupBy((Seq("ci", "cv") ++ blockCols).map(col): _*)
      .agg(sort_array(collect_set(struct(col("media_id"), col("phash")))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(Dedup.pairsOf(col("ms"))).as("p"))
      .select(col("p.a.media_id").as("a"), col("p.b.media_id").as("b"),
        bit_count(col("p.a.phash").bitwiseXOR(col("p.b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Chunk fan-out shared by the pigeonhole machinery: one row per
    * (chunk index, chunk value) of each hash, chunks tiling all 64 bits
    * with widths differing by at most one.
    */
  private def phashChunked(hashes: DataFrame, maxHamming: Int,
                           keep: Seq[String] = Nil): DataFrame = {
    val n = maxHamming + 1
    val base = 64 / n; val rem = 64 % n
    val chunkDefs = (0 until n).scanLeft((0, 0)) { case ((off, wid), i) =>
      (off + wid, base + (if (i < rem) 1 else 0))
    }.tail
    val chunks = chunkDefs.zipWithIndex.map { case ((off, wid), i) =>
      val mask = if (wid == 64) -1L else (1L << wid) - 1L
      struct(lit(i).as("ci"),
        shiftrightunsigned(col("phash"), off).bitwiseAND(lit(mask)).as("cv"))
    }
    val kept = keep.map(col)
    hashes.select(col("media_id") +: col("phash") +: kept :+
        explode(array(chunks: _*)).as("ch"): _*)
      .select(col("media_id") +: col("phash") +: kept :+
        col("ch.ci").as("ci") :+ col("ch.cv").as("cv"): _*)
  }

  /** STREAMING face of [[phashPairs]] — the crawl-time image-dedup gate:
    * find every near-dup pair that INVOLVES the new micro-batch, i.e.
    * batch×accumulated plus batch×batch, without re-pairing the
    * accumulated corpus against itself. The batch's chunk rows equi-join
    * the full side's (accumulated ∪ batch) on (chunk index, chunk value)
    * — the same exact pigeonhole cover, so together with the earlier
    * epochs' outputs the pair set over the whole corpus is complete:
    * every pair surfaces exactly once, in the epoch its LATER member
    * arrives (StreamingSpec proves batch-accumulated equality with the
    * one-shot join). Scale shape: the probe side is batch-sized; the
    * full side shuffles once on the chunk key per epoch — or bucket the
    * accumulated hash table by (ci, cv) to make steady-state ingest
    * shuffle-free on the big side.
    */
  def phashPairsIncremental(accumulated: DataFrame, batch: DataFrame,
                            maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"phashPairsIncremental: maxHamming must be in [0, 63], got $maxHamming")
    val probe = phashChunked(batch, maxHamming)
      .toDF("x_id", "x_hash", "ci", "cv")
    val full = phashChunked(accumulated.unionByName(batch), maxHamming)
      .toDF("y_id", "y_hash", "ci", "cv")
    probe.join(full, Seq("ci", "cv"))
      .filter(col("x_id") =!= col("y_id") &&
        bit_count(col("x_hash").bitwiseXOR(col("y_hash"))) <= maxHamming)
      .select(least(col("x_id"), col("y_id")).as("a"),
        greatest(col("x_id"), col("y_id")).as("b"),
        bit_count(col("x_hash").bitwiseXOR(col("y_hash"))).as("hamming"))
      .distinct()
  }

  /** The planted-video-pixel formula (spec for the fixture replica): the
    * frame index folds into the [[plantPixel]] key so every frame of
    * every clip is distinct but closed-form.
    */
  def plantFramePixel(docId: Long, frame: Int, i: Long): Int =
    plantPixel(docId * 1000003L + frame, i)

  /** Planted video geometry (spec for the fixture replica): small frames,
    * 2..6 of them, 25 fps.
    */
  def plantVideoDims(docId: Long, nChars: Int): (Int, Int, Int) =
    (4 + (docId % 9).toInt, 3 + (nChars % 7), (docId % 5 + 2).toInt)

  /** Build a VIDEO table from the documents fixture: each row plants
    * deterministic RGB frames ([[plantFramePixel]]) wrapped in a REAL
    * uncompressed AVI container ([[Avi.encode]] — bottom-up BGR padded
    * DIB rows, so the decoder's unswizzle path is exercised on every
    * clip). The `frames` metadata column carries the true frame count —
    * the metadata-only [[sampleFrames]] planner face and the decoding
    * [[videoFrameFeatures]] agree on fan-out by construction.
    */
  def videoFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h, nf) = plantVideoDims(id, nChars)
          val frames = (0 until nf).map { f =>
            val px = new Array[Byte](w * h * 3)
            var i = 0
            while (i < px.length) { px(i) = plantFramePixel(id, f, i).toByte; i += 1 }
            px
          }
          MediaItem(id, s"vid/${id % 3}", Avi.encode(w, h, 40000, frames),
            w, h, nf, 0)
        }
      }
  }

  /** MJPEG planting parameters (spec for the fixture replica): quality
    * 55 + (doc_id % 5)·10 (55..95) and 4:2:0 subsampling when
    * doc_id % 2 == 0 — per-clip variety so both chroma paths and the
    * full quant-scale sweep sit inside the oracle gate. Returns
    * (quality, subsample).
    */
  def mjpegPlantParams(docId: Long): (Int, Boolean) =
    (55 + (docId % 5).toInt * 10, docId % 2 == 0)

  /** The MJPEG face of [[videoFromDocuments]]: the SAME planted frames
    * ([[plantFramePixel]] / [[plantVideoDims]]) wrapped in an MJPEG AVI
    * ([[Avi.encodeMjpeg]] — every '00dc' chunk a standalone baseline
    * JPEG), the classic webcam/capture-card shape. Downstream operators
    * don't know or care: [[decodeVideo]] sniffs RIFF and [[Avi.decode]]
    * dispatches on biCompression, so MJPEG clips flow through the
    * unchanged per-frame feature/pHash/dedup operators.
    */
  def mjpegVideoFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h, nf) = plantVideoDims(id, nChars)
          val (quality, sub) = mjpegPlantParams(id)
          val frames = (0 until nf).map { f =>
            val px = new Array[Byte](w * h * 3)
            var i = 0
            while (i < px.length) { px(i) = plantFramePixel(id, f, i).toByte; i += 1 }
            px
          }
          MediaItem(id, s"mjpg/${id % 3}",
            Avi.encodeMjpeg(w, h, 40000, frames, quality, sub), w, h, nf, 0)
        }
      }
  }

  /** Per-frame feature row ([[videoFrameFeatures]]). */
  case class VideoFrameFeatures(media_id: Long, frame_idx: Int,
                                width: Int, height: Int, n_frames: Int,
                                mean_r: Double, mean_g: Double, mean_b: Double,
                                var_r: Double, var_g: Double, var_b: Double,
                                luma_mean: Double, edge_density: Double)

  /** REAL frame sampling + per-frame features: parse the container ONCE
    * per clip, pixel-convert ONLY every `stride`-th frame (0, stride,
    * 2·stride, … — the same index arithmetic as the metadata-only
    * [[sampleFrames]]; [[decodeVideoStrided]] skips the skipped frames'
    * decode work outright where chunks are independent), and run the
    * pinned [[imageStats]] pass on each kept frame's actual pixels. Same
    * `mapPartitions` batch shape as the rest of the tiers — payload
    * bytes never leave the executor, one task decodes a row-group batch
    * of clips.
    */
  def videoFrameFeatures(spark: SparkSession, media: Dataset[MediaItem],
                         stride: Int): Dataset[VideoFrameFeatures] = {
    import spark.implicits._
    require(stride >= 1, s"videoFrameFeatures: stride must be >= 1, got $stride")
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (w, h, nf, sampled) = decodeVideoStrided(m.payload, stride)
        sampled.iterator.map { case (f, rgb) =>
          val st = imageStats(Png.Image(w, h, 3, rgb))
          VideoFrameFeatures(m.media_id, f, w, h, nf,
            st(0), st(1), st(2), st(3), st(4), st(5), st(6), st(7))
        }
      }
    }
  }

  /** Per-sampled-frame perceptual hashes ([[videoNearDups]]' signature
    * stage): decode the AVI once, hash every `stride`-th frame with the
    * pinned [[pHashOf]] chain, and carry the clip's sampled-frame count
    * on every row so the match stage needs no second scan. Same
    * mapPartitions shape as the rest of the tier.
    */
  def videoPHashes(spark: SparkSession, media: Dataset[MediaItem],
                   stride: Int): DataFrame = {
    import spark.implicits._
    require(stride >= 1, s"videoPHashes: stride must be >= 1, got $stride")
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (w, h, _, sampled) = decodeVideoStrided(m.payload, stride)
        sampled.iterator.map { case (f, rgb) =>
          (m.media_id, f, pHashOf(Png.Image(w, h, 3, rgb)), sampled.size, w, h)
        }
      }
    }.toDF("media_id", "frame_idx", "phash", "n_sampled", "width", "height")
  }

  /** VIDEO near-duplicate detection — frame-level pHash matching (the
    * moving-picture analog of [[phashPairs]]): frame hashes pair through
    * the same exact pigeonhole chunk join at `maxHamming`, then clip
    * pairs aggregate DISTINCT matched frame indices per side; a pair
    * reports when BOTH sides match at least `minMatched` of their
    * sampled frames. Output (a, b, matched_a, matched_b, n_a, n_b) with
    * a < b. Scale shape: one narrow shuffle on (chunk, value) over the
    * frame-hash table, bounded bucket expansion, then one clip-pair
    * aggregation — nothing corpus-wide beyond the hash table itself.
    */
  def videoNearDups(frameHashes: DataFrame, maxHamming: Int,
                    minMatched: Int, blockCols: Seq[String] = Nil): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"videoNearDups: maxHamming must be in [0, 63], got $maxHamming")
    require(minMatched >= 1, s"videoNearDups: minMatched must be >= 1")
    val n = maxHamming + 1
    val base = 64 / n; val rem = 64 % n
    val chunkDefs = (0 until n).scanLeft((0, 0)) { case ((off, wid), i) =>
      (off + wid, base + (if (i < rem) 1 else 0))
    }.tail
    val chunks = chunkDefs.zipWithIndex.map { case ((off, wid), i) =>
      val mask = if (wid == 64) -1L else (1L << wid) - 1L
      struct(lit(i).as("ci"),
        shiftrightunsigned(col("phash"), off).bitwiseAND(lit(mask)).as("cv"))
    }
    // rows carry (clip, frame, hash, count); buckets key on the chunk —
    // plus the blocking columns when given (wide radii need them: see
    // phashPairsBlocked's scale note; codec twins share frame dims)
    val r = struct(col("media_id").as("v"), col("frame_idx").as("f"),
      col("phash").as("h"), col("n_sampled").as("n"))
    frameHashes
      .select(r.as("r") +: blockCols.map(col) :+
        explode(array(chunks: _*)).as("ch"): _*)
      .select(col("r") +: blockCols.map(col) :+
        col("ch.ci").as("ci") :+ col("ch.cv").as("cv"): _*)
      .groupBy((Seq("ci", "cv") ++ blockCols).map(col): _*)
      .agg(sort_array(collect_set(col("r"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(Dedup.pairsOf(col("ms"))).as("p"))
      // frames of the SAME clip never pair (self-similar stills are not
      // duplicates of another video); sort_array ordering gives a < b
      .filter(col("p.a.v") < col("p.b.v") &&
        bit_count(col("p.a.h").bitwiseXOR(col("p.b.h"))) <= maxHamming)
      .select(col("p.a.v").as("a"), col("p.b.v").as("b"),
        col("p.a.f").as("fa"), col("p.b.f").as("fb"),
        col("p.a.n").as("n_a"), col("p.b.n").as("n_b"))
      .distinct()
      .groupBy("a", "b", "n_a", "n_b")
      .agg(countDistinct(col("fa")).as("matched_a"),
        countDistinct(col("fb")).as("matched_b"))
      .filter(col("matched_a") >= minMatched && col("matched_b") >= minMatched)
      .select(col("a"), col("b"), col("matched_a"), col("matched_b"),
        col("n_a"), col("n_b"))
  }

  /** Haitsma–Kalker-style audio fingerprints (the robust-hash family
    * broadcast fingerprinting uses; Haitsma & Kalker 2002): per 25 ms-class
    * window, the pinned FFT's power spectrum folds into 32 equal bands
    * over bins 1..256 (ascending sums), and bit m of the window's
    * 31-bit fingerprint is the SIGN of the band-energy double difference
    * (E(t,m) − E(t,m+1)) − (E(t−1,m) − E(t−1,m+1)) — energy SCALING
    * cancels entirely (an amplitude-scaled copy fingerprints
    * identically), which is what makes exact fingerprint equality a
    * meaningful match key. Window 0 of each clip has no predecessor and
    * emits no fingerprint. Same decode-once mapPartitions shape as
    * [[audioSpectralFeatures]].
    */
  def audioFingerprints(spark: SparkSession, audio: Dataset[AudioItem],
                        windowMs: Int, strideMs: Int): DataFrame = {
    import spark.implicits._
    require(windowMs > 0 && strideMs > 0,
      s"audioFingerprints: window/stride must be positive, got $windowMs/$strideMs")
    audio.mapPartitions { it =>
      it.flatMap { a =>
        val (rate, xs) = wavDecode(a.payload)
        val win = rate.toLong * windowMs / 1000
        val hop = rate.toLong * strideMs / 1000
        require(win >= 1 && hop >= 1,
          s"audioFingerprints: window/stride ($windowMs ms/$strideMs ms) " +
            s"is shorter than one sample at sample_rate $rate")
        val nWin = if (xs.length < win) 0L else (xs.length - win) / hop + 1
        var fftN = 1
        while (fftN < win) fftN <<= 1
        require(fftN >= 256,
          s"audioFingerprints: window of $win samples pads to $fftN-point " +
            "FFT — need >= 256 bins for the 32-band fold (use a longer window)")
        var prev: Array[Double] = null
        (0L until nWin).iterator.flatMap { wi =>
          val bands = bandEnergies(xs, (wi * hop).toInt, win.toInt, fftN, rate)
          val out =
            if (prev == null) Iterator.empty
            else {
              var fp = 0L
              var m = 0
              while (m < 31) {
                if ((bands(m) - bands(m + 1)) - (prev(m) - prev(m + 1)) > 0)
                  fp |= (1L << m)
                m += 1
              }
              Iterator.single((a.media_id, wi, fp))
            }
          prev = bands
          out
        }
      }
    }.toDF("media_id", "window_idx", "fingerprint")
  }

  /** The pinned band-energy arithmetic (shared spec for the fixture
    * replica): run [[spectralOfWindow]]'s FFT setup, then fold the power
    * spectrum's bins 1..256 into 32 ascending sums of 8·(N/512)
    * consecutive bins each (so any pow2 N ≥ 256 tiles exactly).
    */
  def bandEnergies(xs: Array[Short], s0: Int, win: Int, fftN: Int,
                   rate: Int): Array[Double] = {
    val re = new Array[Double](fftN); val im = new Array[Double](fftN)
    var i = 0
    while (i < win) { re(i) = xs(s0 + i) / 32768.0; i += 1 }
    fftInPlace(re, im)
    val perBand = fftN / 2 / 32 // bins per band; fftN >= 256 → >= 4
    val bands = new Array[Double](32)
    var m = 0
    while (m < 32) {
      var s = 0.0
      var k = 1 + m * perBand
      val end = 1 + (m + 1) * perBand
      while (k < end) { s += re(k) * re(k) + im(k) * im(k); k += 1 }
      bands(m) = s
      m += 1
    }
    bands
  }

  /** AUDIO near-duplicate detection over [[audioFingerprints]]: clips
    * pair when at least `minMatched` window positions carry EQUAL
    * fingerprints at the SAME window index (time-aligned copies — the
    * re-encode/re-gain duplicate class; the sign construction makes
    * amplitude scaling a non-event). One equi-join key (window_idx,
    * fingerprint), bounded bucket expansion, one clip-pair aggregation.
    */
  def audioNearDups(fingerprints: DataFrame, minMatched: Int): DataFrame = {
    require(minMatched >= 1, "audioNearDups: minMatched must be >= 1")
    fingerprints
      .groupBy("window_idx", "fingerprint")
      .agg(sort_array(collect_set(col("media_id"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(col("window_idx"), explode(Dedup.pairsOf(col("ms"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("window_idx"))
      .distinct()
      .groupBy("a", "b")
      .agg(count(lit(1)).as("matched_windows"))
      .filter(col("matched_windows") >= minMatched)
  }

  /** Per-clip video QUALITY row ([[videoQuality]]). */
  case class VideoQuality(media_id: Long, width: Int, height: Int,
                          n_frames: Int, luma_mean: Double,
                          black_frame_ratio: Double, still_ratio: Double,
                          motion_mean: Double)

  /** Video curation signals over the REAL decode — the gates a video
    * training pipeline filters on (black/corrupt clips, stills
    * masquerading as video, motion level). All accumulation is EXACT
    * integer luma-millis (299r + 587g + 114b per pixel) with one double
    * division + 6-dp round at the very end, so the signals are
    * engine-reproducible (this doc comment is the fixture-replica spec):
    *   - luma_mean: Σ over all frames' pixels of luma-millis, divided by
    *     1000·n·nf;
    *   - black_frame_ratio: fraction of frames whose mean luma is under
    *     16 gray levels (integer compare: frame lumaSum < 16000·n);
    *   - still_ratio: fraction of ADJACENT frame pairs whose mean
    *     absolute per-pixel luma difference is under 2 gray levels
    *     (pair madSum < 2000·n); 0.0 when nf < 2;
    *   - motion_mean: mean over adjacent pairs of madSum/(1000·n) —
    *     average per-pixel luma change in gray levels; 0.0 when nf < 2.
    * One decode per clip in the tier's mapPartitions batch shape.
    */
  def videoQuality(spark: SparkSession, media: Dataset[MediaItem]): Dataset[VideoQuality] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val vid = decodeVideo(m.payload)
        val n = vid.width * vid.height
        val nf = vid.frames.length
        def lumaOf(f: Array[Byte]): Array[Int] =
          Array.tabulate(n) { i =>
            299 * (f(i * 3) & 0xff) + 587 * (f(i * 3 + 1) & 0xff) +
              114 * (f(i * 3 + 2) & 0xff)
          }
        var lumaTotal = 0L; var black = 0
        var still = 0; var madTotal = 0L
        var prev: Array[Int] = null
        var fi = 0
        while (fi < nf) {
          val lum = lumaOf(vid.frames(fi))
          var fs = 0L; var i = 0
          while (i < n) { fs += lum(i); i += 1 }
          lumaTotal += fs
          if (fs < 16000L * n) black += 1
          if (prev != null) {
            var mad = 0L; var j = 0
            while (j < n) { mad += math.abs(lum(j) - prev(j)); j += 1 }
            madTotal += mad
            if (mad < 2000L * n) still += 1
          }
          prev = lum
          fi += 1
        }
        def r6(d: Double): Double =
          BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        VideoQuality(m.media_id, vid.width, vid.height, nf,
          if (nf == 0) 0.0 else r6(lumaTotal / (1000.0 * n * nf)),
          if (nf == 0) 0.0 else r6(black.toDouble / nf),
          if (nf < 2) 0.0 else r6(still.toDouble / (nf - 1)),
          if (nf < 2) 0.0
          else r6(madTotal / (1000.0 * n) / (nf - 1)))
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
    var rate = -1; var fmtCode = -1; var nCh = -1; var bits = -1
    var dataPos = -1; var dataLen = -1
    var blockAlign = -1; var factSamples = -1
    // walk the WHOLE chunk list before decoding: the sample conversion
    // depends on fmt fields, and RIFF does not promise fmt-before-data.
    // ADPCM streams keep walking past data for the 'fact' chunk (the
    // true sample count — the final block is nibble-padded without it)
    while (pos + 8 <= payload.length &&
      (rate < 0 || dataPos < 0 || (fmtCode == 17 && factSamples < 0))) {
      val tag = new String(payload, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      // long arithmetic: a crafted len near Int.MaxValue would wrap
      // pos+8+len negative and sneak past an int-typed bound check
      require(len >= 0 && pos.toLong + 8L + len.toLong <= payload.length,
        s"wavDecode: chunk '$tag' overruns the payload")
      tag match {
        case "fmt " =>
          require(len >= 16, "wavDecode: fmt chunk too short")
          fmtCode = bb.getShort(pos + 8)
          nCh = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          blockAlign = bb.getShort(pos + 20) & 0xffff
          bits = bb.getShort(pos + 22)
        case "fact" =>
          require(len >= 4, "wavDecode: fact chunk too short")
          factSamples = bb.getInt(pos + 8)
        case "data" => dataPos = pos + 8; dataLen = len
        case _ => // skip unknown chunks (LIST, ...)
      }
      pos += 8 + len + (len & 1) // RIFF chunks pad to even
    }
    require(rate > 0, "wavDecode: missing fmt chunk")
    require(dataPos >= 0, "wavDecode: missing data chunk")
    // interleaved multi-channel data read as mono would halve the
    // effective rate and shuffle channels into the signal — reject loudly
    require(nCh == 1, s"wavDecode: $nCh-channel audio not supported (mono only)")
    val out = (fmtCode, bits) match {
      case (1, 16) => // canonical PCM16 (what wavFromSamples writes)
        Array.tabulate(dataLen / 2)(i => bb.getShort(dataPos + i * 2))
      case (1, 8) => // PCM8 is UNSIGNED, centered at 128 → scale to 16-bit
        Array.tabulate(dataLen)(i =>
          (((payload(dataPos + i) & 0xff) - 128) << 8).toShort)
      case (3, 32) => // IEEE float: scale by 2^15, round half-up, clamp
        Array.tabulate(dataLen / 4) { i =>
          val f = java.lang.Float.intBitsToFloat(bb.getInt(dataPos + i * 4))
          math.max(-32768.0, math.min(32767.0,
            math.floor(f * 32768.0 + 0.5))).toShort
        }
      case (6, 8) => // G.711 A-law (telephony)
        Array.tabulate(dataLen)(i =>
          g711Decode(payload(dataPos + i) & 0xff, aLaw = true).toShort)
      case (7, 8) => // G.711 µ-law (telephony)
        Array.tabulate(dataLen)(i =>
          g711Decode(payload(dataPos + i) & 0xff, aLaw = false).toShort)
      case (17, 4) => // IMA/DVI ADPCM (voice mail, game audio, DVI capture)
        require(blockAlign > 4,
          s"wavDecode: ADPCM block align $blockAlign must exceed the 4-byte header")
        imaAdpcmDecode(payload, dataPos, dataLen, blockAlign, factSamples)
      case _ => throw new IllegalArgumentException(
        s"wavDecode: format code $fmtCode at $bits bits not supported " +
          "(PCM 8/16-bit, IEEE float32, G.711 A-law/µ-law and IMA ADPCM only)")
    }
    (rate, out)
  }

  // ── IMA/DVI ADPCM (WAVE format 0x11) ─────────────────────────────────
  //
  // The 4-bit companding in voice mail, game engines and DVI capture
  // cards: 4:1 compression, pure integer math, no library anywhere. Each
  // mono block is a 4-byte header (int16 predictor = the block's first
  // sample, uint8 step index, reserved) followed by packed nibbles (low
  // nibble first), so samplesPerBlock = (blockAlign − 4)·2 + 1. The step
  // walk is the published IMA table pair; encode and decode share the
  // EXACT reconstruction arithmetic so the encoder's predictor tracks
  // the decoder's bit for bit.

  /** The 89-entry IMA step-size table (published constants). */
  val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per nibble magnitude (published constants). */
  val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One reconstruction step — THE shared arithmetic: returns the new
    * (predictor, stepIndex) after consuming `nibble` with the given
    * state. diff = (step·m)/4 + step/8 computed as shifts in the pinned
    * published order (step>>3 + conditional step, step>>1, step>>2).
    */
  def imaStep(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = imaStepTable(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val ix = math.max(0, math.min(88, index + imaIndexTable(nibble & 7)))
    (p, ix)
  }

  private def imaAdpcmDecode(payload: Array[Byte], dataPos: Int, dataLen: Int,
                             blockAlign: Int, factSamples: Int): Array[Short] = {
    val spb = (blockAlign - 4) * 2 + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Short]
    var blockOff = 0
    while (blockOff < dataLen) {
      val blockLen = math.min(blockAlign, dataLen - blockOff)
      require(blockLen > 4,
        s"wavDecode: trailing $blockLen-byte ADPCM fragment is shorter than a block header")
      val base = dataPos + blockOff
      var pred = ((payload(base) & 0xff) | (payload(base + 1) << 8)).toShort.toInt
      var index = payload(base + 2) & 0xff
      require(index <= 88, s"wavDecode: ADPCM step index $index out of range")
      out += pred.toShort
      var b = 4
      while (b < blockLen) {
        val byte = payload(base + b) & 0xff
        val (p1, i1) = imaStep(pred, index, byte & 0x0f)
        pred = p1; index = i1; out += pred.toShort
        val (p2, i2) = imaStep(pred, index, byte >> 4)
        pred = p2; index = i2; out += pred.toShort
        b += 1
      }
      blockOff += blockLen
    }
    // the final block nibble-pads to byte granularity; 'fact' carries the
    // true count
    if (factSamples >= 0) {
      require(factSamples <= out.length,
        s"wavDecode: fact claims $factSamples samples but only ${out.length} decode")
      require(factSamples > out.length - spb ||
        out.length == factSamples, // all-full-blocks case
        s"wavDecode: fact count $factSamples drops more than the final block's padding")
      out.take(factSamples).toArray
    } else out.toArray
  }

  /** IMA ADPCM encoder + WAV container (fmt 0x11, the fixture writer for
    * the 4-bit decode path). Every block header re-anchors the predictor
    * at the block's first true sample (the canonical layout, making
    * blocks independently seekable); the step index carries across
    * blocks. The final block nibble-pads by encoding zero-diff
    * continuations and a 'fact' chunk records the true sample count.
    */
  def wavFromImaAdpcm(samples: Array[Short], sampleRate: Int,
                      blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign > 4 && blockAlign % 4 == 0,
      s"wavFromImaAdpcm: bad block align $blockAlign")
    require(samples.nonEmpty, "wavFromImaAdpcm: empty clip")
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + spb - 1) / spb
    val data = new Array[Byte](nBlocks * blockAlign)
    var index = 0
    var blk = 0
    while (blk < nBlocks) {
      val s0 = blk * spb
      val base = blk * blockAlign
      var pred = samples(s0).toInt
      data(base) = (pred & 0xff).toByte
      data(base + 1) = ((pred >> 8) & 0xff).toByte
      data(base + 2) = index.toByte
      var k = 1 // sample offset within the block
      var b = 4
      while (b < blockAlign) {
        var byte = 0
        var half = 0
        while (half < 2) {
          // past the end: encode the current predictor again (zero diff)
          val target = if (s0 + k < samples.length) samples(s0 + k).toInt else pred
          val step = imaStepTable(index)
          var diff = target - pred
          var nib = 0
          if (diff < 0) { nib = 8; diff = -diff }
          if (diff >= step) { nib |= 4; diff -= step }
          if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
          if (diff >= (step >> 2)) nib |= 1
          val (p, ix) = imaStep(pred, index, nib)
          pred = p; index = ix
          byte |= (if (half == 0) nib else nib << 4)
          k += 1
          half += 1
        }
        data(base + b) = byte.toByte
        b += 1
      }
      blk += 1
    }
    val byteRate = (sampleRate.toLong * blockAlign / spb).toInt
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 20 + 8 + 4 + 8 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(1)                       // IMA ADPCM, mono
      .putInt(sampleRate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(4)       // block align, bits
      .putShort(2).putShort(spb.toShort)              // cbSize, samplesPerBlock
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** ADPCM-audio planting (spec for the fixture replica): 16 kHz clips of
    * nChars full-scale noise samples
    * (sample_i = (([[plantPixel]](doc_id + 5·10⁶, 2i) << 8) |
    * [[plantPixel]](doc_id + 5·10⁶, 2i+1)) as int16), block align
    * 256/64/32 by doc_id % 3 — multi-block clips with partial final
    * blocks and the fact-chunk truncation all sit inside the oracle
    * gate. Empty docs keep a one-sample clip (the encoder rejects empty).
    */
  def imaAdpcmAudioFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[AudioItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].map { case (id, nChars) =>
        val n = math.max(nChars, 1)
        val samples = Array.tabulate(n)(i =>
          ((plantPixel(id + 5000000L, 2L * i) << 8) |
            plantPixel(id + 5000000L, 2L * i + 1)).toShort)
        val ba = Seq(256, 64, 32)((id % 3).toInt)
        AudioItem(id, wavFromImaAdpcm(samples, 16000, ba), 16000)
      }
  }

  /** G.711 expansion (ITU G.711, the telephony companding in every call
    * recording) — pinned formulas matching the classic reference tables
    * (µ-law 0x00 → −32124; A-law 0x2A → −32256, 0x55 → −8):
    *   µ-law: u = ~code; sample = ((132 << e) − 132 + (m << (e+3))),
    *     negated when bit 7 of u is set (e = bits 4-6 of u, m = low 4);
    *   A-law: a = code ⊕ 0x55; t = (m << 4) + 8 for segment 0, else
    *     ((m << 4) + 0x108) << (seg − 1); positive when bit 7 of a is
    *     set. Every byte 0..255 is a valid code, so planted noise bytes
    *     are valid streams and all 256 code points sit inside the gate.
    */
  def g711Decode(code: Int, aLaw: Boolean): Int =
    if (aLaw) {
      val a = code ^ 0x55
      val seg = (a >> 4) & 7
      val m = a & 0x0f
      val t = if (seg == 0) (m << 4) + 8 else ((m << 4) + 0x108) << (seg - 1)
      if ((a & 0x80) != 0) t else -t
    } else {
      val u = (~code) & 0xff
      val e = (u >> 4) & 7
      val m = u & 0x0f
      val t = (132 << e) - 132 + (m << (e + 3))
      if ((u & 0x80) != 0) -t else t
    }

  /** WAV container around RAW G.711 code bytes (fmt code 6 = A-law,
    * 7 = µ-law, 8 bits per sample) — the fixture writer for the
    * telephony decode path, the G.711 analog of [[wavFromSamples]].
    */
  def wavFromG711(codes: Array[Byte], sampleRate: Int, aLaw: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + codes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + codes.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(if (aLaw) 6 else 7).putShort(1)
      .putInt(sampleRate).putInt(sampleRate) // byte rate = rate × 1 × 1
      .putShort(1).putShort(8)               // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(codes.length)
      .put(codes)
    bb.array()
  }

  /** Telephony-audio planting (spec for the fixture replica): 8 kHz
    * G.711 clips, one code byte per text position
    * (code_i = [[plantPixel]](doc_id + 4·10⁶, i)), µ-law for even ids
    * and A-law for odd — both expansions and the full code space sit
    * inside the oracle gate.
    */
  def g711AudioFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[AudioItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("n_chars"), lit(0)).cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)].map { case (id, nChars) =>
        val codes = Array.tabulate(nChars)(i =>
          plantPixel(id + 4000000L, i).toByte)
        AudioItem(id, wavFromG711(codes, 8000, aLaw = id % 2 == 1), 8000)
      }
  }

  /** Plant deterministic audio rows from the documents fixture: each text
    * character LCG-scrambles to one full-range PCM sample (so silence and
    * clipping both actually occur), wrapped in a real WAV container. A
    * real pipeline reads audio files the same way (`binaryFile` source →
    * binary column + metadata).
    */
  def audioFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[AudioItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)].map {
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

  /** Iterative radix-2 Cooley-Tukey FFT, in place, operation order PINNED
    * (this doc comment is the spec for the fixture replica — any
    * implementation following it is bit-identical):
    *   1. N = re.length must be a power of two (im same length).
    *   2. Bit-reversal permutation via the incremental-carry walk: for i
    *      in 0 until N, maintain j; swap (re, im) at (i, j) when i < j;
    *      advance j by flipping bits from the top (`bit = N >> 1; while
    *      (j & bit) != 0 { j ^= bit; bit >>= 1 }; j |= bit`).
    *   3. For len = 2, 4, ..., N (doubling): for each block start s (0,
    *      len, 2·len, ...): for j = 0 until len/2: the twiddle angle is
    *      `-2.0 * math.Pi * j / len` evaluated left-to-right, w =
    *      (cos a, sin a); with b = index s+j+len/2: t_re = w_re·re(b) −
    *      w_im·im(b); t_im = w_re·im(b) + w_im·re(b); re(b) = re(s+j) −
    *      t_re; im(b) = im(s+j) − t_im; re(s+j) += t_re; im(s+j) += t_im.
    * No scaling anywhere (features are ratio-shaped, so the constant
    * cancels).
    */
  def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"fftInPlace: size $n is not a power of two")
    require(im.length == n, "fftInPlace: re/im length mismatch")
    var j = 0
    var i = 0
    while (i < n) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var bit = n >> 1
      while ((j & bit) != 0 && bit > 0) { j ^= bit; bit >>= 1 }
      j |= bit
      i += 1
    }
    var len = 2
    while (len <= n) {
      val half = len >> 1
      var s = 0
      while (s < n) {
        var k = 0
        while (k < half) {
          val ang = -2.0 * math.Pi * k / len
          val wr = math.cos(ang); val wi = math.sin(ang)
          val b = s + k + half
          val tr = wr * re(b) - wi * im(b)
          val ti = wr * im(b) + wi * re(b)
          re(b) = re(s + k) - tr
          im(b) = im(s + k) - ti
          re(s + k) += tr
          im(s + k) += ti
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** Per-window spectral feature row ([[audioSpectralFeatures]]). */
  case class AudioSpectralFeatures(media_id: Long, window_idx: Long,
                                   start_sample: Long, end_sample: Long,
                                   fft_n: Int,
                                   spectral_centroid_hz: Double,
                                   spectral_rolloff_hz: Double,
                                   spectral_flatness: Double)

  /** Per-window SPECTRAL features over the real decode — the signals
    * audio curation actually gates on (speech/music/noise separation),
    * extending [[audioWindowFeatures]]' time-domain set. Each window
    * zero-pads to the next power of two, runs the pinned [[fftInPlace]],
    * and measures bins 0..N/2 at f_k = k·rate/N (all sums ascending-k,
    * 6-dp round LAST — the whole chain is fixture-oracleable):
    *   - centroid  = Σ f_k·|X_k| / Σ |X_k| over k = 1..N/2 (DC excluded —
    *     it has no frequency; 0.0 for an all-zero window);
    *   - rolloff   = f of the smallest K with Σ_{k≤K} p_k ≥ 0.85·Σ p_k
    *     over k = 0..N/2, p = |X|² (0.0 for an all-zero window);
    *   - flatness  = geometric / arithmetic mean of (p_k + 1e-12) over
    *     k = 1..N/2, geometric via exp(mean ln) — 1.0 means white-flat,
    *     →0 means tonal.
    * Samples normalize by /32768.0 before the FFT so the eps floor is
    * scale-meaningful. Same mapPartitions batch shape as the rest of the
    * tier; payload bytes never leave the executor.
    */
  def audioSpectralFeatures(spark: SparkSession, audio: Dataset[AudioItem],
                            windowMs: Int, strideMs: Int): Dataset[AudioSpectralFeatures] = {
    import spark.implicits._
    require(windowMs > 0 && strideMs > 0,
      s"audioSpectralFeatures: window/stride must be positive, got $windowMs/$strideMs")
    audio.mapPartitions { it =>
      it.flatMap { a =>
        val (rate, xs) = wavDecode(a.payload)
        val win = rate.toLong * windowMs / 1000
        val hop = rate.toLong * strideMs / 1000
        require(win >= 1 && hop >= 1,
          s"audioSpectralFeatures: window/stride ($windowMs ms/$strideMs ms) " +
            s"is shorter than one sample at sample_rate $rate")
        val n = xs.length.toLong
        if (n < win) Iterator.empty
        else {
          var fftN = 1
          while (fftN < win) fftN <<= 1
          (0L to (n - win) / hop).iterator.map { wi =>
            val s0 = (wi * hop).toInt
            val f = spectralOfWindow(xs, s0, win.toInt, fftN, rate)
            AudioSpectralFeatures(a.media_id, wi, s0.toLong, s0 + win,
              fftN, f(0), f(1), f(2))
          }
        }
      }
    }
  }

  /** The per-window spectral arithmetic (shared spec for the fixture
    * replica): returns (centroid_hz, rolloff_hz, flatness), 6-dp LAST.
    */
  def spectralOfWindow(xs: Array[Short], s0: Int, win: Int, fftN: Int,
                       rate: Int): Array[Double] = {
    val re = new Array[Double](fftN); val im = new Array[Double](fftN)
    var i = 0
    while (i < win) { re(i) = xs(s0 + i) / 32768.0; i += 1 }
    fftInPlace(re, im)
    val half = fftN / 2
    // power + magnitude over bins 0..N/2 (ascending k, pinned order)
    var magSum = 0.0; var magWeighted = 0.0; var pSum = 0.0
    var logSum = 0.0; var epsSum = 0.0
    var k = 0
    while (k <= half) {
      val p = re(k) * re(k) + im(k) * im(k)
      pSum += p
      if (k >= 1) {
        val m = math.sqrt(p)
        magSum += m
        magWeighted += (k.toDouble * rate / fftN) * m
        logSum += math.log(p + 1e-12)
        epsSum += p + 1e-12
      }
      k += 1
    }
    val centroid = if (magSum == 0.0) 0.0 else magWeighted / magSum
    var rolloff = 0.0
    if (pSum > 0.0) {
      val target = 0.85 * pSum
      var acc = 0.0; var kk = 0; var found = false
      while (kk <= half && !found) {
        acc += re(kk) * re(kk) + im(kk) * im(kk)
        if (acc >= target) { rolloff = kk.toDouble * rate / fftN; found = true }
        kk += 1
      }
    }
    val flatness = math.exp(logSum / half) / (epsSum / half)
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    Array(r6(centroid), r6(rolloff), r6(flatness))
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
