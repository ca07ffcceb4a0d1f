package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Archive ingestion — zip and ustar tar, the two containers code
  * corpora (The Stack shape: one archive per repo) and document dumps
  * actually arrive in. An LLM pipeline needs two operations at 100 TB:
  * ENUMERATE (read the member catalog without touching content — the
  * zip central directory is a few KB at the file's tail regardless of
  * archive size; tar headers are 512 bytes per member) and EXTRACT
  * (inflate chosen members, CRC-verified, without shelling out).
  *
  * Wire formats from the public specs — PKWARE APPNOTE.TXT for zip
  * (EOCD → central directory → local headers; methods 0 stored and
  * 8 deflate via `java.util.zip.Inflater(nowrap)`; streaming entries
  * with data descriptors read fine because the central directory always
  * carries the real sizes/CRC), POSIX ustar for tar (512-byte
  * octal-field headers, content padded to block size, two zero blocks
  * at end). zip64 is supported — repo-scale corpora (one archive per
  * repo) cross the classic 4 GiB / 65,535-member limits routinely, so
  * the walk resolves 0xFFFF/0xFFFFFFFF markers through the EOCD64
  * locator + record and per-entry 0x0001 extra fields. Outside the
  * canonical subset rejects LOUDLY BY NAME: encrypted entries, other
  * compression methods, multi-disk archives, GNU tar longname/sparse
  * extensions, header-checksum mismatches, and any size/offset that
  * overruns the payload (all bounds in Long arithmetic). Extraction
  * verifies both the CRC-32 and the declared uncompressed size — a
  * silent mismatch would poison training text.
  *
  * Reference behavior being matched: the reference stores such payloads
  * as opaque blobs; archive ingestion is a pipeline extension per the
  * brief.
  */
object Archives {

  /** One catalog row. `method` is "store"/"deflate" for zip members,
    * "tar" for tar members (tar never compresses per-member); `crc32`
    * is the central-directory value for zip and -1 for tar (the format
    * carries none — extraction still verifies sizes).
    */
  case class Entry(name: String, n_bytes: Long, compressed_bytes: Long,
                   method: String, crc32: Long, is_dir: Boolean)

  // =====================================================================
  // tar (POSIX ustar)
  // =====================================================================

  private def octal(b: Array[Byte], off: Int, len: Int, what: String): Long = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var seen = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      require(c >= '0' && c <= '7', s"Tar.parse: non-octal byte in $what")
      v = v * 8 + (c - '0'); seen = true; i += 1
    }
    require(seen, s"Tar.parse: empty octal field $what")
    v
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  object Tar {
    /** Write a ustar archive: (name, content) members in order. */
    def encode(members: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      members.foreach { case (name, data) =>
        require(name.getBytes("UTF-8").length <= 100,
          s"Tar.encode: name '$name' over 100 bytes (prefix splitting not written)")
        val h = new Array[Byte](512)
        def put(off: Int, s: String): Unit = {
          val bs = s.getBytes("UTF-8")
          System.arraycopy(bs, 0, h, off, bs.length)
        }
        put(0, name)
        put(100, "0000644")                       // mode
        put(108, "0000000"); put(116, "0000000")  // uid/gid
        put(124, f"${data.length}%011o")
        put(136, "00000000000")                   // mtime: epoch, deterministic
        java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
        h(156) = '0'                              // typeflag: regular file
        put(257, "ustar"); h(262) = 0
        put(263, "00")                            // version
        var sum = 0L
        h.foreach(b => sum += (b & 0xff))
        put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
        out.write(h)
        out.write(data)
        val pad = (512 - data.length % 512) % 512
        out.write(new Array[Byte](pad))
      }
      out.write(new Array[Byte](1024)) // two terminating zero blocks
      out.toByteArray
    }

    /** Catalog walk: headers only, content skipped by size arithmetic. */
    def entries(payload: Array[Byte]): Seq[(Entry, Long)] = {
      val n = payload.length.toLong
      val out = scala.collection.mutable.ArrayBuffer.empty[(Entry, Long)]
      var at = 0L
      var done = false
      while (!done) {
        require(at + 512 <= n, s"Tar.parse: truncated header at offset $at")
        val h = java.util.Arrays.copyOfRange(payload, at.toInt, at.toInt + 512)
        if (h.forall(_ == 0)) done = true // terminator block
        else {
          require(cstr(h, 257, 6) == "ustar",
            s"Tar.parse: no ustar magic at offset $at (pre-POSIX and GNU " +
              "old-style headers not supported)")
          // verify the header checksum: sum of all bytes with the checksum
          // field read as spaces
          val stored = octal(h, 148, 8, "checksum")
          var sum = 0L
          var i = 0
          while (i < 512) {
            sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff); i += 1
          }
          require(sum == stored,
            s"Tar.parse: header checksum mismatch at offset $at ($sum != $stored)")
          val typeflag = h(156).toChar
          require(typeflag == '0' || typeflag == 0.toChar || typeflag == '5',
            s"Tar.parse: typeflag '$typeflag' not supported (regular files " +
              "and directories only; GNU longname/sparse reject)")
          val size = octal(h, 124, 12, "size")
          val prefix = cstr(h, 345, 155)
          val name0 = cstr(h, 0, 100)
          val name = if (prefix.nonEmpty) s"$prefix/$name0" else name0
          val isDir = typeflag == '5'
          require(at + 512 + size <= n,
            s"Tar.parse: member '$name' of $size bytes overruns the $n-byte payload")
          out += ((Entry(name, size, size, "tar", -1L, isDir), at + 512))
          at += 512 + ((size + 511) / 512) * 512
        }
      }
      out.toSeq
    }

    /** Extract one member's bytes (the catalog row carries its offset). */
    def extract(payload: Array[Byte], entry: Entry, dataOff: Long): Array[Byte] =
      java.util.Arrays.copyOfRange(payload, dataOff.toInt,
        (dataOff + entry.n_bytes).toInt)
  }

  // =====================================================================
  // zip (PKWARE APPNOTE classic subset)
  // =====================================================================

  private def le16(b: Array[Byte], at: Long): Int = {
    val i = at.toInt
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  }
  private def le32(b: Array[Byte], at: Long): Long = {
    val i = at.toInt
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  }
  private def le64(b: Array[Byte], at: Long): Long =
    le32(b, at) | (le32(b, at + 4) << 32)

  object Zip {
    /** Write a zip: (name, content, deflate?) members; deterministic
      * (fixed dos time, no comment). `forceZip64` writes the zip64 wire
      * form regardless of actual size — the Info-ZIP forced mode real
      * tools use near the classic limits: central-directory sizes and
      * local offsets masked to 0xFFFFFFFF with the real values in
      * 0x0001 extra fields, classic EOCD counts/offsets masked to
      * 0xFFFF/0xFFFFFFFF, and the EOCD64 record + locator written
      * before the EOCD. Local headers stay classic either way (the
      * central directory is this reader's single source of truth).
      */
    def encode(members: Seq[(String, Array[Byte], Boolean)],
               forceZip64: Boolean = false): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val central = new java.io.ByteArrayOutputStream()
      def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
        o.write(v & 0xff); o.write((v >> 8) & 0xff)
      }
      def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
        o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
      }
      def w64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
        w32(o, v & 0xffffffffL); w32(o, (v >>> 32) & 0xffffffffL)
      }
      members.foreach { case (name, data, deflate) =>
        val nameB = name.getBytes("UTF-8")
        val crc = { val c = new java.util.zip.CRC32(); c.update(data); c.getValue }
        val packed = if (deflate) {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) o.write(buf, 0, d.deflate(buf))
          d.end(); o.toByteArray
        } else data
        val method = if (deflate) 8 else 0
        val localOff = out.size().toLong
        w32(out, 0x04034b50L); w16(out, 20); w16(out, 0); w16(out, method)
        w16(out, 0); w16(out, 0x21) // fixed dos time/date: deterministic
        w32(out, crc); w32(out, packed.length.toLong); w32(out, data.length.toLong)
        w16(out, nameB.length); w16(out, 0)
        out.write(nameB); out.write(packed)
        val vers = if (forceZip64) 45 else 20
        w32(central, 0x02014b50L); w16(central, vers); w16(central, vers)
        w16(central, 0); w16(central, method); w16(central, 0); w16(central, 0x21)
        w32(central, crc)
        if (forceZip64) {
          w32(central, 0xffffffffL); w32(central, 0xffffffffL) // sizes → extra
          w16(central, nameB.length); w16(central, 28); w16(central, 0)
          w16(central, 0); w16(central, 0); w32(central, 0L)
          w32(central, 0xffffffffL)                            // offset → extra
          central.write(nameB)
          w16(central, 0x0001); w16(central, 24)               // zip64 extra field
          w64(central, data.length.toLong); w64(central, packed.length.toLong)
          w64(central, localOff)
        } else {
          w32(central, packed.length.toLong); w32(central, data.length.toLong)
          w16(central, nameB.length); w16(central, 0); w16(central, 0)
          w16(central, 0); w16(central, 0); w32(central, 0L); w32(central, localOff)
          central.write(nameB)
        }
      }
      val cdOff = out.size().toLong
      val cd = central.toByteArray
      out.write(cd)
      if (forceZip64) {
        val e64At = out.size().toLong
        w32(out, 0x06064b50L); w64(out, 44L) // EOCD64: size of remainder
        w16(out, 45); w16(out, 45); w32(out, 0L); w32(out, 0L)
        w64(out, members.length.toLong); w64(out, members.length.toLong)
        w64(out, cd.length.toLong); w64(out, cdOff)
        w32(out, 0x07064b50L); w32(out, 0L); w64(out, e64At); w32(out, 1L) // locator
        w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
        w16(out, 0xffff); w16(out, 0xffff)
        w32(out, 0xffffffffL); w32(out, 0xffffffffL); w16(out, 0)
      } else {
        w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
        w16(out, members.length); w16(out, members.length)
        w32(out, cd.length.toLong); w32(out, cdOff); w16(out, 0)
      }
      out.toByteArray
    }

    /** Catalog walk: EOCD from the tail (tolerating a trailing comment),
      * then the central directory — content bytes never touched.
      * Returns entries with their local-header offsets.
      */
    def entries(payload: Array[Byte]): Seq[(Entry, Long)] = {
      val n = payload.length.toLong
      require(n >= 22, s"Zip.parse: $n bytes is smaller than an EOCD record")
      // EOCD scan: last 64 KB + 22 (max comment length per spec)
      var eocd = -1L
      var at = n - 22
      val lo = math.max(0L, n - 22 - 65535)
      while (eocd < 0 && at >= lo) {
        if (le32(payload, at) == 0x06054b50L &&
            at + 22 + le16(payload, at + 20) == n) eocd = at
        else at -= 1
      }
      require(eocd >= 0, "Zip.parse: no end-of-central-directory record " +
        "(not a zip, or a truncated one)")
      var count = le16(payload, eocd + 10).toLong
      var cdSize = le32(payload, eocd + 12)
      var cdOff = le32(payload, eocd + 16)
      require(le16(payload, eocd + 8).toLong == count,
        "Zip.parse: multi-disk archives not supported")
      if (count == 0xffffL || cdOff == 0xffffffffL || cdSize == 0xffffffffL) {
        // zip64: the EOCD64 locator sits immediately before the EOCD
        val locAt = eocd - 20
        require(locAt >= 0 && le32(payload, locAt) == 0x07064b50L,
          "Zip.parse: zip64 markers in the EOCD but no EOCD64 locator before it")
        require(le32(payload, locAt + 4) == 0L && le32(payload, locAt + 16) == 1L,
          "Zip.parse: multi-disk zip64 archives not supported")
        val e64 = le64(payload, locAt + 8)
        require(e64 >= 0 && e64 + 56 <= locAt,
          s"Zip.parse: EOCD64 record at $e64 overruns its locator at $locAt")
        require(le32(payload, e64) == 0x06064b50L,
          s"Zip.parse: bad EOCD64 signature at $e64")
        count = le64(payload, e64 + 32)
        require(le64(payload, e64 + 24) == count,
          "Zip.parse: multi-disk zip64 archives not supported")
        cdSize = le64(payload, e64 + 40)
        cdOff = le64(payload, e64 + 48)
      }
      require(cdOff >= 0 && cdSize >= 0 && cdOff + cdSize <= eocd,
        s"Zip.parse: central directory [$cdOff, ${cdOff + cdSize}) overruns the EOCD at $eocd")
      // a crafted entry count must reject before the walk (46 B is the
      // minimum central-directory entry)
      require(count >= 0 && count <= cdSize / 46,
        s"Zip.parse: entry count $count overruns the $cdSize-byte central directory")
      val cdEnd = cdOff + cdSize
      val out = scala.collection.mutable.ArrayBuffer.empty[(Entry, Long)]
      var p = cdOff
      (0L until count).foreach { _ =>
        require(p + 46 <= cdEnd, s"Zip.parse: truncated central-directory entry at $p")
        require(le32(payload, p) == 0x02014b50L,
          s"Zip.parse: bad central-directory signature at $p")
        val flags = le16(payload, p + 8)
        require((flags & 0x1) == 0, "Zip.parse: encrypted entries not supported")
        // flag bit 3 (streaming entries with trailing data descriptors —
        // what the JDK's own ZipOutputStream writes for deflated members)
        // is FINE here: this reader is driven entirely by the central
        // directory, whose sizes/CRC are always real; the zeroed local
        // header and the descriptor after the data are never consulted
        val method = le16(payload, p + 10)
        require(method == 0 || method == 8,
          s"Zip.parse: compression method $method not supported (stored/deflate only)")
        val crc = le32(payload, p + 16)
        var compSize = le32(payload, p + 20)
        var uncompSize = le32(payload, p + 24)
        val nameLen = le16(payload, p + 28)
        val extraLen = le16(payload, p + 30)
        val commentLen = le16(payload, p + 32)
        var localOff = le32(payload, p + 42)
        require(p + 46 + nameLen + extraLen + commentLen <= cdEnd,
          s"Zip.parse: central-directory entry at $p overruns the directory end $cdEnd")
        val name = new String(payload, (p + 46).toInt, nameLen, "UTF-8")
        if (compSize == 0xffffffffL || uncompSize == 0xffffffffL ||
            localOff == 0xffffffffL) {
          // the real 64-bit values live in the 0x0001 extra field, holding
          // ONLY the masked fields, in uncomp/comp/offset order (APPNOTE)
          var q = p + 46 + nameLen
          val extraEnd = q + extraLen
          var found = false
          while (!found && q + 4 <= extraEnd) {
            val fid = le16(payload, q)
            val fsz = le16(payload, q + 2)
            require(q + 4 + fsz <= extraEnd,
              s"Zip.parse: extra field on '$name' overruns its declared length")
            if (fid == 0x0001) {
              var r = q + 4
              def take64(what: String): Long = {
                require(r + 8 <= q + 4 + fsz,
                  s"Zip.parse: zip64 extra field on '$name' too short for the $what")
                val v = le64(payload, r); r += 8; v
              }
              if (uncompSize == 0xffffffffL) uncompSize = take64("uncompressed size")
              if (compSize == 0xffffffffL) compSize = take64("compressed size")
              if (localOff == 0xffffffffL) localOff = take64("local-header offset")
              found = true
            } else q += 4 + fsz
          }
          require(found,
            s"Zip.parse: entry '$name' carries zip64 markers but no zip64 extra field")
        }
        require(localOff >= 0 && localOff + 30 <= n,
          s"Zip.parse: entry '$name' local header at $localOff overruns the payload")
        out += ((Entry(name, uncompSize, compSize,
          if (method == 8) "deflate" else "store", crc,
          name.endsWith("/")), localOff))
        p += 46 + nameLen + extraLen + commentLen
      }
      out.toSeq
    }

    /** Extract one member: local-header walk, inflate if deflated, then
      * verify BOTH the declared size and the CRC-32 — a corrupt member
      * must fail loudly, never feed garbage text downstream.
      */
    def extract(payload: Array[Byte], entry: Entry, localOff: Long): Array[Byte] = {
      val n = payload.length.toLong
      require(le32(payload, localOff) == 0x04034b50L,
        s"Zip.parse: bad local-header signature for '${entry.name}'")
      val nameLen = le16(payload, localOff + 26)
      val extraLen = le16(payload, localOff + 28)
      val dataOff = localOff + 30 + nameLen + extraLen
      require(dataOff + entry.compressed_bytes <= n,
        s"Zip.parse: member '${entry.name}' data overruns the payload")
      val raw = java.util.Arrays.copyOfRange(payload, dataOff.toInt,
        (dataOff + entry.compressed_bytes).toInt)
      val data = if (entry.method == "deflate") {
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(raw)
        val o = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val got = inf.inflate(buf)
            require(got > 0 || inf.finished() || !inf.needsInput(),
              s"Zip.parse: truncated deflate stream in '${entry.name}'")
            o.write(buf, 0, got)
          }
        } finally inf.end()
        o.toByteArray
      } else raw
      require(data.length.toLong == entry.n_bytes,
        s"Zip.parse: member '${entry.name}' inflated to ${data.length} bytes, " +
          s"directory declared ${entry.n_bytes}")
      val c = new java.util.zip.CRC32(); c.update(data)
      require(c.getValue == entry.crc32,
        s"Zip.parse: CRC mismatch on '${entry.name}' (corrupt member)")
      data
    }
  }

  // =====================================================================
  // plant + Spark ops
  // =====================================================================

  /** Planted members for one document (spec for the fixture replica):
    * the doc's words split into three member files —
    * `src/part0.txt` (words 0,3,6,…), `src/part1.txt` (1,4,7,…),
    * `README.md` (2,5,8,…) — each member's content its words joined by
    * single spaces, UTF-8. Even ids pack as ZIP (members deflated
    * except `README.md`, stored — both methods in the gate), odd ids as
    * ustar TAR. Docs with no words produce no archive.
    */
  def plantMembers(text: String): Option[Seq[(String, String)]] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return None
    val parts = (0 until 3).map { k =>
      words.zipWithIndex.collect { case (w, i) if i % 3 == k => w }.mkString(" ")
    }
    Some(Seq("src/part0.txt" -> parts(0), "src/part1.txt" -> parts(1),
      "README.md" -> parts(2)).filter(_._2.nonEmpty))
  }

  case class ArchiveItem(doc_id: Long, format: String, payload: Array[Byte])

  /** Whole-payload gzip (RFC 1952) via the JDK streams — the tar.gz
    * transport wrapper. Note the scale asymmetry this tier makes
    * explicit: a .tgz must be DECOMPRESSED END-TO-END even to read its
    * catalog (gzip has no random access), where zip's central directory
    * is a tail read — which is why repo-scale corpora should land as
    * zip/parquet, and why [[entriesOf]] on tgz honestly pays the
    * inflate.
    */
  def gunzip(payload: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(payload))
    try in.readAllBytes() finally in.close()
  }
  def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  private def unwrap(a: ArchiveItem): (String, Array[Byte]) = a.format match {
    case "zip" => ("zip", a.payload)
    case "tar" => ("tar", a.payload)
    case "tgz" => ("tar", gunzip(a.payload))
    case other => throw new IllegalArgumentException(
      s"Archives: unknown format '$other' (zip/tar/tgz)")
  }

  /** Planted format by id: even → zip (the id%10==4 subset in FORCED
    * zip64 wire form — EOCD64 + locator + 0x0001 extra fields, same
    * logical content), id%4==1 → tar, id%4==3 → tar.gz (all transports
    * inside the oracle gate).
    */
  def archivesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[ArchiveItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        plantMembers(tx).map { members =>
          if (id % 2 == 0)
            ArchiveItem(id, "zip", Zip.encode(members.map { case (nm, c) =>
              (nm, c.getBytes("UTF-8"), nm != "README.md")
            }, forceZip64 = id % 10 == 4))
          else {
            val tar = Tar.encode(members.map { case (nm, c) =>
              (nm, c.getBytes("UTF-8"))
            })
            if (id % 4 == 1) ArchiveItem(id, "tar", tar)
            else ArchiveItem(id, "tgz", gzip(tar))
          }
        }
      })
  }

  /** The member CATALOG — headers/central directory only, content bytes
    * never touched: at 100 TB this is the enumerate-then-route step (by
    * extension, size, path) that decides which members are worth
    * extraction.
    */
  def entriesOf(spark: SparkSession, archives: Dataset[ArchiveItem]): DataFrame = {
    import spark.implicits._
    archives.mapPartitions(_.flatMap { a =>
      val (kind, bytes) = unwrap(a)
      val es = if (kind == "zip") Zip.entries(bytes) else Tar.entries(bytes)
      es.zipWithIndex.map { case ((e, _), i) =>
        (a.doc_id, a.format, i, e.name, e.n_bytes, e.compressed_bytes,
          e.method, e.crc32)
      }
    }).toDF("doc_id", "format", "entry_idx", "name", "n_bytes",
      "compressed_bytes", "method", "crc32")
  }

  /** Extract every text member: one pass per archive, CRC/size verified,
    * per-member word/char counts — the ingestion row a code/document
    * corpus starts from.
    */
  def extractText(spark: SparkSession, archives: Dataset[ArchiveItem]): DataFrame = {
    import spark.implicits._
    archives.mapPartitions(_.flatMap { a =>
      val (kind, bytes) = unwrap(a)
      val es = if (kind == "zip") Zip.entries(bytes) else Tar.entries(bytes)
      es.filter(!_._1.is_dir).map { case (e, off) =>
        val data = if (kind == "zip") Zip.extract(bytes, e, off)
          else Tar.extract(bytes, e, off)
        val text = new String(data, "UTF-8")
        val nw = { val t = text.trim; if (t.isEmpty) 0 else t.split("\\s+").length }
        (a.doc_id, e.name, text, nw, text.codePointCount(0, text.length))
      }
    }).toDF("doc_id", "name", "text", "n_words", "n_chars")
  }
}
