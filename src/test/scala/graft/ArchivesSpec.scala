package graft

import graft.sources.Archives
import graft.sources.Archives.{Tar, Zip}

/** Archive tier spec: zip/tar encode→enumerate→extract round trips,
  * interop in BOTH directions with the JDK's own zip streams, loud
  * rejection of crafted/unsupported archives, and the Spark ops.
  */
class ArchivesSpec extends SparkSpec {
  import spark.implicits._

  private val members = Seq(
    ("src/a.txt", "alpha beta gamma".getBytes("UTF-8")),
    ("src/deep/b.txt", "delta".getBytes("UTF-8")),
    ("README.md", ("docs " * 200).trim.getBytes("UTF-8")))

  test("zip: encode→entries→extract round-trips names, sizes, methods, " +
    "CRCs across stored and deflated members") {
    val payload = Zip.encode(members.map { case (n, d) =>
      (n, d, n != "README.md")
    })
    val es = Zip.entries(payload)
    assert(es.map(_._1.name) === members.map(_._1))
    assert(es.map(_._1.n_bytes) === members.map(_._2.length.toLong))
    assert(es.map(_._1.method) === Seq("deflate", "deflate", "store"))
    // the repeated README deflates well below its stored size
    es.zip(members).foreach { case ((e, off), (_, data)) =>
      assert(Zip.extract(payload, e, off).toSeq === data.toSeq)
      val c = new java.util.zip.CRC32(); c.update(data)
      assert(e.crc32 === c.getValue)
    }
  }

  test("tar: encode→entries→extract round-trips; header checksums verify") {
    val payload = Tar.encode(members)
    val es = Tar.entries(payload)
    assert(es.map(_._1.name) === members.map(_._1))
    assert(es.map(_._1.n_bytes) === members.map(_._2.length.toLong))
    assert(es.forall(_._1.method == "tar"))
    es.zip(members).foreach { case ((e, off), (_, data)) =>
      assert(Tar.extract(payload, e, off).toSeq === data.toSeq)
    }
  }

  test("interop: the JDK's ZipInputStream reads our zips; we read " +
    "ZipOutputStream's output") {
    // ours → JDK
    val ours = Zip.encode(members.map { case (n, d) => (n, d, true) })
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(ours))
    members.foreach { case (n, d) =>
      val e = zin.getNextEntry
      assert(e.getName === n)
      val got = zin.readAllBytes()
      assert(got.toSeq === d.toSeq, n)
    }
    assert(zin.getNextEntry === null)
    // JDK → ours
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    members.foreach { case (n, d) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      zout.write(d); zout.closeEntry()
    }
    zout.close()
    val theirs = bos.toByteArray
    val es = Zip.entries(theirs)
    assert(es.map(_._1.name) === members.map(_._1))
    es.zip(members).foreach { case ((e, off), (_, d)) =>
      assert(Zip.extract(theirs, e, off).toSeq === d.toSeq)
    }
  }

  test("zip64: the forced wire form (EOCD64 + locator + 0x0001 extra " +
    "fields) round-trips and interops with the JDK reader; crafted " +
    "zip64 rejects by name") {
    val z64 = Zip.encode(members.map { case (n, d) => (n, d, n != "README.md") },
      forceZip64 = true)
    // classic and zip64 wire forms of the same members yield the same catalog
    val classic = Zip.encode(members.map { case (n, d) => (n, d, n != "README.md") })
    assert(Zip.entries(z64).map(_._1) === Zip.entries(classic).map(_._1))
    val es = Zip.entries(z64)
    es.zip(members).foreach { case ((e, off), (_, data)) =>
      assert(Zip.extract(z64, e, off).toSeq === data.toSeq)
    }
    // JDK interop: local headers stay classic, so ZipInputStream streams it
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(z64))
    members.foreach { case (n, d) =>
      val e = zin.getNextEntry
      assert(e.getName === n)
      assert(zin.readAllBytes().toSeq === d.toSeq, n)
    }
    // EOCD carries zip64 markers but the locator is missing → by name
    val noLoc = {
      val eocd = z64.length - 22
      z64.take(eocd - 20 - 56) ++ z64.drop(eocd) // cut EOCD64 + locator
    }
    val m1 = intercept[IllegalArgumentException](Zip.entries(noLoc)).getMessage
    assert(m1.contains("EOCD64 locator"), m1)
    // an entry with markers but no 0x0001 extra field → by name
    val sig = Array[Byte](0x50, 0x4b, 0x01, 0x02)
    val cdAt = z64.indices.find(i => i + 4 <= z64.length &&
      z64.slice(i, i + 4).sameElements(sig)).get
    val noExtra = z64.clone()
    val nameLen = (z64(cdAt + 28) & 0xff) | ((z64(cdAt + 29) & 0xff) << 8)
    noExtra(cdAt + 46 + nameLen) = 0x7e // poison the extra field id (0x0001 → 0x007e)
    val m2 = intercept[IllegalArgumentException](Zip.entries(noExtra)).getMessage
    assert(m2.contains("no zip64 extra field"), m2)
  }

  test("crafted and unsupported archives reject by name") {
    def zrej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException] {
        Zip.entries(p).foreach { case (e, off) => Zip.extract(p, e, off) }
      }.getMessage
      assert(m.contains(frag), m)
    }
    val good = Zip.encode(members.map { case (n, d) => (n, d, true) })
    zrej("not a zip payload at all......................".getBytes, "end-of-central")
    zrej(good.take(good.length - 4), "end-of-central")
    // a lying CRC must fail extraction loudly
    val badCrc = good.clone()
    val cdSig = Array[Byte](0x50, 0x4b, 0x01, 0x02)
    val cdAt = good.indices.find(i => i + 4 <= good.length &&
      good.slice(i, i + 4).sameElements(cdSig)).get
    badCrc(cdAt + 16) = (badCrc(cdAt + 16) ^ 0x7f).toByte
    zrej(badCrc, "CRC mismatch")
    // encrypted flag rejects at the catalog
    val enc = good.clone(); enc(cdAt + 8) = 0x1
    zrej(enc, "encrypted")
    // unsupported method
    val lzma = good.clone(); lzma(cdAt + 10) = 14
    zrej(lzma, "method 14")
    def trej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](Tar.entries(p)).getMessage
      assert(m.contains(frag), m)
    }
    val tgood = Tar.encode(members)
    trej(tgood.take(700), "truncated")
    val nomagic = tgood.clone(); nomagic(257) = 'X'
    trej(nomagic, "ustar magic")
    val badsum = tgood.clone(); badsum(0) = 'Z' // name change breaks checksum
    trej(badsum, "checksum mismatch")
    val gnuLong = tgood.clone(); gnuLong(156) = 'L'
    // typeflag change also breaks the checksum; fix it back up so the
    // rejection is for the GNU extension, not the sum
    var sum = 0L
    (0 until 512).foreach(i => sum += (if (i >= 148 && i < 156) ' '.toInt
      else gnuLong(i) & 0xff))
    System.arraycopy(f"$sum%06o".getBytes("UTF-8"), 0, gnuLong, 148, 6)
    trej(gnuLong, "typeflag")
  }

  test("the Spark ops: planted archives → entriesOf / extractText agree " +
    "with the word plant; content bytes drive both formats") {
    val docs = Tables.documents(spark, sf).limit(30)
    val arch = Archives.archivesFromDocuments(spark, docs)
    val ents = Archives.entriesOf(spark, arch).collect()
    val texts = Archives.extractText(spark, arch).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    var sawZip = 0; var sawTar = 0; var sawTgz = 0
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        Archives.plantMembers(Option(text).getOrElse("")).foreach { ms =>
          val rows = ents.filter(_.getLong(0) == id).sortBy(_.getInt(2))
          assert(rows.map(_.getString(3)).toSeq === ms.map(_._1), s"doc $id")
          val wantFmt = if (id % 2 == 0) "zip" else if (id % 4 == 1) "tar" else "tgz"
          assert(rows.forall(_.getString(1) == wantFmt), s"doc $id")
          if (id % 2 == 0) sawZip += 1
          else if (id % 4 == 1) sawTar += 1 else sawTgz += 1
          ms.foreach { case (nm, c) =>
            assert(texts((id, nm)) === c, s"doc $id member $nm")
          }
          rows.foreach { r =>
            val want = ms.find(_._1 == r.getString(3)).get._2
            assert(r.getLong(4) === want.getBytes("UTF-8").length.toLong)
            if (id % 2 == 0 && r.getString(6) == "deflate")
              assert(r.getLong(5) <= r.getLong(4) + 16) // deflate never balloons a text member much
          }
        }
    }
    assert(sawZip > 0 && sawTar > 0 && sawTgz > 0)
  }

  test("tar.gz transport: gzip∘gunzip is the identity and a tgz archive " +
    "enumerates/extracts like its inner tar") {
    val tar = Tar.encode(members)
    assert(Archives.gunzip(Archives.gzip(tar)).toSeq === tar.toSeq)
  }
}
