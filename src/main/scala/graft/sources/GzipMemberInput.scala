package graft.sources

import java.io.InputStream
import java.util.zip.{CRC32, Inflater}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Splittable reader for CONCATENATED-GZIP files (RFC 1952 multi-member):
  * each gzip MEMBER decompresses to one record. This is the Common Crawl
  * `.warc.gz` convention — one WARC record per member — and the reason the
  * format stays parallel at 100 TB: member boundaries are natural split
  * points, unlike Hadoop's whole-file gzip codec which forces one task per
  * file.
  *
  * Split sync: splits are plain byte ranges; a reader starting mid-file
  * scans forward for the gzip magic (`1f 8b 08`, reserved FLG bits zero)
  * and validates the candidate by attempting a FULL member decode — the
  * CRC32 + ISIZE trailer check makes a false positive surviving decode
  * astronomically unlikely, and a failed candidate just resumes the scan
  * one byte on. A member straddling the split end belongs to the split
  * that contains its first byte (same ownership rule as Hadoop's line
  * reader), so records are emitted exactly once with no coordination.
  */
final class GzipMemberInputFormat extends FileInputFormat[LongWritable, Text] {
  override protected def isSplitable(context: JobContext, filename: HPath): Boolean = true
  override def createRecordReader(split: InputSplit, context: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new GzipMemberRecordReader
}

/** Growable read-ahead window over an InputStream with absolute-offset
  * tracking. Supports the decode-then-discard loop and the rescan a false
  * magic needs: everything from the current candidate onward stays
  * buffered until the candidate is accepted (discarded) or rejected
  * (discard 1, rescan). Memory is bounded by one compressed member plus
  * the sync-scan distance — both far below a block.
  */
private[sources] final class ReplayWindow(in: InputStream, startOffset: Long) {
  private var buf = new Array[Byte](1 << 16)
  private var len = 0

  /** Absolute file offset of window index 0. */
  var base: Long = startOffset

  /** Buffer at least `n` bytes (EOF permitting); returns bytes available. */
  private def ensure(n: Int): Int = {
    if (n > buf.length) {
      var cap = buf.length
      while (cap < n) cap <<= 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }
    var eof = false
    while (len < n && !eof) {
      val r = in.read(buf, len, buf.length - len)
      if (r < 0) eof = true else len += r
    }
    len
  }

  /** Byte at window index `i` as 0..255, or -1 past EOF. */
  def get(i: Int): Int = if (ensure(i + 1) > i) buf(i) & 0xff else -1

  def eofAt(i: Int): Boolean = ensure(i + 1) <= i

  /** Buffered bytes from index `i` as (array, offset, count), pulling more
    * from the stream when the window is exhausted; null at EOF.
    */
  def chunk(i: Int): (Array[Byte], Int, Int) = {
    if (i >= len && ensure(math.max(i + 1, len + 8192)) <= i) null
    else (buf, i, len - i)
  }

  def discard(n: Int): Unit = {
    val d = math.min(n, len)
    System.arraycopy(buf, d, buf, 0, len - d)
    len -= d
    base += n
  }

  /** Next index >= `from` holding a plausible member header (magic + zero
    * reserved FLG bits), or -1 at EOF. Plausible only — the caller
    * validates by decoding.
    */
  def nextMagic(from: Int): Int = {
    var i = math.max(from, 0)
    while (true) {
      val b0 = get(i)
      if (b0 < 0) return -1
      if (b0 == 0x1f && get(i + 1) == 0x8b && get(i + 2) == 0x08) {
        val flg = get(i + 3)
        if (flg >= 0 && (flg & 0xe0) == 0) return i
      }
      i += 1
    }
    -1
  }
}

private[sources] object GzipMember {

  /** Decode ONE gzip member at window index `off`. Some((payload, consumed
    * compressed bytes)) iff the full member parses and its CRC32 + ISIZE
    * trailer verify; None marks a false magic / truncation and consumes
    * nothing.
    */
  def decodeAt(w: ReplayWindow, off: Int): Option[(Array[Byte], Int)] = {
    var i = off
    def u8(): Int = { val b = w.get(i); i += 1; b }
    if (u8() != 0x1f || u8() != 0x8b || u8() != 0x08) return None
    val flg = u8()
    if (flg < 0 || (flg & 0xe0) != 0) return None
    i += 6 // MTIME(4) XFL OS
    if ((flg & 4) != 0) { // FEXTRA
      val lo = u8(); val hi = u8()
      if (hi < 0) return None
      i += lo | (hi << 8)
    }
    if ((flg & 8) != 0) { var b = u8(); while (b > 0) b = u8(); if (b < 0) return None } // FNAME
    if ((flg & 16) != 0) { var b = u8(); while (b > 0) b = u8(); if (b < 0) return None } // FCOMMENT
    // FHCRC: deliberately skipped (not verified) — it only checks the
    // header bytes, and the CRC32+ISIZE trailer below already validates
    // the full payload; a corrupt header either fails to parse here or
    // fails the trailer check
    if ((flg & 2) != 0) { if (w.get(i + 1) < 0) return None; i += 2 }

    val inf = new Inflater(true)
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    val crc = new CRC32
    val obuf = new Array[Byte](1 << 16)
    var feedPos = i // next window index not yet handed to the inflater
    try {
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val c = w.chunk(feedPos)
          if (c == null) return None // truncated mid-deflate
          inf.setInput(c._1, c._2, c._3)
          feedPos += c._3
        }
        val n =
          try inf.inflate(obuf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) { out.write(obuf, 0, n); crc.update(obuf, 0, n) }
        else if (inf.needsDictionary()) return None
      }
      i += (feedPos - i) - inf.getRemaining
    } finally inf.end()

    def u32le(): Long = {
      val b0 = u8(); val b1 = u8(); val b2 = u8(); val b3 = u8()
      if (b3 < 0) -1L
      else (b0.toLong | (b1.toLong << 8) | (b2.toLong << 16) | (b3.toLong << 24))
    }
    val storedCrc = u32le()
    val storedIsize = u32le()
    if (storedCrc != crc.getValue) None
    else if (storedIsize != (out.size().toLong & 0xffffffffL)) None
    else Some((out.toByteArray, i - off))
  }
}

private[sources] final class GzipMemberRecordReader extends RecordReader[LongWritable, Text] {
  private var start = 0L
  private var end = 0L
  private var stream: org.apache.hadoop.fs.FSDataInputStream = _
  private var window: ReplayWindow = _
  private var synced = false
  private val key = new LongWritable
  private val value = new Text

  override def initialize(genericSplit: InputSplit, context: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    start = split.getStart
    end = start + split.getLength
    val fs = split.getPath.getFileSystem(context.getConfiguration)
    stream = fs.open(split.getPath)
    if (start > 0) stream.seek(start)
    window = new ReplayWindow(stream, start)
    // offset 0 is a member boundary by definition; mid-file readers must scan
    synced = start == 0
  }

  override def nextKeyValue(): Boolean = {
    while (true) {
      if (!synced) {
        val m = window.nextMagic(0)
        if (m < 0) return false
        window.discard(m)
      }
      // ownership rule: a member starting at/after `end` is the next split's
      if (window.base >= end) return false
      if (window.eofAt(0)) return false
      GzipMember.decodeAt(window, 0) match {
        case Some((payload, consumed)) =>
          key.set(window.base)
          value.set(payload, 0, payload.length)
          window.discard(consumed)
          synced = true
          return true
        case None =>
          // false magic from the sync scan, or mid-file corruption: resume
          // scanning one byte on (robust-lossy, like Hadoop's text framing)
          window.discard(1)
          synced = false
      }
    }
    false
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (window.base - start).toFloat / (end - start).toFloat)
  override def close(): Unit = if (stream != null) stream.close()
}
