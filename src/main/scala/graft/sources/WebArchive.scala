package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC / WET web-archive ingestion (ISO 28500) — the Common-Crawl-shaped
  * source a 100 TB training-data pipeline actually starts from.
  *
  * Scale design: the archive is read through Hadoop's TextInputFormat with
  * the record delimiter set to the WARC version prefix, so SPLITTING IS
  * FREE — every HDFS/S3 block boundary starts scanning forward to the next
  * `WARC/1.` marker exactly like line-splitting does for `\n`, records
  * parse independently per partition, and a 100 TB crawl fans out across
  * every executor with no pre-parse, no index, and no driver involvement.
  * Header parsing is a per-record scalar pass; the result is a plain
  * DataFrame, so everything downstream (dedup, quality, langid — the
  * operators/ tier) composes with full pushdown.
  *
  * WET ("conversion" records) carry extracted text; WARC response records
  * carry raw HTTP payloads. Both parse here — filter `warc_type`.
  *
  * Framing caveat: the delimiter split assumes payloads do not contain the
  * literal `WARC/1.` marker. A crawled page ABOUT the WARC format would
  * split mid-record: the truncated record keeps its headers (and is cut to
  * Content-Length where the remaining bytes allow), and the marker-less
  * tail block carries no WARC-Type header, so it drops rather than
  * surfacing as a phantom record. Byte-exact framing for adversarial
  * payloads requires sequential Content-Length chaining — inherently
  * single-stream, the trade this reader deliberately refuses for free
  * block-boundary parallelism.
  */
object WebArchive {

  private val versionMarker = java.util.regex.Pattern.compile("(?m)^WARC/\\d")

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("url", StringType),
    StructField("date", StringType),
    StructField("record_id", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("text", StringType)))

  /** All records of the WARC/WET files under `path` (file, directory, or
    * glob). Routing is PER MATCHED FILE: names ending `.gz` go through the
    * splittable per-member gzip reader ([[GzipMemberInputFormat]]),
    * everything else through plaintext delimiter framing — so a directory
    * or glob mixing both forms (a real crawl drop often does) reads
    * correctly in one call instead of mis-framing one kind. Directories
    * expand one level, like Hadoop's non-recursive input listing. The
    * listing is driver-side metadata IO only (one globStatus), not a data
    * pass.
    */
  def records(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }.map(_.getPath.toString)
    if (files.isEmpty)
      throw new java.io.FileNotFoundException(
        s"WebArchive.records: no input files match '$path'")
    val (gz, plain) = files.partition(_.endsWith(".gz"))
    // FileInputFormat splits its input string on bare commas — escape each
    // path so an archive named 'seg-1,2.warc.gz' stays one file
    def joined(ps: Seq[String]) =
      ps.map(org.apache.hadoop.util.StringUtils.escapeString).mkString(",")
    val parts = Seq(
      if (gz.nonEmpty) Some(gzipRecords(spark, joined(gz))) else None,
      if (plain.nonEmpty) Some(plaintextRecords(spark, joined(plain))) else None
    ).flatten
    parts.reduce(_ unionByName _)
  }

  /** Plaintext WARC/WET: delimiter-split on the `WARC/1.` version prefix —
    * covers 1.0 and 1.1 archives (the version-digit remainder lands as the
    * block's first line and drops in header parsing: no colon). An archive
    * of another major version never splits; [[parseRecord]] detects the
    * swallowed records and fails loudly instead of silently truncating to
    * the first record's Content-Length.
    */
  def plaintextRecords(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    // split on the version line; the leading block before the first marker
    // (empty, or a non-WARC preamble) parses to None and drops out
    conf.set("textinputformat.record.delimiter", "WARC/1.")
    val blocks = spark.sparkContext.newAPIHadoopFile(
      path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
    val rows = blocks.flatMap(parseRecord)
    spark.createDataFrame(rows, recordSchema)
  }

  /** One decompressed gzip member usually frames exactly one record
    * (Common Crawl convention), but nothing guarantees it — a producer may
    * pack several records per member, so split on the version marker
    * before parsing.
    */
  private val memberRecordSplit =
    java.util.regex.Pattern.compile("(?m)^(?=WARC/\\d)")

  /** Gzip'd WARC/WET (`*.warc.gz`): real Common Crawl ships one gzip MEMBER
    * per record, members concatenated into one valid RFC 1952 stream.
    * Hadoop's gzip codec would make each file one unsplittable task; the
    * member reader instead splits on byte ranges and CRC-validates member
    * boundaries, so the crawl fans out block-parallel like the plaintext
    * path.
    */
  def gzipRecords(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val members = spark.sparkContext.newAPIHadoopFile(
      path, classOf[GzipMemberInputFormat], classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
    val rows = members.flatMap { m =>
      memberRecordSplit.split(m).iterator.flatMap(parseRecord)
    }
    spark.createDataFrame(rows, recordSchema)
  }

  /** WET extracted-text documents: one row per conversion record. */
  def wetDocuments(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    records(spark, path)
      .filter(col("warc_type") === "conversion")
      .select(col("url"), col("date"), col("record_id"), col("text"))
  }

  /** One record block (everything between two WARC/1.0 markers):
    * `headers CRLF CRLF payload`. The payload is cut to Content-Length
    * BYTES when the header is present and sane (record blocks end with the
    * two CRLF record separators, which are framing, not content); headers
    * are case-insensitive per the spec.
    */
  private[sources] def parseRecord(block: String): Option[Row] = {
    if (block.trim.isEmpty) None
    else {
      val parts = block.split("\r?\n\r?\n", 2)
      val headerPart = parts(0)
      val rawBody = if (parts.length > 1) parts(1) else ""
      val headers = headerPart.linesIterator.flatMap { l =>
        l.split(":", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
          case _ => None
        }
      }.toMap
      // not a WARC record block (e.g. a preamble): no WARC-Type header
      headers.get("warc-type").map { wtype =>
        val len = headers.get("content-length").flatMap(s => s.toLongOption)
        val body = len match {
          case Some(n) if n >= 0 =>
            // Content-Length counts the ORIGINAL bytes; the cut below
            // re-encodes the decoded text, so a payload that was not
            // byte-faithful on decode (invalid UTF-8 became U+FFFD, 3
            // bytes each) can drift the cut point — acceptable for WET
            // text, where payloads are valid UTF-8 by construction.
            val bytes = rawBody.getBytes("UTF-8")
            if (n < bytes.length) {
              // never cut inside a multibyte sequence: if the char whose
              // lead byte precedes the cut extends past it, trim the whole
              // incomplete sequence instead of emitting trailing U+FFFD
              var cut = n.toInt
              var lead = cut - 1
              while (lead > 0 && (bytes(lead) & 0xc0) == 0x80) lead -= 1
              if (lead >= 0) {
                val b = bytes(lead) & 0xff
                val seqLen =
                  if (b < 0x80) 1
                  else if ((b & 0xe0) == 0xc0) 2
                  else if ((b & 0xf0) == 0xe0) 3
                  else if ((b & 0xf8) == 0xf0) 4
                  else 1
                if (lead + seqLen > cut) cut = lead
              }
              // the discarded tail should only ever be record separators;
              // a WARC version line in it means the delimiter never split
              // this archive (unsupported major version) and every record
              // after the first is being swallowed — refuse loudly
              val tail = new String(bytes, cut, bytes.length - cut, "UTF-8")
              if (versionMarker.matcher(tail).find())
                throw new IllegalStateException(
                  "WARC framing: payload tail beyond Content-Length contains another " +
                  "WARC version header — this archive's version is not split by the " +
                  "WARC/1.x delimiter and its records would be silently dropped. " +
                  "Re-encode the archive as WARC/1.x or extend the delimiter framing.")
              new String(bytes, 0, cut, "UTF-8")
            } else rawBody.stripSuffix("\r\n\r\n").stripSuffix("\n\n")
          case _ => rawBody.stripSuffix("\r\n\r\n").stripSuffix("\n\n")
        }
        Row(wtype,
          headers.get("warc-target-uri").orNull,
          headers.get("warc-date").orNull,
          headers.get("warc-record-id").orNull,
          headers.get("content-type").orNull,
          len.map(Long.box).orNull,
          body)
      }
    }
  }
}
