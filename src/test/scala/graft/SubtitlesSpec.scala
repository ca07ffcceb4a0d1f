package graft

import graft.operators.Subtitles
import org.apache.spark.sql.functions._

/** Subtitle/caption tier spec: hand-written SRT and WebVTT samples
  * (CRLF, BOM, NOTE/STYLE blocks, cue identifiers, settings, the
  * optional-hours form, out-of-order cues), loud rejection of malformed
  * tracks, round trip of the planted renderer, and hand-checked
  * cue→frame alignment.
  */
class SubtitlesSpec extends SparkSpec {
  import spark.implicits._

  test("parseSrt reads a canonical SubRip track: indices ignored, " +
    "multi-line text joined, CRLF normalized, out-of-order flagged") {
    val srt = "1\r\n00:00:01,500 --> 00:00:03,000\r\nHello there\r\n\r\n" +
      "7\r\n00:00:03,200 --> 00:01:00,000\r\nsecond cue\r\nline two\r\n\r\n" +
      "3\r\n00:00:02,000 --> 00:00:04,000\r\nrewound cue\r\n"
    val cues = Subtitles.parseSrt(9L, srt)
    assert(cues.map(_.cue_idx) === Seq(0, 1, 2)) // positional, not the file's 1/7/3
    assert(cues(0).start_ms === 1500 && cues(0).end_ms === 3000)
    assert(cues(1).start_ms === 3200 && cues(1).end_ms === 60000)
    assert(cues(1).text === "second cue\nline two" && cues(1).n_words === 4)
    assert(cues.map(_.in_order) === Seq(true, true, false)) // the rewind
    assert(cues.forall(_.media_id === 9L))
  }

  test("parse sniffs a BOM-prefixed SRT track (routine from Windows " +
    "subtitle tools) — the BOM must not reach the numeric index check") {
    val srt = "\uFEFF1\n00:00:01,000 --> 00:00:02,000\nbom cue\n"
    val cues = Subtitles.parse(3L, srt)
    assert(cues.length === 1)
    assert(cues(0).text === "bom cue" && cues(0).start_ms === 1000)
  }

  test("parseVtt reads a WebVTT track: BOM + header text, NOTE/STYLE " +
    "blocks skipped, cue identifiers, settings after the end time, " +
    "optional-hours timestamps") {
    val vtt = "\uFEFFWEBVTT - some header\n\n" +
      "NOTE\nthis block is commentary\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "01:30.000 --> 01:31.250 align:start position:10%\nshort form\n\n" +
      "intro-cue\n00:01:31.500 --> 00:01:33,000\nnamed cue\n\n" +
      "02:00.000 --> 02:01.000\nlast\n"
    val cues = Subtitles.parseVtt(4L, vtt)
    assert(cues.length === 3)
    assert(cues(0).start_ms === 90000 && cues(0).end_ms === 91250)
    assert(cues(0).text === "short form")
    assert(cues(1).start_ms === 91500 && cues(1).text === "named cue")
    assert(cues(2).start_ms === 120000)
    assert(cues.forall(_.in_order))
    // the sniff routes on the magic
    assert(Subtitles.parse(4L, vtt).length === 3)
    assert(Subtitles.parse(9L,
      "1\n00:00:01,000 --> 00:00:02,000\nx\n").head.start_ms === 1000)
  }

  test("malformed tracks reject by name: missing arrow, bad timestamp, " +
    "empty span, non-numeric SRT index, missing VTT magic") {
    def bad(body: => Any, frag: String): Unit =
      assert(intercept[IllegalArgumentException](body).getMessage.contains(frag))
    bad(Subtitles.parseSrt(1L, "1\n00:00:01,000 00:00:02,000\nx"), "-->")
    bad(Subtitles.parseSrt(1L, "1\n00:00:xx,000 --> 00:00:02,000\nx"),
      "unparseable")
    bad(Subtitles.parseSrt(1L, "1\n00:00:02,000 --> 00:00:02,000\nx"), "span")
    bad(Subtitles.parseSrt(1L, "one\n00:00:01,000 --> 00:00:02,000\nx"),
      "not numeric")
    bad(Subtitles.parseVtt(1L, "1\n00:00:01,000 --> 00:00:02,000\nx"),
      "WEBVTT")
    bad(Subtitles.parseSrt(1L, "1\n00:61:01,000 --> 00:62:02,000\nx"),
      "out of range")
  }

  test("parseAss reads an ASS track: Format-ordered Dialogue fields, " +
    "centisecond timestamps, Comment lines skipped, overrides stripped " +
    "from the visible word count; malformed tracks reject by name") {
    val track =
      """[Script Info]
        |Title: t
        |
        |[Events]
        |Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
        |Comment: 0,0:00:00.00,0:00:01.00,Default,,0,0,0,,a note
        |Dialogue: 0,0:00:01.50,0:00:03.20,Default,,0,0,0,,Hello {\i1}styled{\i0} world
        |Dialogue: 0,0:00:03.20,0:00:05.00,Default,,0,0,0,,two\Nlines, with a comma
        |""".stripMargin
    val cues = Subtitles.parseAss(7L, track)
    assert(cues.length === 2)
    assert(cues(0).start_ms === 1500L && cues(0).end_ms === 3200L)
    assert(cues(0).n_words === 3) // overrides don't count as words
    assert(cues(0).text === "Hello {\\i1}styled{\\i0} world") // raw kept
    assert(cues(1).start_ms === 3200L && cues(1).n_words === 5)
    assert(cues(1).in_order)
    // the sniffing router takes the section header
    assert(Subtitles.parse(7L, track) === cues)
    // a reordered Format grid still resolves fields by name
    val reordered = track.replace(
      "Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text",
      "Format: Start, End, Layer, Style, Name, MarginL, MarginR, MarginV, Effect, Text")
      .replaceAll("(?m)^Dialogue: 0,(\\d:\\d{2}:\\d{2}\\.\\d{2}),(\\d:\\d{2}:\\d{2}\\.\\d{2})",
        "Dialogue: $1,$2,0")
      .replaceAll("(?m)^Comment: 0,(\\d:\\d{2}:\\d{2}\\.\\d{2}),(\\d:\\d{2}:\\d{2}\\.\\d{2})",
        "Comment: $1,$2,0")
    assert(Subtitles.parseAss(7L, reordered).map(c => (c.start_ms, c.n_words)) ===
      cues.map(c => (c.start_ms, c.n_words)))
    def bad(body: => Any, frag: String): Unit =
      assert(intercept[IllegalArgumentException](body).getMessage.contains(frag), frag)
    bad(Subtitles.parseAss(1L, "[Script Info]\nTitle: x\n"), "[Events]")
    bad(Subtitles.parseAss(1L, "[Events]\nDialogue: 0,0:00:01.00,0:00:02.00,s,,0,0,0,,x"),
      "Format:")
    bad(Subtitles.parseAss(1L,
      "[Events]\nFormat: Start, Text, End\nDialogue: 0:00:01.00,x,0:00:02.00"),
      "LAST")
    bad(Subtitles.parseAss(1L,
      "[Events]\nFormat: Start, End, Text\nDialogue: 0:00:02.00,0:00:02.00,x"),
      "span")
    bad(Subtitles.parseAss(1L,
      "[Events]\nFormat: Start, End, Text\nDialogue: 0:00:01.000,0:00:02.00,x"),
      "unparseable")
    // assVisibleText: overrides vanish, escapes become spaces
    assert(Subtitles.assVisibleText("{\\pos(1,2)}a\\Nb\\hc") === "a b c")
  }

  test("the ASS plant round-trips: format∘parse is the identity and " +
    "cleanCueTextRef recovers exactly the normalized words") {
    val docs = Tables.documents(spark, sf).limit(30)
      .select("doc_id", "text").as[(Long, String)].collect()
    var sawCues = 0; var sawOutOfOrder = 0
    docs.foreach { case (id, text) =>
      Subtitles.plantAssSubtitle(id, Option(text).getOrElse("")).foreach { payload =>
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
          .map(Subtitles.normalizeAssWord)
        val groups = words.grouped(4).toIndexedSeq
        val cues = Subtitles.parse(id, payload)
        assert(cues.length === groups.length, s"doc $id")
        cues.zip(groups).zipWithIndex.foreach { case ((c, g), i) =>
          val (ws, we) = Subtitles.plantAssCueTimes(id, i, groups.length)
          assert(c.start_ms === ws && c.end_ms === we, s"doc $id cue $i")
          assert(c.n_words === g.length, s"doc $id cue $i")
          assert(Subtitles.cleanCueTextRef(c.text) === g.mkString(" "), s"doc $id cue $i")
          if (!c.in_order) sawOutOfOrder += 1
          sawCues += 1
        }
      }
    }
    assert(sawCues > 0)
    assert(sawOutOfOrder > 0, "the out-of-order plant never fired")
  }

  test("the planted renderer round-trips through the parser on both " +
    "formats — format∘parse is the identity on every cue field") {
    val docs = Tables.documents(spark, sf).limit(40)
      .select("doc_id", "text").as[(Long, String)].collect()
    var sawSrt = 0; var sawVtt = 0; var sawOutOfOrder = 0
    docs.foreach { case (id, text) =>
      Subtitles.plantSubtitle(id, Option(text).getOrElse("")).foreach { payload =>
        if (payload.startsWith("WEBVTT")) sawVtt += 1 else sawSrt += 1
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        val groups = words.grouped(4).toIndexedSeq
        val cues = Subtitles.parse(id, payload)
        assert(cues.length === groups.length, s"doc $id")
        cues.zip(groups).zipWithIndex.foreach { case ((c, g0), i) =>
          val (ws, we) = Subtitles.plantCueTimes(id, i, groups.length)
          // the supplementary-character plant suffixes cue 0's last word
          val g = if (i == 0 && id % 11 == 0) g0.init :+ (g0.last + "🎬") else g0
          assert(c.start_ms === ws && c.end_ms === we, s"doc $id cue $i")
          assert(c.n_words === g.length, s"doc $id cue $i")
          assert(c.text.split("\\s+").toSeq === g.toSeq, s"doc $id cue $i")
          if (!c.in_order) sawOutOfOrder += 1
        }
      }
    }
    assert(sawSrt > 0 && sawVtt > 0, s"srt=$sawSrt vtt=$sawVtt")
    assert(sawOutOfOrder > 0, "the out-of-order plant never fired")
  }

  test("cleanCueText strips voice spans, style tags, karaoke stamps and " +
    "entities — the Spark codegen chain equals the java.util.regex " +
    "replica on hand samples and on the whole marked plant") {
    val samples = Seq(
      "<v Roger Bingham>We are in New York City",
      "<b>bold</b> and <i>italic</i> and <c.yellow>classed</c>",
      "word<00:01.500>karaoke <00:02.000>more",
      "A&amp;B &lt;tag&gt; x&nbsp;y &lrm;rtl&rlm;",
      "  spaces\tand\nnewlines  ",
      "plain text stays")
    val expected = Seq(
      "We are in New York City",
      "bold and italic and classed",
      "wordkaraoke more",
      "A&B <tag> x y rtl",
      "spaces and newlines",
      "plain text stays")
    samples.zip(expected).foreach { case (s, want) =>
      assert(Subtitles.cleanCueTextRef(s) === want, s)
    }
    val viaSpark = samples.toDF("t")
      .select(Subtitles.cleanCueText(col("t"))).collect().map(_.getString(0))
    assert(viaSpark.toSeq === expected)
    // the marked plant is valid VTT: parses, and cleaning recovers the
    // original words (modulo the planted entity suffix)
    val docs = Tables.documents(spark, sf).limit(30)
      .select("doc_id", "text").as[(Long, String)].collect()
    var sawMarkup = 0
    docs.foreach { case (id, text) =>
      Subtitles.plantMarkedSubtitle(id, Option(text).getOrElse("")).foreach { payload =>
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        val cues = Subtitles.parseVtt(id, payload)
        assert(cues.length === words.grouped(4).size, s"doc $id")
        // the recovers-original-words claim only holds for words that
        // carry no markup-looking characters themselves (the oracle
        // replica is parity-exact regardless — it cleans the same
        // marked text)
        if (!text.exists(c => c == '<' || c == '>' || c == '&')) {
          val cleaned = cues.flatMap(c =>
            Subtitles.cleanCueTextRef(c.text).split(" ")).toSeq
          // word 0 of EVERY cue (k % 4 == 0) carries the entity on
          // id % 4 == 0 docs
          val want = words.zipWithIndex.map { case (w, k) =>
            if (k % 4 == 0 && id % 4 == 0) w + "&co" else w
          }.toSeq
          assert(cleaned === want, s"doc $id")
        }
        if (cues.exists(_.text.contains("<"))) sawMarkup += 1
      }
    }
    assert(sawMarkup > 0)
  }

  test("cueQualityStats: hand-checked counts, cue-order overlap " +
    "detection, and reading-speed arithmetic") {
    val cues = Seq(
      (1L, 0, 0L, 1000L, 2, true, "ab cd"),  // 5 chars, 1000 ms
      (1L, 1, 900L, 2000L, 1, true, "efg"),  // overlaps cue 0 (900 < 1000)
      (1L, 2, 500L, 2500L, 1, false, "h"),   // out-of-order AND overlaps (500 < 2000)
      (2L, 0, 0L, 2000L, 1, true, "xxxx"))
      .toDF("media_id", "cue_idx", "start_ms", "end_ms", "n_words",
        "in_order", "text")
    val q = Subtitles.cueQualityStats(cues).collect()
      .map(r => r.getLong(0) -> r).toMap
    val t1 = q(1L)
    assert(t1.getLong(t1.fieldIndex("n_cues")) === 3)
    assert(t1.getLong(t1.fieldIndex("span_ms")) === 2500)
    assert(t1.getLong(t1.fieldIndex("out_of_order")) === 1)
    assert(t1.getLong(t1.fieldIndex("overlap_cues")) === 2)
    assert(t1.getLong(t1.fieldIndex("total_chars")) === 9)
    assert(t1.getLong(t1.fieldIndex("cue_ms")) === 4100)
    assert(t1.getDouble(t1.fieldIndex("chars_per_sec")) ===
      BigDecimal(9 * 1000.0 / 4100)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val t2 = q(2L)
    assert(t2.getLong(t2.fieldIndex("overlap_cues")) === 0)
    assert(t2.getLong(t2.fieldIndex("out_of_order")) === 0)
    assert(t2.getDouble(t2.fieldIndex("chars_per_sec")) === 2.0)
    // the planted corpus: id%5==0 docs with >= 3 cues carry exactly one
    // out-of-order cue and one overlap; everything else is clean
    val docs = Tables.documents(spark, sf).limit(40)
    val stats = Subtitles.cueQualityStats(
      Subtitles.parseCues(spark,
        Subtitles.subtitlesFromDocuments(spark, docs)).toDF())
      .collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      val dirty = id % 5 == 0 && r.getLong(r.fieldIndex("n_cues")) >= 3
      assert(r.getLong(r.fieldIndex("out_of_order")) === (if (dirty) 1L else 0L), s"doc $id")
      assert(r.getLong(r.fieldIndex("overlap_cues")) === (if (dirty) 1L else 0L), s"doc $id")
    }
  }

  test("cueFramePairs aligns cue spans to the sampled-frame timeline by " +
    "hand arithmetic: boundary frames, clipping, and off-clip cues") {
    val cues = Seq(
      // [1000, 2000) ms at 500 ms/frame → frames 2, 3 (frame 4 sits AT end)
      (10L, 0, 1000L, 2000L, 2, true, "a b"),
      // [1250, 1400) covers no frame timestamp: first=ceil(2.5)=3 but
      // last=ceil(2.8)−1=2 → empty, no rows
      (10L, 1, 1250L, 1400L, 1, true, "c"),
      // [0, 10000) clipped to the 4-frame clip → frames 0..3
      (10L, 2, 0L, 10000L, 1, true, "d"),
      // beyond the clip entirely → no rows
      (10L, 3, 99000L, 99500L, 1, true, "e"))
      .toDF("media_id", "cue_idx", "start_ms", "end_ms", "n_words",
        "in_order", "text")
    val clips = Seq((10L, 4)).toDF("media_id", "n_frames")
    val pairs = Subtitles.cueFramePairs(cues, clips, 500000)
      .select("cue_idx", "frame_idx").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(pairs === Seq((0, 2L), (0, 3L), (2, 0L), (2, 1L), (2, 2L), (2, 3L)))
  }
}
