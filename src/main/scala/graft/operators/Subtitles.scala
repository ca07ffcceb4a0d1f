package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Subtitle/caption parsing — the TEXT side of the video tier. A
  * video-text training pipeline (contrastive pretraining, caption
  * grounding, ASR supervision) starts from the two caption formats the
  * web actually serves: SubRip (.srt) and WebVTT (.vtt). Both are plain
  * text, so the parse is pure string discipline — no library anywhere —
  * and the cue→frame alignment that produces (frame, text) training
  * pairs is integer arithmetic over the clip's frame interval.
  *
  * Scope (canonical subset, fails loudly outside it): SRT blocks
  * (index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm`, text lines, blank-line
  * separated) and WebVTT (the `WEBVTT` magic, `.` millisecond
  * separator, optional cue identifiers, NOTE/STYLE/REGION blocks
  * skipped, cue settings after the arrow ignored, optional hour field).
  * Cues must be well-formed spans (end > start); out-of-order cues are
  * accepted (the wild is full of them) but flagged in [[Cue.in_order]]
  * so a curation gate can cut on it.
  *
  * Reference behavior being matched: the reference stores such payloads
  * as text/blob columns (cql3 text type); caption parsing is a pipeline
  * extension per the brief, wire formats from the public SubRip/WebVTT
  * specs.
  */
object Subtitles {

  /** One parsed cue. `in_order` is false when this cue starts before
    * the previous cue's start (the monotonicity curation signal).
    */
  case class Cue(media_id: Long, cue_idx: Int, start_ms: Long, end_ms: Long,
                 n_words: Int, in_order: Boolean, text: String)

  /** A subtitle payload row (the caption analog of MediaItem). */
  case class SubtitleItem(media_id: Long, payload: String)

  private val SrtTime = """(\d+):(\d{2}):(\d{2})[,.](\d{3})""".r
  private val VttShortTime = """(\d{2}):(\d{2})[.](\d{3})""".r

  private def parseTime(s: String, what: String): Long = s.trim match {
    case SrtTime(hh, mm, ss, ms) =>
      require(mm.toInt < 60 && ss.toInt < 60,
        s"$what: minutes/seconds out of range in '$s'")
      ((hh.toLong * 60 + mm.toLong) * 60 + ss.toLong) * 1000 + ms.toLong
    case VttShortTime(mm, ss, ms) => // WebVTT's optional-hours form
      require(mm.toInt < 60 && ss.toInt < 60,
        s"$what: minutes/seconds out of range in '$s'")
      (mm.toLong * 60 + ss.toLong) * 1000 + ms.toLong
    case _ => throw new IllegalArgumentException(
      s"$what: unparseable timestamp '$s'")
  }

  private def wordCount(text: String): Int = {
    val t = text.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  /** SubRip parse: blank-line-separated blocks of (numeric index,
    * `start --> end`, text lines). The numeric index line is validated
    * as numeric but its VALUE is ignored (real files renumber badly);
    * cue_idx is positional.
    */
  def parseSrt(mediaId: Long, payload: String): Seq[Cue] = {
    val blocks = payload.replace("\r\n", "\n").replace("\r", "\n")
      .split("\n{2,}").iterator.map(_.strip).filter(_.nonEmpty).toSeq
    var prevStart = Long.MinValue
    blocks.zipWithIndex.map { case (block, i) =>
      val lines = block.split("\n")
      require(lines.length >= 2,
        s"parseSrt: cue $i has ${lines.length} line(s), need index + timing")
      require(lines(0).trim.forall(_.isDigit) && lines(0).trim.nonEmpty,
        s"parseSrt: cue $i index line '${lines(0)}' is not numeric")
      val arrow = lines(1).split("-->")
      require(arrow.length == 2,
        s"parseSrt: cue $i timing line '${lines(1)}' has no -->")
      val start = parseTime(arrow(0), s"parseSrt cue $i")
      val end = parseTime(arrow(1), s"parseSrt cue $i")
      require(end > start,
        s"parseSrt: cue $i is an empty/negative span ($start..$end ms)")
      val text = lines.drop(2).mkString("\n")
      val ord = start >= prevStart
      prevStart = start
      Cue(mediaId, i, start, end, wordCount(text), ord, text)
    }
  }

  /** WebVTT parse: the `WEBVTT` magic (with optional trailing header
    * text), then blank-line-separated blocks — NOTE/STYLE/REGION blocks
    * skip whole; a cue block is an optional identifier line, the timing
    * line (`.` millisecond separator, optional hours, settings after
    * the end time ignored), then text lines.
    */
  def parseVtt(mediaId: Long, payload: String): Seq[Cue] = {
    val norm = payload.replace("\uFEFF", "").replace("\r\n", "\n")
      .replace("\r", "\n")
    require(norm.startsWith("WEBVTT"),
      "parseVtt: missing WEBVTT magic")
    val blocks = norm.split("\n{2,}").iterator.map(_.strip)
      .filter(_.nonEmpty).toSeq.drop(1) // the header block
    var prevStart = Long.MinValue
    var idx = 0
    val out = Seq.newBuilder[Cue]
    blocks.foreach { block =>
      val lines = block.split("\n")
      val kind = lines(0).takeWhile(!_.isWhitespace)
      if (kind != "NOTE" && kind != "STYLE" && kind != "REGION") {
        val timingLine = if (lines(0).contains("-->")) 0 else 1
        require(timingLine < lines.length && lines(timingLine).contains("-->"),
          s"parseVtt: cue block '${lines(0).take(40)}' has no timing line")
        val arrow = lines(timingLine).split("-->")
        require(arrow.length == 2,
          s"parseVtt: malformed timing line '${lines(timingLine)}'")
        val start = parseTime(arrow(0), s"parseVtt cue $idx")
        // cue settings (position:, line:, align:, ...) follow the end
        // time on the same line — split them off before parsing
        val endTok = arrow(1).trim.split("\\s+")(0)
        val end = parseTime(endTok, s"parseVtt cue $idx")
        require(end > start,
          s"parseVtt: cue $idx is an empty/negative span ($start..$end ms)")
        val text = lines.drop(timingLine + 1).mkString("\n")
        val ord = start >= prevStart
        prevStart = start
        out += Cue(mediaId, idx, start, end, wordCount(text), ord, text)
        idx += 1
      }
    }
    out.result()
  }

  // =====================================================================
  // ASS/SSA (Advanced SubStation Alpha — the fansub/anime-corpus format)
  // =====================================================================

  private val AssTime = """(\d+):(\d{2}):(\d{2})\.(\d{2})""".r

  /** ASS timestamps are `H:MM:SS.cc` — CENTIseconds, not milliseconds. */
  private def parseAssTime(s: String, what: String): Long = s.trim match {
    case AssTime(h, m, sec, cs) =>
      require(m.toInt < 60 && sec.toInt < 60,
        s"$what: minutes/seconds out of range in '$s'")
      ((h.toLong * 60 + m.toLong) * 60 + sec.toLong) * 1000 + cs.toLong * 10
    case _ => throw new IllegalArgumentException(
      s"$what: unparseable ASS timestamp '$s'")
  }

  /** Visible text of one ASS dialogue line: `{\...}` style-override
    * blocks vanish, the `\N`/`\n`/`\h` escapes read as spaces.
    */
  def assVisibleText(t: String): String =
    t.replaceAll("\\{[^}]*\\}", "").replace("\\N", " ")
      .replace("\\n", " ").replace("\\h", " ")

  /** ASS/SSA parse into the same [[Cue]] schema: the `[Events]`
    * section's `Format:` line fixes the field order (Text must be LAST —
    * it is the one field that may contain commas, so each `Dialogue:`
    * line splits with that bound); `Comment:` lines and every other
    * section are skipped. `text` keeps the raw dialogue (override blocks
    * included — [[cleanCueText]] strips them downstream, the SRT/VTT
    * discipline); `n_words` counts the VISIBLE words.
    */
  def parseAss(mediaId: Long, payload: String): Seq[Cue] = {
    val lines = payload.replace("\uFEFF", "").replace("\r\n", "\n")
      .replace("\r", "\n").split("\n")
    val evAt = lines.indexWhere(_.trim.equalsIgnoreCase("[Events]"))
    require(evAt >= 0, "parseAss: no [Events] section")
    val fmtAt = lines.indexWhere(l => l.trim.nonEmpty, evAt + 1)
    require(fmtAt > evAt && lines(fmtAt).trim.startsWith("Format:"),
      "parseAss: [Events] section without a leading Format: line")
    val fields = lines(fmtAt).trim.stripPrefix("Format:").split(",").map(_.trim)
    val startIdx = fields.indexOf("Start")
    val endIdx = fields.indexOf("End")
    val textIdx = fields.indexOf("Text")
    require(startIdx >= 0 && endIdx >= 0 && textIdx >= 0,
      s"parseAss: Format line lacks Start/End/Text: '${lines(fmtAt).trim}'")
    require(textIdx == fields.length - 1,
      "parseAss: Text must be the LAST Format field (dialogue text may " +
        "contain commas)")
    var prevStart = Long.MinValue
    var idx = 0
    val out = Seq.newBuilder[Cue]
    var i = fmtAt + 1
    var inEvents = true
    while (inEvents && i < lines.length) {
      val line = lines(i).trim
      if (line.startsWith("[")) inEvents = false // next section
      else if (line.startsWith("Dialogue:")) {
        val parts = line.stripPrefix("Dialogue:").split(",", fields.length)
        require(parts.length == fields.length,
          s"parseAss: Dialogue line has ${parts.length} fields, Format " +
            s"declares ${fields.length}: '${line.take(60)}'")
        val start = parseAssTime(parts(startIdx), s"parseAss cue $idx")
        val end = parseAssTime(parts(endIdx), s"parseAss cue $idx")
        require(end > start,
          s"parseAss: cue $idx is an empty/negative span ($start..$end ms)")
        val text = parts(textIdx)
        val ord = start >= prevStart
        prevStart = start
        out += Cue(mediaId, idx, start, end, wordCount(assVisibleText(text)),
          ord, text)
        idx += 1
      }
      // Comment:/Picture:/Sound: event lines and blanks: skipped per spec
      i += 1
    }
    out.result()
  }

  /** Container sniff: WebVTT magic → VTT; an ini-style `[...]` section
    * header → ASS/SSA; else SRT. */
  def parse(mediaId: Long, payload: String): Seq[Cue] = {
    val trimmed = payload.replace("\uFEFF", "")
    if (trimmed.startsWith("WEBVTT")) parseVtt(mediaId, payload)
    else if (trimmed.dropWhile(c => c == '\n' || c == '\r' || c == ' ')
      .startsWith("[")) parseAss(mediaId, trimmed)
    else parseSrt(mediaId, trimmed)
  }

  /** Parse a subtitle table into one row per cue — the same
    * `mapPartitions` batch shape as the media tiers; payload text never
    * leaves the executor.
    */
  def parseCues(spark: SparkSession, subs: Dataset[SubtitleItem]): Dataset[Cue] = {
    import spark.implicits._
    subs.mapPartitions(_.flatMap(s => parse(s.media_id, s.payload)))
  }

  /** Per-track caption QUALITY signals — what a video-text pipeline
    * gates on before trusting a caption track: cue count, covered span,
    * out-of-order and overlapping cue counts (machine-merged or
    * double-encoded tracks), and reading speed (chars/sec over cue
    * time — autogenerated junk tracks run far above human subtitling
    * rates). One lag window + one aggregation, both keyed on media_id,
    * so the single key shuffle is reused across the two stages.
    */
  def cueQualityStats(cues: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("cue_idx")
    cues.withColumn("_prev_end", lag(col("end_ms"), 1).over(w))
      .groupBy("media_id").agg(
        count(lit(1)).as("n_cues"),
        (max(col("end_ms")) - min(col("start_ms"))).as("span_ms"),
        sum(when(col("in_order"), 0).otherwise(1)).as("out_of_order"),
        sum(when(col("_prev_end").isNotNull &&
          col("start_ms") < col("_prev_end"), 1).otherwise(0)).as("overlap_cues"),
        sum(length(col("text"))).as("total_chars"),
        sum(col("end_ms") - col("start_ms")).as("cue_ms"))
      .withColumn("chars_per_sec",
        round(col("total_chars") * 1000.0 / col("cue_ms"), 6))
  }

  /** Strip WebVTT/SRT cue markup down to training text — voice spans
    * (`<v Name>`), class/style spans (`<b> <i> <u> <c.cls>` and their
    * closers), karaoke timestamps (`<00:01.500>`), and the five basic
    * character entities — then collapse runs of whitespace. One
    * codegen'd `regexp_replace` chain (Java regex on both engines), no
    * UDF: markup density varies wildly across caption tracks, and at
    * crawl scale this runs on every cue of every clip.
    */
  def cleanCueText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // ASS `{\...}` override blocks and `\N`/`\n`/`\h` escapes first (a
    // no-op on SRT/VTT text), then the angle-bracket span markup
    val unoverridden = regexp_replace(
      regexp_replace(text, "\\{[^}]*\\}", ""), "\\\\[Nnh]", " ")
    val untagged = regexp_replace(unoverridden, "<[^>]*>", "")
    val entities = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&nbsp;" -> " ", "&lrm;" -> "", "&rlm;" -> "")
    val decoded = entities.foldLeft(untagged) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Plain-Scala restatement of [[cleanCueText]] (the fixture replica's
    * half — java.util.regex against Spark's codegen'd regexp_replace).
    */
  def cleanCueTextRef(text: String): String = {
    var t = text.replaceAll("\\{[^}]*\\}", "").replaceAll("\\\\[Nnh]", " ")
      .replaceAll("<[^>]*>", "")
    Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&nbsp;" -> " ", "&lrm;" -> "", "&rlm;" -> "").foreach { case (from, to) =>
      t = t.replace(from, to)
    }
    t.replaceAll("\\s+", " ").trim
  }

  /** Markup planting (spec for the fixture replica): the VTT render of
    * every doc's cues with deterministic markup injected — cue 0 opens
    * with a voice span `<v Speaker(id mod 3)>`, word j of cue i wraps in
    * `<b>`/`<i>`/`<c.yellow>` when (id + i + j) mod 4 is 0/1/2 (mod 4 ==
    * 3 stays bare), a karaoke timestamp precedes word 1 of even cues,
    * and word 0 of id mod 4 == 0 docs carries an `&amp;` entity.
    * Timing/grouping as [[plantCueTimes]].
    */
  def plantMarkedSubtitle(id: Long, text: String): Option[String] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return None
    val groups = words.grouped(4).toSeq
    val blocks = groups.zipWithIndex.map { case (g, i) =>
      val (start, end) = plantCueTimes(id, i, groups.length)
      val marked = g.zipWithIndex.map { case (w0, j) =>
        val w = if (j == 0 && id % 4 == 0) w0 + "&amp;co" else w0
        val core = ((id + i + j) % 4).toInt match {
          case 0 => s"<b>$w</b>"
          case 1 => s"<i>$w</i>"
          case 2 => s"<c.yellow>$w</c>"
          case _ => w
        }
        val karaoke = if (j == 1 && i % 2 == 0)
          s"<${formatTime(start + 200, srt = false)}>" else ""
        val voice = if (i == 0 && j == 0) s"<v Speaker${id % 3}>" else ""
        voice + karaoke + core
      }.mkString(" ")
      s"${formatTime(start, srt = false)} --> ${formatTime(end, srt = false)}\n$marked"
    }
    Some((Seq("WEBVTT") ++ blocks).mkString("\n\n"))
  }

  /** Format milliseconds as an SRT/VTT timestamp. */
  def formatTime(ms: Long, srt: Boolean): String = {
    val h = ms / 3600000; val m = ms / 60000 % 60
    val s = ms / 1000 % 60; val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d${if (srt) "," else "."}$f%03d"
  }

  /** Planted cue timing (spec for the fixture replica): cue i of doc
    * `id` starts at i·1700 + (id mod 7)·13 ms and runs 1400 ms — except
    * cue 2 of id % 5 == 0 docs, which starts 100 ms BEFORE cue 1 (a
    * deliberately out-of-order cue, so the in_order curation flag sits
    * inside the oracle gate). Cue text is the doc's whitespace words in
    * groups of four (a full group renders as two lines of two words).
    */
  def plantCueTimes(id: Long, i: Int, nCues: Int): (Long, Long) = {
    val base = i.toLong * 1700 + (id % 7) * 13
    val start = if (i == 2 && id % 5 == 0 && nCues >= 3)
      1L * 1700 + (id % 7) * 13 - 100 else base
    (start, start + 1400)
  }

  /** Render the planted cues for one document as SRT (even ids) or
    * WebVTT (odd ids). The VTT side plants the parser's edge paths: a
    * NOTE block, a cue identifier line on cue 1, a settings suffix on
    * cue 0, and the optional-hours short timestamp form on even cues.
    * Returns None when the text has no words (no cues, no payload).
    */
  def plantSubtitle(id: Long, text: String): Option[String] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return None
    val groups = words.grouped(4).toSeq
    val srt = id % 2 == 0
    val blocks = groups.zipWithIndex.map { case (g, i) =>
      val (start, end) = plantCueTimes(id, i, groups.length)
      val lines0 =
        if (g.length == 4) Seq(g.take(2).mkString(" "), g.drop(2).mkString(" "))
        else Seq(g.mkString(" "))
      // plant a supplementary character (U+1F3AC, 2 UTF-16 units, 1 code
      // point) on cue 0 of id%11==0 tracks: emoji are routine in real
      // caption tracks, and the plant pins total_chars to CODE POINTS on
      // both engines (Spark length() vs the replica's codePointCount)
      val lines = if (i == 0 && id % 11 == 0)
        lines0.init :+ (lines0.last + "🎬") else lines0
      if (srt)
        (Seq(s"${i + 1}",
          s"${formatTime(start, srt = true)} --> ${formatTime(end, srt = true)}") ++
          lines).mkString("\n")
      else {
        val shortForm = i % 2 == 0 && start < 3600000 && end < 3600000
        def t(ms: Long) =
          if (shortForm) formatTime(ms, srt = false).drop(3) else formatTime(ms, srt = false)
        val timing = s"${t(start)} --> ${t(end)}" +
          (if (i == 0) " align:start position:10%" else "")
        val idLine = if (i == 1) Seq(s"cue-$id-1") else Nil
        (idLine ++ Seq(timing) ++ lines).mkString("\n")
      }
    }
    Some(
      if (srt) blocks.mkString("\n\n")
      else (Seq("WEBVTT - planted fixture", "NOTE synthetic caption track") ++
        blocks).mkString("\n\n"))
  }

  /** ASS word normalization (spec for the fixture replica): '{', '}'
    * and '\' map to ',' — a brace would open a style-override block the
    * extractor strips (silent word loss), and a backslash could
    * fabricate a `\N` escape.
    */
  def normalizeAssWord(w: String): String =
    w.map(c => if (c == '{' || c == '}' || c == '\\') ',' else c)

  /** ASS cue timing (spec for the fixture replica): centisecond
    * resolution — ASS timestamps are `H:MM:SS.cc` — so everything is a
    * multiple of 10 ms: cue i starts at i·1700 + (id%7)·10, runs 1400;
    * cue 2 of id%5==0 docs starts 100 ms before cue 1 (the out-of-order
    * plant, as the SRT/VTT side).
    */
  def plantAssCueTimes(id: Long, i: Int, nCues: Int): (Long, Long) = {
    val base = i.toLong * 1700 + (id % 7) * 10
    val start = if (i == 2 && id % 5 == 0 && nCues >= 3)
      1L * 1700 + (id % 7) * 10 - 100 else base
    (start, start + 1400)
  }

  /** Render the planted cues for one document as ASS (spec for the
    * fixture replica): words normalized by [[normalizeAssWord]], groups
    * of four per cue ([[plantAssCueTimes]] timing); word j of cue i
    * wraps in `{\i1}..{\i0}` when (id+i+j)%3==0, `{\b1}..{\b0}` when
    * ==1, bare otherwise; full 4-word cues join their halves with `\N`;
    * a `Comment:` event precedes the cues on id%3==0 docs (skipped by
    * contract). The visible text of cue i is EXACTLY its normalized
    * words joined by single spaces.
    */
  def plantAssSubtitle(id: Long, text: String): Option[String] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
      .map(normalizeAssWord)
    if (words.isEmpty) return None
    val groups = words.grouped(4).toSeq
    def fmt(ms: Long): String = {
      val h = ms / 3600000; val m = ms / 60000 % 60
      val s = ms / 1000 % 60; val cc = ms % 1000 / 10
      f"$h%01d:$m%02d:$s%02d.$cc%02d"
    }
    val dialogues = groups.zipWithIndex.map { case (g, i) =>
      val (start, end) = plantAssCueTimes(id, i, groups.length)
      val styled = g.zipWithIndex.map { case (w, j) =>
        ((id + i + j) % 3).toInt match {
          case 0 => s"{\\i1}$w{\\i0}"
          case 1 => s"{\\b1}$w{\\b0}"
          case _ => w
        }
      }
      val body = if (styled.length == 4)
        styled.take(2).mkString(" ") + "\\N" + styled.drop(2).mkString(" ")
      else styled.mkString(" ")
      s"Dialogue: 0,${fmt(start)},${fmt(end)},Default,,0,0,0,,$body"
    }
    val comment = if (id % 3 == 0)
      Seq(s"Comment: 0,0:00:00.00,0:00:01.00,Default,,0,0,0,,planted note $id")
    else Nil
    Some((Seq(
      "[Script Info]",
      s"Title: doc$id",
      "ScriptType: v4.00+",
      "",
      "[V4+ Styles]",
      "Format: Name, Fontname, Fontsize",
      "Style: Default,Arial,20",
      "",
      "[Events]",
      "Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text") ++
      comment ++ dialogues).mkString("\n") + "\n")
  }

  /** Build the ASS subtitle table from the documents fixture. */
  def assFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[SubtitleItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)].flatMap { case (id, text) =>
        plantAssSubtitle(id, text).map(SubtitleItem(id, _))
      }
  }

  /** Build a subtitle table from the documents fixture ([[plantSubtitle]]
    * — SRT for even ids, WebVTT for odd, so both formats and every
    * parser edge path sit inside the oracle gate).
    */
  def subtitlesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[SubtitleItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)].flatMap { case (id, text) =>
        plantSubtitle(id, text).map(SubtitleItem(id, _))
      }
  }

  /** Cue→frame alignment — the (frame, caption) pair generator for
    * video-text training: a cue spanning [start_ms, end_ms) covers the
    * frames whose timestamps f·uspf fall inside it (uspf in
    * MICROseconds per frame, the [[Avi.Video]] convention), clipped to
    * the clip's n_frames. One metadata equi-join on media_id attaches
    * the clip's frame count (broadcastable — it's id + one int, never
    * the payload), then the fan-out is a single generator expression:
    * frames = sequence(ceil(start_us/uspf), min(ceil(end_us/uspf)−1,
    * n−1)). The video payload is never touched — pair rows carry frame
    * INDICES; the consumer decodes only paired frames via the strided
    * path.
    */
  def cueFramePairs(cues: DataFrame, clips: DataFrame,
                    microSecPerFrame: Int): DataFrame = {
    require(microSecPerFrame > 0,
      s"cueFramePairs: bad frame interval $microSecPerFrame")
    // timestamps in µs to stay integral: frame f sits at f·uspf µs;
    // first covered frame = ceil(start_us / uspf), last = the final
    // frame strictly before end_us, clipped to the clip bound
    // exact integral ceil — (us + uspf − 1) div uspf — so the frame
    // boundary arithmetic never routes through a double
    val uspf = lit(microSecPerFrame.toLong)
    def ceilDiv(us: org.apache.spark.sql.Column) =
      call_function("div", us + uspf - 1, uspf)
    cues.join(clips, "media_id")
      .withColumn("_first",
        greatest(lit(0L), ceilDiv(col("start_ms") * 1000)))
      .withColumn("_last",
        least(col("n_frames").cast("long") - 1,
          ceilDiv(col("end_ms") * 1000) - 1))
      .filter(col("_first") <= col("_last"))
      .select(col("media_id"), col("cue_idx"),
        explode(sequence(col("_first"), col("_last"))).as("frame_idx"),
        col("start_ms"), col("end_ms"), col("text"))
  }
}
