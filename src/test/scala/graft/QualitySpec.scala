package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("ngramRunStats: top and duplicate 2-gram character mass") {
    // "a b a b a" 2-grams: [a b, b a, a b, b a] — both occur twice,
    // each 3 chars: top = 2*3 = 6, dup = 2*3 + 2*3 = 12
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val r = df.select(Quality.ngramRunStats(col("text"), 2).as("s"))
      .select(col("s.top_chars"), col("s.dup_chars")).as[(Long, Long)].head()
    assert(r === ((6L, 12L)))
  }

  test("ngramRunStats: all-distinct grams have zero dup mass") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = df.select(Quality.ngramRunStats(col("text"), 2).as("s"))
      .select(col("s.top_chars"), col("s.dup_chars")).as[(Long, Long)].head()
    assert(r === ((3L, 0L))) // top single occurrence: "a b" (3 chars)
  }

  test("ngramRunStats clamps short docs to one shingle") {
    val df = Seq((1L, "hi")).toDF("doc_id", "text")
    val r = df.select(Quality.ngramRunStats(col("text"), 3).as("s"))
      .select(col("s.top_chars"), col("s.dup_chars")).as[(Long, Long)].head()
    assert(r === ((2L, 0L)))
  }

  test("line stats: duplicate-line fractions") {
    val df = Seq((1L, Seq("x y", "a b", "x y", "c d"))).toDF("doc_id", "lines")
    val got = df.select(
        Quality.duplicateLineFrac(col("lines")).as("f"),
        Quality.lineRunStats(col("lines")).getField("dup_chars").as("dc"),
        Quality.lineCharTotal(col("lines")).as("tc"))
      .as[(Double, Long, Long)].head()
    assert(got._1 === 0.25) // 4 lines, 3 distinct
    assert(got._2 === 6L)   // "x y" twice, 3 chars each
    assert(got._3 === 12L)
  }

  test("piiCounts and piiRedact find and replace emails, IPs, phones") {
    val df = Seq((1L, "mail a.user+x@sub.example.org then 10.0.255.3 or +1-555-0199 end"),
                 (2L, "clean text only")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Quality.piiCounts(col("text")).as("c"),
        Quality.piiRedact(col("text")).as("r"))
      .select(col("doc_id"), col("c.n_emails"), col("c.n_ipv4"), col("c.n_phones"), col("r"))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 1, 1, 1, "mail <EMAIL> then <IP> or <PHONE> end")))
    assert(got(1) === ((2L, 0, 0, 0, "clean text only")))
  }

  test("bigramLogProb: common-sequence docs outscore rare-sequence docs; " +
      "short docs drop; partition-stable") {
    val corpus = Seq(
      (1L, "a b a b"), (2L, "a b a b"), (3L, "x q"), (4L, "solo"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Quality.bigramLogProb(df, "doc_id", "text")
        .as[(Long, Double, Long)].collect().sortBy(_._1)
    val got = run(corpus)
    // doc 4 has no bigram; docs 1/2 share common bigrams, doc 3's is unique
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(got(0)._2 === got(1)._2 && got(0)._2 > got(2)._2)
    assert(got(0)._3 === 3L && got(2)._3 === 1L)
    // doc 3: single bigram "x q", c2=1, c1(x)=1, V=5 → ln(1.5/(1+2.5))
    val expected = BigDecimal(math.log(1.5 / 3.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2)._2 === expected)
    assert(run(corpus.repartition(5)).toSeq === got.toSeq)
  }

  test("knTrigramLogProb: common-context docs outscore rare ones; every " +
    "backoff rung stays finite; partition-stable") {
    val corpus = Seq(
      (1L, "a b c a b c a b c"), (2L, "a b c a b c"), (3L, "x q z w"),
      (4L, "one two")).toDF("doc_id", "text")
    val got = Quality.knTrigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    // doc 4 (two words) has no trigram and drops out
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // "a b c" repeats within and across docs; doc 3's trigrams are singletons
    assert(got(0)._2 > got(2)._2)
    assert(got.forall(r => !r._2.isNaN && !r._2.isInfinite))
    // reference-trained on a DISJOINT vocabulary: every rung backs off to
    // the add-α unigram floor and stays finite
    val ref = Seq((9L, "p q r p q s")).toDF("doc_id", "text")
    val oov = Quality.knTrigramLogProbAgainst(ref, corpus, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
    assert(oov.nonEmpty && oov.forall(r => !r._2.isNaN && !r._2.isInfinite))
    // the zero-continuation hole: "q s" occurs ONLY as the reference's
    // final bigram (c2 > 0, no trigram continues it) — must take the
    // full-order backoff, never ln(0)
    val edge = Seq((1L, "q s t")).toDF("doc_id", "text")
    val e = Quality.knTrigramLogProbAgainst(ref, edge, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
    assert(e.length === 1 && !e(0)._2.isInfinite && !e(0)._2.isNaN)
    val rep = Quality.knTrigramLogProb(corpus.repartition(5), "doc_id", "text")
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(rep.toSeq === got.toSeq)
  }

  test("gopherWordSignals: counts, symbol ratio, alpha fraction, stop hits") {
    // words (lowered): the cat ### sat on 42 mats that have fur with... style
    // n=12; '#'×3 + '...'×1 → 4/12; non-alpha words: ###, 42 → 10/12;
    // stop hits: the, that, have (with... != with) → 3; char total 43
    val df = Seq((1L, "The cat ### sat on 42 mats that have fur with... style"))
      .toDF("doc_id", "text")
    val got = df.select(Quality.gopherWordSignals(col("text")).as("s"))
      .select(col("s.n_words"), col("s.mean_word_len"), col("s.symbol_ratio"),
        col("s.alpha_frac"), col("s.stop_hits"))
      .as[(Int, Double, Double, Double, Int)].head()
    assert(got === ((12, 3.583333, 0.333333, 0.833333, 3)))
  }

  test("gopherLineSignals: bullet and ellipsis line fractions") {
    val df = Seq((1L, Seq("- intro", "plain line", "trailing...")))
      .toDF("doc_id", "lines")
    val got = df.select(Quality.gopherLineSignals(col("lines")).as("s"))
      .select(col("s.n_lines"), col("s.bullet_frac"), col("s.ellipsis_frac"))
      .as[(Int, Double, Double)].head()
    assert(got === ((3, 0.333333, 0.333333)))
  }

  test("gopherReasons composes threshold failures in fixed order") {
    val df = Seq((1L, "a b", Seq("- x"))).toDF("doc_id", "text", "lines")
    val got = df.select(Quality.gopherReasons(
        Quality.gopherWordSignals(col("text")),
        Quality.gopherLineSignals(col("lines"))).as("r"))
      .as[String].head()
    // n_words=2 <50; mean_word_len=1 <3; stop_hits=0 <2; bullet_frac=1 >0.9
    assert(got === "word_count,word_len,stop_words,bullets")
  }

  test("q_quality_gopher splits the corpus; every reason fires somewhere") {
    val r = Queries.byName("q_quality_gopher").impl(spark, sf)
      .select(col("keep"), col("reasons")).as[(Boolean, String)].collect()
    assert(r.exists(_._1) && r.exists(!_._1))
    val fired = r.flatMap(_._2.split(",")).filter(_.nonEmpty).toSet
    for (reason <- Seq("word_count", "symbols", "non_alpha", "stop_words",
        "bullets", "ellipses"))
      assert(fired.contains(reason), s"reason $reason never fired")
  }

  test("wordsSegmented isolates CJK characters, leaves Latin runs intact") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "Abc的一de fg"), (2L, "plain latin words")).toDF("doc_id", "text")
    val got = df.orderBy("doc_id")
      .select(TextAnalysis.wordsSegmented(col("text"))).as[Seq[String]].collect()
    assert(got(0) === Seq("abc", "的", "一", "de", "fg"))
    // whitespace-only text: identical to the plain words() split
    assert(got(1) === Seq("plain", "latin", "words"))
  }

  test("gopherWordSignalsOf + wordsSegmented: Han chars are alphabetic words") {
    import graft.operators.TextAnalysis
    // segmented: [的, 一, 是, the] — n=4, chars 1+1+1+3=6, all alpha, 1 stop hit
    val df = Seq((1L, "的一是 the")).toDF("doc_id", "text")
    val got = df.select(Quality.gopherWordSignalsOf(col("text"),
        TextAnalysis.wordsSegmented(col("text"))).as("s"))
      .select(col("s.n_words"), col("s.mean_word_len"), col("s.alpha_frac"),
        col("s.stop_hits"))
      .as[(Int, Double, Double, Int)].head()
    assert(got === ((4, 1.5, 1.0, 1)))
    // the plain whitespace path reads the same doc as 2 words, half non-alpha
    val old = df.select(Quality.gopherWordSignals(col("text")).as("s"))
      .select(col("s.n_words"), col("s.alpha_frac")).as[(Int, Double)].head()
    assert(old === ((2, 0.5)))
  }

  test("langIdOf + wordsSegmented routes unspaced Chinese to zh") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "我是了的在他有"), (2L, "the cat and the dog is here"))
      .toDF("doc_id", "text")
    val got = df.orderBy("doc_id")
      .select(TextAnalysis.langIdOf(TextAnalysis.wordsSegmented(col("text"))))
      .as[String].collect()
    assert(got.toSeq === Seq("zh", "en"))
    // the whitespace split can never see the single-char zh stopwords:
    // all counts zero → first-wins 'en' — the failure mode this closes
    val blind = df.filter(col("doc_id") === 1)
      .select(TextAnalysis.langId(col("text"))).as[String].head()
    assert(blind === "en")
  }

  test("encodingSignals flags replacement, control, and mojibake damage") {
    val df = Seq(
      (1L, "clean text with\ttab and\nnewline"),
      (2L, "bad � char"),
      (3L, "ctrl \u0001 spill \u001f"),
      (4L, "cafÃ© and nÃ£o"),
      (5L, "")).toDF("doc_id", "text")
    val got = df.orderBy("doc_id")
      .select(Quality.encodingSignals(col("text")).as("s"))
      .select(col("s.replacement_hits"), col("s.ctrl_hits"),
        col("s.mojibake_hits"), col("s.clean"))
      .as[(Int, Int, Int, Boolean)].collect()
    assert(got(0) === ((0, 0, 0, true))) // tab/newline are NOT damage
    assert(got(1) === ((1, 0, 0, false)))
    assert(got(2) === ((0, 2, 0, false)))
    assert(got(3) === ((0, 0, 2, false))) // Ã© and Ã£ both hit
    assert(got(4) === ((0, 0, 0, true))) // empty text: clean, no div-by-zero
  }

  test("encodingSignals fractions are 6-dp over the char count") {
    val df = Seq((1L, "ab�")).toDF("doc_id", "text")
    val got = df.select(Quality.encodingSignals(col("text")).as("s"))
      .select(col("s.n_chars"), col("s.replacement_frac"), col("s.ctrl_frac"))
      .as[(Int, Double, Double)].head()
    assert(got === ((3, 0.333333, 0.0)))
  }

  test("cleanLines drops short and blacklisted lines, keeps order") {
    val df = Seq((1L, Seq("one two three", "too short", "bad slow line", "four five six")))
      .toDF("doc_id", "lines")
    val got = df.select(Quality.cleanLines(col("lines"), 3, Seq("slow", "big")).as("k"))
      .as[Seq[String]].head()
    assert(got === Seq("one two three", "four five six"))
  }

  test("q_quality_repetition signals stay in [0, +) and 2-gram dup >= 3-gram dup") {
    val out = Queries.byName("q_quality_repetition").impl(spark, sf).collect()
    assert(out.length > 0)
    out.foreach { r =>
      val d2 = r.getAs[Double]("dup2gram_char_frac")
      val d3 = r.getAs[Double]("dup3gram_char_frac")
      assert(d2 >= 0 && d3 >= 0 && r.getAs[Double]("top2gram_char_frac") > 0)
      // a duplicated 3-gram implies duplicated 2-grams inside it
      assert(d3 === 0.0 || d2 > 0.0)
    }
  }

  test("q_quality_filter splits the corpus and tags each drop with its reasons") {
    val out = Queries.byName("q_quality_filter").impl(spark, sf).collect()
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < out.length, s"degenerate split: $kept/${out.length}")
    out.foreach { r =>
      val reasons = r.getAs[String]("reasons")
      assert(r.getAs[Boolean]("keep") === reasons.isEmpty)
      if (reasons.nonEmpty)
        reasons.split(",").foreach(t =>
          assert(Set("too_short", "too_long", "repetitive", "low_quality")(t), t))
    }
  }

  test("unigramLogProb: uniform corpus scores ln(1/V); rare-token docs " +
      "score lower than common-token docs") {
    import spark.implicits._
    // 4 distinct tokens, each appearing exactly twice -> p = 1/4 everywhere
    val uniform = Seq((1L, "a b"), (2L, "c d"), (3L, "a b"), (4L, "c d"))
      .toDF("doc_id", "text")
    val u = Quality.unigramLogProb(uniform, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val lnQuarter = BigDecimal(math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(u.forall { case (_, lp, n) => lp === lnQuarter && n === 2L })

    // doc of ubiquitous tokens scores higher (less negative) than a doc of
    // tokens unique to it
    val skewed = Seq((1L, "the the the the"), (2L, "the the the the"),
      (3L, "zyx wvu tsr qpo")).toDF("doc_id", "text")
    val s = Quality.unigramLogProb(skewed, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(s(1L) > s(3L))
  }

  test("removeBoilerplateLines drops lines in >= minDocs distinct docs, " +
      "counts within-doc repeats once, keeps everything else in order") {
    // "nav" appears in docs 1,2,3 (twice in doc 1 — distinct-doc count is
    // still 3); "rare" appears in docs 1,2 only (below minDocs=3)
    val df = Seq(
      (1L, Seq("nav", "body one", "nav", "rare")),
      (2L, Seq("nav", "rare", "body two")),
      (3L, Seq("body three", "nav")),
      (4L, Seq("body four"))).toDF("doc_id", "lines")
    val got = Quality.removeBoilerplateLines(df, "doc_id", col("lines"), 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got === Array(
      (1L, 4, 2, "body one rare"),
      (2L, 3, 1, "rare body two"),
      (3L, 2, 1, "body three"),
      (4L, 1, 0, "body four")))
  }

  test("removeBoilerplateLines with no boilerplate is the identity") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("c"))).toDF("doc_id", "lines")
    val got = Quality.removeBoilerplateLines(df, "doc_id", col("lines"), 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
    assert(got === Array((1L, 0, "a b"), (2L, 0, "c")))
  }

  test("q_pii_redact leaves no pattern unredacted") {
    val out = Queries.byName("q_pii_redact").impl(spark, sf)
    val leftover = out.filter(
      col("redacted").rlike(Quality.EmailRe) ||
      col("redacted").rlike(Quality.Ipv4Re) ||
      col("redacted").rlike(Quality.PhoneRe))
    assert(leftover.isEmpty)
    assert(out.filter(col("n_emails") > 0).count() > 0)
  }

  test("ccnetBuckets: per-language terciles are equal-count bands and " +
    "thresholds are language-local") {
    // language A: scores 1..9 — head {7,8,9}, middle {4,5,6}, tail {1,2,3}
    // language B: scores 101..106 — its OWN terciles, not A's (a global
    // cut would put every B doc in head)
    val rows = (1 to 9).map(i => (i.toLong, "A", i.toDouble)) ++
      (101 to 106).map(i => (i.toLong, "B", i.toDouble))
    val scored = rows.toDF("doc_id", "lang", "score")
    val got = Quality.ccnetBuckets(scored, "lang", "score")
      .select("doc_id", "lang", "bucket")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val a = got.filter(_._2 == "A")
    assert(a.filter(_._3 == "head").map(_._1).toSet === Set(7L, 8L, 9L))
    assert(a.filter(_._3 == "middle").map(_._1).toSet === Set(4L, 5L, 6L))
    assert(a.filter(_._3 == "tail").map(_._1).toSet === Set(1L, 2L, 3L))
    val b = got.filter(_._2 == "B")
    assert(b.filter(_._3 == "head").map(_._1).toSet === Set(105L, 106L))
    assert(b.filter(_._3 == "tail").map(_._1).toSet === Set(101L, 102L))
    // within every language, the worst head score beats the best tail score
    // (the defining CCNet property)
    for (lang <- Seq("A", "B")) {
      val sc = rows.filter(_._2 == lang).map(r => r._1 -> r._3).toMap
      val perLang = got.filter(_._2 == lang)
      val minHead = perLang.filter(_._3 == "head").map(r => sc(r._1)).min
      val maxTail = perLang.filter(_._3 == "tail").map(r => sc(r._1)).max
      assert(minHead > maxTail)
    }
  }

  test("q_ccnet_buckets: every (lang, bucket) cell is populated and bands " +
    "are balanced within interpolation slack") {
    val out = Queries.byName("q_ccnet_buckets").impl(spark, sf)
    val cells = out.groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect()
    val langs = cells.map(_._1).distinct
    assert(langs.length >= 2)
    for (l <- langs; b <- Seq("head", "middle", "tail"))
      assert(cells.exists(c => c._1 == l && c._2 == b), s"empty cell ($l, $b)")
    // tercile cut: each band holds a third of its language ±2 (ties at an
    // interpolated threshold can move a doc across the boundary)
    for (l <- langs) {
      val n = cells.filter(_._1 == l).map(_._3).sum
      for (b <- Seq("head", "middle", "tail")) {
        val c = cells.find(x => x._1 == l && x._2 == b).get._3
        assert(math.abs(c - n / 3.0) <= 2.0, s"($l, $b): $c of $n")
      }
    }
  }

  test("compressionRatio: repetition compresses below prose, prose below " +
    "high-entropy text; empty is 0; null propagates") {
    import graft.operators.TextAnalysis
    val spam = "buy now " * 60
    val prose = "The four distributed quality measures above need per-doc " +
      "frequency tables computed without a corpus-wide shuffle of every " +
      "n-gram occurrence, which is why each document sorts its grams " +
      "in the row and extracts run lengths in a single fold expression. " +
      "A second scan then re-derives hashed shingle sets for candidate " +
      "documents only, so nothing corpus-sized is ever pinned in memory " +
      "and both passes stay bandwidth-bound on an ordinary disk array. " +
      "Survivor choice orders on the exact integer variate rather than " +
      "its floating projection, keeping every engine's kept set equal."
    // base64 of md5 digest bytes: ~6 bits of entropy per character —
    // deterministic stand-in for high-entropy text (hex would be only
    // 4 bits/char and deflate exploits that below prose level)
    val noise = java.util.Base64.getEncoder.encodeToString(
      (1 to 40).flatMap(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).toSeq).toArray)
    val df = Seq((1L, spam), (2L, prose), (3L, noise), (4L, ""), (5L, null))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).get < got(2L).get, s"spam ${got(1L)} !< prose ${got(2L)}")
    assert(got(2L).get < got(3L).get, s"prose ${got(2L)} !< noise ${got(3L)}")
    assert(got(4L) === Some(0.0))
    assert(got(5L) === None)
    // the expression matches a plain java.util.zip run byte-for-byte
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(prose.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](8192)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    val exprLen = df.filter(col("doc_id") === 2L)
      .select(graft.functions.Functions.deflate_len(col("text")))
      .head().getInt(0)
    assert(exprLen === n)
  }

  test("htmlBlockSignals: nav/footer blocks flag boilerplate, the body " +
      "paragraph flags content, inline anchors stay in their block") {
    import graft.operators.TextAnalysis
    val body = "this paragraph carries enough plain prose to pass the " +
      "twenty five character floor with a single inline <a href=\"/x\">link</a>."
    val df = Seq((1L,
      "<ul><li><a href=\"/h\">Home</a></li></ul>" +
        s"<p>$body</p>" +
        "<p>tiny</p>" +
        "<footer><a href=\"/c\">contact us</a></footer>"))
      .toDF("doc_id", "html")
    val got = TextAnalysis.htmlBlockSignals(df, "doc_id", "html")
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getBoolean(6)))
    val byText = got.map(g => g._1 -> g).toMap
    assert(got.length === 4)
    // nav item: all anchor, density 1.0
    assert(byText("Home") === (("Home", 4L, 4L, 1.0, false)))
    // body: long, 4 link chars out of >100
    val bodyRow = got.find(_._1.startsWith("this paragraph")).get
    assert(bodyRow._3 === 4L && bodyRow._5 === true,
      s"body must classify as content: $bodyRow")
    // short paragraph: no links but under the floor
    assert(byText("tiny") === (("tiny", 4L, 0L, 0.0, false)))
    // footer: pure link text
    assert(byText("contact us")._5 === false)
    assert(byText("contact us")._4 === 1.0)
  }

  test("htmlToText: a script block is only closed by </script>, a style " +
      "block only by </style> (malformed-crawl containment)") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "<p>a</p><script>evil();</style>x</script><p>b</p>"),
      (2L, "<style>.c{}</script>y</style><p>ok</p>")).toDF("doc_id", "html")
    val got = df.orderBy("doc_id")
      .select(TextAnalysis.htmlToText(col("html"))).as[String].collect()
    assert(got(0) === "a b") // 'x' must not leak out of the script block
    assert(got(1) === "ok")  // 'y' must not leak out of the style block
  }

  test("markdownToText: structure strips, content survives, URLs and " +
    "info strings never leak") {
    import graft.operators.TextAnalysis
    val samples = Seq(
      "## Heading words here" -> "Heading words here",
      "> quoted line" -> "quoted line",
      "- item one\n- item two" -> "item one item two",
      "3. ordered\n12. items" -> "ordered items",
      "**bold** and *em* and __strong__ and _under_" ->
        "bold and em and strong and under",
      "[text](https://url.invalid/x) plain ![alt](https://i.invalid/p.png)" ->
        "text plain alt",
      "[ref style][r1] end\n\n[r1]: https://ref.invalid/1" -> "ref style end",
      "`code span` outside" -> "code span outside",
      "```scala\nval kept = 1\n```" -> "val kept = 1",
      "| a | b |\n|---|---|\n| c | d |" -> "a b c d",
      "before\n\n---\n\nafter" -> "before after",
      // a bullet's * must not pair with a later emphasis *
      "* bullet\nstill *em* here" -> "bullet still em here")
    val got = samples.map(_._1).zipWithIndex.map { case (m, i) => (i, m) }
      .toDF("i", "md").orderBy("i")
      .select(TextAnalysis.markdownToText(col("md"))).as[String].collect()
    samples.map(_._2).zip(got).foreach { case (want, g) => assert(g === want) }
    // the plant round-trips to the normalized word stream on real docs
    val docs = Tables.documents(spark, sf).limit(40)
      .select("doc_id", "text").as[(Long, String)].collect()
    var planted = 0
    docs.foreach { case (id, text) =>
      TextAnalysis.plantMarkdown(id, Option(text).getOrElse("")).foreach { md =>
        planted += 1
        val want = Option(text).getOrElse("").trim.split("\\s+")
          .filter(_.nonEmpty).map(TextAnalysis.normalizeMdWord).mkString(" ")
        val extracted = Seq(md).toDF("md")
          .select(TextAnalysis.markdownToText(col("md"))).as[String].head()
        assert(extracted === want, s"doc $id\nmd:\n$md")
      }
    }
    assert(planted > 0)
  }
}
