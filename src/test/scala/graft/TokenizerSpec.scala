package graft

import graft.functions.Bpe
import graft.operators.Tokenizer
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpec {

  private def mergesOf(texts: Seq[String], n: Int): Seq[Tokenizer.Merge] = {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    Tokenizer.bpeTrain(texts.toDF("text"), "text", n)
  }

  test("bpeTrain learns the classic merges on a toy corpus") {
    // Sennrich's worked example shape: 'low' x5, 'lower' x2, 'newest' x6,
    // 'widest' x3 — the first merges must assemble 'est</w>' because
    // (e,s) then (es,t) then (est,</w>) dominate the pair counts.
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val merges = mergesOf(Seq(corpus.mkString(" ")), 4)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    assert(merges.map(_.pair_freq) === Seq(9L, 9L, 9L, 7L))
  }

  test("encode replays the learned merges; concatenation reconstructs the word") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val merges = mergesOf(Seq(corpus.mkString(" ")), 10)
    val model = new Bpe.Model(merges.map(_.left).toArray, merges.map(_.right).toArray)
    // ranks 1-8 assemble newest</w> completely (worked through by hand:
    // es, est, est</w>, lo, low, ew, ewest</w>, newest</w>)
    assert(model.encodeWord("newest").toSeq === Seq("newest" + Bpe.EndOfWord))
    // reconstruction invariant: tokens concatenate back to word + </w>
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "unseen"))
      assert(model.encodeWord(w).mkString === w + Bpe.EndOfWord)
  }

  test("zero merges yields code-point symbols; surrogate pairs stay whole") {
    val model = new Bpe.Model(Array.empty, Array.empty)
    assert(model.encodeWord("ab").toSeq === Seq("a", "b", Bpe.EndOfWord))
    // U+1F600 is a surrogate pair in UTF-16; code-point granularity keeps it
    val emoji = new String(Character.toChars(0x1F600))
    assert(model.encodeWord(s"a$emoji").toSeq === Seq("a", emoji, Bpe.EndOfWord))
  }

  test("bpe_encode expression matches the model driver-side, through codegen") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val merges = mergesOf(Seq("low low lower newest newest widest"), 6)
    val model = new Bpe.Model(merges.map(_.left).toArray, merges.map(_.right).toArray)
    val docs = Seq((1L, "Low lowest NEWEST"), (2L, "  widest  wide "), (3L, null))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        Tokenizer.encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    def ref(s: String): Seq[String] =
      s.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(model.encodeWord(_).toSeq)
    assert(got(1L) === Some(ref("Low lowest NEWEST")))
    assert(got(2L) === Some(ref("  widest  wide ")))
    assert(got(3L) === None)
  }

  test("merge table round-trips through parquet; loaded model encodes identically") {
    graft.functions.Functions.ensure(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Tokenizer.bpeTrain(docs, "text", 30)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-save").toString
    Tokenizer.saveMerges(spark, merges, dir)
    val loaded = Tokenizer.loadMerges(spark, dir)
    assert(loaded === merges)
    val a = docs.select(Tokenizer.encode(col("text"), merges).as("t")).collect().map(_.toSeq)
    val b = docs.select(Tokenizer.encode(col("text"), loaded).as("t")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("bpe_encode rejects non-constant and null-bearing merge tables with typed errors") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val df = Seq(("a", "b")).toDF("text", "lhs")
    val nonConst = intercept[Exception] {
      df.select(graft.functions.Functions.bpe_encode(
        col("text"), array(col("lhs")), array(lit("b")))).collect()
    }
    assert(nonConst.getMessage.contains("constant string arrays"), nonConst.getMessage)
    val withNull = intercept[Exception] {
      df.select(graft.functions.Functions.bpe_encode(
        col("text"), array(lit("a"), lit(null).cast("string")), array(lit("b"), lit("c")))).collect()
    }
    assert(withNull.getMessage.contains("NULL symbols"), withNull.getMessage)
  }

  test("trainOnHistogram is deterministic under histogram order and ties") {
    val hist = Seq(("ab", 3L), ("ba", 3L), ("aa", 2L))
    val m1 = Tokenizer.trainOnHistogram(hist, 5)
    val m2 = Tokenizer.trainOnHistogram(hist.reverse, 5)
    assert(m1 === m2)
    // (a,</w>) dominates at 3+2=5 ('ba' tail + 'aa' tail)
    assert((m1.head.left, m1.head.right, m1.head.pair_freq) === ("a", "</w>", 5L))
    // pure tie: 'abab'/'baba' give (a,b)@6 vs (b,a)@6, above every </w>
    // pair — resolves to the lexicographically smallest pair
    val tied = Tokenizer.trainOnHistogram(Seq(("abab", 2L), ("baba", 2L)), 1)
    assert((tied.head.left, tied.head.right, tied.head.pair_freq) === ("a", "b", 6L))
  }

  test("corpus training end-to-end: merges are well-formed, encode covers the corpus") {
    graft.functions.Functions.ensure(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Tokenizer.bpeTrain(docs, "text", 40)
    assert(merges.nonEmpty && merges.size <= 40)
    assert(merges.map(_.rank) === (1 to merges.size))
    // pair frequencies never increase as training proceeds? NOT guaranteed
    // by BPE (later merges can create denser pairs), but every chosen pair
    // must have been seen at least twice
    assert(merges.forall(_.pair_freq >= 2))
    val withToks = docs.select(
        Tokenizer.encode(col("text"), merges).as("toks"),
        Tokenizer.preTokens(col("text")).as("words"))
      .filter(col("toks").isNotNull)
    // token streams reconstruct the pre-tokenized text exactly
    val bad = withToks.filter(
      concat_ws("", col("toks")) =!=
        concat_ws("", transform(col("words"), w => concat(w, lit(Bpe.EndOfWord)))))
    assert(bad.count() === 0L)
  }

  test("decode inverts encode: randomized round-trip property through codegen") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    // multi-word, unicode (incl. a surrogate pair), punctuation runs,
    // mixed whitespace forms. Angle characters stay out: a corpus whose
    // merges assemble a literal '</w>' surface string is ambiguous to ANY
    // marker-based decoder (the documented Sennrich-marker boundary).
    val rnd = new scala.util.Random(0xB9E)
    val pieces = Seq("low", "lower", "newest", "éclair", "𝄞note",
      "a", "!!", "x9", "ABC", "ab", "..", "::x")
    val texts = (0 until 200).map { _ =>
      (0 until 1 + rnd.nextInt(8)).map { _ =>
        pieces(rnd.nextInt(pieces.length))
      }.mkString(Seq(" ", "  ", "\t", " \n ")(rnd.nextInt(4)))
    } :+ "" :+ "   "
    val merges = mergesOf(texts, 50)
    val df = texts.toDF("text")
    val toks = Tokenizer.encode(col("text"), merges)
    val bad = df.select(col("text"),
        Tokenizer.decode(toks).as("rt"),
        concat_ws(" ", Tokenizer.preTokens(col("text"))).as("want"))
      .filter(col("rt") =!= col("want"))
    assert(bad.count() === 0L, bad.collect().take(3).mkString("; "))
    // null text → null tokens → null decode (null-poisoning, not crash)
    val nr = Seq((1, Option.empty[String])).toDF("k", "text")
      .select(Tokenizer.decode(Tokenizer.encode(col("text"), merges)).as("rt"))
      .collect().head
    assert(nr.isNullAt(0))
  }

  test("vocabulary export: alphabet first in binary order, then merges by " +
    "rank, first surface string wins") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val texts = Seq("low lower newest widest", "low low newest")
    val merges = mergesOf(texts, 10)
    val vocab = Tokenizer.vocabulary(texts.toDF("text"), "text", merges)
      .orderBy("id").collect().map(r => (r.getString(0), r.getInt(1)))
    // ids are dense from 0
    assert(vocab.map(_._2).toSeq === vocab.indices.toSeq)
    // the alphabet prefix is exactly the distinct code points + </w>,
    // sorted in UTF-8 binary order ('<' (0x3c) sorts before letters)
    val alphaWant = texts.flatMap(_.split("\\s+")).flatMap(Bpe.initialSymbols)
      .distinct.sorted
    assert(vocab.take(alphaWant.size).map(_._1).toSeq === alphaWant)
    // every merge product appears exactly once, after the alphabet, in
    // rank order (no duplicates on this corpus)
    val tail = vocab.drop(alphaWant.size).map(_._1).toSeq
    assert(tail === merges.sortBy(_.rank).map(m => m.left + m.right)
      .filterNot(alphaWant.contains).distinct)
    // tokens are unique across the whole vocab
    assert(vocab.map(_._1).distinct.length === vocab.length)
  }

  test("encodeIds maps tokens through the vocabulary; unseen code points " +
    "emit the -1 UNK sentinel") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val texts = Seq("low lower newest widest", "low low newest")
    val docs = texts.toDF("text")
    val merges = mergesOf(texts, 10)
    val vocab = Tokenizer.vocabulary(docs, "text", merges)
      .orderBy("id").collect().map(_.getString(0)).toSeq
    val got = docs.select(
        Tokenizer.encode(col("text"), merges).as("toks"),
        Tokenizer.encodeIds(col("text"), merges, vocab).as("ids"))
      .collect()
    got.foreach { r =>
      val toks = r.getSeq[String](0)
      val ids = r.getSeq[Int](1)
      // ids are exactly the vocab positions of the token encode
      assert(ids === toks.map(vocab.indexOf))
      assert(!ids.contains(-1), "training corpus must be fully in-vocab")
    }
    // a character never seen in training has no vocab entry -> -1
    val unk = Seq("low qqq").toDF("text")
      .select(Tokenizer.encodeIds(col("text"), merges, vocab).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(unk.contains(-1))
  }

  test("tokenizer artifact: save/load bundle, id round-trip through the " +
    "vocab, UNK renders as <unk>") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val texts = Seq("low lower newest widest", "low low newest wide")
    val docs = texts.toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    val (merges, vocab) = Tokenizer.saveTokenizer(docs, "text", 10, dir)
    val (m2, v2) = Tokenizer.loadTokenizer(spark, dir)
    assert(m2 === merges && v2 === vocab)
    // decodeIds ∘ encodeIds == the normalized text (full id round-trip)
    val rt = docs.select(col("text"),
        Tokenizer.decodeIds(
          Tokenizer.encodeIds(col("text"), m2, v2), v2).as("rt"),
        concat_ws(" ", Tokenizer.preTokens(col("text"))).as("want"))
      .filter(col("rt") =!= col("want")).count()
    assert(rt === 0L)
    // out-of-vocab ids surface as <unk>, not a crash or a silent drop
    val unk = Seq("low qqq").toDF("text")
      .select(Tokenizer.decodeIds(
        Tokenizer.encodeIds(col("text"), m2, v2), v2).as("rt"))
      .collect().head.getString(0)
    assert(unk.startsWith("low") && unk.contains("<unk>"))
  }

  test("space-free scripts fall back to character pre-tokens; training " +
      "learns multi-character merges; Latin text is untouched") {
    import spark.implicits._
    // pre-tokens: each CJK/Thai char isolates; Latin words split on \s+
    val pt = Seq("Hello 今天天气 world ไทยดี").toDF("text")
      .select(Tokenizer.preTokens(col("text")).as("w"))
      .as[Seq[String]].head()
    assert(pt === Seq("hello", "今", "天", "天", "气", "world", "ไ", "ท", "ย", "ด", "ี"))
    // a pure-Latin corpus pre-tokenizes exactly as before
    val latin = Seq("Low lower NEWEST").toDF("text")
      .select(Tokenizer.preTokens(col("text")).as("w")).as[Seq[String]].head()
    assert(latin === Seq("low", "lower", "newest"))
    // training on a space-free corpus sees per-character words (the BERT
    // per-char convention) with a meaningful Zipf histogram — 天 occurs
    // 2× as often as 今/气 — instead of one giant unique word per doc
    // whose pair counts never reach the freq-2 training floor
    val docs = Seq.fill(4)("今天天气今天天气").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(docs, "text", 10)
    assert(merges.nonEmpty, "char fallback must yield trainable pairs")
    // highest-frequency merge is the most common character's eow-attach
    assert(merges.head.left === "天" && merges.head.right === Bpe.EndOfWord)
    // the codegen'd encode kernel shares the isolation spec: one token
    // per character (8 chars -> 8 tokens), so token counts / fertility /
    // packing budgets stay honest on space-free text
    val toks = docs.select(Tokenizer.encode(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks.length === 8)
    val rt = docs.limit(1)
      .select(Tokenizer.decode(Tokenizer.encode(col("text"), merges)).as("rt"))
      .as[String].head()
    assert(rt === "今 天 天 气 今 天 天 气",
      "decode must reproduce the isolated pre-token stream")
    // encodeIds flows through the same pre-tokenization
    val vocab = Tokenizer.vocabulary(docs, "text", merges)
      .orderBy("id").collect().map(_.getString(0)).toSeq
    val ids = docs.limit(1)
      .select(Tokenizer.encodeIds(col("text"), merges, vocab).as("ids"))
      .as[Seq[Int]].head()
    assert(ids.nonEmpty && ids.forall(_ >= 0))
  }

  // ── unigram-LM (SentencePiece) family ─────────────────────────────

  test("unigram trainer keeps whole frequent words as pieces and gives " +
    "them dominant probability") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    // 'aba' dominates, 'cd' second; singles (▁ a b c d) are always kept,
    // so a vocab of 8 must fill its multi slots with the whole-word
    // pieces the EM assigns the mass to
    val corpus = (Seq.fill(8)("aba") ++ Seq.fill(5)("cd")).mkString(" ")
    val pieces = Tokenizer.unigramTrain(Seq(corpus).toDF("text"), "text",
      vocabSize = 8, seedSize = 40)
    val table = pieces.map(p => p.piece -> p.log_prob).toMap
    assert(table.contains("▁aba"), s"want ▁aba in ${pieces.map(_.piece)}")
    assert(table.contains("▁cd"), s"want ▁cd in ${pieces.map(_.piece)}")
    // the whole-word piece must outscore its own first character — the
    // EM shifted the mass off the char decomposition
    assert(table("▁aba") > table("▁") || table("▁cd") > table("▁"))
    // log-probs are normalized (Σ exp ≤ 1 + rounding slack) and rounded
    val mass = pieces.map(p => StrictMath.exp(p.log_prob)).sum
    assert(mass > 0.5 && mass < 1.001, s"mass $mass")
    assert(pieces.forall(p =>
      BigDecimal(p.log_prob).scale <= 6), "log-probs must be 6dp-rounded")
  }

  test("unigram Viterbi: max-likelihood segmentation wins; exact ties keep " +
    "the longer last piece; unknown code points emit their surface form") {
    val m = new graft.functions.Unigram.Model(
      Array("▁", "a", "b", "ab", "▁ab"),
      Array(-2.0, -3.0, -3.0, -4.0, -1.5))
    // ▁ab (-1.5) beats ▁+ab (-6) and ▁+a+b (-8)
    assert(m.encodeWord("ab").toSeq === Seq("▁ab"))
    // unknown q: best completion is ▁ab then q at the UNK penalty
    assert(m.encodeWord("abq").toSeq === Seq("▁ab", "q"))
    // exact tie: pieces x(-1) y(-1) xy(-2) and ▁(-1): '▁xy' can end in
    // 'y' (total -3: ▁,x,y) or 'xy' (total -3: ▁,xy) — the longer last
    // piece must win
    val tie = new graft.functions.Unigram.Model(
      Array("▁", "x", "y", "xy"), Array(-1.0, -1.0, -1.0, -2.0))
    assert(tie.encodeWord("xy").toSeq === Seq("▁", "xy"))
    // surrogate pairs stay whole through the lattice
    val emoji = new String(Character.toChars(0x1F600))
    assert(m.encodeWord(s"a$emoji").toSeq.mkString === s"▁a$emoji")
  }

  test("unigram_encode expression matches the model driver-side, through " +
    "codegen; nulls poison; decode inverts") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val corpus = (Seq.fill(8)("aba") ++ Seq.fill(5)("cd")).mkString(" ")
    val pieces = Tokenizer.unigramTrain(Seq(corpus).toDF("text"), "text",
      vocabSize = 8, seedSize = 40)
    val model = new graft.functions.Unigram.Model(
      pieces.map(_.piece).toArray, pieces.map(_.log_prob).toArray)
    val docs = Seq((1L, "Aba CD aba"), (2L, "  cd  unseen☃ "), (3L, null))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        Tokenizer.unigramEncode(col("text"), pieces).as("toks"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    def ref(s: String): Seq[String] =
      s.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(model.encodeWord(_).toSeq)
    assert(got(1L) === Some(ref("Aba CD aba")))
    assert(got(2L) === Some(ref("  cd  unseen☃ ")))
    assert(got(3L) === None)
    // decode: ▁ markers back to spaces == normalized pre-token stream,
    // including the out-of-vocabulary characters
    val rt = docs.filter(col("text").isNotNull).select(col("id"),
        (Tokenizer.unigramDecode(
          Tokenizer.unigramEncode(col("text"), pieces)) ===
          concat_ws(" ", Tokenizer.preTokens(col("text")))).as("ok"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(rt === Map(1L -> true, 2L -> true))
  }

  test("unigram ids: <unk>=0 then table order; OOV code points emit 0; " +
    "decodeIds restores text except at <unk>; vocab export matches the " +
    "expression's assignment") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val corpus = (Seq.fill(8)("aba") ++ Seq.fill(5)("cd")).mkString(" ")
    val pieces = Tokenizer.unigramTrain(Seq(corpus).toDF("text"), "text",
      vocabSize = 8, seedSize = 40)
    val vocab = Tokenizer.unigramVocabulary(spark, pieces)
      .orderBy("id").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(vocab.head === ("<unk>", 0))
    assert(vocab.drop(1).map(_._1).toSeq === pieces.map(_.piece),
      "ids 1..n must follow table order")
    val docs = Seq((1L, "aba cd"), (2L, "ab☃a")).toDF("id", "text")
    val got = docs.select(col("id"),
        Tokenizer.unigramEncodeIds(col("text"), pieces).as("ids"),
        Tokenizer.unigramEncode(col("text"), pieces).as("toks"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1), r.getSeq[String](2))).toMap
    val idOf = vocab.toMap
    // id stream == piece stream mapped through the vocab, OOV → 0
    got.values.foreach { case (ids, toks) =>
      assert(ids === toks.map(t => idOf.getOrElse(t, 0)))
    }
    assert(got(2L)._1.contains(0), "the ☃ code point must emit <unk>=0")
    // decodeIds inverts exactly where no <unk> was emitted
    val dec = docs.select(col("id"),
        Tokenizer.unigramDecodeIds(
          Tokenizer.unigramEncodeIds(col("text"), pieces), pieces).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec(1L) === "aba cd")
    assert(dec(2L).contains("<unk>"))
  }

  test("unigram save/load bundle: a loaded piece table segments and " +
    "id-encodes identically to the trained one") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val docs = (1 to 30).map(i => s"tok${i % 5} word${i % 3}").toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("graft-unitok").toString
    val trained = Tokenizer.saveUnigramTokenizer(docs, "text", 40, dir)
    val loaded = Tokenizer.loadUnigramTokenizer(spark, dir)
    assert(loaded === trained, "parquet must round-trip the table bit-exactly")
    val probe = Seq("tok1 word2 tok4").toDF("text")
    val a = probe.select(Tokenizer.unigramEncodeIds(col("text"), trained))
      .as[Seq[Int]].head()
    val b = probe.select(Tokenizer.unigramEncodeIds(col("text"), loaded))
      .as[Seq[Int]].head()
    assert(a === b && a.nonEmpty)
    // the saved vocab parquet agrees with the in-memory derivation
    val v = spark.read.parquet(s"$dir/vocab").orderBy("id")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(v === ("<unk>", 0) +:
      trained.zipWithIndex.map { case (p, i) => (p.piece, i + 1) })
  }

  // ── byte-level BPE (GPT-2 / tiktoken mode) ────────────────────────

  test("byte-level BPE: bijective byte table; case/scripts/emoji round-trip " +
    "byte-exactly; zero UNK even on bytes unseen in training") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val bc = graft.functions.ByteLevel.byteToChar
    assert(bc.distinct.length === 256, "byte table must be a bijection")
    assert(!bc.contains(' '), "space must not be in the byte image")
    val docs = Seq((1L, "MiXeD CaSe Grüße"), (2L, "雪 ☃ emoji 😀 end"),
        (3L, "tab\tand  doubled spaces"))
      .toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrainBytes(docs, "text", 20)
    val toks = Tokenizer.encodeBytes(col("text"), merges)
    val rt = docs.select(col("doc_id"),
        (Tokenizer.decodeBytes(toks) ===
          trim(regexp_replace(col("text"), "\\s+", " "))).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rt === Map(1L -> true, 2L -> true, 3L -> true),
      "decode must restore case, accents, Han, and emoji byte-for-byte")
    // zero UNK: bytes the training corpus never saw still have vocab ids
    val vocab = Tokenizer.byteVocabulary(merges).zipWithIndex.toMap
    val probeToks = Seq("Ωznačka ţest").toDF("text")
      .select(Tokenizer.encodeBytes(col("text"), merges))
      .as[Seq[String]].head()
    assert(probeToks.nonEmpty && probeToks.forall(vocab.contains),
      s"every byte-mode token must be in-vocabulary, got $probeToks")
    // case distinction survives (char-level BPE would fold these)
    val cased = Seq(("Case", "case")).toDF("a", "b")
      .select(Tokenizer.decodeBytes(Tokenizer.encodeBytes(col("a"), merges)).as("da"),
        Tokenizer.decodeBytes(Tokenizer.encodeBytes(col("b"), merges)).as("db"))
      .head()
    assert(cased.getString(0) === "Case" && cased.getString(1) === "case")
  }

  test("unigram trainer is deterministic and prunes to the requested size " +
    "(singles never dropped)") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val texts = (1 to 40).map(i => s"pad${i % 7} word${i % 5} tail${i % 3}")
    val df = texts.toDF("text")
    val a = Tokenizer.unigramTrain(df, "text", vocabSize = 30, seedSize = 500)
    val b = Tokenizer.unigramTrain(df, "text", vocabSize = 30, seedSize = 500)
    assert(a === b, "same corpus must train the identical table")
    val singles = a.map(_.piece).filter(p => p.codePointCount(0, p.length) == 1)
    val distinctChars = texts.mkString.replace(" ", "").distinct.length + 1 // + ▁
    assert(singles.size === distinctChars,
      "every corpus code point (plus ▁) must survive pruning")
    assert(a.size >= 30 && a.size <= math.max(30, distinctChars + 30),
      s"prune must land near the cap, got ${a.size}")
  }

  // ── WordPiece (BERT) family ───────────────────────────────────────

  test("wordpiece trainer scores pairs by likelihood, not raw frequency") {
    // pair counts: (a,##b) appears 12 times but both symbols are very
    // frequent; (x,##y) appears 4 times on rare symbols. Raw-frequency
    // BPE would merge ab first; WordPiece's score pf/(lf·rf) must pick
    // xy: 4/(4·4) = 0.25 vs 12/(24·12) ≈ 0.042.
    val hist = Seq(("ab", 12L), ("ac", 6L), ("ad", 6L), ("xy", 4L))
    val vocab = Tokenizer.wordpieceTrainOnHistogram(hist, 1)
    assert(vocab.contains("xy") && !vocab.contains("ab"),
      s"score must pick the rare-symbol pair, got $vocab")
    // alphabet carries position-dependent forms: bare first chars,
    // ##-prefixed continuations, [UNK] at id 0
    assert(vocab.head === "[UNK]")
    assert(vocab.contains("a") && vocab.contains("##b") &&
      !vocab.contains("b") && !vocab.contains("##a"), vocab.toString)
  }

  test("wordpiece greedy encode: longest match first, continuation prefix, " +
    "whole-word [UNK] on any gap, long-word guard") {
    val m = new graft.functions.Wordpiece.Model(
      Array("[UNK]", "un", "##aff", "##able", "##a", "u", "##u", "##n",
        "##f", "##b", "##l", "##e"))
    // the classic BERT example: un ##aff ##able
    assert(m.encodeWord("unaffable").toSeq === Seq("un", "##aff", "##able"))
    // greedy longest-first: '##able' beats '##a'+...
    assert(m.encodeWord("unable").toSeq === Seq("un", "##able"))
    // a gap anywhere UNKs the WHOLE word (no partial emission)
    assert(m.encodeWord("unznown").toSeq === Seq("[UNK]"))
    // >100 code points short-circuits to [UNK]
    assert(m.encodeWord("u" * 101).toSeq === Seq("[UNK]"))
    assert(m.encodeWord("u" * 100).toSeq.head === "u")
    // surrogate pairs stay whole
    val emoji = new String(Character.toChars(0x1F600))
    val me = new graft.functions.Wordpiece.Model(Array("[UNK]", "a", "##" + emoji))
    assert(me.encodeWord("a" + emoji).toSeq === Seq("a", "##" + emoji))
  }

  test("wordpiece_encode expression matches the model driver-side through " +
    "codegen; ids map position-is-id; decode inverts where no UNK") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val corpus = (Seq.fill(9)("hugging") ++ Seq.fill(7)("hugs") ++
      Seq.fill(5)("bugs")).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val vocab = Tokenizer.wordpieceTrain(df, "text", numMerges = 8)
    val model = new graft.functions.Wordpiece.Model(vocab.toArray)
    val row = df.select(
      Tokenizer.wordpieceEncode(col("text"), vocab).as("toks"),
      Tokenizer.wordpieceEncodeIds(col("text"), vocab).as("ids"),
      Tokenizer.wordpieceDecode(
        Tokenizer.wordpieceEncode(col("text"), vocab)).as("dec")).head()
    val toks = row.getSeq[String](0)
    val ids = row.getSeq[Int](1)
    val expected = corpus.split(" ").flatMap(model.encodeWord).toSeq
    assert(toks === expected, "engine tokens must match the driver model")
    val idOf = vocab.zipWithIndex.toMap
    assert(ids === toks.map(idOf), "ids must be vocab positions")
    assert(row.getString(2) === corpus,
      "decode must reconstruct the normalized corpus (no UNK fired)")
    // an out-of-alphabet word UNKs whole and maps to id 0
    val unkRow = Seq("hugs qzqz").toDF("text")
      .select(Tokenizer.wordpieceEncode(col("text"), vocab).as("t"),
        Tokenizer.wordpieceEncodeIds(col("text"), vocab).as("i")).head()
    assert(unkRow.getSeq[String](0).last === "[UNK]")
    assert(unkRow.getSeq[Int](1).last === 0)
  }

  test("wordpiece trainer is deterministic; save/load restores id order " +
    "and segments identically") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val texts = (1 to 40).map(i => s"pad${i % 7} word${i % 5} tail${i % 3}")
    val df = texts.toDF("text")
    val a = Tokenizer.wordpieceTrain(df, "text", numMerges = 20)
    val b = Tokenizer.wordpieceTrain(df, "text", numMerges = 20)
    assert(a === b, "same corpus must train the identical vocabulary")
    val dir = java.nio.file.Files.createTempDirectory("wp").toString
    Tokenizer.saveWordpiece(spark, a, s"$dir/vocab")
    val loaded = Tokenizer.loadWordpiece(spark, s"$dir/vocab")
    assert(loaded === a, "load must restore the exact id order")
    val probe = Seq(texts.head).toDF("text")
    val x = probe.select(Tokenizer.wordpieceEncodeIds(col("text"), a))
      .as[Seq[Int]].head()
    val y = probe.select(Tokenizer.wordpieceEncodeIds(col("text"), loaded))
      .as[Seq[Int]].head()
    assert(x === y)
  }

  test("BPE merge order is prefix-stable: truncating a larger merge table " +
    "equals retraining at the smaller size (deploy-time vocab surgery)") {
    val docs = Tables.spread(Tables.documents(spark, sf))
    val big = Tokenizer.bpeTrain(docs, "text", 40)
    val small = Tokenizer.bpeTrain(docs, "text", 15)
    assert(big.take(15) === small)
  }

  test("bpeTrainWithVocab's single-pass histogram reuse is bit-identical " +
    "to separate bpeTrain + vocabulary (merges, tokens AND ids)") {
    val docs = Tables.spread(Tables.documents(spark, sf))
    val (merges1, vocabDf1) = Tokenizer.bpeTrainWithVocab(docs, "text", 40)
    val merges2 = Tokenizer.bpeTrain(docs, "text", 40)
    val vocabDf2 = Tokenizer.vocabulary(docs, "text", merges2)
    assert(merges1 === merges2)
    assert(vocabDf1.orderBy("id").collect().map(r => (r.getString(0), r.getInt(1))).toSeq ===
      vocabDf2.orderBy("id").collect().map(r => (r.getString(0), r.getInt(1))).toSeq)
  }
}
