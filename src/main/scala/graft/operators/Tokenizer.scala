package graft.operators

import graft.functions.Bpe
import graft.functions.Functions.java_lower
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING over a document corpus (Sennrich 2016; the
  * GPT-2/RoBERTa tokenizer shape) — the missing half next to
  * `TextAnalysis.subTokenCount`'s fixed regex: here the merge table is
  * LEARNED from the corpus.
  *
  * Scale shape (the same split every production trainer uses —
  * HuggingFace tokenizers, SentencePiece): the corpus scan collapses to a
  * WORD HISTOGRAM first — one distributed `groupBy(word)` over the 100 TB
  * input, the only pass that touches raw text — and the merge loop then
  * runs on the bounded top-`maxWords` histogram driver-side. A vocabulary
  * histogram is Zipf-bounded (tens of millions of distinct words for a
  * web-scale corpus; top-50k covers the training mass), so the collect is
  * a bounded-header pull exactly like the IVF centroid / PQ codebook
  * collects in [[Similarity]], not a corpus materialization. The merge
  * loop itself is inherently sequential (merge r+1's pair counts depend
  * on merge r having been applied) — no distributed formulation avoids
  * that dependency; distributing it would add a shuffle barrier per merge
  * for less work per round than a task launch costs.
  *
  * Encoding (the per-row hot path) stays fully distributed and
  * codegen-fused: [[graft.functions.BpeEncode]] replays the learned
  * merges inside the corpus scan with a per-thread word memo.
  */
object Tokenizer {

  /** Pre-tokenization: lowercase, CJK/Thai character isolation, `\s+`-
    * split, empties dropped (leading whitespace yields an empty head
    * token in both Spark and java.lang.String.split — filtered
    * identically here and in the driver-side loop). Lowercasing is
    * `java_lower`, NOT Spark's ICU `lower()`: the driver-side halves of
    * this pipeline (merge replay, oracle replicas, Bpe.Model.encodeText)
    * lowercase with the JVM tables, and the two disagree on recent code
    * points (U+A7D0 etc.) — both sides must share one semantic.
    * Requires `Functions.ensure`.
    *
    * Space-free scripts (Chinese/Japanese/Thai — [[Bpe.CjkCharClass]])
    * carry no whitespace word boundaries; each such character becomes
    * its own pre-token (space isolated on both sides, the WordPiece
    * `tokenize_chinese_chars` move — per-character tokens, the BERT
    * convention), so the trainer sees a meaningful character-frequency
    * histogram instead of one unique giant "word" per line, and word
    * counts / fertility / packing budgets count characters rather than
    * lines. Same spec as the codegen'd encode kernels
    * ([[Bpe.preTokenize]]) — training and encoding must agree on word
    * boundaries or the merge replay diverges.
    */
  def preTokens(text: Column): Column =
    filter(split(regexp_replace(java_lower(text),
      s"(${Bpe.CjkCharClass})", " $1 "), "\\s+"), w => length(w) > 0)

  /** Distributed word histogram — the single pass over raw text. One
    * shuffle, map-side partial aggregation, no driver involvement.
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(preTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** One learned merge: rank (1-based, training order), the two merged
    * symbols, and the pair's corpus frequency when chosen.
    */
  final case class Merge(rank: Int, left: String, right: String, pair_freq: Long)

  /** Driver-side merge loop over a word histogram. Deterministic: each
    * round picks the max-frequency adjacent pair, ties broken by
    * lexicographically smallest (left, right); stops early when the best
    * pair occurs fewer than 2 times (a frequency-1 merge memorizes a
    * single word — every real trainer cuts there or higher).
    */
  def trainOnHistogram(hist: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      hist.iterator.map { case (w, f) => (Bpe.initialSymbols(w), f) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestF = 0L
      counts.forEach { (p, f) =>
        if (f > bestF || (f == bestF && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestF = f
        }
      }
      if (best == null || bestF < 2) exhausted = true
      else {
        merges += Merge(rank, best._1, best._2, bestF)
        val (l, r) = best
        words = words.map { case (syms, f) =>
          if (!hasPair(syms, l, r)) (syms, f)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += l + r; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, f)
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  private def hasPair(syms: Array[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** Train `numMerges` BPE merges on the corpus: distributed histogram,
    * bounded top-`maxWords` collect (total order: freq desc, word asc —
    * a boundary tie never flips the selection), driver merge loop.
    * Returns (rank, left, right, pair_freq) in training order.
    */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 50000): Seq[Merge] = {
    val hist = wordHistogram(docs, textCol)
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainOnHistogram(hist, numMerges)
  }

  /** Learned merges as a DataFrame (for persistence or the oracle gate).
    * Columns lhs/rhs, not left/right — those are SQL keywords downstream.
    */
  def mergesDf(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs", "pair_freq")
  }

  /** Tokens column under a trained merge table — codegen-fused scan work,
    * merges shipped once per task as a reference object.
    */
  def encode(text: Column, merges: Seq[Merge]): Column = {
    val lefts = merges.map(_.left).toArray
    val rights = merges.map(_.right).toArray
    call_function("bpe_encode", text, lit(lefts), lit(rights))
  }

  /** Tokens as ids into a [[vocabulary]] export — the handoff format a
    * training stack consumes (`array<int>` per document; unknown tokens,
    * i.e. unseen code points at inference, emit the -1 UNK sentinel).
    * Codegen-fused like [[encode]]; the vocab ships once per task inside
    * the expression's reference object.
    */
  def encodeIds(text: Column, merges: Seq[Merge], vocab: Seq[String]): Column =
    call_function("bpe_encode_ids", text,
      lit(merges.map(_.left).toArray), lit(merges.map(_.right).toArray),
      lit(vocab.toArray))

  /** Inverse of [[encode]]: join a token array back into text, trailing
    * `</w>` markers becoming word boundaries. `decode(encode(text)) ==
    * concat_ws(' ', preTokens(text))` for any merge table (round-trip
    * spec-pinned) — the detokenize direction a training stack needs.
    */
  def decode(tokens: Column): Column = call_function("bpe_decode", tokens)

  /** Inverse of [[encodeIds]]: id arrays back to text through the vocab
    * table. The -1 UNK sentinel (and any id outside the vocab) renders as
    * `<unk>` — lossy exactly where encoding was.
    */
  def decodeIds(ids: Column, vocab: Seq[String]): Column = {
    val vlit = typedLit(vocab)
    decode(transform(ids, i =>
      when(i >= 0 && i < vocab.size, element_at(vlit, i + 1))
        .otherwise(lit("<unk>"))))
  }

  /** Token → id vocabulary of a trained tokenizer — the export a training
    * stack consumes next to the merge table. Ids are assigned the way BPE
    * vocabularies are built: the base ALPHABET first (every single
    * code-point symbol in the corpus plus `</w>`, in UTF-8 binary order —
    * Spark's string sort, so the assignment is engine-reproducible), then
    * one token per merge in training-rank order, skipping strings already
    * present (two merge chains can assemble the same surface string; first
    * rank wins, like GPT-2's vocab json).
    *
    * Scale shape: the alphabet pass reuses the codegen'd encode kernel
    * with an EMPTY merge table (= code-point symbols), so it's one
    * distributed distinct over the corpus scan; the distinct result is
    * alphabet-sized (bounded by the charset, not the corpus) and the only
    * driver materialization.
    */
  def vocabulary(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val alphabet = docs.filter(col(textCol).isNotNull)
      .select(explode(encode(col(textCol), Nil)).as("token"))
      .distinct()
      .orderBy("token")
      .collect()
      .map(_.getString(0))
    assembleVocab(docs.sparkSession, alphabet, merges)
  }

  /** The id-assembly step shared by [[vocabulary]] and
    * [[bpeTrainWithVocab]]: alphabet first, then one token per merge in
    * rank order, first rank winning surface-string collisions.
    */
  private def assembleVocab(spark: org.apache.spark.sql.SparkSession,
                            alphabet: Array[String],
                            merges: Seq[Merge]): DataFrame = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    alphabet.foreach(seen += _)
    merges.sortBy(_.rank).foreach(m => seen += m.left + m.right)
    import spark.implicits._
    seen.iterator.zipWithIndex.map { case (t, i) => (t, i) }
      .toSeq.toDF("token", "id")
  }

  /** [[bpeTrain]] + [[vocabulary]] sharing ONE corpus pass: the word
    * histogram (checkpointed) feeds both the driver merge loop and the
    * alphabet derivation. Every base symbol of the corpus occurs in some
    * histogram word and histogram words are preTokens-idempotent (already
    * lowercased, whitespace-free, CJK pre-split), so exploding the
    * HISTOGRAM's words through the empty-merge encode kernel yields
    * exactly the distinct symbol set a second corpus scan would — at
    * vocabulary-bounded cost. Results are bit-identical to calling the
    * two steps separately (spec-pinned).
    */
  def bpeTrainWithVocab(docs: DataFrame, textCol: String, numMerges: Int,
                        maxWords: Int = 50000): (Seq[Merge], DataFrame) = {
    val hist = wordHistogram(docs, textCol).localCheckpoint()
    val top = hist.orderBy(desc("freq"), asc("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val merges = trainOnHistogram(top, numMerges)
    val alphabet = hist
      .select(explode(encode(col("word"), Nil)).as("token"))
      .distinct()
      .orderBy("token")
      .collect()
      .map(_.getString(0))
    (merges, assembleVocab(docs.sparkSession, alphabet, merges))
  }

  // ── Unigram-LM (SentencePiece) trainer ─────────────────────────────

  /** One trained unigram piece: surface string + log-probability (rounded
    * to 6 dp — the rounded table IS the artifact; encoding replays it, so
    * engine and oracle replica segment under identical doubles).
    */
  final case class Piece(piece: String, log_prob: Double)

  private def utf8Less(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Driver-side unigram-LM training over a word histogram (Kudo 2018,
    * the SentencePiece unigram trainer, over the same bounded histogram
    * the BPE loop uses — the corpus-scale pass stays the one distributed
    * [[wordHistogram]] shuffle).
    *
    * Algorithm (each step's float-op ORDER is part of the spec — the
    * Verify replica re-implements it independently and must reproduce
    * the exact doubles):
    *  1. SEED: count every code-point substring of `▁word` up to
    *     `maxPieceLen` code points, weighted by word frequency (exact
    *     long arithmetic). Keep ALL single-code-point pieces (never
    *     pruned — they guarantee every word stays segmentable) plus the
    *     top `seedSize - #singles` multi-character substrings by
    *     (count desc, piece UTF-8 asc). Initial log-prob:
    *     `log(count) - log(Σ counts over kept pieces)` (long total).
    *  2. EM: `emRounds` iterations of forward-backward expected counts.
    *     Words accumulate in histogram order; lattice edges enumerate by
    *     end position ascending, then start ascending; logsumexp is
    *     max-shift then exp-sum in edge order (StrictMath throughout).
    *     M-step: `e(x) = max(expected(x), 1e-12)` (floor keeps an
    *     underflowed piece finite), `T = Σ e(x)` in UTF-8 piece order,
    *     `lp(x) = log(e(x)) - log(T)`.
    *  3. PRUNE: drop the lowest-expected-count multi-character pieces
    *     (ties: UTF-8-larger piece drops first) down to
    *     `max(vocabSize, ⌊size·shrink⌋)`; each prune is followed by
    *     another `emRounds` EM passes (the one after the last prune is
    *     the final polish), until the vocabulary fits.
    *     (Expected-count pruning is the standard approximation of
    *     SentencePiece's per-piece likelihood-loss ranking; the loss
    *     ranking needs a second Viterbi corpus pass per candidate.)
    *  4. Output pieces in UTF-8 order with log-probs rounded to 6 dp.
    */
  def unigramTrainOnHistogram(hist: Seq[(String, Long)], vocabSize: Int,
                              seedSize: Int = 2000, maxPieceLen: Int = 6,
                              emRounds: Int = 2,
                              shrink: Double = 0.75): Seq[Piece] = {
    require(vocabSize > 0 && seedSize > 0 && maxPieceLen > 0 && emRounds > 0)
    // code points of ▁word, one string per cp
    def cps(word: String): Array[String] = {
      val s = graft.functions.Unigram.Boundary + word
      val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    val words: Array[(Array[String], Long)] =
      hist.iterator.map { case (w, f) => (cps(w), f) }.toArray

    // 1. seed counts (exact longs)
    val counts = new java.util.HashMap[String, java.lang.Long]()
    words.foreach { case (c, f) =>
      var j = 0
      while (j < c.length) {
        val sb = new java.lang.StringBuilder
        var i = j
        val hi = math.min(c.length, j + maxPieceLen)
        while (i < hi) {
          sb.append(c(i))
          counts.merge(sb.toString, java.lang.Long.valueOf(f), (a, b) =>
            java.lang.Long.valueOf(a.longValue() + b.longValue()))
          i += 1
        }
        j += 1
      }
    }
    var singles = List.empty[(String, Long)]
    var multis = List.empty[(String, Long)]
    counts.forEach { (p, f) =>
      if (p.codePointCount(0, p.length) == 1) singles ::= (p, f.longValue())
      else multis ::= (p, f.longValue())
    }
    val keptMultis = multis
      .sortWith { case ((p1, f1), (p2, f2)) =>
        f1 > f2 || (f1 == f2 && utf8Less(p1, p2)) }
      .take(math.max(0, seedSize - singles.size))
    var vocab: Vector[String] =
      (singles.map(_._1) ++ keptMultis.map(_._1)).sortWith(utf8Less).toVector
    val singleSet = singles.map(_._1).toSet
    val lp = new java.util.HashMap[String, java.lang.Double]()
    locally {
      val total = vocab.iterator.map(p => counts.get(p).longValue()).sum
      val logTotal = StrictMath.log(total.toDouble)
      vocab.foreach { p =>
        lp.put(p, java.lang.Double.valueOf(
          StrictMath.log(counts.get(p).longValue().toDouble) - logTotal))
      }
    }

    // one E+M pass; returns the expected-count map (for pruning)
    def emStep(): java.util.HashMap[String, Double] = {
      val expected = new java.util.HashMap[String, Double]()
      words.foreach { case (c, f) =>
        val n = c.length
        val alpha = new Array[Double](n + 1)
        val beta = new Array[Double](n + 1)
        val terms = new scala.collection.mutable.ArrayBuffer[Double](maxPieceLen)
        def logsumexp(): Double = {
          if (terms.isEmpty) return Double.NegativeInfinity
          var m = Double.NegativeInfinity
          terms.foreach(t => if (t > m) m = t)
          if (m == Double.NegativeInfinity) return m
          var s = 0.0
          terms.foreach(t => s += StrictMath.exp(t - m))
          m + StrictMath.log(s)
        }
        def piece(j: Int, i: Int): String = {
          val sb = new java.lang.StringBuilder
          var k = j
          while (k < i) { sb.append(c(k)); k += 1 }
          sb.toString
        }
        alpha(0) = 0.0
        var i = 1
        while (i <= n) {
          terms.clear()
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            val p = lp.get(piece(j, i))
            if (p != null) terms += alpha(j) + p.doubleValue()
            j += 1
          }
          alpha(i) = logsumexp()
          i += 1
        }
        beta(n) = 0.0
        i = n - 1
        while (i >= 0) {
          terms.clear()
          var j = i + 1
          val hi = math.min(n, i + maxPieceLen)
          while (j <= hi) {
            val p = lp.get(piece(i, j))
            if (p != null) terms += p.doubleValue() + beta(j)
            j += 1
          }
          beta(i) = logsumexp()
          i -= 1
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          i = 1
          while (i <= n) {
            var j = math.max(0, i - maxPieceLen)
            while (j < i) {
              val pc = piece(j, i)
              val p = lp.get(pc)
              if (p != null) {
                val post = f * StrictMath.exp(alpha(j) + p.doubleValue() + beta(i) - z)
                expected.merge(pc, post, (a, b) => a + b)
              }
              j += 1
            }
            i += 1
          }
        }
      }
      // M-step over the canonical (UTF-8-sorted) vocab order
      val e = new java.util.HashMap[String, Double]()
      vocab.foreach { p =>
        val v = expected.get(p)
        e.put(p, math.max(if (v == null) 0.0 else v, 1e-12))
      }
      var t = 0.0
      vocab.foreach(p => t += e.get(p))
      val logT = StrictMath.log(t)
      lp.clear()
      vocab.foreach(p => lp.put(p,
        java.lang.Double.valueOf(StrictMath.log(e.get(p)) - logT)))
      e
    }

    def emPass(): java.util.HashMap[String, Double] = {
      var e = emStep()
      var r = 1
      while (r < emRounds) { e = emStep(); r += 1 }
      e
    }
    var lastE = emPass()
    var done = vocab.size <= vocabSize
    while (!done) {
      val target = math.max(vocabSize, (vocab.size * shrink).toInt)
      val prunable = vocab.filterNot(singleSet)
      val dropCount = math.min(vocab.size - target, prunable.size)
      if (dropCount <= 0) {
        // every droppable piece is gone yet size still exceeds the cap:
        // more distinct characters than vocabSize. Keep them all —
        // segmentability beats the size cap (SentencePiece's
        // required_chars handling)
        done = true
      } else {
        val dropped = prunable
          .sortWith { (p1, p2) =>
            val e1 = lastE.get(p1); val e2 = lastE.get(p2)
            e1 < e2 || (e1 == e2 && utf8Less(p2, p1)) }
          .take(dropCount).toSet
        vocab = vocab.filterNot(dropped)
        lp.keySet.removeIf(p => dropped(p))
        lastE = emPass() // the pass after the LAST prune is the polish
        done = vocab.size <= vocabSize
      }
    }
    vocab.map(p => Piece(p,
      BigDecimal(lp.get(p).doubleValue())
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toList
  }

  /** Train a unigram-LM piece table on the corpus: the same distributed
    * histogram + bounded top-`maxWords` collect as [[bpeTrain]] (total
    * order: freq desc, word UTF-8 asc), then the driver EM loop.
    */
  def unigramTrain(docs: DataFrame, textCol: String, vocabSize: Int,
                   seedSize: Int = 2000, maxPieceLen: Int = 6,
                   maxWords: Int = 50000): Seq[Piece] = {
    val hist = wordHistogram(docs, textCol)
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    unigramTrainOnHistogram(hist, vocabSize, seedSize, maxPieceLen)
  }

  /** Trained piece table as a DataFrame (persistence / the oracle gate). */
  def piecesDf(spark: org.apache.spark.sql.SparkSession,
               pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    pieces.map(p => (p.piece, p.log_prob)).toDF("piece", "log_prob")
  }

  /** Pieces column under a trained table — codegen-fused Viterbi in the
    * scan ([[graft.functions.UnigramEncode]]), table shipped once per
    * task as a reference object.
    */
  def unigramEncode(text: Column, pieces: Seq[Piece]): Column =
    call_function("unigram_encode", text,
      lit(pieces.map(_.piece).toArray), lit(pieces.map(_.log_prob).toArray))

  /** Inverse of [[unigramEncode]]: concatenate pieces, `▁` markers become
    * word boundaries. Built-in string ops end to end (translate + trim) —
    * no custom kernel needed. Same inherent boundary caveat as BPE's
    * `</w>`: raw text containing a literal U+2581 is ambiguous to any
    * marker-based decoder.
    */
  def unigramDecode(tokens: Column): Column =
    trim(translate(concat_ws("", tokens),
      graft.functions.Unigram.Boundary, " "))

  /** Piece → id vocabulary of a trained unigram tokenizer — the export a
    * training stack loads next to the piece table. Id assignment follows
    * the SentencePiece convention: `<unk>` is id 0, then one id per piece
    * in table order (which [[unigramTrain]] emits in canonical UTF-8
    * binary order, so the assignment is engine-reproducible). Purely a
    * driver-side transform of the bounded piece table — no corpus pass.
    */
  def unigramVocabulary(spark: org.apache.spark.sql.SparkSession,
                        pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    (("<unk>", 0) +: pieces.zipWithIndex.map { case (p, i) => (p.piece, i + 1) })
      .toDF("piece", "id")
  }

  /** Ids column under a trained piece table (`array<int>` per document —
    * what a training stack's data loader reads): codegen-fused Viterbi +
    * id map ([[graft.functions.UnigramEncodeIds]]). Out-of-vocabulary
    * code points emit the `<unk>` id 0 — the id stream is lossy exactly
    * where the surface-piece stream ([[unigramEncode]]) is not.
    */
  def unigramEncodeIds(text: Column, pieces: Seq[Piece]): Column =
    call_function("unigram_encode_ids", text,
      lit(pieces.map(_.piece).toArray), lit(pieces.map(_.log_prob).toArray))

  /** Inverse of [[unigramEncodeIds]]: id arrays back to text through the
    * piece table. Id 0 (and any id outside the table) renders as `<unk>`
    * — lossy exactly where encoding was; all in-vocabulary ids restore
    * their surface pieces, so `unigramDecodeIds(unigramEncodeIds(t))`
    * equals the normalized text wherever no OOV code point occurred.
    */
  def unigramDecodeIds(ids: Column, pieces: Seq[Piece]): Column = {
    val plit = typedLit(pieces.map(_.piece))
    unigramDecode(transform(ids, i =>
      when(i >= 1 && i <= pieces.size, element_at(plit, i))
        .otherwise(lit("<unk>"))))
  }

  /** Persist a trained piece table (UTF-8 piece order — the canonical
    * table order ids are assigned in).
    */
  def savePieces(spark: org.apache.spark.sql.SparkSession, pieces: Seq[Piece],
                 dir: String): Unit =
    piecesDf(spark, pieces).coalesce(1).write.mode("overwrite").parquet(dir)

  /** Load a persisted piece table, canonical order restored. Parquet
    * round-trips the log-prob doubles bit-exactly, so a loaded table
    * segments identically to the trained one.
    */
  def loadPieces(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Piece] =
    spark.read.parquet(dir)
      .select("piece", "log_prob")
      .collect()
      .map(r => Piece(r.getString(0), r.getDouble(1)))
      .sortWith((a, b) => utf8Less(a.piece, b.piece)).toSeq

  /** The full unigram tokenizer artifact — pieces + vocab under one
    * directory, mirror of the BPE [[saveTokenizer]] bundle: `dir/pieces`
    * (canonical order) and `dir/vocab` (piece, id; `<unk>` = 0). Train
    * once, every later job loads.
    */
  def saveUnigramTokenizer(docs: DataFrame, textCol: String, vocabSize: Int,
                           dir: String): Seq[Piece] = {
    val spark = docs.sparkSession
    val pieces = unigramTrain(docs, textCol, vocabSize)
    savePieces(spark, pieces, s"$dir/pieces")
    unigramVocabulary(spark, pieces)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    pieces
  }

  /** Load a [[saveUnigramTokenizer]] artifact (the vocab is derivable
    * from the pieces, so the piece table alone restores the tokenizer).
    */
  def loadUnigramTokenizer(spark: org.apache.spark.sql.SparkSession,
                           dir: String): Seq[Piece] =
    loadPieces(spark, s"$dir/pieces")

  // ── WordPiece (BERT) trainer ───────────────────────────────────────

  /** Initial symbols of a word under the WordPiece convention: the first
    * code point bare, every later one `##`-prefixed (so "word" seeds as
    * `w ##o ##r ##d` — position-dependent symbols, unlike BPE's flat
    * code points + `</w>`).
    */
  private def wpInitialSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    var first = true
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val s = new String(Character.toChars(cp))
      out += (if (first) s else graft.functions.Wordpiece.ContPrefix + s)
      first = false
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Driver-side WordPiece training over a word histogram — the
    * likelihood-scored merge loop (Schuster & Nakajima 2012 as
    * implemented by the published HuggingFace WordPiece trainer): like
    * BPE each round merges one adjacent symbol pair corpus-wide, but the
    * pair is chosen by the SCORE
    *
    *   score(a,b) = freq(a,b) / (freq(a) · freq(b))
    *
    * — the pointwise likelihood gain of fusing the pair under a unigram
    * factorization — rather than raw pair frequency, so a pair of two
    * already-frequent symbols must co-occur far more often to win than a
    * pair of rare ones.
    *
    * Determinism contract (the Verify replica re-implements this spec
    * independently): symbol and pair frequencies are exact longs
    * recounted from the current segmentations each round; scores compare
    * by exact integer cross-multiplication (`BigInt` — no float ratio
    * ever forms), ties broken by higher pair frequency then
    * lexicographically smallest (left, right) in UTF-8 byte order; the
    * loop stops early when the best pair occurs fewer than 2 times (a
    * frequency-1 merge memorizes one word — same cut as [[bpeTrain]]).
    *
    * Returns the VOCABULARY (the WordPiece artifact — encoding is greedy
    * longest-match over a vocab, so no merge table survives training):
    * `[UNK]` at id 0, then the alphabet (every initial symbol of the
    * histogram, bare and `##` forms separately, UTF-8 order), then one
    * token per merge in training order, first surface string wins (two
    * merge chains can assemble the same surface, e.g. `a+##bc` and
    * `ab+##c`).
    */
  def wordpieceTrainOnHistogram(hist: Seq[(String, Long)],
                                numMerges: Int): Seq[String] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val cont = graft.functions.Wordpiece.ContPrefix
    var words: Array[(Array[String], Long)] =
      hist.iterator.map { case (w, f) => (wpInitialSymbols(w), f) }.toArray
    val alphabet = words.iterator.flatMap(_._1).toSet.toSeq.sortWith(utf8Less)
    val products = scala.collection.mutable.ArrayBuffer.empty[String]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val symFreq = new java.util.HashMap[String, Long]()
      val pairFreq = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          symFreq.merge(syms(i), f, (a, b) => a + b)
          if (i < syms.length - 1)
            pairFreq.merge((syms(i), syms(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      // best by score = pf/(lf·rf): s1 > s2 ⟺ p1·l2·r2 > p2·l1·r1 (exact)
      var best: (String, String) = null
      var bestP = 0L
      var bestLR = BigInt(1)
      pairFreq.forEach { (p, pf) =>
        val lr = BigInt(symFreq.get(p._1)) * BigInt(symFreq.get(p._2))
        val cmp =
          if (best == null) 1
          else (BigInt(pf) * bestLR).compare(BigInt(bestP) * lr)
        val wins =
          cmp > 0 || (cmp == 0 && (pf > bestP || (pf == bestP &&
            (utf8Less(p._1, best._1) || (p._1 == best._1 &&
              utf8Less(p._2, best._2))))))
        if (wins) { best = p; bestP = pf; bestLR = lr }
      }
      if (best == null || bestP < 2) exhausted = true
      else {
        val (l, r) = best
        val merged = l + r.stripPrefix(cont)
        products += merged
        words = words.map { case (syms, f) =>
          if (!hasPair(syms, l, r)) (syms, f)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += merged; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, f)
          }
        }
        rank += 1
      }
    }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    seen += graft.functions.Wordpiece.Unk
    alphabet.foreach(seen += _)
    products.foreach(seen += _)
    seen.toSeq
  }

  /** Train a WordPiece vocabulary on the corpus: the same distributed
    * histogram + bounded top-`maxWords` collect as [[bpeTrain]] (total
    * order: freq desc, word UTF-8 asc), then the driver score-merge loop.
    * The alphabet derives from the bounded histogram, so a code point
    * seen only in below-cutoff tail words is absent and its words encode
    * to `[UNK]` — the documented vocabulary-coverage behavior of any
    * frequency-cut WordPiece vocab.
    */
  def wordpieceTrain(docs: DataFrame, textCol: String, numMerges: Int,
                     maxWords: Int = 50000): Seq[String] = {
    val hist = wordHistogram(docs, textCol)
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    wordpieceTrainOnHistogram(hist, numMerges)
  }

  /** Pieces column under a trained vocabulary — codegen-fused greedy
    * longest-match in the scan ([[graft.functions.WordpieceEncode]]),
    * vocab shipped once per task as a reference object.
    */
  def wordpieceEncode(text: Column, vocab: Seq[String]): Column =
    call_function("wordpiece_encode", text, lit(vocab.toArray))

  /** Inverse of [[wordpieceEncode]]: join pieces with spaces, then every
    * ` ##` seam closes its word — restores the whitespace-normalized
    * lowercased text wherever no `[UNK]` was emitted (spec-pinned; an
    * `[UNK]` is lossy by construction). Built-in string ops end to end;
    * same literal-marker ambiguity as BPE's `</w>` if raw text contains
    * `##` after a space.
    */
  def wordpieceDecode(tokens: Column): Column =
    replace(concat_ws(" ", tokens), lit(" " + graft.functions.Wordpiece.ContPrefix),
      lit(""))

  /** Ids column under a trained vocabulary (`array<int>` per document —
    * the training-stack handoff): the same greedy segmentation with each
    * piece at vocab position i mapping to id i; `[UNK]` is id 0 by the
    * trainer's export, so unknown words emit 0 like every vocab-file
    * BERT checkpoint expects.
    */
  def wordpieceEncodeIds(text: Column, vocab: Seq[String]): Column =
    call_function("wordpiece_encode_ids", text, lit(vocab.toArray))

  /** Token → id vocabulary of a trained WordPiece tokenizer as a
    * DataFrame (position = id — the vocab.txt line-number convention).
    * Purely a driver-side transform of the bounded vocab.
    */
  def wordpieceVocabulary(spark: org.apache.spark.sql.SparkSession,
                          vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    vocab.zipWithIndex.toDF("token", "id")
  }

  /** Persist a trained WordPiece vocabulary (id order — the artifact a
    * pipeline trains once and every later job loads).
    */
  def saveWordpiece(spark: org.apache.spark.sql.SparkSession,
                    vocab: Seq[String], dir: String): Unit =
    wordpieceVocabulary(spark, vocab)
      .coalesce(1).write.mode("overwrite").parquet(dir)

  /** Load a persisted WordPiece vocabulary, id order restored. */
  def loadWordpiece(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Seq[String] =
    spark.read.parquet(dir)
      .orderBy("id").collect().map(_.getString(0)).toSeq

  // ── byte-level BPE mode (GPT-2 / tiktoken family) ──────────────────

  /** Train byte-level merges: the corpus lowers to GPT-2 byte-mapped
    * pre-tokens in the scan (`byte_remap` — case-preserving, `\s+` only),
    * then the SAME distributed histogram + bounded collect + driver merge
    * loop as [[bpeTrain]] (the loop is pre-tokenization-agnostic: mapped
    * byte-chars are ordinary single code points to it).
    */
  def bpeTrainBytes(docs: DataFrame, textCol: String, numMerges: Int,
                    maxWords: Int = 50000): Seq[Merge] = {
    val hist = docs.filter(col(textCol).isNotNull)
      .select(explode(split(call_function("byte_remap", col(textCol)), " "))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainOnHistogram(hist, numMerges)
  }

  /** Byte-mode tokens column — codegen-fused like [[encode]], but
    * case-preserving and script-uniform (every word lowers to bytes).
    */
  def encodeBytes(text: Column, merges: Seq[Merge]): Column =
    call_function("bpe_encode_bytes", text,
      lit(merges.map(_.left).toArray), lit(merges.map(_.right).toArray))

  /** Inverse of [[encodeBytes]]: shared `</w>`-aware concatenation
    * ([[decode]]) then the byte bijection inverted — restores the
    * whitespace-normalized RAW text byte-for-byte (case, emoji, any
    * script; the property byte-level BPE exists for).
    */
  def decodeBytes(tokens: Column): Column =
    call_function("byte_unmap", call_function("bpe_decode", tokens))

  /** Byte-mode vocabulary: ALL 256 byte symbols (ascending byte order —
    * seeded unconditionally, which is what makes UNK impossible), the
    * end-of-word marker, then merge products in rank order
    * (first-surface-string-wins like [[vocabulary]]). No corpus pass at
    * all — the alphabet is the closed byte set, not a corpus scan.
    */
  def byteVocabulary(merges: Seq[Merge]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    (0 until 256).foreach(b =>
      seen += graft.functions.ByteLevel.byteToChar(b).toString)
    seen += graft.functions.Bpe.EndOfWord
    merges.sortBy(_.rank).foreach(m => seen += m.left + m.right)
    seen.toSeq
  }

  /** Persist a trained merge table (rank-ordered parquet — the tokenizer
    * artifact a pipeline trains once and every later job loads).
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge],
                 dir: String): Unit =
    mergesDf(spark, merges).coalesce(1).write.mode("overwrite").parquet(dir)

  /** Load a persisted merge table, rank order restored. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Merge] =
    spark.read.parquet(dir)
      .select("rank", "lhs", "rhs", "pair_freq")
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** The full tokenizer artifact — merges + vocab under one directory,
    * what a training stack checks out: `dir/merges` (rank-ordered) and
    * `dir/vocab` (token, id). Train once, every later job loads.
    */
  def saveTokenizer(docs: DataFrame, textCol: String, numMerges: Int,
                    dir: String): (Seq[Merge], Seq[String]) = {
    val spark = docs.sparkSession
    val merges = bpeTrain(docs, textCol, numMerges)
    saveMerges(spark, merges, s"$dir/merges")
    val vocabDf = vocabulary(docs, textCol, merges)
    vocabDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    (merges, vocabDf.orderBy("id").collect().map(_.getString(0)).toSeq)
  }

  /** Load a [[saveTokenizer]] artifact: (merges rank-ordered, vocab
    * id-ordered).
    */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
                    dir: String): (Seq[Merge], Seq[String]) = {
    val merges = loadMerges(spark, s"$dir/merges")
    val vocab = spark.read.parquet(s"$dir/vocab")
      .orderBy("id").collect().map(_.getString(0)).toSeq
    (merges, vocab)
  }
}
