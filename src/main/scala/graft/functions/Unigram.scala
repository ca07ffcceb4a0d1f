package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization kernel (Kudo 2018, the SentencePiece unigram
  * model) — the second major learned-tokenizer family next to BPE: a
  * piece vocabulary with log-probabilities, decoding each word to its
  * MAXIMUM-LIKELIHOOD segmentation by Viterbi over the piece lattice
  * (where BPE greedily replays merge ranks).
  *
  * Shares the whole pre-tokenization contract with the BPE stack
  * ([[Bpe.preTokenize]]: Locale.ROOT lowercase, CJK/Thai character
  * isolation, `\s+` split) so the two tokenizer families segment the same
  * word stream and their fertility numbers compare like-for-like.
  *
  * Word-boundary convention: SentencePiece's — each word is encoded as
  * `▁` (U+2581) + word, and vocabulary pieces may carry the `▁` prefix.
  * Decoding is therefore pure string work (concatenate, `▁` → space,
  * trim) with the same literal-`▁`-in-raw-text ambiguity BPE's `</w>`
  * marker has; see `Tokenizer.unigramDecode`.
  *
  * Determinism contract (shared with the trainer and the Verify replica):
  *  - lattice positions are CODE POINTS (surrogate pairs never split);
  *  - Viterbi scans predecessors j ascending (longest candidate piece
  *    first) and replaces only on a STRICTLY greater score, so an exact
  *    tie keeps the longer last piece;
  *  - a single code point absent from the vocabulary scores
  *    [[Unigram.UnkScore]] and emits its own surface form (not an
  *    `<unk>` sentinel — keeps decode∘encode the identity on ANY input,
  *    which the round-trip audit pins corpus-wide); multi-code-point
  *    gaps are simply not lattice edges.
  */
object Unigram {

  /** SentencePiece's word-boundary marker (LOWER ONE EIGHTH BLOCK). */
  val Boundary = "▁"

  /** Log-score of a single code point outside the vocabulary. Any fixed
    * finite penalty below every trained log-prob works (it only competes
    * against other segmentations of the same gap); -20 matches the
    * floor SentencePiece derives for its unknown surface.
    */
  val UnkScore: Double = -20.0

  /** Serializable piece table. Lookup state (piece → log-prob map, the
    * per-thread word memo) rebuilds lazily on each executor, like
    * [[Bpe.Model]].
    */
  final class Model(val pieces: Array[String], val logProbs: Array[Double])
      extends Serializable {
    require(pieces.length == logProbs.length,
      s"piece table arity mismatch: ${pieces.length} pieces, " +
        s"${logProbs.length} log-probs")

    @transient private lazy val lp: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        m.putIfAbsent(pieces(i), java.lang.Double.valueOf(logProbs(i)))
        i += 1
      }
      m
    }

    /** Longest piece in code points — bounds the Viterbi predecessor
      * scan (the lattice has no edge longer than the longest piece).
      */
    @transient private lazy val maxPieceCp: Int = {
      var mx = 1
      var i = 0
      while (i < pieces.length) {
        val n = pieces(i).codePointCount(0, pieces(i).length)
        if (n > mx) mx = n
        i += 1
      }
      mx
    }

    /** Word→pieces memo — same Zipf argument as the BPE memo: steady
      * state is one hash probe per word per thread. Access-ordered,
      * bounded.
      */
    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
        override def initialValue(): java.util.LinkedHashMap[String, Array[String]] =
          new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 32768
          }
      }

    /** Viterbi segmentation of one (already lowercased) word; the `▁`
      * boundary marker is prepended here.
      */
    def encodeWord(word: String): Array[String] = {
      val memo = cache.get()
      val hit = memo.get(word)
      if (hit != null) return hit
      val s = Boundary + word
      // code-point offsets: cp k spans chars off(k) until off(k+1)
      val n = s.codePointCount(0, s.length)
      val off = new Array[Int](n + 1)
      var ci = 0
      var k = 0
      while (k < n) {
        off(k) = ci
        ci += Character.charCount(s.codePointAt(ci))
        k += 1
      }
      off(n) = s.length
      val best = new Array[Double](n + 1)
      val prev = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        var bi = Double.NegativeInfinity
        var bj = -1
        var j = math.max(0, i - maxPieceCp)
        while (j < i) {
          val piece = s.substring(off(j), off(i))
          val p = lp.get(piece)
          val score =
            if (p != null) best(j) + p.doubleValue()
            else if (i - j == 1) best(j) + UnkScore
            else Double.NegativeInfinity
          if (score > bi) { bi = score; bj = j }
          j += 1
        }
        best(i) = bi
        prev(i) = bj
        i += 1
      }
      val out = List.newBuilder[String]
      val stack = new scala.collection.mutable.ArrayBuffer[String](8)
      var pos = n
      while (pos > 0) {
        val j = prev(pos)
        stack += s.substring(off(j), off(pos))
        pos = j
      }
      var r = stack.length - 1
      while (r >= 0) { out += stack(r); r -= 1 }
      val arr = out.result().toArray
      memo.put(word, arr)
      arr
    }

    /** Pieces of a whole text: shared pre-tokenization, per-word Viterbi,
      * concatenated. Returns Catalyst array data (UTF8String elements).
      */
    def encodeText(text: String): GenericArrayData = {
      val words = Bpe.preTokenize(text)
      val out = new scala.collection.mutable.ArrayBuffer[AnyRef](words.length * 2)
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) {
          val toks = encodeWord(words(i))
          var j = 0
          while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    /** Piece → id under the SentencePiece id convention this engine
      * exports ([[graft.operators.Tokenizer.unigramVocabulary]]): id 0 is
      * `<unk>`, piece at table position i is id i+1 (the table is already
      * in canonical UTF-8 order). First occurrence wins on a duplicate
      * piece, mirroring the probability map.
      */
    @transient private lazy val idOf: java.util.HashMap[String, java.lang.Integer] = {
      val m = new java.util.HashMap[String, java.lang.Integer](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        m.putIfAbsent(pieces(i), java.lang.Integer.valueOf(i + 1))
        i += 1
      }
      m
    }

    /** Ids of a whole text: the same Viterbi segmentation as
      * [[encodeText]], each piece mapped through [[idOf]]; an
      * out-of-vocabulary surface form (the unknown-code-point emission)
      * maps to the `<unk>` id 0 — HERE the id stream is lossy where the
      * surface stream was not, exactly like BPE's -1 sentinel.
      */
    def encodeTextIds(text: String): GenericArrayData = {
      val words = Bpe.preTokenize(text)
      val out = new scala.collection.mutable.ArrayBuffer[Any](words.length * 2)
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) {
          val toks = encodeWord(words(i))
          var j = 0
          while (j < toks.length) {
            val id = idOf.get(toks(j))
            out += (if (id == null) 0 else id.intValue())
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }
}

/** `unigram_encode(text, pieces, log_probs)` — unigram-LM pieces of
  * `text` under the trained table given as two aligned constant arrays
  * (the shape `Tokenizer.unigramTrain` emits). Codegen'd: the model is a
  * reference object on the generated class, so Viterbi fuses into the
  * corpus scan like `bpe_encode`; the per-thread word memo makes the
  * steady-state cost a hash probe per word.
  */
case class UnigramEncode(child: Expression, pieces: Seq[String],
                         logProbs: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires text input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val model =
    new Unigram.Model(pieces.toArray, logProbs.toArray)

  override def nullSafeEval(v: Any): Any = model.encodeText(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model, classOf[Unigram.Model].getName)
    defineCodeGen(ctx, ev, c => s"$m.encodeText($c.toString())")
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode =
    copy(child = c)
}

/** `unigram_encode_ids(text, pieces, log_probs)` — unigram-LM id arrays
  * (`array<int>` per document, the training-stack handoff format): the
  * same Viterbi segmentation as [[UnigramEncode]] with each piece mapped
  * to its vocabulary id (`<unk>` = 0, table position i = i+1 — the
  * assignment `Tokenizer.unigramVocabulary` exports). Codegen'd like the
  * piece form; the id map rides inside the model reference object.
  */
case class UnigramEncodeIds(child: Expression, pieces: Seq[String],
                            logProbs: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode_ids requires text input, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unigram_encode_ids"

  @transient private lazy val model =
    new Unigram.Model(pieces.toArray, logProbs.toArray)

  override def nullSafeEval(v: Any): Any = model.encodeTextIds(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model, classOf[Unigram.Model].getName)
    defineCodeGen(ctx, ev, c => s"$m.encodeTextIds($c.toString())")
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncodeIds =
    copy(child = c)
}
