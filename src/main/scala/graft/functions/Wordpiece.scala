package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization kernel (Schuster & Nakajima 2012; the BERT
  * tokenizer shape) — the THIRD learned-tokenizer family next to BPE and
  * unigram-LM: a plain vocabulary of pieces where every non-initial piece
  * carries the `##` continuation prefix, and each word is decoded by
  * GREEDY LONGEST-MATCH-FIRST (BERT's WordpieceTokenizer loop), not merge
  * replay (BPE) or a likelihood lattice (unigram).
  *
  * Shares the whole pre-tokenization contract with the other two families
  * ([[Bpe.preTokenize]]: Locale.ROOT lowercase, CJK/Thai character
  * isolation — which is itself BERT's `tokenize_chinese_chars` move —
  * `\s+` split), so all three families segment the same word stream and
  * their fertility numbers compare like-for-like.
  *
  * Determinism contract (shared with the trainer and the Verify replica):
  *  - match positions are CODE POINTS (surrogate pairs never split);
  *  - the longest vocabulary piece starting at the cursor wins; on no
  *    match at any cursor the WHOLE word becomes one `[UNK]` (BERT's
  *    is_bad contract — no partial emission);
  *  - words longer than [[Wordpiece.MaxWordCp]] code points become
  *    `[UNK]` without scanning (BERT's max_input_chars_per_word guard —
  *    the greedy scan is quadratic in word length, and a 10k-char
  *    unbroken token is a data artifact, not language).
  */
object Wordpiece {

  /** BERT's unknown-word sentinel; always id 0 in this engine's export. */
  val Unk = "[UNK]"

  /** BERT's continuation prefix for non-initial pieces. */
  val ContPrefix = "##"

  /** BERT's max_input_chars_per_word (default 100 in the published
    * tokenizer): longer words short-circuit to `[UNK]`.
    */
  val MaxWordCp = 100

  /** Serializable vocabulary. Lookup state (piece set, id map, the
    * per-thread word memo) rebuilds lazily on each executor, like
    * [[Bpe.Model]] / [[Unigram.Model]]. Piece at array position i is id
    * i (the trainer emits `[UNK]` at position 0); first occurrence wins
    * on a duplicate piece.
    */
  final class Model(val vocab: Array[String]) extends Serializable {

    @transient private lazy val pieceSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.length * 2)
      var i = 0
      while (i < vocab.length) { s.add(vocab(i)); i += 1 }
      s
    }

    @transient private lazy val idOf: java.util.HashMap[String, java.lang.Integer] = {
      val m = new java.util.HashMap[String, java.lang.Integer](vocab.length * 2)
      var i = 0
      while (i < vocab.length) {
        m.putIfAbsent(vocab(i), java.lang.Integer.valueOf(i))
        i += 1
      }
      m
    }

    /** Longest piece in code points, `##` prefix excluded — bounds the
      * backward match scan.
      */
    @transient private lazy val maxPieceCp: Int = {
      var mx = 1
      var i = 0
      while (i < vocab.length) {
        val p = vocab(i)
        val body = if (p.startsWith(ContPrefix)) p.substring(ContPrefix.length) else p
        val n = body.codePointCount(0, body.length)
        if (n > mx) mx = n
        i += 1
      }
      mx
    }

    /** Word→pieces memo — same Zipf argument as the BPE/unigram memos. */
    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
        override def initialValue(): java.util.LinkedHashMap[String, Array[String]] =
          new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 32768
          }
      }

    /** Greedy longest-match-first segmentation of one (already
      * lowercased) word — BERT's WordpieceTokenizer: at each cursor try
      * the longest candidate substring (with the `##` prefix when the
      * cursor is past the word start) and shrink until a vocabulary hit;
      * any cursor with no hit makes the whole word `[UNK]`.
      */
    def encodeWord(word: String): Array[String] = {
      val memo = cache.get()
      val hit = memo.get(word)
      if (hit != null) return hit
      val n = word.codePointCount(0, word.length)
      val result: Array[String] =
        if (n > MaxWordCp) Array(Unk)
        else {
          // code-point offsets: cp k spans chars off(k) until off(k+1)
          val off = new Array[Int](n + 1)
          var ci = 0
          var k = 0
          while (k < n) {
            off(k) = ci
            ci += Character.charCount(word.codePointAt(ci))
            k += 1
          }
          off(n) = word.length
          val out = new scala.collection.mutable.ArrayBuffer[String](4)
          var start = 0
          var bad = false
          while (start < n && !bad) {
            var end = math.min(n, start + maxPieceCp)
            var found: String = null
            while (found == null && end > start) {
              val body = word.substring(off(start), off(end))
              val cand = if (start > 0) ContPrefix + body else body
              if (pieceSet.contains(cand)) found = cand
              else end -= 1
            }
            if (found == null) bad = true
            else { out += found; start = end }
          }
          if (bad) Array(Unk) else out.toArray
        }
      memo.put(word, result)
      result
    }

    /** Pieces of a whole text: shared pre-tokenization, per-word greedy
      * match, concatenated. Returns Catalyst array data.
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

    /** Ids of a whole text: the same segmentation as [[encodeText]] with
      * each piece mapped through the position-is-id table; `[UNK]` rides
      * at position 0 by the trainer's construction, so unknown words map
      * to 0 like every vocab-file BERT checkpoint expects.
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

/** `wordpiece_encode(text, vocab)` — WordPiece pieces of `text` under the
  * trained vocabulary given as one constant string array (position = id).
  * Codegen'd: the model is a reference object on the generated class, so
  * the greedy match fuses into the corpus scan like `bpe_encode` /
  * `unigram_encode`; the per-thread word memo makes the steady-state cost
  * a hash probe per word.
  */
case class WordpieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires text input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val model = new Wordpiece.Model(vocab.toArray)

  override def nullSafeEval(v: Any): Any = model.encodeText(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("wordpieceModel", model, classOf[Wordpiece.Model].getName)
    defineCodeGen(ctx, ev, c => s"$m.encodeText($c.toString())")
  }

  override protected def withNewChildInternal(c: Expression): WordpieceEncode =
    copy(child = c)
}

/** `wordpiece_encode_ids(text, vocab)` — WordPiece id arrays (`array<int>`
  * per document, the training-stack handoff format): the same greedy
  * segmentation as [[WordpieceEncode]] with each piece mapped to its
  * vocabulary position (`[UNK]` = 0 by the trainer's export). Codegen'd
  * like the piece form.
  */
case class WordpieceEncodeIds(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode_ids requires text input, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wordpiece_encode_ids"

  @transient private lazy val model = new Wordpiece.Model(vocab.toArray)

  override def nullSafeEval(v: Any): Any = model.encodeTextIds(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("wordpieceModel", model, classOf[Wordpiece.Model].getName)
    defineCodeGen(ctx, ev, c => s"$m.encodeTextIds($c.toString())")
  }

  override protected def withNewChildInternal(c: Expression): WordpieceEncodeIds =
    copy(child = c)
}
