package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization kernels (Sennrich 2016 / GPT-2 shape).
  *
  * A [[Bpe.Model]] is an ordered merge list; encoding a word repeatedly
  * merges the adjacent symbol pair with the LOWEST merge rank until none
  * applies — equivalent to replaying the merges in training order, which
  * is how the training loop in `operators/Tokenizer` derives them.
  *
  * Determinism contract (shared with the training loop and the Verify
  * replica): lowercase via Locale.ROOT, whitespace pre-tokenization
  * (`\s+`), code-point symbol granularity (never splits surrogate
  * pairs), `</w>` as an explicit end-of-word symbol.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Space-free-script character class (BERT-style CJK isolation): Thai,
    * Hiragana/Katakana, Han (unified + ext A + compatibility). Text in
    * these scripts carries no whitespace word boundaries, so a pure
    * `\s+` split would hand the trainer one giant "word" per line;
    * isolating each such character (space on both sides, the WordPiece
    * `tokenize_chinese_chars` move) makes every character its own
    * pre-token — per-character tokens, the BERT convention for
    * space-free scripts — so histograms, token counts, and fertility
    * stay meaningful (character-frequency Zipf instead of one unique
    * giant word per document whose pair counts never reach the
    * training floor). BMP ranges only
    * (ext-B+ supplementary Han is vanishingly rare in web text and
    * would need surrogate-pair classes in every engine that shares
    * this spec).
    */
  val CjkCharClass: String =
    "[\\x{0e00}-\\x{0e7f}\\x{3040}-\\x{30ff}\\x{3400}-\\x{4dbf}" +
      "\\x{4e00}-\\x{9fff}\\x{f900}-\\x{faff}]"

  private val cjkPattern = java.util.regex.Pattern.compile(s"($CjkCharClass)")

  /** True if `c` can possibly need isolation — a cheap prefilter so the
    * regex pass only runs on rows that contain candidate characters
    * (everything below U+0E00, i.e. virtually all Latin/Cyrillic/Greek
    * text, skips it).
    */
  private def mayHaveCjk(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x0E00) return true
      i += 1
    }
    false
  }

  /** Shared pre-tokenization of the whole BPE stack (training histogram,
    * encode kernels, ids kernel, and — as the same spec re-stated — the
    * Verify replica): lowercase via Locale.ROOT, CJK/Thai character
    * isolation, `\s+` split. May return empty strings at the edges;
    * callers skip empties.
    */
  def preTokenize(text: String): Array[String] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val isolated =
      if (mayHaveCjk(lower)) cjkPattern.matcher(lower).replaceAll(" $1 ")
      else lower
    isolated.split("\\s+")
  }

  /** Inverse of encoding: concatenate tokens, turning each token's
    * trailing `</w>` marker into a word boundary. `decodeTokens(
    * encodeText(t))` equals the whitespace-normalized lowercased input:
    * every word's final token carries the `</w>` suffix, and the genuine
    * marker symbol never gains a right neighbor, so merge products end in
    * the marker only at word end. The one boundary (inherent to Sennrich-
    * style markers; byte-level BPE exists to avoid it): a corpus whose
    * raw text trains merges assembling a LITERAL `</w>` surface string
    * from `<`, `/`, `w`, `>` characters is ambiguous to any marker-based
    * decoder. Null elements poison the result to null, like every other
    * null-poisoned kernel here.
    */
  def decodeTokens(arr: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val t = arr.getUTF8String(i).toString
      if (t.endsWith(EndOfWord)) {
        sb.append(t, 0, t.length - EndOfWord.length)
        if (i < n - 1) sb.append(' ')
      } else sb.append(t)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Initial symbol sequence of a word: one symbol per code point, then
    * the end-of-word marker.
    */
  def initialSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.toArray
  }

  /** Serializable merge table. Encoding state (rank map, per-thread word
    * cache) rebuilds lazily on each executor.
    */
  final class Model(val lefts: Array[String], val rights: Array[String])
      extends Serializable {
    require(lefts.length == rights.length,
      s"merge table arity mismatch: ${lefts.length} lefts, ${rights.length} rights")

    // nested left -> (right -> rank): a flat concatenated-string key
    // would collide for pairs whose symbols contain the separator (text
    // CAN carry any code point, including NUL)
    @transient private lazy val rank: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
      val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]](lefts.length * 2)
      var i = 0
      while (i < lefts.length) {
        m.computeIfAbsent(lefts(i), _ => new java.util.HashMap[String, Integer]())
          .putIfAbsent(rights(i), Integer.valueOf(i))
        i += 1
      }
      m
    }

    /** Word→tokens memo: corpora repeat words heavily (Zipf), so the memo
      * turns the per-row cost into a hash probe for all but the first
      * sighting of each word on the thread. Access-ordered, bounded.
      */
    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
        override def initialValue(): java.util.LinkedHashMap[String, Array[String]] =
          new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 32768
          }
      }

    private def rankOf(a: String, b: String): Int = {
      val inner = rank.get(a)
      if (inner == null) return Int.MaxValue
      val r = inner.get(b)
      if (r == null) Int.MaxValue else r.intValue()
    }

    /** Tokens of one (already lowercased) word. */
    def encodeWord(word: String): Array[String] = {
      val memo = cache.get()
      val hit = memo.get(word)
      if (hit != null) return hit
      var syms = initialSymbols(word)
      var done = false
      while (!done && syms.length > 1) {
        // lowest-rank adjacent pair this round
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rankOf(syms(i), syms(i + 1))
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          // merge every occurrence of that pair, greedy left-to-right
          val l = lefts(best); val r = rights(best)
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              out += l + r
              j += 2
            } else {
              out += syms(j)
              j += 1
            }
          }
          syms = out.toArray
        }
      }
      memo.put(word, syms)
      syms
    }

    /** Tokens of a whole text: lowercase, CJK isolation, `\s+`-split,
      * per-word encode, concatenated ([[Bpe.preTokenize]]). Returns
      * Catalyst array data (UTF8String elements).
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
  }
}

/** `bpe_encode(text, lefts, rights)` — BPE tokens of `text` under the
  * merge table given as two aligned constant string arrays (the shape
  * `Tokenizer.bpeTrain` emits). Codegen'd: the model is attached to the
  * generated class as a reference object, so encoding fuses into the
  * corpus scan like the rest of the text stack; the per-thread word memo
  * makes the steady-state cost a hash probe per word.
  */
case class BpeEncode(child: Expression, lefts: Seq[String], rights: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode requires text input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val model = new Bpe.Model(lefts.toArray, rights.toArray)

  override def nullSafeEval(v: Any): Any = model.encodeText(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    defineCodeGen(ctx, ev, c => s"$m.encodeText($c.toString())")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}

object BpeIds {
  /** [[Bpe.Model]] plus a token → id table (the `Tokenizer.vocabulary`
    * export): encodes straight to the id arrays a training stack consumes.
    * Tokens outside the vocabulary — unseen code points at inference time
    * — emit `-1`, the documented UNK sentinel the consumer remaps.
    */
  final class IdModel(lefts: Array[String], rights: Array[String],
                      vocab: Array[String]) extends Serializable {
    private val model = new Bpe.Model(lefts, rights)
    @transient private lazy val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.length * 2)
      var i = 0
      while (i < vocab.length) { m.putIfAbsent(vocab(i), Integer.valueOf(i)); i += 1 }
      m
    }
    def encodeTextIds(text: String): GenericArrayData = {
      val words = Bpe.preTokenize(text)
      val out = new scala.collection.mutable.ArrayBuffer[Any](words.length * 2)
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) {
          val toks = model.encodeWord(words(i))
          var j = 0
          while (j < toks.length) {
            val id = ids.get(toks(j))
            out += (if (id == null) -1 else id.intValue())
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }
}

/** `bpe_encode_ids(text, lefts, rights, vocab)` — tokens of `text` as ids
  * into the vocabulary table (`Tokenizer.vocabulary` order), the handoff
  * format a training stack consumes. Unknown tokens emit -1 (UNK
  * sentinel). Codegen'd like `bpe_encode`, same per-thread word memo.
  */
case class BpeEncodeIds(child: Expression, lefts: Seq[String],
                        rights: Seq[String], vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode_ids requires text input, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  @transient private lazy val model =
    new BpeIds.IdModel(lefts.toArray, rights.toArray, vocab.toArray)

  override def nullSafeEval(v: Any): Any = model.encodeTextIds(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeIdModel", model, classOf[BpeIds.IdModel].getName)
    defineCodeGen(ctx, ev, c => s"$m.encodeTextIds($c.toString())")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeIds = copy(child = c)
}

/** `bpe_decode(tokens)` — inverse of `bpe_encode`: joins the token array
  * back into text, turning trailing `</w>` markers into word boundaries.
  * The handoff direction a training stack needs (detokenize samples,
  * round-trip audits); codegen'd so it fuses into the scan like encode.
  */
case class BpeDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode requires an array<string> of tokens, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode"
  // a null token ELEMENT null-poisons the result even when the array
  // itself is non-nullable — without this the optimizer could fold
  // IsNull(bpe_decode(...)) to false and mis-report a null value
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Bpe.decodeTokens(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // not defineCodeGen: decodeTokens returns null on a null token element,
    // which must set isNull rather than leak a null value
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Bpe.decodeTokens($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): BpeDecode = copy(child = c)
}
