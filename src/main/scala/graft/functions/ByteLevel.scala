package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE support (the GPT-2 / tiktoken tokenizer mode): text is
  * lowered to UTF-8 BYTES, each byte rendered as one printable BMP
  * character through the published GPT-2 `bytes_to_unicode` bijection, and
  * the ordinary merge machinery ([[Bpe.Model]]) runs over those
  * byte-characters. Properties the mode exists for:
  *
  *  - CASE-PRESERVING and normalization-free: unlike the char-level stack
  *    (which lowercases and CJK-isolates — [[Bpe.preTokenize]]), byte mode
  *    pre-tokenizes by `\s+` alone; every script, emoji, or binary-ish
  *    octet sequence is uniform bytes, so no script ever needs special
  *    casing.
  *  - ZERO UNK by construction: the 256 byte symbols seed the vocabulary,
  *    so every token an encoder can emit is in-vocabulary — the id stream
  *    is never lossy (the char-level stack's -1/`<unk>` sentinel cannot
  *    occur).
  *  - Exact round-trip: decode = concatenate tokens, `</w>` → space
  *    ([[Bpe.decodeTokens]], shared), then [[ByteLevel.unmap]] inverts the
  *    byte bijection — whitespace-normalized input restored byte-for-byte,
  *    case and all.
  *
  * The byte↔char table is re-stated from the public GPT-2 encoder spec
  * (printable bytes 33-126, 161-172, 174-255 map to their own code point;
  * the remaining 68 bytes map to 256+n in ascending byte order) — the
  * Verify replica derives it independently.
  */
object ByteLevel {

  /** GPT-2 `bytes_to_unicode`: a bijection byte → printable BMP char. */
  val byteToChar: Array[Char] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse table: mapped char → byte (-1 for chars outside the image). */
  private val charToByte: Array[Int] = {
    val out = Array.fill(512)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b)) = b; b += 1 }
    out
  }

  /** One word's UTF-8 bytes as mapped characters. */
  def mapWord(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Byte-mode pre-tokenization: `\s+` split only — no lowercase, no CJK
    * isolation (see class doc). May return empties at edges; callers skip.
    */
  def preTokenizeBytes(text: String): Array[String] = text.split("\\s+")

  /** Whole text → space-joined mapped pre-tokens (the training histogram
    * input; the space separator is unambiguous because byte 0x20 is
    * non-printable under the GPT-2 table and never appears as a mapped
    * char).
    */
  def remapText(text: String): String = {
    val words = preTokenizeBytes(text)
    val sb = new java.lang.StringBuilder(text.length * 2)
    var i = 0
    var first = true
    while (i < words.length) {
      if (words(i).nonEmpty) {
        if (!first) sb.append(' ')
        sb.append(mapWord(words(i)))
        first = false
      }
      i += 1
    }
    sb.toString
  }

  /** Inverse of the mapping over a decoded string (mapped chars plus the
    * space separators `Bpe.decodeTokens` re-inserts). A character outside
    * the byte image poisons the result to null — it cannot come from this
    * pipeline, and silently guessing bytes would corrupt the round-trip
    * guarantee.
    */
  def unmap(s: String): UTF8String = {
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') bytes.write(0x20)
      else {
        val b = if (c < 512) charToByte(c) else -1
        if (b < 0) return null
        bytes.write(b)
      }
      i += 1
    }
    UTF8String.fromBytes(bytes.toByteArray)
  }
}

/** `byte_remap(text)` — space-joined GPT-2 byte-mapped pre-tokens of
  * `text` (the byte-mode training-histogram input). Codegen'd scan work.
  */
case class ByteRemap(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_remap requires text input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "byte_remap"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(ByteLevel.remapText(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.ByteLevel.remapText($c.toString()))")
  override protected def withNewChildInternal(c: Expression): ByteRemap = copy(child = c)
}

/** `byte_unmap(text)` — inverse of the byte mapping over a decoded token
  * stream (mapped chars + word-boundary spaces) → the original raw text.
  * Null on characters outside the byte image (see [[ByteLevel.unmap]]).
  */
case class ByteUnmap(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_unmap requires text input, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "byte_unmap"
  override def nullSafeEval(v: Any): Any = ByteLevel.unmap(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.freshName("unmapped")
    nullSafeCodeGen(ctx, ev, c => s"""
      UTF8String $u = graft.functions.ByteLevel.unmap($c.toString());
      if ($u == null) { ${ev.isNull} = true; } else { ${ev.value} = $u; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): ByteUnmap = copy(child = c)
}

/** `bpe_encode_bytes(text, lefts, rights)` — byte-level BPE tokens: `\s+`
  * pre-tokenization (case-preserving), GPT-2 byte mapping per word, then
  * the shared merge-replay kernel ([[Bpe.Model]], memo keyed on the mapped
  * word). Codegen'd like the char-level form.
  */
case class BpeEncodeBytes(child: Expression, lefts: Seq[String], rights: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_bytes requires text input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_bytes"

  @transient private lazy val model = new Bpe.Model(lefts.toArray, rights.toArray)

  /** Non-private so the generated code can call it through the reference
    * object of [[model]]'s owner — expressed as a static helper instead:
    * kept on the case class for the interpreted path, with codegen routed
    * through [[BpeEncodeBytes.encodeText]].
    */
  override def nullSafeEval(v: Any): Any =
    BpeEncodeBytes.encodeText(model, v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeByteModel", model, classOf[Bpe.Model].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncodeBytes$$.MODULE$$.encodeText($m, $c.toString())")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeBytes =
    copy(child = c)
}

object BpeEncodeBytes {
  /** Shared by interpreted and generated paths: byte-mode pre-tokenize,
    * map, merge-replay, concatenate.
    */
  def encodeText(model: Bpe.Model, text: String): GenericArrayData = {
    val words = ByteLevel.preTokenizeBytes(text)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](words.length * 2)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val toks = model.encodeWord(ByteLevel.mapWord(words(i)))
        var j = 0
        while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
