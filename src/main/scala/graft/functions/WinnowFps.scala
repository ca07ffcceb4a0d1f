package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(tokens, w, s)` — one-pass winnowing fingerprint selection
  * (Schleimer et al. 2003): md5 every `w`-token window of `tokens`, then
  * keep only the LEFTMOST-minimum digest of each sliding group of `s`
  * consecutive window hashes (classic monotonic-deque sliding-window min,
  * O(n) total). Returns array<struct<pos:int, fp:binary>> with 1-based
  * window start positions — explode it for the (doc, window) relation.
  *
  * Semantics are IDENTICAL to the declarative formulation
  * `array_position(slice(hs,j,s), array_min(slice(hs,j,s)))` over
  * `hs = transform(…, md5(array_join(slice(tokens,i,w), " ")))`:
  *  - digests compare as unsigned bytes, which equals the lexicographic
  *    order of their hex strings (hex digits are ASCII-monotonic);
  *  - ties keep the earlier position (the deque pops only on strictly
  *    greater, so an equal earlier digest stays at the head), matching
  *    array_position's first-occurrence rule.
  * The declarative form is quadratic under Catalyst's projection collapse
  * (every lambda step re-inlines the whole hash-array expression — measured
  * 189 s vs 1.6 s at sf0.1); this expression hashes each window exactly
  * once and selects in one pass.
  */
case class WinnowFps(child: Expression, w: Int, s: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 2, s"window width must be >= 2 tokens, got $w")
  require(s >= 1, s"winnow window must be >= 1, got $s")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires array<string> tokens, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", BinaryType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnow_fps"

  /** Unsigned lexicographic byte compare (== hex-string lexicographic). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  // per-instance digest: expressions are deserialized per task, so access
  // is single-threaded; reset() between windows avoids the per-row JCA
  // provider lookup on this hot scan path
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // md5 of every w-token window, space-joined — byte-identical to
    // unhex(md5(array_join(slice(tokens, i, w), " "))), including
    // array_join's null rule: a null element is skipped together with its
    // delimiter (unreachable from split() tokens, kept for the contract)
    val fps = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      var written = false
      while (j < w) {
        val t = toks.getUTF8String(i + j)
        if (t != null) {
          if (written) md.update(' '.toByte)
          md.update(t.getBytes)
          written = true
        }
        j += 1
      }
      fps(i) = md.digest()
      i += 1
    }
    // sliding-window minimum over fps with window length min(s, m):
    // monotonic deque of indices; strict-greater pops keep the leftmost
    // of equal minima at the head
    val win = math.min(s, m)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail) valid
    val out = new scala.collection.mutable.ArrayBuffer[Any](m / math.max(win / 2, 1) + 2)
    var last = -1
    i = 0
    while (i < m) {
      while (tail > head && less(fps(i), fps(deque(tail - 1)))) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1 && deque(head) != last) {
        last = deque(head)
        out += InternalRow(last + 1, fps(last))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFps =
    copy(child = c)
}
