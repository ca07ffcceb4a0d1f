package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `cassandra_token(key)` — the reference partitioner's token of a single
  * partition-key value (bigint/int/text/blob), bit-exact (see
  * [[CassandraMurmur3]]; reference `dht/Murmur3Partitioner.java:214-247`).
  *
  * Native codegen expression (not a UDF) so token-range predicates stay
  * inside whole-stage codegen — this is the hot path for emulating
  * token-range scans over a 100 TB table.
  */
case class CassandraToken(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | BinaryType | _: StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cassandra_token requires bigint/int/text/binary input, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "cassandra_token"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType    => CassandraMurmur3.tokenOfLong(v.asInstanceOf[Long])
    case IntegerType => CassandraMurmur3.tokenOfInt(v.asInstanceOf[Int])
    case _: StringType => CassandraMurmur3.tokenOfString(v.toString)
    case BinaryType  => CassandraMurmur3.tokenOfBytes(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case LongType      => s"graft.functions.CassandraMurmur3.tokenOfLong($c)"
      case IntegerType   => s"graft.functions.CassandraMurmur3.tokenOfInt($c)"
      case _: StringType => s"graft.functions.CassandraMurmur3.tokenOfString($c.toString())"
      case BinaryType    => s"graft.functions.CassandraMurmur3.tokenOfBytes($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): CassandraToken =
    copy(child = newChild)
}

/** `murmur64(str, seed)` — 64-bit murmur of a string with a seed; the base
  * hash for MinHash signatures and SimHash bit voting. Codegen'd.
  */
case class Murmur64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"murmur64 requires (string, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "murmur64"

  override def nullSafeEval(s: Any, seed: Any): Any =
    CassandraMurmur3.hashString(s.toString, seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, seed) =>
      s"graft.functions.CassandraMurmur3.hashString($s.toString(), $seed)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Murmur64 =
    copy(left = l, right = r)
}

/** `cosine_sim(a, b)` — cosine similarity of two float-array embeddings,
  * accumulated in double precision with a single sequential pass (ascending
  * index order) so results are deterministic and reproducible across engines.
  * Codegen'd; avoids the boxing that `functions.aggregate`/`zip_with` lambda
  * pipelines pay per element.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    VectorMath.cosineF(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.cosineF($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** `dot_product(a, b)` — double-precision dot product of float arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    VectorMath.dotF(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.dotF($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Tight-loop vector kernels shared by interpreted eval and codegen. */
object VectorMath {
  /** splitmix64 — deterministic pseudo-random stream for LSH hyperplanes. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long, Int), Array[Array[Double]]]()

  private def planes(bits: Int, seed: Long, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, seed, dim), _ =>
      Array.tabulate(bits, dim) { (b, d) =>
        // uniform in [-1, 1) from the splitmix stream
        splitmix64(seed * 0x100000001L + b.toLong * 65537L + d).toDouble / 9.223372036854776e18
      })

  def lshCode(emb: Array[Float], bits: Int, seed: Long): Long = {
    val ps = planes(bits, seed, emb.length)
    var code = 0L
    var b = 0
    while (b < bits) {
      val p = ps(b)
      var dot = 0.0
      var d = 0
      while (d < emb.length) { dot += p(d) * emb(d); d += 1 }
      if (dot >= 0.0) code |= (1L << b)
      b += 1
    }
    code
  }
  def dotF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def norm2F(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Distinct hashed-feature ids of a token array (first occurrence kept —
    * the array_distinct contract): pmod(murmur64(word, seed), dim).
    */
  def hashFeatures(words: org.apache.spark.sql.catalyst.util.ArrayData,
                   dim: Int, seed: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = words.numElements()
    val seen = new java.util.LinkedHashSet[Integer](n * 2)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      val h = CassandraMurmur3.hashString(w, seed)
      val m = (h % dim).toInt
      seen.add(if (m < 0) m + dim else m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().intValue(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Exact long margin: Σ w(f) over feature ids. */
  def fpMarginSum(fs: Array[Int], w: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < fs.length) { s += w(fs(i)); i += 1 }
    s
  }
}

/** `lsh_code(embedding, bits, seed)` — sign-random-projection (hyperplane)
  * LSH code: bit b of the result is set iff the dot product of the embedding
  * with pseudo-random hyperplane b (derived deterministically from the seed
  * via a splitmix64 stream) is >= 0. Deterministic across runs and engines;
  * codegen'd, with the plane matrix cached per (bits, seed, dim).
  */
case class LshCode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lsh_code requires (array<float>, int, bigint), got ($a, $b, $c)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_code"

  override def nullSafeEval(emb: Any, bits: Any, seed: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    VectorMath.lshCode(emb.asInstanceOf[ArrayData].toFloatArray(),
      bits.asInstanceOf[Int], seed.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, b, s) =>
      s"graft.functions.VectorMath.lshCode($e.toFloatArray(), $b, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshCode = copy(f, s, t)
}

/** `min_timeuuid(ms)` / `max_timeuuid(ms)` — boundary v1 UUIDs for timeuuid
  * range queries (reference `TimeFcts.java:69-91`, `UUIDGen.java:198-217`).
  */
case class MinTimeUuid(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"min_timeuuid requires bigint millis, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "min_timeuuid"
  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      TimeUuid.minTimeUuid(v.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.TimeUuid.minTimeUuid($c))")
  override protected def withNewChildInternal(c: Expression): MinTimeUuid = copy(c)
}

case class MaxTimeUuid(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"max_timeuuid requires bigint millis, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "max_timeuuid"
  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      TimeUuid.maxTimeUuid(v.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.TimeUuid.maxTimeUuid($c))")
  override protected def withNewChildInternal(c: Expression): MaxTimeUuid = copy(c)
}

/** `timeuuid_unix_millis(u)` — embedded unix millis of a v1 UUID (reference
  * `TimeFcts.java:97-142` dateOf/unixTimestampOf). Pair with the uuid string
  * for reference-faithful timeuuid ORDER BY.
  */
case class TimeUuidMillis(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"timeuuid_unix_millis requires uuid string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "timeuuid_unix_millis"
  override def nullSafeEval(v: Any): Any = TimeUuid.unixMillisOf(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TimeUuid.unixMillisOf($c.toString())")
  override protected def withNewChildInternal(c: Expression): TimeUuidMillis = copy(c)
}

/** `timeuuid_sort_key(u)` — 24-byte binary key whose unsigned-lexicographic
  * order equals the reference TimeUUIDType comparator (embedded 100ns time,
  * then unsigned uuid bytes — `db/marshal/TimeUUIDType.java:39-73`). Used
  * for clustering sorts and range predicates over timeuuid columns, where
  * uuid-string order would be wrong (time_low serializes first).
  */
case class TimeUuidSortKey(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"timeuuid_sort_key requires uuid string, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "timeuuid_sort_key"
  override def nullSafeEval(v: Any): Any = TimeUuid.sortKey(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TimeUuid.sortKey($c.toString())")
  override protected def withNewChildInternal(c: Expression): TimeUuidSortKey = copy(c)
}

/** Variadic `cassandra_token(pk1, pk2, ...)` for composite partition keys:
  * components serialized per the reference CompositeType layout
  * (2-byte length + bytes + 0x00 each) before hashing.
  */
case class CassandraTokenComposite(children: Seq[Expression])
    extends Expression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).find {
      case LongType | IntegerType | BinaryType | _: StringType => false
      case _ => true
    }
    bad match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"cassandra_token components must be bigint/int/text/binary, got $t")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cassandra_token"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val parts = new Array[Array[Byte]](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      parts(i) = children(i).dataType match {
        case LongType => CassandraMurmur3.serializeLong(v.asInstanceOf[Long])
        case IntegerType => CassandraMurmur3.serializeInt(v.asInstanceOf[Int])
        case _: StringType => v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case BinaryType => v.asInstanceOf[Array[Byte]]
      }
      i += 1
    }
    CassandraMurmur3.tokenOfComposite(parts.toSeq)
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CassandraTokenComposite = copy(children = cs)
}

/** `nfc_normalize(text)` — Unicode NFC normalization (canonical
  * decomposition + composition, java.text.Normalizer). Text pipelines
  * normalize BEFORE hashing/dedup so "é" and "e"+U+0301 — byte-different,
  * canonically equal — produce one dedup key and one vocabulary entry.
  * Codegen'd; scan-fused like the rest of the normalization chain.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize requires text input, got $t")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(v.toString, java.text.Normalizer.Form.NFC))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}

/** `java_lower(text)` — String.toLowerCase(Locale.ROOT). Spark 4's
  * `lower()` lowercases through ICU (spark.sql.icu.caseMappings.enabled
  * defaults true), whose tables differ from the JVM's for recent code
  * points (e.g. U+A7D0, U+10570) — so a pipeline whose driver-side
  * kernels lowercase with the JVM (BPE training replay, oracle
  * replicas) must lowercase the in-plan side with the SAME tables or
  * the two halves disagree on exotic scripts. Codegen'd, scan-fused.
  */
case class JavaLower(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"java_lower requires text input, got $t")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "java_lower"
  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      v.toString.toLowerCase(java.util.Locale.ROOT))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$c.toString().toLowerCase(java.util.Locale.ROOT))")
  override protected def withNewChildInternal(c: Expression): JavaLower = copy(c)
}

/** `hash_features(words, dim)` — distinct hashed-feature ids of a token
  * array: pmod(murmur64(w, QualityModel seed), dim) per word, first
  * occurrence kept (the `array_distinct(transform(...))` contract). The
  * higher-order transform/array_distinct pipeline it replaces is
  * CodegenFallback — interpreted per ROW with boxed lambdas — on the
  * classifier hot path (feature build + every scoring pass); this is one
  * codegen'd call into a tight loop. Bit-identical ids by construction
  * (same murmur, same pmod).
  */
case class HashFeatures(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_features requires array<string> input, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hash_features"
  override def nullSafeEval(v: Any): Any =
    VectorMath.hashFeatures(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], dim, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorMath.hashFeatures($c, $dim, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): HashFeatures =
    copy(child = c)
}

/** `fp_margin_sum(features, weightsFp)` — Σ weightsFp(f) over an
  * array<int> of feature ids against a CONSTANT scaled-long weight table:
  * the margin fold of the trained classifiers. Replaces an
  * ArrayAggregate/element_at fold (CodegenFallback, interpreted per row)
  * with one codegen'd call; the weight table ships once per task as a
  * reference object. Exact long addition — bit-identical sums.
  */
case class FpMarginSum(child: Expression, weightsFp: Seq[Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fp_margin_sum requires array<int> features, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "fp_margin_sum"
  @transient private lazy val w: Array[Long] = weightsFp.toArray
  override def nullSafeEval(v: Any): Any =
    VectorMath.fpMarginSum(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray(), w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("wfp", w, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorMath.fpMarginSum($c.toIntArray(), $wRef)")
  }
  override protected def withNewChildInternal(c: Expression): FpMarginSum =
    copy(child = c)
}

/** `strict_exp(x)` — StrictMath.exp. java.lang.Math.exp is only
  * quasi-deterministic: the JIT intrinsic and the interpreted fallback
  * may differ in the last ulp for the SAME input in the SAME JVM, which
  * is enough to break bit-reproducibility contracts (seen: one doc in
  * 500 scoring 1 ulp apart between a codegen'd plan and driver-side
  * Scala). StrictMath is fully specified (fdlibm), so results are
  * identical everywhere — the logistic-regression trainer's sigmoid
  * rides on this.
  */
case class StrictExp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"strict_exp requires double input, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "strict_exp"
  override def nullSafeEval(v: Any): Any = StrictMath.exp(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.StrictMath.exp($c)")
  override protected def withNewChildInternal(c: Expression): StrictExp = copy(c)
}

/** DEFLATE worker behind [[DeflateLen]]. The Deflater is native-backed and
  * expensive to construct, so one per thread is reused via reset() — at
  * scan speed the per-row cost is the compression itself, not allocation.
  * Level 6 (zlib default), nowrap (raw stream, no 11-byte zlib/gzip
  * framing skewing short texts). Output length for a given input is a
  * pure function of (input, level, strategy) for a given zlib build, so
  * results are deterministic across partitions and retries within a
  * deployment.
  */
object Deflate {
  // no explicit end(): since JDK 12 (JDK-8185582) Deflater releases its
  // native zlib state through an internal Cleaner once the instance is
  // unreachable, so a dying executor thread's value is reclaimed — the
  // ThreadLocal only pins native memory for LIVE threads (bounded by the
  // executor pool), not churned ones
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }
  def length(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = sink.get()
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    n
  }
}

/** `deflate_len(text)` — DEFLATE-compressed byte length of the UTF-8 text.
  * The compression-ratio quality signal (deflate_len / octet_length):
  * highly repetitive machine-generated text and template spam compress far
  * below natural prose, and near-random gibberish compresses above it —
  * the cheap single-pass complement to the Gopher repetition measures
  * (used as a doc-level filter in the Dolma/RedPajama pipelines).
  * Codegen'd so the signal fuses into the corpus scan.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires text or binary input, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case BinaryType => Deflate.length(v.asInstanceOf[Array[Byte]])
    case _ => Deflate.length(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case BinaryType => s"graft.functions.Deflate.length($c)"
      case _ => s"graft.functions.Deflate.length($c.getBytes())"
    })
  override protected def withNewChildInternal(c: Expression): DeflateLen = copy(c)
}
