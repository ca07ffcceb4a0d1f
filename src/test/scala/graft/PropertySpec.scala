package graft

import graft.cql.CqlParser
import graft.functions.{CassandraMurmur3, MinHashSig, SimHashSig, WinnowFps}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based hardening, pure JVM (expressions evaluated directly, no
  * Spark session): randomized inputs pin the native sketch expressions to
  * independent plain-Scala references and fuzz the CQL parser's failure
  * mode. Complements the fixture-based equivalence specs with coverage the
  * fixtures can't enumerate. Generators drive from a FIXED seed so a
  * failure reproduces deterministically.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sample loop (no scalatestplus bridge in the offline
    * cache): n samples from the generator, fixed seed, params varied per
    * index so sizes sweep small → large.
    */
  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default.withSize(1 + i % 40), Seed(0x5EED0L + i))
        .foreach(f)
    }

  private def strArray(ws: Seq[String]): ArrayData =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  private val wordGen = Gen.nonEmptyListOf(Gen.oneOf(
    "a", "b", "key", "row", "scan", "table", "value", "x", "yy", "zzz"))

  test("minhash_sig equals a plain-Scala minhash for random shingle lists") {
    forAllSamples(Gen.zip(wordGen, Gen.chooseNum(1, 64))) { case (ws, perms) =>
      val expr = MinHashSig(Literal.create(null, ArrayType(StringType)), perms)
      val got = expr.nullSafeEval(strArray(ws)).asInstanceOf[ArrayData].toLongArray()
      val ref = Array.fill(perms)(Long.MaxValue)
      ws.foreach { s =>
        val a = CassandraMurmur3.hashString(s, 1L)
        val b = CassandraMurmur3.hashString(s, 2L)
        (0 until perms).foreach { j =>
          val v = a + j * b // wrapping, matching the strength-reduced loop
          if (v < ref(j)) ref(j) = v
        }
      }
      assert(got.toSeq === ref.toSeq, s"ws=$ws perms=$perms")
    }
  }

  test("simhash_sig equals a plain-Scala distinct-vote simhash for random " +
    "shingle lists (duplicates never vote twice)") {
    forAllSamples(wordGen) { ws =>
      val expr = SimHashSig(Literal.create(null, ArrayType(StringType)))
      val got = expr.nullSafeEval(strArray(ws)).asInstanceOf[Long]
      val votes = new Array[Int](64)
      ws.distinct.foreach { s =>
        val hv = CassandraMurmur3.hashString(s, 0x51c0L)
        (0 until 64).foreach { j =>
          if (((hv >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        }
      }
      val ref = (0 until 64).foldLeft(0L) { (acc, j) =>
        if (votes(j) >= 0) acc | (1L << j) else acc
      }
      assert(got === ref, s"ws=$ws")
    }
  }

  test("winnow_fps selections are valid, increasing, and cover every " +
    "sliding group of s windows (the winnowing guarantee)") {
    val caseGen = Gen.zip(
      Gen.chooseNum(6, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf("p", "q", "r", "s"))),
      Gen.chooseNum(2, 4), Gen.chooseNum(1, 3))
    forAllSamples(caseGen) { case (toks, w, s) =>
      if (toks.size >= w + s - 1) {
        val expr = WinnowFps(Literal.create(null, ArrayType(StringType)), w, s)
        val out = expr.nullSafeEval(strArray(toks)).asInstanceOf[ArrayData]
        val selected = (0 until out.numElements()).map(i => out.getStruct(i, 2).getInt(0))
        val nWindows = toks.size - w + 1
        assert(selected.forall(p => p >= 1 && p <= nWindows), s"w=$w s=$s toks=$toks")
        assert(selected === selected.sorted.distinct, "strictly increasing")
        (1 to nWindows - s + 1).foreach { g =>
          assert(selected.exists(p => p >= g && p < g + s),
            s"group at $g uncovered (w=$w s=$s toks=$toks)")
        }
      }
    }
  }

  test("CQL parser never fails with anything but its own typed errors on " +
    "arbitrary input") {
    val junkGen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("SELECT", "FROM", "WHERE", "(", ")", "'", "''",
        "*", ",", ";", "INSERT", "INTO", "VALUES", "??", "0x", "[", "{",
        "}", "]", "::", "token", "IN", "AND", "1e", ".5", "-", "$$",
        "1.2.3", "99999999999999999999", "1e9999", "1h2x", "3mo", ":",
        "?", "0xzz", "e1", "now", "(", "system", ".", "CAST", "AS"))
        .map(_.mkString(" ")))
    forAllSamples(junkGen, n = 500) { s =>
      try { CqlParser.parse(s); () }
      catch {
        case _: CqlParser.ParseException => ()
        // anything else (StackOverflow, NPE, MatchError, IndexOOB) fails
      }
    }
  }

  test("$$-quoted strings round-trip arbitrary content through the lexer " +
    "(PG dollar quoting for UDF bodies — no escape processing inside)") {
    val bodyGen = Gen.asciiPrintableStr
      .map(_.replace("$$", "$").stripSuffix("$"))
    forAllSamples(bodyGen, n = 300) { body =>
      CqlParser.parse(
        s"CREATE FUNCTION ff (x int) CALLED ON NULL INPUT RETURNS int " +
          s"LANGUAGE spark AS $$$$$body$$$$") match {
        case f: graft.cql.Ast.CreateFunction => assert(f.body === body)
        case other => fail(s"unexpected statement $other")
      }
    }
  }

  test("freq_items_agg candidates contain every item above n/(k+1) for " +
    "random streams, random merge trees, and serialize round-trips") {
    import graft.functions.FreqItemsAgg
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    forAllSamples(Gen.zip(Gen.nonEmptyListOf(wordGen), Gen.chooseNum(1, 16)),
        n = 200) { case (streams, k) =>
      val agg = FreqItemsAgg(BoundReference(0, StringType, nullable = true), k)
      val bufs = streams.map { ws =>
        val b = agg.createAggregationBuffer()
        ws.foreach(w => agg.update(b, InternalRow(UTF8String.fromString(w))))
        b
      }
      // merge right-to-left through a serialize round-trip (the partial →
      // final path Spark drives); the guarantee must hold for any tree
      val merged = bufs.reduce((a, b) =>
        agg.merge(a, agg.deserialize(agg.serialize(b))))
      val cands = agg.eval(merged).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString).toSet
      assert(cands.size <= k)
      val all = streams.flatten
      val n = all.size
      all.groupBy(identity).foreach { case (w, occ) =>
        if (occ.size > n.toDouble / (k + 1))
          assert(cands.contains(w),
            s"item $w (count ${occ.size} of $n, k=$k) missing from $cands")
      }
    }
  }

  test("BPE: random corpora train deterministically; encoding always " +
    "reconstructs the word and replaying merges in rank order agrees " +
    "with the lowest-rank-first encoder") {
    import graft.functions.Bpe
    import graft.operators.Tokenizer
    // words over a tiny alphabet force heavy merge interaction; include a
    // multibyte char so code-point granularity is exercised
    val bpeWordGen = Gen.nonEmptyListOf(
      Gen.chooseNum(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "é")).map(_.mkString)))
    forAllSamples(Gen.zip(bpeWordGen, Gen.chooseNum(0, 12)), n = 200) {
      case (ws, nMerges) =>
        val hist = ws.groupMapReduce(identity)(_ => 1L)(_ + _).toSeq
        val merges = Tokenizer.trainOnHistogram(hist, nMerges)
        assert(merges === Tokenizer.trainOnHistogram(hist.reverse, nMerges))
        assert(merges.map(_.rank) === (1 to merges.size))
        val model = new Bpe.Model(merges.map(_.left).toArray, merges.map(_.right).toArray)
        ws.distinct.foreach { w =>
          val toks = model.encodeWord(w)
          // reconstruction invariant
          assert(toks.mkString === w + Bpe.EndOfWord, s"word $w -> ${toks.toSeq}")
          // sequential replay of the merge list (the training-side
          // formulation) must agree with the encoder's
          // lowest-rank-first loop
          var syms: List[String] = Bpe.initialSymbols(w).toList
          merges.foreach { m =>
            def apply(l: List[String]): List[String] = l match {
              case a :: b :: rest if a == m.left && b == m.right =>
                (a + b) :: apply(rest)
              case a :: rest => a :: apply(rest)
              case Nil => Nil
            }
            syms = apply(syms)
          }
          assert(toks.toSeq === syms, s"word $w: rank-replay $syms vs encoder ${toks.toSeq}")
        }
    }
  }
}
