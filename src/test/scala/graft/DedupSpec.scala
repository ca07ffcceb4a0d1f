package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf).cache()

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "a b c"), (2L, "A B C"), (3L, "x y z")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", "text").collect()
    assert(got.length === 2)
    val dupGroup = got.find(_.getLong(1) == 2L).get
    assert(dupGroup.getLong(2) === 1L) // canonical = min doc_id
  }

  test("ngram jaccard finds planted near-duplicates and only them") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty, "corpus should contain planted near-dups")
    // every reported pair really has jaccard >= 0.7 (self-check on a sample)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    def sh(t: String) = {
      val w = t.toLowerCase.split(" ")
      (if (w.length < 3) Array(w.mkString(" "))
       else w.sliding(3).map(_.mkString(" ")).toArray).toSet
    }
    pairs.take(10).foreach { case (a, b) =>
      val (sa, sb) = (sh(texts(a)), sh(texts(b)))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j >= 0.7 - 1e-9, s"pair ($a,$b) jaccard $j")
    }
  }

  test("minhash LSH reproduces the exact jaccard pair set at threshold 0.7") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
  }

  test("dupGroups labels connected components with the component minimum " +
    "(chains resolve transitively; singletons label themselves)") {
    // chain 1-2-3 (1-3 not directly paired), island 10-11, singleton 12
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.dupGroups(nodes, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 12L))
    // real corpus: endpoints of every pair share a group, and each group's
    // id is its own minimum member
    val corpusPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
    val labels = Dedup.dupGroups(docs.select("doc_id"), corpusPairs)
      .as[(Long, Long)].collect().toMap
    corpusPairs.select("a", "b").as[(Long, Long)].collect().foreach {
      case (a, b) => assert(labels(a) === labels(b), s"pair ($a,$b) split")
    }
    labels.groupBy(_._2).foreach { case (g, members) =>
      assert(members.keys.min === g, s"group $g is not its min member")
    }
    // refusing beats silently mis-splitting when rounds run out
    val ex = intercept[IllegalStateException] {
      Dedup.dupGroups(nodes, pairs, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("keepBestPerGroup works with STRING ids (host labels): winner id " +
    "survives intact, highest score wins, score ties break on lowest id") {
    val labels = Seq(("hostA", "g1"), ("hostB", "g1"), ("hostC", "g1"),
      ("solo", "g2"), ("tieB", "g3"), ("tieA", "g3"))
      .toDF("doc_id", "group_id")
    val scored = Seq(("hostA", 1.0), ("hostB", 9.0), ("hostC", 3.0),
      ("solo", 2.0), ("tieB", 5.0), ("tieA", 5.0))
      .toDF("doc_id", "score")
    val got = Dedup.keepBestPerGroup(labels, scored)
      .as[(String, String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "g1" -> (("hostB", 9.0, 3L)),
      "g2" -> (("solo", 2.0, 1L)),
      "g3" -> (("tieA", 5.0, 2L))))
  }

  test("keepBestPerGroup: null and NaN scores LOSE to any real one, the " +
    "emitted id/score always come from the SAME row (no frankenrows), " +
    "and a -Double.MaxValue score still beats null") {
    val labels = Seq(("a", "g1"), ("b", "g1"), ("nB", "g2"), ("nA", "g2"),
      ("nanDoc", "g3"), ("real", "g3"), ("worst", "g4"), ("none", "g4"),
      ("zInf", "g5"), ("aNull", "g5"))
      .toDF("doc_id", "group_id")
    val scored = Seq(("a", Option.empty[Double]), ("b", Some(5.0)),
      ("nB", Option.empty[Double]), ("nA", Option.empty[Double]),
      ("nanDoc", Some(Double.NaN)), ("real", Some(5.0)),
      ("worst", Some(-Double.MaxValue)), ("none", Option.empty[Double]),
      ("zInf", Some(Double.NegativeInfinity)), ("aNull", Option.empty[Double]))
      .toDF("doc_id", "score")
    val got = Dedup.keepBestPerGroup(labels, scored)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getLong(3)))).toMap
    assert(got === Map(
      "g1" -> (("b", Some(5.0), 2L)),            // null loses to scored
      "g2" -> (("nA", None, 2L)),                // all-null: lowest id, null score
      "g3" -> (("real", Some(5.0), 2L)),         // NaN loses; score is the WINNER's
      "g4" -> (("worst", Some(-Double.MaxValue), 2L)), // worst real beats null
      // -Infinity negates to +Inf — a finite sentinel would collide and
      // let the scoreless smaller id win; the null FLAG keeps it real
      "g5" -> (("zInf", Some(Double.NegativeInfinity), 2L))))
  }

  test("minhash_sig fused signatures are bit-identical to the exploded " +
    "minhash_agg aggregate") {
    val viaAgg = Dedup.minhashSignatures(
        Dedup.explodedShingles(docs, "doc_id", "text", 3), 64)
      .as[(Long, Seq[Long])].collect().toMap
    val fused = Dedup.minhashSignaturesFused(docs, "doc_id", "text", 3, 64)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused === viaAgg)
  }

  test("simhash_sig fused signatures are bit-identical to the exploded " +
    "simhash_agg aggregate (internal distinct included)") {
    val viaAgg = Dedup.simhashSignatures(
        Dedup.explodedShingles(docs, "doc_id", "text", 3))
      .as[(Long, Long)].collect().toMap
    val fused = Dedup.simhashSignaturesFused(docs, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(fused === viaAgg)
    // a doc with repeated shingles exercises the internal dedup: votes
    // must count each distinct shingle once, like explodedShingles does
    val rep = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val a = Dedup.simhashSignatures(
        Dedup.explodedShingles(rep, "doc_id", "text", 2))
      .as[(Long, Long)].collect().toMap
    val f = Dedup.simhashSignaturesFused(rep, "doc_id", "text", 2)
      .as[(Long, Long)].collect().toMap
    assert(f === a)
  }

  test("dupGroups pointer jumping: a 40-node chain converges in O(log d) " +
    "rounds, far under its diameter") {
    // path graph 0-1-...-39: one-hop propagation needs 39 rounds; path
    // halving must land every node on 0 within 10
    val nodes = (0L to 39L).toDF("doc_id")
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.dupGroups(nodes, pairs, maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 40 && got.values.forall(_ === 0L))
  }

  test("simhash finds the tight near-duplicates (hamming <= 3 subset)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", 3, 3, 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(sim.subsetOf(exact), "simhash pairs must be verified true pairs")
    assert(sim.nonEmpty, "simhash should catch the tightest dups")
  }

  test("chunking covers every word; chunks overlap by window - stride") {
    import org.apache.spark.sql.functions._
    val chunked = docs.select(col("doc_id"), lower(col("text")).as("t"),
        explode(graft.operators.TextAnalysis.chunks(col("text"), 32, 16)).as("c"))
      .select(col("doc_id"), col("t"), col("c.idx").as("idx"), col("c.chunk").as("chunk"))
    // chunk 0 is a prefix of the document for every doc
    val badPrefix = chunked.filter(col("idx") === 0)
      .filter(!col("t").startsWith(col("chunk"))).count()
    assert(badPrefix === 0L)
    // concatenating EVEN chunks (stride 16, window 32 → chunks 0,2,4 are
    // disjoint and contiguous) reconstructs the document
    val rebuilt = chunked.filter(col("idx") % 2 === 0)
      .groupBy("doc_id", "t")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("idx"), col("chunk"))))
        .getField("chunk")).as("joined"))
    assert(rebuilt.filter(concat_ws(" ", col("t")) =!= col("joined")).count() === 0L)
  }

  test("duplicatedSpans finds planted cross-doc substrings, merges overlaps, " +
      "and skips short docs") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ") // 10 shared tokens
    val df = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta"),
      (2L, s"one two three four $shared five six"),
      (3L, "totally unrelated text with no repeated windows here at all"),
      (4L, "short doc")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // the 10 shared tokens yield 7 four-token windows per doc, all
    // overlapping -> exactly ONE merged span per doc, token-exact:
    // doc 1: shared starts at token 3 (1-based) -> [3, 12]
    // doc 2: shared starts at token 5           -> [5, 14]
    assert(spans === Seq((1L, 3L, 12L, 7L), (2L, 5L, 14L, 7L)))

    // disjoint duplicated regions stay separate spans
    val df2 = Seq(
      (1L, "a b c d X Y Z p q r s"),
      (2L, "a b c d unrelated filler words p q r s")).toDF("doc_id", "text")
    val spans2 = Dedup.duplicatedSpans(df2, "doc_id", "text", 4)
      .filter($"doc_id" === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(spans2 === Seq((1L, 4L), (8L, 11L)))
  }

  test("removeDuplicatedSpans excises exactly the span tokens and keeps " +
    "everything else in order") {
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    val cleaned = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", 8)
      .as[(Long, String)].collect().toMap
    val original = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(cleaned.keySet === original.keySet)
    assert(spans.nonEmpty, "fixture corpus has duplicated spans")
    original.foreach { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1)
      val keep = toks.zipWithIndex.collect {
        case (t, ix) if !spans.getOrElse(id, Array.empty[(Long, Long)])
          .exists { case (s, e) => ix + 1 >= s && ix + 1 <= e } => t
      }
      assert(cleaned(id) === keep.mkString(" "), s"doc $id")
    }
  }

  test("crossCorpusNearDups reports only pairs straddling the sides, " +
      "oriented new -> corpus") {
    val newSide = docs.filter($"doc_id" % 2 === 1)
    val oldSide = docs.filter($"doc_id" % 2 === 0)
    val cross = Dedup.crossCorpusNearDups(newSide, oldSide, "doc_id", "text", 3, 0.7)
      .select("new_id", "corpus_id").as[(Long, Long)].collect()
    assert(cross.nonEmpty, "fixture corpus has cross-parity near-dups")
    assert(cross.forall { case (n, c) => n % 2 == 1 && c % 2 == 0 })
    // exactly the cross-parity subset of the full pair set
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("a", "b").as[(Long, Long)].collect()
      .filter { case (a, b) => a % 2 != b % 2 }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }.toSet
    assert(cross.toSet === full)
  }

  test("persistent LSH index: ingest against the saved index equals the " +
      "from-scratch cross-corpus pass, corpus text never rescanned") {
    val newSide = docs.filter($"doc_id" % 2 === 1)
    val oldSide = docs.filter($"doc_id" % 2 === 0)
    val expected = Dedup.crossCorpusNearDups(newSide, oldSide, "doc_id", "text", 3, 0.7)
      .as[(Long, Long, Double)].collect().toSet
    val idx = Dedup.lshIndexBuild(oldSide, "doc_id", "text", 3)
    val inMem = Dedup.ingestAgainstLshIndex(newSide, idx, "doc_id", "text", 3, 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(inMem === expected && inMem.nonEmpty)
    // save/load round-trip serves identically
    val dir = java.nio.file.Files.createTempDirectory("graft-lshidx").toString
    idx.save(dir)
    val loaded = Dedup.lshIndexLoad(spark, dir)
    val served = Dedup.ingestAgainstLshIndex(newSide, loaded, "doc_id", "text", 3, 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(served === expected)
    // the loaded-index ingest plan reads the crawl and the index parquet,
    // never the corpus text source
    val plan = Dedup.ingestAgainstLshIndex(newSide, loaded, "doc_id", "text", 3, 0.7)
      .queryExecution.executedPlan.toString
    assert(plan.contains(dir), plan.take(1500))
  }

  test("bloomIngestDedup equals the exact digest anti-join even when the " +
      "undersized sketch forces false positives") {
    val corpus = docs.filter($"doc_id" % 2 === 0).select("doc_id", "text")
    val crawl = docs.filter($"doc_id" % 4 === 0)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" % 2 === 1).select("doc_id", "text"))
    val expected = crawl.join(
        corpus.select(md5(lower($"text")).as("_d")).distinct(),
        md5(lower(crawl("text"))) === col("_d"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    // 4 bits/doc at fpp=0.5: a sketch this small false-positives heavily,
    // so the verification anti-join — not the sketch — carries exactness
    for ((items, fpp) <- Seq((5000L, 0.01), (10L, 0.5))) {
      val kept = Dedup.bloomIngestDedup(crawl, corpus, "doc_id", "text", items, fpp)
        .select("doc_id").as[Long].collect().sorted
      assert(kept === expected, s"items=$items fpp=$fpp")
    }
    // non-degenerate: every re-crawl dropped, every fresh page kept
    assert(expected.forall(id => id % 2 == 1))
    assert(expected.length === docs.filter($"doc_id" % 2 === 1).count())
  }

  test("winnowing is alignment-free: misaligned duplicated regions that a " +
      "strided explode misses are caught with the >= w+s-1 guarantee") {
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ") // 12 shared tokens
    // doc 1 places the region at token 3, doc 2 at token 4 — opposite
    // parities, so stride=2 windows NEVER land on a common fingerprint
    val df = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"one two three $shared four")).toDF("doc_id", "text")
    val strided = Dedup.duplicatedSpans(df, "doc_id", "text", 4, stride = 2)
    assert(strided.isEmpty, "stride misses misaligned duplicates by design")
    // winnowing selects by content, not offset: the 12-token region
    // (>= w+s-1 = 5) must surface in BOTH docs, within the planted bounds
    val spans = Dedup.winnowedSpans(df, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.map(_._1).toSet === Set(1L, 2L))
    val s1 = spans.filter(_._1 == 1L)
    assert(s1.forall(x => x._2 >= 3L && x._3 <= 14L), s1.toSeq.toString)
    val s2 = spans.filter(_._1 == 2L)
    assert(s2.forall(x => x._2 >= 4L && x._3 <= 15L), s2.toSeq.toString)
  }

  test("shingles clamp short documents to one shingle") {
    val df = Seq((1L, "only two")).toDF("doc_id", "text")
    val s = df.select(Dedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(s === Seq("only two"))
  }

  test("dedupSentences: over-frequency sentences vanish from every doc, " +
    "survivors rebuild in original order, all-boilerplate docs go empty") {
    graft.functions.Functions.ensure(spark)
    val boiler = "Subscribe now."
    val docs = Seq(
      (1L, s"Alpha beta. $boiler Gamma delta."),
      (2L, s"$boiler Epsilon zeta."),
      (3L, s"Eta theta. $boiler"),
      (4L, boiler)).toDF("doc_id", "text")
    val got = Dedup.dedupSentences(docs, "doc_id", "text", maxDocFreq = 2L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "Alpha beta. Gamma delta.", 2L, 1L),
      (2L, "Epsilon zeta.", 1L, 1L),
      (3L, "Eta theta.", 1L, 1L),
      (4L, "", 0L, 1L)))
    // below the cap nothing is touched
    val loose = Dedup.dedupSentences(docs, "doc_id", "text", maxDocFreq = 4L)
      .agg(sum(col("n_dropped"))).head().getLong(0)
    assert(loose === 0L)
  }
}
