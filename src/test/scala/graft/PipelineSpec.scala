package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** Corpus-curation operators (operators/Pipeline.scala): deterministic
  * stratified sampling, benchmark decontamination, mixture weighting and
  * budget-chunked sequence packing.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")

  test("temperatureEpochs: α=1 is the identity, α=0 equalizes shares, " +
    "expected corpus mass is preserved") {
    val counts = Seq("a" -> 50L, "b" -> 30L, "c" -> 20L)
    val a1 = Pipeline.temperatureEpochs(counts, 1.0).toMap
    assert(a1.values.forall(v => math.abs(v - 1.0) < 1e-9))
    // α=0: every source converges to an equal N/K share → w_s = N/(K·n_s)
    val a0 = Pipeline.temperatureEpochs(counts, 0.0).toMap
    assert(math.abs(a0("a") - 100.0 / (3 * 50)) < 1e-6)
    assert(math.abs(a0("c") - 100.0 / (3 * 20)) < 1e-6)
    val a5 = Pipeline.temperatureEpochs(counts, 0.5).toMap
    // Σ w_s·n_s == N: temperature re-shapes the mix, it never grows it
    val mass = counts.map { case (s, n) => a5(s) * n }.sum
    assert(math.abs(mass - 100.0) < 1e-3)
    // the α curve: head source downweighted, tail upweighted, order kept
    assert(a5("a") < 1.0 && a5("c") > 1.0 && a5("a") < a5("b") && a5("b") < a5("c"))
  }

  test("hash-gate sampling is deterministic and nested: the 25% sample is " +
    "a subset of the 50% sample, rates track fractions") {
    val half = docs.filter(Pipeline.hashGate(col("doc_id"), 0.5))
      .select("doc_id").as[Long].collect().toSet
    val halfAgain = docs.filter(Pipeline.hashGate(col("doc_id"), 0.5))
      .select("doc_id").as[Long].collect().toSet
    val quarter = docs.filter(Pipeline.hashGate(col("doc_id"), 0.25))
      .select("doc_id").as[Long].collect().toSet
    assert(half === halfAgain) // no RNG state anywhere
    assert(quarter.subsetOf(half)) // gates nest: smaller fraction ⊂ larger
    val n = docs.count().toDouble
    assert(math.abs(half.size / n - 0.5) < 0.2)
    // fraction edge cases: 0 keeps nothing, 1 keeps everything
    assert(docs.filter(Pipeline.hashGate(col("doc_id"), 0.0)).count() === 0L)
    assert(docs.filter(Pipeline.hashGate(col("doc_id"), 1.0)).count() === docs.count())
  }

  test("weightedSample: p=0 drops all, p>=1 keeps all, higher p is a " +
      "superset, and dyadic constants agree exactly with hashGate") {
    assert(Pipeline.weightedSample(docs, col("doc_id"), lit(0.0)).isEmpty)
    assert(Pipeline.weightedSample(docs, col("doc_id"), lit(1.0)).count()
      === docs.count())
    val at25 = Pipeline.weightedSample(docs, col("doc_id"), lit(0.25))
      .select("doc_id").as[Long].collect().toSet
    val at50 = Pipeline.weightedSample(docs, col("doc_id"), lit(0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(at25.subsetOf(at50))
    // hashUniform < dyadic f inspects exactly the hex prefix hashGate
    // compares, so the two samplers select identical row sets
    val gate50 = docs.filter(Pipeline.hashGate(col("doc_id"), 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(at50 === gate50)
    // per-row p: quality-proportional keep rate sits strictly between
    // the all-drop and all-keep poles on the fixture corpus
    val q = graft.operators.TextAnalysis.qualityScore(col("text"))
    val kept = Pipeline.weightedSample(docs, col("doc_id"), q).count()
    assert(kept > 0 && kept < docs.count())
  }

  test("splitByHash partitions exhaustively, is stable under corpus " +
      "growth, and nests with hashGate samples") {
    val split = Pipeline.splitByHash(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.9), "test")
    val by = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(by.keySet === Set("train", "val", "test"))
    assert(by.values.sum === docs.count())
    assert(by("train") > by("val") && by("train") > by("test"))
    // a doc's split is a pure function of its id: the half-corpus
    // assignment agrees with the full-corpus one
    val full = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    Pipeline.splitByHash(docs.filter($"doc_id" % 2 === 0), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.9), "test")
      .select("doc_id", "split").as[(Long, String)].collect()
      .foreach { case (id, sp) => assert(full(id) === sp) }
    // the 50% hashGate sample keeps train/val/test membership intact
    val sampled = docs.filter(Pipeline.hashGate(col("doc_id"), 0.5))
    Pipeline.splitByHash(sampled, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.9), "test")
      .select("doc_id", "split").as[(Long, String)].collect()
      .foreach { case (id, sp) => assert(full(id) === sp) }
  }

  test("capTokenBudget keeps each stratum's maximal hash-ordered prefix " +
      "within budget") {
    val toks = graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
    val kept = Pipeline.capTokenBudget(docs, "source", col("doc_id"), toks, 800L)
    // every stratum stays within budget and is non-empty on this corpus
    val caps = kept.groupBy("source").agg(max("cum_tokens").as("mx"))
      .as[(String, Long)].collect()
    assert(caps.nonEmpty)
    caps.foreach { case (src, mx) => assert(mx <= 800L, src) }
    // prefix property: adding any dropped doc's tokens to its stratum's
    // total would cross the budget (the cut really is the maximal prefix)
    val u = Pipeline.hashUniform(col("doc_id"))
    val ordered = docs.select(col("source"), col("doc_id"), toks.as("tk"), u.as("u"))
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._4, r._2))).toMap
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    ordered.foreach { case (src, rows) =>
      var cum = 0L
      rows.foreach { case (_, id, tk, _) =>
        cum += tk
        assert(keptIds.contains(id) === (cum <= 800L), s"$src/$id")
      }
    }
  }

  test("stratified sampling applies per-stratum fractions and the default") {
    val sampled = Pipeline.stratifiedSample(docs, "source", col("doc_id"),
      Seq("src0" -> 1.0, "src1" -> 0.0), 0.5)
    val bySrc = sampled.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("src0") === totals("src0")) // fraction 1.0 keeps all
    assert(!bySrc.contains("src1")) // fraction 0.0 keeps none
  }

  test("decontaminate drops exactly the docs sharing a k-gram with the " +
    "benchmark, keeps the rest, and broadcasts the gram set") {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val clean = Pipeline.decontaminate(corpus, bench, "doc_id", "text", 3)
    val cleanIds = clean.select("doc_id").as[Long].collect().toSet
    val badIds = Pipeline.contaminatedIds(corpus, bench, "doc_id", "text", 3)
      .as[Long].collect().toSet
    val corpusIds = corpus.select("doc_id").as[Long].collect().toSet
    assert(cleanIds === (corpusIds -- badIds))
    assert(badIds.subsetOf(corpusIds))
    // independent recheck of one contaminated doc: it really shares a gram
    if (badIds.nonEmpty) {
      val one = badIds.head
      val benchGrams = graft.operators.Dedup
        .explodedShingles(bench, "doc_id", "text", 3)
        .select("s").as[String].collect().toSet
      val docGrams = graft.operators.Dedup
        .explodedShingles(corpus.filter(col("doc_id") === one), "doc_id", "text", 3)
        .select("s").as[String].collect().toSet
      assert(docGrams.intersect(benchGrams).nonEmpty)
    }
    // the corpus-side plan must not shuffle the corpus for the semi-join
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins in:\n$plan")
  }

  test("mixEpochs repeats sources by weight with 1-based epoch tags") {
    val mixed = Pipeline.mixEpochs(docs, "source", Seq("src0" -> 3, "src1" -> 2))
    val perEpoch = mixed.groupBy("epoch").count()
      .as[(Long, Long)].collect().toMap
    val totals = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val all = totals.values.sum
    assert(perEpoch(1L) === all) // every doc appears in epoch 1
    assert(perEpoch(2L) === totals("src0") + totals("src1"))
    assert(perEpoch(3L) === totals("src0"))
    assert(!perEpoch.contains(4L))
    assert(mixed.count() === all + totals("src0") * 2 + totals("src1"))
    // weight 0 drops the source entirely (not sequence(1,0) = [1,0])
    val dropped = Pipeline.mixEpochs(docs, "source", Seq("src0" -> 0))
    assert(dropped.filter(col("source") === "src0").count() === 0L)
    assert(dropped.count() === all - totals("src0"))
    intercept[IllegalArgumentException] {
      Pipeline.mixEpochs(docs, "source", Seq("src0" -> -1))
    }
  }

  test("mixEpochsFractional: integer weights reduce to mixEpochs; the " +
    "fractional epoch is the source's hash-gated sample") {
    val intFrac = Pipeline.mixEpochsFractional(docs, "source", col("doc_id"),
        Seq("src0" -> 3.0, "src1" -> 2.0))
      .select("doc_id", "source", "epoch").as[(Long, String, Long)].collect().toSet
    val intExact = Pipeline.mixEpochs(docs, "source",
        Seq("src0" -> 3, "src1" -> 2))
      .select("doc_id", "source", "epoch").as[(Long, String, Long)].collect().toSet
    assert(intFrac === intExact)

    val mixed = Pipeline.mixEpochsFractional(docs, "source", col("doc_id"),
      Seq("src0" -> 2.5, "src1" -> 0.25))
    val src0 = docs.filter(col("source") === "src0")
    val src1 = docs.filter(col("source") === "src1")
    // src0: epochs 1 and 2 hold every doc; epoch 3 holds exactly the
    // hashGate(0.5) subset
    val byEpoch = mixed.filter(col("source") === "src0")
      .groupBy("epoch").count().as[(Long, Long)].collect().toMap
    assert(byEpoch(1L) === src0.count() && byEpoch(2L) === src0.count())
    def mixKey = concat(lit("mix:"), col("doc_id").cast("string"))
    val gated0 = src0.filter(Pipeline.hashGate(mixKey, 0.5))
      .select("doc_id").as[Long].collect().toSet
    val epoch3 = mixed.filter(col("source") === "src0" && col("epoch") === 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(epoch3 === gated0 && !byEpoch.contains(4L))
    // the salted gate is decorrelated from the raw md5(id) variate the
    // samplers/splits use: after an upstream 0.5 stratified sample, the
    // 0.5 fractional epoch must NOT keep every survivor
    val rawGated0 = src0.filter(Pipeline.hashGate(col("doc_id"), 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(epoch3 !== rawGated0)
    assert((epoch3 & rawGated0).size < rawGated0.size)
    // src1 (weight < 1): only the gated sample survives, in epoch 1
    val gated1 = src1.filter(Pipeline.hashGate(mixKey, 0.25))
      .select("doc_id").as[Long].collect().toSet
    val src1Rows = mixed.filter(col("source") === "src1")
      .select("doc_id", "epoch").as[(Long, Long)].collect()
    assert(src1Rows.map(_._1).toSet === gated1 && src1Rows.forall(_._2 === 1L))
    // unlisted sources keep exactly one epoch
    val rest = mixed.filter(!col("source").isin("src0", "src1"))
    assert(rest.count() ===
      docs.filter(!col("source").isin("src0", "src1")).count())
    assert(rest.filter(col("epoch") =!= 1L).count() === 0L)
  }

  test("plan shapes: sampling and mixing are scan-fused (no exchange); " +
    "packing shuffles exactly once, on its partitioning column") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val sampled = Pipeline.stratifiedSample(docs, "source", col("doc_id"),
      Seq("src0" -> 0.5), 0.1)
    assert(!planOf(sampled).contains("Exchange"), planOf(sampled))
    val mixed = Pipeline.mixEpochs(docs, "source", Seq("src0" -> 2))
    assert(!planOf(mixed).contains("Exchange"), planOf(mixed))
    val mixedFrac = Pipeline.mixEpochsFractional(docs, "source", col("doc_id"),
      Seq("src0" -> 2.5))
    assert(!planOf(mixedFrac).contains("Exchange"), planOf(mixedFrac))
    val packed = Pipeline.packSequences(docs, "source", "doc_id", col("n_chars"), 2000L)
    assert("Exchange".r.findAllIn(planOf(packed)).size === 1, planOf(packed))
    // emission adds NO exchange: partitioning by source already co-locates
    // every (source, pack_id) group, so the agg reuses the window shuffle
    val emitted = Pipeline.emitPacked(packed, "source", "doc_id", "text")
    assert("Exchange".r.findAllIn(planOf(emitted)).size === 1, planOf(emitted))
  }

  test("materialized shuffle/shard: the variate projection checkpoints, " +
    "so the ranking window reads the checkpoint instead of re-scanning " +
    "the source — identical output either way") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val src = docs // parquet-backed
    val lazyOrd = Pipeline.shuffledOrdinal(src, col("doc_id"), seed = 5L)
    val matOrd = Pipeline.shuffledOrdinal(src, col("doc_id"), seed = 5L,
      materialize = true)
    // the lazy form's remaining plan re-scans parquet; the materialized
    // form's scan is the checkpoint RDD (source was read exactly once,
    // during the eager offsets pass)
    assert(planOf(lazyOrd).toLowerCase.contains("parquet"), planOf(lazyOrd))
    assert(!planOf(matOrd).toLowerCase.contains("parquet"), planOf(matOrd))
    assert(planOf(matOrd).contains("ExistingRDD") ||
      planOf(matOrd).contains("Scan ExistingRDD"), planOf(matOrd))
    val a = lazyOrd.select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = matOrd.select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq === b.toSeq)
    val lazySh = Pipeline.assignShardsByBudget(src, col("doc_id"), 5L,
      col("n_chars"), 4000L)
    val matSh = Pipeline.assignShardsByBudget(src, col("doc_id"), 5L,
      col("n_chars"), 4000L, materialize = true)
    assert(!planOf(matSh).toLowerCase.contains("parquet"), planOf(matSh))
    val c = lazySh.select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val e = matSh.select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(c.toSeq === e.toSeq)
  }

  test("contaminationReport frac>0 set equals contaminatedIds; fractions " +
      "bounded and grams counted distinct") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val report = Pipeline.contaminationReport(corpus, bench, "doc_id", "text", 3)
    val flagged = report.filter(col("frac") > 0)
      .select("doc_id").as[Long].collect().toSet
    val ids = Pipeline.contaminatedIds(corpus, bench, "doc_id", "text", 3)
      .as[Long].collect().toSet
    assert(flagged === ids)
    assert(report.filter(col("frac") < 0 || col("frac") > 1).isEmpty)
    assert(report.filter(col("n_contaminated") > col("n_grams")).isEmpty)
    assert(report.count() === corpus.count(), "one row per corpus doc")
  }

  test("tfidfTopTerms ranks corpus-distinctive terms above ubiquitous ones " +
      "and bounds output at k per doc") {
    graft.functions.Functions.ensure(spark)
    val df = Seq(
      (1L, "the quark the quark the boson"),
      (2L, "the boson the boson the lepton"),
      (3L, "the lepton the quark the gluon")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.tfidfTopTerms(df, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4))
    assert(got.count(_._1 == 1L) === 2)
    // "the" appears in every doc -> idf 0 -> never a top term; doc 1's top
    // term is quark (tf=2, df=2), doc 3's gluon (tf=1, df=1) beats
    // quark (tf=1, df=2) because ln(3/1) > ln(3/2)
    assert(got.filter(_._1 == 1L).head._2 === "quark")
    assert(got.filter(_._1 == 3L).head._2 === "gluon")
    assert(got.forall(_._2 != "the"))
    // score sanity: doc1 quark = 2 * ln(3/2)
    val expected = BigDecimal(2 * math.log(3.0 / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.filter(_._1 == 1L).head._3 === expected)
  }

  test("topNgrams counts corpus bigrams exactly, cuts at k with a " +
    "deterministic tie-break, and plans a bounded TakeOrdered") {
    import graft.operators.TextAnalysis
    val tiny = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "y")).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(tiny, "text", 2, 3)
      .as[(String, Long)].collect().toSeq
    // bigrams: doc1 {a b, b a, a b, b c}, doc2 {a b, b x}, doc3 none;
    // k=3 cut takes "b a","b c" from the cnt=1 tie group, drops "b x"
    assert(got === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
    val plan = TextAnalysis.topNgrams(docs, "text", 2, 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("heavyHitters returns exactly the >=threshold grams with exact " +
      "counts, under any partitioning and a tiny sketch") {
    import graft.operators.TextAnalysis
    graft.functions.Functions.ensure(spark)
    // 60 'hot pair' + 30 'warm pair' bigram occurrences drowned in noise
    val docsHh = (
      (1 to 60).map(i => (i.toLong, "hot pair")) ++
      (61 to 90).map(i => (i.toLong, "warm pair")) ++
      (91 to 290).map(i => (i.toLong, s"n${i} x${i % 7} m${i % 13}"))
    ).toDF("doc_id", "text")
    // n_total = 90 + 200*2 = 490; sketchK=48 → guarantee floor 490/49 = 10
    val exact = docsHh
      .select(explode(graft.operators.Dedup.shingles(col("text"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c")).filter(col("c") >= 30)
      .as[(String, Long)].collect().toSet
    for (parts <- Seq(1, 7)) {
      val got = TextAnalysis.heavyHitters(docsHh.repartition(parts), "text",
          n = 2, sketchK = 48, threshold = 30L)
        .as[(String, Long)].collect().toSet
      assert(got === exact, s"parts=$parts")
    }
  }

  test("q_vocab_heavy matches the full-aggregation answer") {
    import graft.operators.TextAnalysis
    val got = Queries.byName("q_vocab_heavy").impl(spark, sf)
      .as[(String, Long)].collect().toSeq
    val full = TextAnalysis.topNgrams(docs, "text", 2, Int.MaxValue)
      .filter(col("cnt") >= 40).as[(String, Long)].collect().toSeq
    assert(got === full)
  }

  test("emitPacked reassembles each source exactly: pack texts in pack " +
      "order concatenate to the docs in doc order, nothing lost") {
    val packed = Pipeline.packSequences(docs, "source", "doc_id",
      col("n_chars"), 2000)
    val emitted = Pipeline.emitPacked(packed, "source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(emitted.map(_._3).sum === docs.count())
    val reassembled = emitted.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._4).mkString(" ")).toMap
    val expected = docs.select("source", "doc_id", "text")
      .as[(String, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).mkString(" ")).toMap
    assert(reassembled === expected)
  }

  test("packSequences chunks by exclusive prefix sum within each group") {
    val df = Seq(
      ("a", 1L, 900L), ("a", 2L, 900L), ("a", 3L, 900L), ("a", 4L, 900L),
      ("b", 1L, 2500L), ("b", 2L, 100L)
    ).toDF("src", "id", "sz")
    val packed = Pipeline.packSequences(df, "src", "id", col("sz"), 2000L)
      .select("src", "id", "pack_id").as[(String, Long, Long)]
      .collect().toSet
    // a: exclusive prefix sums 0,900,1800,2700 → packs 0,0,0,1
    // b: 0,2500 → packs 0,1 (an oversized doc owns its pack and overflows it)
    assert(packed === Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 1L)))
    // pack ids are dense and non-decreasing in doc order within a group
    val ids = Pipeline.packSequences(docs, "source", "doc_id", col("n_chars"), 2000L)
      .groupBy("source").agg(max("pack_id").as("mx"), countDistinct("pack_id").as("n"))
      .as[(String, Long, Long)].collect()
    ids.foreach { case (_, mx, n) => assert(n === mx + 1) }
  }

  test("dsirLogRatio scores target-like docs above target-disjoint docs, " +
      "independent of partitioning") {
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta"),   // = target vocabulary
      (2L, "gamma delta gamma delta gamma delta"), // disjoint from target
      (3L, "alpha beta gamma delta alpha beta")    // mixed
    ).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") === 1L)
    def run(df: org.apache.spark.sql.DataFrame) =
      Pipeline.dsirLogRatio(df, target, "doc_id", "text", 16)
        .as[(Long, Double)].collect().sortBy(_._1)
    val got = run(corpus)
    assert(got(0)._2 > got(2)._2 && got(2)._2 > got(1)._2,
      s"expected target > mixed > disjoint, got $got")
    assert(got(0)._2 > 0 && got(1)._2 < 0)
    // decimal-summed fold: bit-identical under a different partitioning
    assert(run(corpus.repartition(7)).toSeq === got.toSeq)
  }

  test("q_dsir_select keeps a nonempty strict subset; keep == log_ratio > 0") {
    val r = Queries.byName("q_dsir_select").impl(spark, sf)
      .as[(Long, Double, Boolean)].collect()
    assert(r.exists(_._3) && r.exists(!_._3))
    r.foreach { case (_, lr, k) => assert(k === (lr > 0)) }
  }

  test("bm25TopK: tf raises, length normalization penalizes, non-matching " +
      "docs are absent, ranks are contiguous per query") {
    graft.functions.Functions.ensure(spark)
    val pad = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, "quark quark boson"),            // tf=2, short
      (2L, "quark boson lepton"),           // tf=1, short
      (3L, s"quark $pad"),                  // tf=1, long — length-normalized down
      (4L, "boson lepton gluon")            // no match for 'quark'
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq(7L -> Seq("quark")), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._4)
    assert(got.forall(_._1 === 7L))
    assert(got.map(_._2).toSet === Set(1L, 2L, 3L), "only matching docs surface")
    assert(got.map(_._4).toSeq === Seq(1, 2, 3), "contiguous ranks")
    assert(got(0)._2 === 1L, "tf=2 wins")
    assert(got(1)._2 === 2L, "short tf=1 beats long tf=1 (b-normalization)")
    assert(got(2)._2 === 3L)
    assert(got.forall(_._3 > 0.0))
  }

  test("fuzzyTermMatch: insertion/deletion/substitution hit at distance 1, " +
      "transpositions and distance-2 shapes are verified away") {
    graft.functions.Functions.ensure(spark)
    val docs = Seq((1L, "hash join scan merge"), (2L, "hash batch filter"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.fuzzyTermMatch(docs, "text",
      Seq("hash", "hxsh", "joinn", "scn", "mergee", "bacth", "zzz"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ("hash").map(x => (x._2, x._3, x._4)).toSet === Set(("hash", 0, 2L)))
    assert(byQ("hxsh").map(_._2).toSet === Set("hash"))   // substitution
    assert(byQ("joinn").map(_._2).toSet === Set("join"))  // insertion
    assert(byQ("scn").map(_._2).toSet === Set("scan"))    // deletion
    assert(byQ("mergee").map(_._2).toSet === Set("merge"))
    // 'bacth' is a TRANSPOSITION of 'batch' — classic Levenshtein distance
    // 2, so the deletion-join candidate must be verified away
    assert(!byQ.contains("bacth"))
    assert(!byQ.contains("zzz"))
    assert(got.forall(x => x._3 <= 1))
  }

  test("retrievalEval: hand-computed MRR/MAP/nDCG on a mixed run; perfect " +
      "and zero-relevant queries hit the boundary values") {
    // q0: run = [10,11,12,13], relevant = {11,13,99} (99 never retrieved)
    // q1: perfect run of its 3 relevant docs at k=3... (k shared = 4, so
    //     prec_k uses 4; q1 has exactly 3 relevant, all in top 3)
    // q2: nothing relevant
    val run = Seq(
      (0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3), (0L, 13L, 4),
      (1L, 20L, 1), (1L, 21L, 2), (1L, 22L, 3),
      (2L, 30L, 1), (2L, 31L, 2)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (0L, 11L), (0L, 13L), (0L, 99L),
      (1L, 20L), (1L, 21L), (1L, 22L)).toDF("query_id", "doc_id")
    val got = graft.operators.TextAnalysis.retrievalEval(run, qrels, 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    // q0 by hand: hits 2/4; first rel at rank 2; AP terms 1/2 + 2/4 over
    // min(3,4)=3; DCG micros 630930 (rank 2) + 430677 (rank 4); IDCG
    // micros 1000000 + 630930 + 500000
    val ndcg0 = BigDecimal((630930.0 + 430677.0) / 2130930.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L) === ((3L, 2L, 0.5, 0.666667, 0.5, 0.333333, ndcg0)))
    // q1: all 3 relevant retrieved at 1..3 -> recall/rr/ap/ndcg all 1
    assert(got(1L) === ((3L, 3L, 0.75, 1.0, 1.0, 1.0, 1.0)))
    // q2: no relevant docs -> all metrics 0
    assert(got(2L) === ((0L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("phraseSearch: consecutive positions only, overlapping occurrences " +
      "count, repeated phrase terms join their own posting list") {
    graft.functions.Functions.ensure(spark)
    val docs = Seq(
      (1L, "a b a b a"),   // 'a b a' matches at offsets 0 and 2
      (2L, "b a x a b"),   // contains a,b but never the phrase
      (3L, "x a b a y"))   // one match
      .toDF("doc_id", "text")
    val idx = graft.operators.TextAnalysis.positionalIndexBuild(
      docs, "doc_id", "text", buckets = 4)
    val got = graft.operators.TextAnalysis.phraseSearch(idx, Seq("a", "b", "a"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 3L -> 1L))
    // save/load round-trips bit-equal
    val dir = java.nio.file.Files.createTempDirectory("pos-idx").toString
    graft.operators.TextAnalysis.positionalIndexSave(idx, dir)
    val loaded = graft.operators.TextAnalysis.positionalIndexLoad(spark, dir)
    assert(loaded.buckets === 4)
    val got2 = graft.operators.TextAnalysis.phraseSearch(loaded, Seq("a", "b", "a"))
      .as[(Long, Long)].collect().toMap
    assert(got2 === got)
  }

  test("positionalIndexAppend: appended index answers phrase searches " +
      "identically to a from-scratch build of the union") {
    graft.functions.Functions.ensure(spark)
    val first = Seq((1L, "a b a"), (2L, "x a b")).toDF("doc_id", "text")
    val more = Seq((3L, "a b a b"), (4L, "b a")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pos-app").toString
    graft.operators.TextAnalysis.positionalIndexSave(
      graft.operators.TextAnalysis.positionalIndexBuild(
        first, "doc_id", "text", buckets = 4), dir)
    graft.operators.TextAnalysis.positionalIndexAppend(
      spark, dir, more, "doc_id", "text")
    val appended = graft.operators.TextAnalysis.phraseSearch(
        graft.operators.TextAnalysis.positionalIndexLoad(spark, dir),
        Seq("a", "b"))
      .as[(Long, Long)].collect().toMap
    val fresh = graft.operators.TextAnalysis.phraseSearch(
        graft.operators.TextAnalysis.positionalIndexBuild(
          first.unionByName(more), "doc_id", "text", buckets = 4),
        Seq("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(appended === fresh)
    assert(appended === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("bm25 persistent index: save/load search equals the from-scratch " +
      "search bit-for-bit; stats carry the bucket modulus") {
    graft.functions.Functions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val queries = Seq(0L -> Seq("hash", "join"), 1L -> Seq("fast", "scan"))
    val fresh = graft.operators.TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, 10)
      .collect().map(_.toSeq).toSet
    val dir = java.nio.file.Files.createTempDirectory("bm25-idx").toString
    graft.operators.TextAnalysis.bm25IndexBuild(docs, "doc_id", "text", buckets = 8)
      .save(dir)
    val idx = graft.operators.TextAnalysis.bm25IndexLoad(spark, dir)
    val viaIndex = graft.operators.TextAnalysis.bm25SearchIndex(idx, queries, 10)
      .collect().map(_.toSeq).toSet
    assert(viaIndex === fresh)
    assert(idx.stats.head().getAs[Int]("buckets") === 8)
  }

  test("bm25IndexMerge: two disjoint-shard indexes merge into one that " +
      "searches bit-equal to a from-scratch build of the union; bucket " +
      "modulus mismatch rejects") {
    graft.functions.Functions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val queries = Seq(0L -> Seq("hash", "join"), 1L -> Seq("fast", "scan"))
    val dirA = java.nio.file.Files.createTempDirectory("bm25-ma").toString
    val dirB = java.nio.file.Files.createTempDirectory("bm25-mb").toString
    val dirM = java.nio.file.Files.createTempDirectory("bm25-mm").toString
    graft.operators.TextAnalysis.bm25IndexBuild(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", buckets = 8).save(dirA)
    graft.operators.TextAnalysis.bm25IndexBuild(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", buckets = 8).save(dirB)
    graft.operators.TextAnalysis.bm25IndexMerge(spark, dirA, dirB, dirM)
    val idx = graft.operators.TextAnalysis.bm25IndexLoad(spark, dirM)
    val viaMerged = graft.operators.TextAnalysis.bm25SearchIndex(idx, queries, 10)
      .collect().map(_.toSeq).toSet
    val fresh = graft.operators.TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, 10)
      .collect().map(_.toSeq).toSet
    assert(viaMerged === fresh)
    val st = idx.stats.head()
    assert(st.getAs[Long]("n_docs") === docs.count())
    // df merged term-wise: no duplicate term rows survive the merge
    assert(idx.dfreq.groupBy("term").count().filter(col("count") > 1).count() === 0)
    val dirC = java.nio.file.Files.createTempDirectory("bm25-mc").toString
    graft.operators.TextAnalysis.bm25IndexBuild(
      docs.limit(10), "doc_id", "text", buckets = 4).save(dirC)
    val ex = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.bm25IndexMerge(spark, dirA, dirC,
        java.nio.file.Files.createTempDirectory("bm25-mx").toString)
    }
    assert(ex.getMessage.contains("bucket moduli differ"))
  }

  test("sentenceSplit: terminal punctuation + whitespace bounds, inner " +
      "periods stay, no-terminal text is one sentence, empties drop") {
    graft.functions.Functions.ensure(spark)
    val df = Seq(
      (1L, "A b. C d! E? F"),
      (2L, "pi is 3.14 exactly"),
      (3L, "x.  y.\t z."),
      (4L, ""),
      (5L, "...")).toDF("id", "text")
    val got = df.select(col("id"),
        graft.operators.TextAnalysis.sentenceSplit(col("text")).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("A b.", "C d!", "E?", "F"))
    assert(got(2L) === Seq("pi is 3.14 exactly"), "3.14 has no space after the dot")
    assert(got(3L) === Seq("x.", "y.", "z."))
    assert(got(4L) === Seq.empty)
    assert(got(5L) === Seq("..."))
  }

  test("ngramNovelty complements contaminationReport: n_novel + " +
      "n_contaminated = n_grams on identical inputs; all-seen scores 0, " +
      "all-new scores 1") {
    graft.functions.Functions.ensure(spark)
    val ref = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma"),          // both grams seen → novelty 0
      (2L, "zeta eta theta iota"),       // nothing seen → novelty 1
      (3L, "alpha beta zeta eta")).toDF("doc_id", "text") // 1 of 3? check below
    val nov = Pipeline.ngramNovelty(corpus, ref, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(nov(1L)._2 === 0L && nov(1L)._3 === 0.0)
    assert(nov(2L)._2 === nov(2L)._1 && nov(2L)._3 === 1.0)
    // cross-check against the broadcast-path contamination fraction
    val cont = Pipeline.contaminationReport(corpus, ref, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "n_contaminated")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    nov.foreach { case (id, (ng, nn, _)) =>
      assert(cont(id)._1 === ng)
      assert(cont(id)._2 + nn === ng, s"doc $id")
    }
  }

  test("gateAtKeepRate: threshold is the exact (1-rate) percentile, " +
      "rate 1.0 keeps everything, survivors all clear the threshold") {
    graft.functions.Functions.ensure(spark)
    val kept = graft.operators.Quality.gateAtKeepRate(
      docs.select("doc_id", "n_chars"), "n_chars", 0.25)
    val thr = kept.select("thr").head().getDouble(0)
    val want = docs.agg(expr("round(percentile(n_chars, 0.75D), 6)"))
      .head().getDouble(0)
    assert(thr === want)
    val n = docs.count()
    val k = kept.count()
    assert(k >= n / 4 - 1 && k <= n / 2, s"kept $k of $n")
    assert(kept.filter(col("n_chars") < col("thr")).count() === 0)
    assert(graft.operators.Quality.gateAtKeepRate(
      docs.select("doc_id", "n_chars"), "n_chars", 1.0).count() === n)
  }

  test("positionalIndexMerge: merged shard indexes answer phrase and " +
      "proximity searches identically to a from-scratch union build; " +
      "modulus mismatch rejects") {
    graft.functions.Functions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val dirA = java.nio.file.Files.createTempDirectory("pos-ma").toString
    val dirB = java.nio.file.Files.createTempDirectory("pos-mb").toString
    val dirM = java.nio.file.Files.createTempDirectory("pos-mm").toString
    graft.operators.TextAnalysis.positionalIndexSave(
      graft.operators.TextAnalysis.positionalIndexBuild(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", buckets = 8), dirA)
    graft.operators.TextAnalysis.positionalIndexSave(
      graft.operators.TextAnalysis.positionalIndexBuild(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", buckets = 8), dirB)
    graft.operators.TextAnalysis.positionalIndexMerge(spark, dirA, dirB, dirM)
    val merged = graft.operators.TextAnalysis.positionalIndexLoad(spark, dirM)
    val fresh = graft.operators.TextAnalysis.positionalIndexBuild(
      docs, "doc_id", "text", buckets = 8)
    val phrase = Seq("slow", "hash", "batch")
    assert(graft.operators.TextAnalysis.phraseSearch(merged, phrase)
      .collect().map(_.toSeq).toSet ===
      graft.operators.TextAnalysis.phraseSearch(fresh, phrase)
        .collect().map(_.toSeq).toSet)
    assert(graft.operators.TextAnalysis.proximitySearch(merged, "slow", "batch", 4)
      .collect().map(_.toSeq).toSet ===
      graft.operators.TextAnalysis.proximitySearch(fresh, "slow", "batch", 4)
        .collect().map(_.toSeq).toSet)
    val dirC = java.nio.file.Files.createTempDirectory("pos-mc").toString
    graft.operators.TextAnalysis.positionalIndexSave(
      graft.operators.TextAnalysis.positionalIndexBuild(
        docs.limit(5), "doc_id", "text", buckets = 4), dirC)
    val ex = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.positionalIndexMerge(spark, dirA, dirC,
        java.nio.file.Files.createTempDirectory("pos-mx").toString)
    }
    assert(ex.getMessage.contains("bucket moduli differ"))
  }

  test("collocationsPruned: with topVocab covering the whole vocabulary " +
      "it equals the unpruned miner; a tight cut keeps only head-term pairs") {
    graft.functions.Functions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val full = graft.operators.TextAnalysis.collocations(docs, "doc_id", "text",
      window = 3, minCount = 3L, k = 15).collect().map(_.toSeq).toSeq
    val vocabSize = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").select("w").distinct().count().toInt
    val unprunedEquiv = graft.operators.TextAnalysis.collocationsPruned(docs, "doc_id", "text",
      window = 3, minCount = 3L, k = 15, topVocab = vocabSize)
      .collect().map(_.toSeq).toSeq
    assert(unprunedEquiv === full,
      "a cut covering the whole vocabulary must be the identity")
    // a tight cut: every surfaced term is within the top-5 unigram set
    val top5 = docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(5)
      .select("w").as[String].collect().toSet
    val pruned = graft.operators.TextAnalysis.collocationsPruned(docs, "doc_id", "text",
      window = 3, minCount = 1L, k = 50, topVocab = 5)
      .select("term_a", "term_b").as[(String, String)].collect()
    assert(pruned.nonEmpty)
    assert(pruned.forall(p => top5.contains(p._1) && top5.contains(p._2)))
  }

  test("vocabCoverage: OOV tokens are exactly the eval words under the " +
      "train-frequency floor; rates are exact quotients") {
    graft.functions.Functions.ensure(spark)
    val train = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "alpha beta  beta")).toDF("doc_id", "text")
    // vocab at minFreq 2: alpha (3), beta (3); gamma (1) drops
    val eval = Seq(
      (10L, "alpha beta gamma delta"), // 2 OOV of 4
      (11L, "alpha alpha"),            // 0 OOV
      (12L, "zeta")).toDF("doc_id", "text") // 1 OOV of 1
    val got = graft.operators.TextAnalysis
      .vocabCoverage(train, eval, "doc_id", "text", minFreq = 2L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((10L, 4L, 2L, 0.5), (11L, 2L, 0L, 0.0),
      (12L, 1L, 1L, 1.0)))
  }

  test("bm25IndexAppend: incrementally appended index searches bit-equal " +
      "to a from-scratch search over the union corpus") {
    graft.functions.Functions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val queries = Seq(0L -> Seq("hash", "join"), 1L -> Seq("fast", "scan"))
    val dir = java.nio.file.Files.createTempDirectory("bm25-app").toString
    graft.operators.TextAnalysis.bm25IndexBuild(
      docs.filter(col("doc_id") < 200), "doc_id", "text", buckets = 8).save(dir)
    graft.operators.TextAnalysis.bm25IndexAppend(spark, dir,
      docs.filter(col("doc_id") >= 200), "doc_id", "text")
    val idx = graft.operators.TextAnalysis.bm25IndexLoad(spark, dir)
    val viaIndex = graft.operators.TextAnalysis.bm25SearchIndex(idx, queries, 10)
      .collect().map(_.toSeq).toSet
    val fresh = graft.operators.TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, 10)
      .collect().map(_.toSeq).toSet
    assert(viaIndex === fresh)
    // stats carry exact integer sums for the union
    val st = idx.stats.head()
    assert(st.getAs[Long]("n_docs") === docs.count())
  }

  test("rrfFuse: 1/(60+rank) sums are exact, single-list ids keep one " +
      "contribution, ties break id-ascending") {
    graft.functions.Functions.ensure(spark)
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 11L, 1), (0L, 13L, 2)).toDF("query_id", "doc_id", "rank")
    val got = graft.operators.TextAnalysis.rrfFuse(a, b, "query_id", "doc_id", "rank", 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    // 11: 1/62 + 1/61 (both lists) — the winner; 10: 1/61; 13: 1/62; 12: 1/63
    assert(got.map(_._1).toSeq === Seq(11L, 10L, 13L, 12L))
    assert(got(0)._2 === 1.0 / 62 + 1.0 / 61)
    assert(got(1)._2 === 1.0 / 61)
    assert(got(2)._2 === 1.0 / 62)
    assert(got(3)._2 === 1.0 / 63)
    // equal contributions tie-break on id: two single-list ids at the same
    // rank order ascending
    val a2 = Seq((0L, 5L, 1)).toDF("query_id", "doc_id", "rank")
    val b2 = Seq((0L, 3L, 1)).toDF("query_id", "doc_id", "rank")
    val tied = graft.operators.TextAnalysis.rrfFuse(a2, b2, "query_id", "doc_id", "rank", 10)
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    assert(tied.map(_._1).toSeq === Seq(3L, 5L))
  }

  test("emitPackedIds: ids concatenate in doc order; boundaries are every " +
    "doc's start offset plus the total; multi-pack budgets split correctly") {
    val df = Seq((1L, "s", Seq(1, 2, 3)), (2L, "s", Seq(4, 5)), (3L, "s", Seq(6)),
        (4L, "t", Seq(7, 8)))
      .toDF("doc_id", "source", "ids")
      .withColumn("n", size(col("ids")).cast("long"))
    val one = Pipeline.emitPackedIds(
        Pipeline.packSequences(df, "source", "doc_id", col("n"), 100),
        "source", "doc_id", "ids")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3), r.getSeq[Int](4))).sortBy(r => (r._1, r._2))
    assert(one === Array(
      ("s", 0L, 3L, Seq(1, 2, 3, 4, 5, 6), Seq(0, 3, 5, 6)),
      ("t", 0L, 1L, Seq(7, 8), Seq(0, 2))))
    // budget 3: doc 1 fills pack 0 exactly; docs 2+3 go to pack 1
    val split = Pipeline.emitPackedIds(
        Pipeline.packSequences(df.filter(col("source") === "s"),
          "source", "doc_id", col("n"), 3),
        "source", "doc_id", "ids")
      .collect().map(r => (r.getLong(1), r.getSeq[Int](3), r.getSeq[Int](4)))
      .sortBy(_._1)
    assert(split === Array(
      (0L, Seq(1, 2, 3), Seq(0, 3)), (1L, Seq(4, 5, 6), Seq(0, 2, 3))))
  }

  test("hardNegatives: every positive pair is excluded (not just top-1), " +
    "survivors re-rank densely from 1 in score order") {
    import graft.operators.TextAnalysis
    graft.functions.Functions.ensure(spark)
    val corpus = Seq(
      (1L, "spark hash join plan"), (2L, "hash join hash join"),
      (3L, "hash table scan"), (4L, "join order optimizer"),
      (5L, "filter pushdown rule"), (6L, "hash partition shuffle"))
      .toDF("doc_id", "text")
    val qs = Seq(0L -> Seq("hash", "join"))
    // positives are NOT the top hits: ids 3 and 4 from the middle
    val pos = Seq((0L, 3L), (0L, 4L)).toDF("query_id", "doc_id")
    val got = TextAnalysis.hardNegatives(corpus, "doc_id", "text", qs, pos,
        k = 6, kneg = 3)
      .orderBy("neg_rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length === 3)
    assert(!got.map(_._1).toSet.exists(Set(3L, 4L)), "positives must be excluded")
    assert(got.map(_._3).toSeq === Seq(1, 2, 3), "dense re-rank from 1")
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted.reverse,
      "negatives ordered by descending score")
    // and they really are the 3 best non-positive candidates
    val full = TextAnalysis.bm25TopK(corpus, "doc_id", "text", qs, 6)
      .orderBy("rank").collect().map(_.getLong(1)).filterNot(Set(3L, 4L)).take(3)
    assert(got.map(_._1).toSeq === full.toSeq)
  }

  test("shuffledOrdinal and assignShardsByBudget handle negative and " +
    "sparse keys against the MessageDigest reference") {
    val keys = Seq(-987654321L, -5L, 0L, 3L, 7777777777L, 42L,
      Long.MinValue / 2, 999999999999L)
    val df = keys.map(k => (k, 3L + math.floorMod(k, 5))).toDF("id", "n")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val orderRef = keys.sortBy(k => (md5hex(s"11:$k"), k))
    val pos = Pipeline.shuffledOrdinal(df, col("id"), 11, buckets = 4)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos === orderRef.zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap)
    var cum = 0L
    val shardRef = orderRef.map { k =>
      val n = 3L + math.floorMod(k, 5)
      val s = cum / 7
      cum += n
      k -> s
    }.toMap
    val got = Pipeline.assignShardsByBudget(df, col("id"), 11, col("n"), 7,
        buckets = 4)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === shardRef)
  }

  test("shuffledOrdinal: positions are the dense 0..n-1 ordinal of the " +
    "seeded md5 order, independent of bucket count and partitioning") {
    val df = (1L to 500L).map(i => (i, s"t$i")).toDF("id", "payload")
    def posMap(buckets: Int, parts: Int) =
      Pipeline.shuffledOrdinal(df.repartition(parts), col("id"), 42, buckets)
        .select("id", "pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = posMap(256, 8)
    // dense permutation of 0..499
    assert(got.values.toSeq.sorted === (0L until 500L))
    // matches the single-partition reference order
    val ref = (1L to 500L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .zipWithIndex.map { case (i, p) => i -> p.toLong }.toMap
    assert(got === ref)
    // bucket count and input partitioning do not change the answer
    assert(posMap(7, 3) === ref)
    assert(posMap(65536, 1) === ref)
    // a different seed is a different permutation
    val other = Pipeline.shuffledOrdinal(df, col("id"), 43)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other !== ref)
  }

  test("sharded corpus save/append: existing rows never re-shard, the " +
    "append tops up the last partial shard, manifest and meta reconcile " +
    "after every batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shardtest").toString
    val b1 = (1L to 60L).map(i => (i, 10L + (i % 5))).toDF("id", "n")
    val b2 = (61L to 100L).map(i => (i, 10L + (i % 5))).toDF("id", "n")
    Pipeline.saveShardedCorpus(b1, col("id"), 9, col("n"), 100, dir)
    val before = spark.read.parquet(s"$dir/data")
      .select(col("id"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t1 = spark.read.parquet(s"$dir/meta").select("total_tokens")
      .head().getLong(0)
    assert(t1 === (1L to 60L).map(i => 10L + (i % 5)).sum)
    Pipeline.appendShardedCorpus(spark, dir, b2, col("id"), col("n"))
    val after = spark.read.parquet(s"$dir/data")
      .select(col("id"), col("n"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // batch-1 rows keep their assignment bit-for-bit (no rewrite)
    assert(after.filter(_._1 <= 60).map(r => r._1 -> r._3).toMap === before)
    // batch 2 continues the token line: its first doc lands in the shard
    // the cumulative position t1 falls into (topping up the partial one)
    val minB2Shard = after.filter(_._1 > 60).map(_._3).min
    assert(minB2Shard === t1 / 100)
    // manifest reconciles exactly with the doc-level truth
    val m = spark.read.parquet(s"$dir/manifest")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val truth = after.groupBy(_._3).map { case (s, rs) =>
      s -> (rs.length.toLong, rs.map(_._2).sum) }
    assert(m === truth)
    // meta's token line advanced to the full corpus total
    val t2 = spark.read.parquet(s"$dir/meta").select("total_tokens")
      .head().getLong(0)
    assert(t2 === after.map(_._2).sum)
    // shard ids are dense 0..max
    assert(m.keySet === (0L to m.keySet.max).toSet)
  }

  test("assignShardsByBudget: shards cover the shuffled order in budget " +
    "chunks; manifest totals reconcile exactly with the corpus") {
    val df = (1L to 300L).map(i => (i, 10L + (i % 7))).toDF("id", "n")
    val assigned = Pipeline.assignShardsByBudget(df, col("id"), 7, col("n"), 100)
    val rows = assigned.select("id", "n", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: cumulative next-fit over the seeded order
    val order = (1L to 300L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString, i))
    var cum = 0L
    val ref = order.map { i =>
      val n = 10L + (i % 7)
      val s = cum / 100
      cum += n
      i -> s
    }.toMap
    assert(rows.map(r => r._1 -> r._3).toMap === ref)
    // shard ids are dense from 0 and weakly increasing along the order
    val shardsInOrder = order.map(ref)
    assert(shardsInOrder.head === 0L)
    assert(shardsInOrder.sliding(2).forall(p => p(1) - p(0) >= 0 && p(1) - p(0) <= 1))
    // manifest reconciles: Σ n_docs == corpus rows, Σ n_tokens == Σ n
    val m = Pipeline.shardManifest(assigned, col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.map(_._2).sum === 300L)
    assert(m.map(_._3).sum === rows.map(_._2).sum)
    // every shard but possibly the last holds >= the budget's floor of docs
    // only in aggregate: each full shard's tokens reach the budget once its
    // straddling doc lands (overflow by at most one doc => tokens < budget + max n)
    val lastShard = m.map(_._1).max
    m.filter(_._1 != lastShard).foreach { case (_, _, toks) =>
      assert(toks >= 100 - 16 && toks <= 100 + 16,
        s"full shard tokens $toks should sit within one doc of the budget")
    }
  }

  test("corpusDrift: shares per side, one-sided groups report zero on the " +
      "other, delta is the abs rounded-share gap") {
    val a = Seq("en", "en", "en", "de").toDF("lang")
    val b = Seq("en", "fr").toDF("lang")
    val got = graft.operators.Pipeline.corpusDrift(a, b, "lang")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") === (("en", 3L, 1L, 0.75, 0.5, 0.25)))
    assert(got("de") === (("de", 1L, 0L, 0.25, 0.0, 0.25)))
    assert(got("fr") === (("fr", 0L, 1L, 0.0, 0.5, 0.5)))
  }

  test("collocations: a planted always-adjacent pair scores its " +
    "closed-form PMI; the min-count floor drops rare pairs") {
    import graft.operators.TextAnalysis
    // 'zig zag' always adjacent (10 co-occurrences, each term only in the
    // pair); filler terms are frequent but combinatorially mixed
    val fillers = Seq("red", "blue", "green", "gray", "cyan", "pink", "teal")
    val docs = (0 until 10).map { i =>
      (i.toLong, s"zig zag ${fillers((2 * i) % 7)} ${fillers((3 * i + 1) % 7)} " +
        s"${fillers((5 * i + 2) % 7)} ${fillers((i + 3) % 7)}")
    }.toDF("doc_id", "text")
    val top = TextAnalysis.collocations(docs, "doc_id", "text",
        window = 2, minCount = 5L, k = 10)
      .select("term_a", "term_b", "n_ab", "pmi")
      .as[(String, String, Long, Double)].collect()
    val zz = top.find(r => r._1 == "zag" && r._2 == "zig")
      .getOrElse(fail(s"planted pair missing: ${top.toSeq}"))
    assert(zz._3 === 10L, "zig/zag co-occur once per doc")
    // closed-form re-derivation from the planted corpus: an independent
    // count of pairs/tokens through the operator's own PMI formula
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).toSeq
    val m = words.size.toDouble
    val perDoc = docs.as[(Long, String)].collect().map(_._2.split(" "))
    val allPairs = perDoc.flatMap { w =>
      for {
        i <- w.indices
        o <- 1 to 2
        if i + o < w.length && w(i) != w(i + o)
      } yield (Seq(w(i), w(i + o)).min, Seq(w(i), w(i + o)).max)
    }
    val t = allPairs.length.toDouble
    val nZig = words.count(_ == "zig").toDouble
    val nZag = words.count(_ == "zag").toDouble
    val expected = BigDecimal(math.log(10.0) + 2 * math.log(m) -
        math.log(t) - math.log(nZig) - math.log(nZag))
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(zz._4 - expected) < 2e-6,
      s"pmi ${zz._4} != closed form $expected")
    // a pair occurring fewer than minCount times never surfaces
    val floored = TextAnalysis.collocations(docs, "doc_id", "text",
        window = 2, minCount = 11L, k = 5)
    assert(floored.count() === 0)
  }

  test("weightedReservoir: exactly k per group, dominant weights rank " +
    "first, nonpositive weights never sample, global form bounds + ranks") {
    val df = Seq(
      (1L, "a", 1e9), (2L, "a", 1e-9), (3L, "a", 1e-9), (4L, "a", 0.0),
      (5L, "b", 1.0)
    ).toDF("id", "g", "w")
    val grouped = Pipeline.weightedReservoir(df, "id", col("w"), 2, Seq("g"))
      .select("g", "id", "rn").as[(String, Long, Int)].collect()
    assert(grouped.count(_._1 == "a") === 2)
    assert(grouped.count(_._1 == "b") === 1, "exact size = min(k, |group|)")
    assert(grouped.find(r => r._1 == "a" && r._3 == 1).get._2 === 1L,
      "the 1e9-weight row must win rank 1 (ln(u)/w ≈ 0 beats huge negatives)")
    assert(!grouped.exists(_._2 == 4L), "w = 0 must never sample")
    val global = Pipeline.weightedReservoir(df, "id", col("w"), 3)
    assert(global.count() === 3)
    val g1 = global.select("id", "rn").as[(Long, Int)].collect()
      .find(_._2 == 1).get._1
    assert(g1 === 1L)
  }
}
