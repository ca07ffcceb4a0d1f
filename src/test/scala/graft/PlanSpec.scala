package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast, partial aggregation) are asserted so
  * a refactor can't silently trade them away.
  */
class PlanSpec extends SparkSpec {

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  test("single-partition read pushes the key filter into the parquet scan") {
    val p = plan("q_single_partition")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]"), p)
  }

  test("column pruning reaches the scan (no over-read)") {
    val p = plan("q_partition_in")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("multiway join broadcasts dimensions, never cartesian") {
    val p = plan("q_join_multiway")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"), p)
  }

  test("group-by aggregates partially before the shuffle") {
    val p = plan("q_group_pk_prefix")
    // partial + final HashAggregate pair around a single exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange"), p)
  }

  test("tuple-relation DNF pushes the leading column range to the scan") {
    val p = plan("q_multicol_tuple")
    assert(p.contains("PushedFilters: [Or(GreaterThan(l_orderkey,5)"), p)
  }

  test("top-k compiles to TakeOrderedAndProject (no full sort)") {
    val p = plan("q_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ANN brute force broadcasts the query side") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("PQ re-rank tail broadcasts the bounded candidate set — the corpus " +
    "is never shuffled for the exact re-score") {
    val p = plan("q_ann_pq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("SQ8 re-rank: queries broadcast over the code scan, candidates " +
    "broadcast for the exact tail, corpus never sort-merge shuffled") {
    val p = plan("q_ann_sq8")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("PCA search: projection fuses into both scans (pca_project, no " +
    "shuffle to transform), the reduced-space search broadcasts the " +
    "query side, corpus never sort-merge shuffled") {
    val p = plan("q_ann_pca")
    assert(p.contains("pca_project"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("IVF drift stats: broadcast assignment, one bounded aggregation, " +
    "no corpus join") {
    val p = plan("q_ann_ivf_drift")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("composed-index drift stats (IVF-SQ8 / IVF-PQ / IVF-OPQ): the " +
    "assignment and fidelity signals fuse into one scan — broadcast/" +
    "literal assignment, one bounded aggregation, never a corpus join") {
    Seq("q_ann_ivf_sq8_drift", "q_ann_ivfpq_drift", "q_ann_ivf_opq_drift")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("SortMergeJoin"), s"$q: $p")
        assert(!p.contains("CartesianProduct"), s"$q: $p")
        assert(p.contains("HashAggregate"), s"$q: $p")
      }
  }

  test("radius-2 fuzzy match: variant equi-join with a broadcast query " +
    "table, never a vocabulary cross join") {
    val p = plan("q_fuzzy_match2")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("html extraction is one scan-fused projection: no hash shuffle, " +
    "no join, only the oracle-ordering range exchange") {
    val p = plan("q_html_extract")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("container/document tiers: MP4 metadata and markdown extraction " +
    "are map-only (no join, no aggregate); the MP4 gate and PDF stats " +
    "aggregate once without any join") {
    Seq("q_multimodal_mp4", "q_mp4_fragmented", "q_markdown_extract",
        "q_pdf_extract", "q_archive_entries", "q_archive_text").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
        !p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
        s"$q:\n$p")
    }
    // the gate and stats rows fold in ONE keyed aggregation (hash or
    // sort form) — the producer rides the page rows in q_pdf_stats, so
    // the former parse-twice-and-join shape must not regress back in
    Seq("q_mp4_gate", "q_pdf_stats").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
        !p.contains("CartesianProduct"), s"$q:\n$p")
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
        s"$q:\n$p")
    }
  }

  test("r16 tiers: DOCX/ASS/Ogg/WebP/TIFF/WebM/AVIF extraction paths are " +
    "map-only — no join, no aggregate, payloads never shuffle") {
    Seq("q_docx_extract", "q_subtitles_ass", "q_audio_ogg_meta",
        "q_webp_meta", "q_multimodal_webp", "q_multimodal_tiff",
        "q_webm_meta", "q_avif_meta", "q_multimodal_webp_video").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
        !p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
        s"$q:\n$p")
    }
  }

  test("BPE-token packing: counts fuse into the scan, one window " +
    "shuffle on the partitioning column, no join") {
    val p = plan("q_pack_bpe")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    // the encode rides the scan — no extra hash-partitioned exchange
    // beyond the window's own partitioning
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH candidate shuffles carry ids only, embeddings cross once") {
    // the chunk join + candidate distinct must NOT shuffle array<float>
    // payloads (they'd duplicate bands×); only the single embedding re-join
    // may move vectors
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val df = SparkEntry.queries("q_ann_lsh")(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case s: ShuffleExchangeExec => Seq(s)
      }.flatten
    val withArrays = shuffles(df.queryExecution.executedPlan)
      .filter(_.output.exists(_.dataType == ArrayType(FloatType)))
    assert(withArrays.size <= 1,
      s"expected at most one embedding-carrying shuffle, got ${withArrays.size}")
  }

  test("KN trigram scorer: key joins only (no cartesian), totals ride a " +
    "1-row broadcast, the scan reads just (doc_id, text)") {
    val p = plan("q_quality_kn_lp")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // pruning reaches the source — the parquet scan when cold, or the
    // column-pruned InMemoryTableScan when another suite cached documents
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>")
      || ("InMemoryTableScan\\s+Output \\[2\\]: \\[doc_id#\\d+L, text#\\d+\\]".r
        .findFirstIn(p).isDefined), p)
  }

  test("sessionize is ONE hash shuffle: both windows and the per-session " +
    "aggregate reuse the user_id partitioning") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    val df = SparkEntry.queries("q_sessionize")(spark, sf)
    df.collect()
    // AQE wraps finalized stages in QueryStageExec leaves (Result/Shuffle)
    // that plain collect() does not descend into
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case q: QueryStageExec => shuffles(q.plan)
        case s: ShuffleExchangeExec => Seq(s)
      }.flatten
    val sh = shuffles(df.queryExecution.executedPlan)
    val hash = sh.filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
    // one hashpartitioning(user_id) moves the events; anything else is the
    // oracle-determinism orderBy (range) — never a second data shuffle
    assert(hash.size === 1, s"expected 1 hash shuffle, got ${hash.size}:\n$sh")
    assert(sh.filterNot(hash.contains)
      .forall(_.outputPartitioning.isInstanceOf[RangePartitioning]), sh.toString)
  }

  test("exact ngram-jaccard candidates come from a DF-bounded group, " +
    "never a raw shingle self-join") {
    // a hot boilerplate shingle must cost a bounded aggregation buffer,
    // not a quadratic join fan-out: the plan groups shingles through the
    // bounded topk_rows_agg (+ df cutoff) and the only joins are the
    // candidate-id semi-join and the two per-side verify joins
    val df = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    // the final plan stops at the candidate checkpoint boundary, so the
    // candidate pipeline is inspected pre-checkpoint (like the minhash
    // guard below): the bounded aggregate, no shingle self-join
    val candPlan = graft.operators.Dedup.ngramCandidates(
        graft.operators.Dedup.explodedShingles(
          graft.Tables.documents(spark, sf), "doc_id", "text", 3), 5000)
      .queryExecution.explainString(FormattedMode)
    assert(candPlan.contains("topk_rows_agg"),
      "candidate doc lists must go through the bounded aggregate:\n" + candPlan.take(2000))
    assert(!candPlan.contains("SortMergeJoin"),
      "no shingle sort-merge self-join:\n" + candPlan.take(2000))
    assert(!candPlan.contains("collect_list") && !candPlan.contains("collect_set"),
      "no unbounded per-shingle collection:\n" + candPlan.take(2000))
    // and the verify tail never re-joins raw shingle rows
    assert(!p.contains("SortMergeJoin"), "no shingle sort-merge self-join:\n" + p.take(2000))
    assert(!p.contains("collect_list") && !p.contains("collect_set"),
      "no unbounded per-shingle collection:\n" + p.take(2000))
    // and the cutoff preserves the exact result on this corpus
    val legacy = {
      import org.apache.spark.sql.functions._
      val sh = graft.operators.Dedup.explodedShingles(
        graft.Tables.documents(spark, sf), "doc_id", "text", 3)
      val pairs = sh.as("x").join(sh.as("y"),
          col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("c"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      pairs
        .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
        .select(col("a"), col("b"),
          round(col("c") * lit(1.0) / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
    }
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = legacy.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want, "DF-bounded path must reproduce the exact pair set")
  }

  test("minhash signature shuffle carries sketch buffers, never shingle lists") {
    // the round-3 shape: no corpus-wide persist, no collect_list of
    // shingles through the exchange — every shuffle either moves the
    // fixed-width signature or id/band keys
    spark.catalog.clearCache() // other suites may have cached source tables
    val df = SparkEntry.queries("q_dedup_minhash_lsh")(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("collect_list"), "no collect_list anywhere in the minhash plan")
    assert(!p.contains("InMemoryTableScan"), "no persisted corpus table in the minhash plan")
    // the final plan stops at the candidate checkpoint boundary (Scan
    // ExistingRDD), so ALSO inspect the pre-checkpoint sketch pipeline the
    // operator builds internally: signatures must be scan-fused (zero
    // exchanges — the minhash_sig expression, not an explode + aggregate)
    // and the candidate stage must not collect shingle lists either
    val docs = graft.Tables.documents(spark, sf)
    val sigs = graft.operators.Dedup
      .minhashSignaturesFused(docs, "doc_id", "text", 3, 64)
    val sigPlan = sigs.queryExecution.explainString(FormattedMode)
    assert(!sigPlan.contains("Exchange"),
      "fused signatures must not shuffle:\n" + sigPlan.take(2000))
    assert(sigPlan.contains("minhash_sig"), sigPlan.take(2000))
    val sketch = graft.operators.Dedup.lshCandidates(
      graft.operators.Dedup.lshBuckets(sigs, 16, 4))
    val sketchPlan = sketch.queryExecution.explainString(FormattedMode)
    assert(!sketchPlan.contains("collect_list"),
      "no shingle lists through the candidate exchange")
    assert(!sketchPlan.contains("InMemoryTableScan"),
      "no persisted corpus in the candidate pipeline")
  }

  test("engine-path inventory queries read bulk data from parquet segments, not a driver tail") {
    // the graded q_cql_* queries run with storage attached: bulkInsert must
    // land as distributed parquet segments and the read plan must scan those
    // files — a LocalTableScan of the bulk rows would mean the data went
    // through the driver (the storage-less fallback)
    val df = SparkEntry.queries("q_cql_group")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("Scan parquet"), p.take(2000))
    assert(!p.contains("LocalTableScan"),
      "bulk rows must not round-trip through the driver:\n" + p.take(2000))
  }

  test("index-served engine query reads durable segments, not the driver") {
    // q_cql_index: entries() index serves m[k]=v without ALLOW FILTERING;
    // the data must come off parquet segment files (distributed sink), not
    // a LocalTableScan of driver-collected rows
    val df = SparkEntry.queries("q_cql_index")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("Scan parquet"), p.take(2000))
    assert(!p.contains("LocalTableScan"),
      "index-served read must come off durable segments:\n" + p.take(2000))
  }

  test("IVF probe prunes the inverted-list scan to the probed cid partitions") {
    // the graded q_ann_ivf runs train → save → load → probe: the lists scan
    // must carry a PartitionFilters entry on cid (directory-level pruning —
    // at 100 TB a probe reads nprobe/nlist of the index, not all of it)
    val df = SparkEntry.queries("q_ann_ivf")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    val pruned = "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p)
    assert(pruned.nonEmpty, {
      val i = math.max(0, p.indexOf("PartitionFilters"))
      "probe scan must prune on cid:\n" + p.slice(math.max(0, i - 500), i + 200)
    })
  }

  test("IVF-PQ probe prunes the code-table scan to the probed cid partitions") {
    // same contract as the IVF guard: a probe reads nprobe/nlist of the
    // CODES, which are themselves 32× smaller than the float corpus
    val df = SparkEntry.queries("q_ann_ivfpq")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    val pruned = "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p)
    assert(pruned.nonEmpty, {
      val i = math.max(0, p.indexOf("PartitionFilters"))
      "codes scan must prune on cid:\n" + p.slice(math.max(0, i - 500), i + 200)
    })
  }

  test("IVF-SQ8 probe prunes the code-table scan to the probed cid partitions") {
    // the IndexIVFScalarQuantizer composition: a probe reads nprobe/nlist
    // of the 4×-compressed codes — directory-level pruning like IVF/IVF-PQ
    val df = SparkEntry.queries("q_ann_ivf_sq8")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    val pruned = "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p)
    assert(pruned.nonEmpty, {
      val i = math.max(0, p.indexOf("PartitionFilters"))
      "codes scan must prune on cid:\n" + p.slice(math.max(0, i - 500), i + 200)
    })
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("KNN join prunes the list scan to probed cids and keeps the " +
    "routes-lists join an equi-join (no cartesian candidate generation)") {
    val df = SparkEntry.queries("q_ann_knn_join")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    val pruned = "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p)
    assert(pruned.nonEmpty, {
      val i = math.max(0, p.indexOf("PartitionFilters"))
      "list scan must prune on cid:\n" + p.slice(math.max(0, i - 500), i + 200)
    })
    // the only nested-loop is the tiny centroid header routing; the
    // corpus-sized routes×lists candidate generation must be an equi-join
    assert(!p.contains("CartesianProduct"), p)
    // per-query cut is the bounded top-k aggregate, not a rank window
    assert(p.contains("topk_rows_agg"), p)
  }

  test("quality signals compute in one projection — no hash shuffle, pruned scan") {
    // the Gopher repetition folds replace the naive explode+groupBy(doc,
    // gram) shape; the only exchanges allowed are spread's round-robin and
    // the final sort's range partitioning
    for (q <- Seq("q_quality_repetition", "q_clean_lines", "q_pii_redact", "q_quality_filter")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("hashpartitioning"), s"$q shuffles on a key:\n$p")
      assert(!p.contains("HashAggregate") && !p.contains("ObjectHashAggregate"), s"$q aggregates:\n$p")
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), s"$q over-reads:\n$p")
    }
  }

  test("exact-substring spans: no join anywhere — duplicated fingerprints " +
    "fan out of ONE bucket aggregation; span merge is a per-doc window") {
    for (q <- Seq("q_dedup_spans", "q_dedup_spans_winnow")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q:\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$q:\n$p") // collect_list bucket agg
      assert(p.contains("Window"), s"$q:\n$p")              // gaps-and-islands merge
    }
    // the winnowed variant must select via the native one-pass expression,
    // never the quadratic-under-collapse declarative form
    assert(plan("q_dedup_spans_winnow").contains("winnow_fps"))
  }

  test("tfidf: corpus count broadcasts; the per-doc cut is the bounded " +
    "top-k aggregate, not a rank window") {
    val p = plan("q_tfidf_topterms")
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("topk_rows_agg"), p)
    assert(!p.contains("RunningWindowFunction"), p)
  }

  test("unigram log-prob: token total broadcasts, no cartesian product, " +
    "decimal partial aggregation before the doc shuffle") {
    val p = plan("q_quality_unigram_lp")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("boilerplate removal: line counts combine map-side; the boilerplate " +
    "set returns as a 1-row broadcast, never a corpus-keyed join") {
    val p = plan("q_boilerplate_lines")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastNestedLoopJoin Cross BuildRight"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bloom ingest dedup: bloom-negative fast path unions with an " +
    "anti-join verify tail — no cartesian, no full-crawl join") {
    val p = plan("q_dedup_bloom_ingest")
    assert(p.contains("Union"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("composed ingest DAG inherits every stage's shape: anti-join " +
    "prunes, no cartesian anywhere") {
    val p = plan("q_ingest_e2e")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("gopher verdict is one shuffle-free projection over the scan") {
    val p = plan("q_quality_gopher")
    // the only exchange is the final presentation orderBy's range partition
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("dsir scoring: bucket arrays broadcast as one row; the corpus is " +
    "never sort-merge-joined or windowed") {
    val p = plan("q_dsir_select")
    assert(p.contains("BroadcastNestedLoopJoin Cross BuildRight"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("heavy hitters: MG candidates return as a 1-row broadcast; the " +
    "exact pass aggregates partially map-side") {
    val p = plan("q_vocab_heavy")
    assert(p.contains("freq_items_agg") || p.contains("ObjectHashAggregate"), p)
    assert(p.contains("BroadcastNestedLoopJoin Cross BuildRight"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bigram log-prob: vocab broadcasts, corpus joins carry their own " +
    "keys — no cartesian beyond the 1-row vocab, no window") {
    val p = plan("q_quality_bigram_lp")
    assert(p.contains("BroadcastNestedLoopJoin Cross BuildRight"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("ccnet buckets: the per-language threshold table broadcasts; the " +
    "band tag never sort-merge-joins or windows the corpus") {
    val p = plan("q_ccnet_buckets")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("bm25: query terms broadcast into the corpus token stream; per-query " +
    "cut is the bounded top-k aggregate, never a rank window") {
    val p = plan("q_bm25_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("topk_rows_agg"), p)
  }

  test("bm25 index search prunes the postings scan to the query terms' " +
    "bucket partitions (the inverted-index posting-list read)") {
    val df = SparkEntry.queries("q_bm25_index")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    val pruned = "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p)
    assert(pruned.nonEmpty, {
      val i = math.max(0, p.indexOf("PartitionFilters"))
      "postings scan must prune on bucket:\n" + p.slice(math.max(0, i - 500), i + 200)
    })
    assert(!p.contains("Window"), p)
  }

  test("hybrid rrf composes two bounded lists: no window, no cartesian " +
    "beyond the ANN query broadcast") {
    val p = plan("q_hybrid_rrf")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("topk_rows_agg"), p)
  }

  test("compression ratio is one scan-fused projection — deflate_len stays " +
    "inside codegen, no shuffle but the final sort, pruned scan") {
    val p = plan("q_quality_compress")
    assert(!p.toLowerCase.contains("hashpartitioning"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("deflate_len"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("CodegenFallback"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("BPE word histogram aggregates partially before its single shuffle; " +
    "the scan reads only the text column") {
    graft.functions.Functions.ensure(spark)
    val p = graft.operators.Tokenizer
      .wordHistogram(Tables(spark, sf, "documents"), "text")
      .queryExecution.explainString(FormattedMode)
    // partial + final HashAggregate around one exchange: the 100 TB corpus
    // collapses map-side to per-partition word counts before anything moves
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // formatted mode prints each node twice (tree + detail): 2 hits = ONE
    // exchange in the plan
    assert("Exchange".r.findAllIn(p).size === 2 && p.contains("hashpartitioning"), p)
    assert(p.contains("ReadSchema: struct<text:string>"), p)
  }

  test("quality-model scoring is a scan-fused fold: weights ride as a " +
    "literal, no aggregate, no codegen fallback") {
    graft.functions.Functions.ensure(spark)
    val w = Array.tabulate(64)(i => (i % 7 - 3) * 0.1)
    val p = Tables(spark, sf, "documents")
      .select(graft.operators.QualityModel.score(org.apache.spark.sql.functions.col("text"), w, 64).as("p"))
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("HashAggregate") && !p.contains("Exchange"), p)
    assert(p.contains("strict_exp"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("CodegenFallback"), p)
  }

  test("BPE encode is one scan-fused projection: merges ship as a task " +
    "constant, no shuffle, no codegen fallback") {
    val p = plan("q_bpe_encode")
    // the orderBy is the query's presentation sort; the encode itself adds
    // no exchange beyond it and no aggregate
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("bpe_encode"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("CodegenFallback"), p)
  }

  test("unigram encode is one scan-fused projection: the piece table ships " +
    "as a task constant, no shuffle, no codegen fallback") {
    val p = plan("q_unigram_encode")
    // training's histogram shuffle runs eagerly at build time; the
    // returned frame is Viterbi fused into the scan + presentation sort
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("unigram_encode"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("CodegenFallback"), p)
  }

  test("wordpiece encode is one scan-fused projection: the vocabulary ships " +
    "as a task constant, no shuffle, no codegen fallback") {
    val p = plan("q_wordpiece_encode")
    // training's histogram shuffle runs eagerly at build time; the
    // returned frame is the greedy match fused into the scan + the
    // presentation sort
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("wordpiece_encode"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("CodegenFallback"), p)
  }

  test("curation funnel is one DAG: stage flags inline over the scan, a " +
    "single digest-keyed window for the canonical verdict, one source " +
    "aggregation, zero joins") {
    val p = plan("q_curation_funnel")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("packed training records: id encode fuses into the scan, one " +
    "source-keyed window + one bounded (source,pack) aggregation, no join") {
    val p = plan("q_pack_records")
    assert(p.contains("bpe_encode_ids"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("global shuffle ordinal and budget sharding ride the bucketed " +
    "prefix sum: the window partitions on the md5-prefix bucket, never " +
    "a whole-corpus single-partition window, and no join appears") {
    Seq("q_shuffle_ordinal", "q_shard_budget", "q_shard_manifest").foreach { q =>
      val p = plan(q)
      // every Window/sort runs under the _b bucket partitioning; the
      // offsets ride as an array literal, not a join
      assert(p.contains("_b"), s"$q: bucket column missing from plan\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      assert(!p.contains("CodegenFallback"), s"$q:\n$p")
    }
  }

  test("byte-level BPE encode is one scan-fused projection like the " +
    "char-level form — merges ship as a task constant, no shuffle, no join") {
    val p = plan("q_bpe_bytes")
    assert(p.contains("bpe_encode_bytes"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("phrase search prunes the positional postings to the phrase terms' " +
    "bucket partitions and never sorts the corpus") {
    val df = SparkEntry.queries("q_phrase_search")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    val pruned = "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p)
    assert(pruned.nonEmpty, {
      val i = math.max(0, p.indexOf("PartitionFilters"))
      "postings scan must prune on bucket:\n" + p.slice(math.max(0, i - 500), i + 200)
    })
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("semantic decontamination ships the benchmark as one broadcast row — " +
    "the max fold fuses into the corpus scan, no corpus shuffle or sort join") {
    val p = plan("q_contamination_semantic")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("link-prior join attaches the node-bounded rank table by broadcast — " +
    "the corpus is never shuffled for the prior") {
    val p = plan("q_link_prior")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("anchor-term aggregation is scan-fused extraction + one partial " +
    "hash aggregation — no joins, no window") {
    val p = plan("q_anchor_text")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(!p.contains("CodegenFallback"), p)
  }

  test("per-host anchor profile cuts with the bounded top-k aggregate, " +
    "not a rank window") {
    val p = plan("q_anchor_topk")
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("block-level boilerplate classification is scan-fused regexp work " +
    "+ one explode — no shuffle, no join") {
    val p = plan("q_boilerplate_blocks")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("HashAggregate"), p)
  }

  test("unigram id encode is scan-fused like the piece form; the fertility " +
    "comparison is two partial-aggregated one-row folds, no window") {
    val p = plan("q_unigram_encode_ids")
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("unigram_encode_ids"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("CodegenFallback"), p)
    val f = plan("q_tokenizer_fertility")
    // per-family global aggregate: partial + final HashAggregate pairs,
    // never a rank window or a join between the families
    assert(f.contains("HashAggregate"), f)
    assert(!f.contains("Window") && !f.contains("SortMergeJoin"), f)
    assert(!f.contains("CodegenFallback"), f)
  }

  test("event transitions: one key shuffle feeds the lead window; the " +
    "probability normalization windows over the pair aggregate, and the " +
    "event payload never joins anything") {
    val p = plan("q_event_transitions")
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("URL blocklist: the entries broadcast into the column-pruned " +
    "candidate scan; never a cartesian") {
    val p = plan("q_url_blocklist")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("A-ES reservoir cuts with the bounded top-k aggregate — no rank " +
    "window over the corpus") {
    val p = plan("q_sample_reservoir")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("collocations pair through a real equi-join (the only nested-loop " +
    "joins are the one-row totals broadcasts) and aggregate with " +
    "map-side partials") {
    val p = plan("q_collocations")
    assert(!p.contains("CartesianProduct"), p)
    // the (doc, pos) pair match must plan as an equi-join, never a theta
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("decay scoring is one partial+final keyed aggregation — terms fuse " +
    "into the scan, no window, no join") {
    val p = plan("q_decay_score")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("as-of join compiles to zero Join operators: one key shuffle, " +
    "one running-last window over the unioned stream") {
    val p = plan("q_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p) // no SMJ, no BHJ, no BNLJ — none at all
  }

  test("range join bucketizes to a co-partitioned equi-join — no " +
    "BroadcastNestedLoop, no cartesian") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("filtered IVF search pushes the attribute predicate into the " +
    "loaded lists scan — bytes are cut at the parquet read") {
    val df = SparkEntry.queries("q_ann_filtered")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,1)"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("IVF-OPQ probe prunes the code-table scan to the probed cid " +
    "partitions, with the rotation fused into the query/corpus scans") {
    val df = SparkEntry.queries("q_ann_ivf_opq")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    val pruned = "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p)
    assert(pruned.nonEmpty, {
      val i = math.max(0, p.indexOf("PartitionFilters"))
      "codes scan must prune on cid:\n" + p.slice(math.max(0, i - 500), i + 200)
    })
    assert(p.contains("pca_project"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("OPQ keeps the PQ plan shape: the rotation fuses into the scans as " +
    "the pca_project kernel, candidates broadcast for the rerank, never a " +
    "sort-merge or cartesian join") {
    val p = plan("q_ann_opq")
    assert(p.contains("pca_project"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pruned collocations broadcast the bounded vocabulary cut into the " +
    "position stream before the pair join — no cartesian anywhere") {
    val p = plan("q_collocations_pruned")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // the top-m vocab cut
    assert(!p.contains("CartesianProduct"), p)
  }

  test("triangle counting pairs wedges through equi-joins only (the " +
    "degree-ordered orientation bounds fan-out; a theta/cartesian join " +
    "would be the quadratic failure mode)") {
    val p = plan("q_host_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("vocabulary coverage joins eval tokens to the vocab on the term " +
    "key and reduces per doc with map-side partials — no cartesian") {
    val p = plan("q_vocab_coverage")
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("merged BM25 index search keeps the bucket-pruned scan shape: the " +
    "posting read prunes to the query terms' bucket partitions") {
    val p = plan("q_bm25_merge")
    assert(p.contains("PartitionFilters"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("merged positional index keeps the bucket-pruned phrase plan: " +
    "posting reads prune to the phrase terms' partitions, position " +
    "alignment is an equi-join") {
    val p = plan("q_phrase_merge")
    assert(p.contains("PartitionFilters"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("link reciprocity's reverse check is a co-partitioned equi-join " +
    "on the flipped key — never a nested-loop product") {
    val p = plan("q_link_reciprocity")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("salted join keys on (key, _salt) — the hot key spreads across " +
    "salt sub-keys — and stays an equi-join") {
    val p = plan("q_salted_join")
    assert(p.contains("_salt"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("classification report is two class-keyed aggregations + one " +
    "class-keyed join — map-side partials, no corpus collect") {
    val p = plan("q_classifier_eval")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // partial+final × 2
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sentence segmentation is scan-fused regexp + one posexplode — " +
    "the only exchange is the oracle sort") {
    val p = plan("q_text_sentences")
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("Generate"), p)
  }

  test("ngram novelty joins the reference grams on the gram KEY — an " +
    "equi-join that degrades gracefully from broadcast (small reference " +
    "at this SF) to shuffle at scale; never a nested loop") {
    val p = plan("q_ngram_novelty")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("keep-rate gate: one global percentile aggregation broadcast back " +
    "over the scan — no per-row window, no corpus sort") {
    val p = plan("q_quality_keep_rate")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p) // the 1-row threshold attach
    assert(!p.contains("Window"), p)
  }

  test("sentence dedup: sentence-keyed flag join (equi, never nested " +
    "loop) + doc-keyed rebuild with map-side partials") {
    val p = plan("q_dedup_sentences")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("image feature extraction never reads document text: the planting " +
    "scan prunes to (doc_id, n_chars); decode/measure is map-only (no " +
    "hash shuffle anywhere)") {
    val p = plan("q_multimodal_features")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("video quality gates are one map-only pass per clip branch: no " +
    "hash shuffle, no join, text column pruned out of every scan") {
    val p = plan("q_multimodal_video_quality")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("text"), p) // planting reads doc_id + n_chars only
  }

  test("image near-dup pairs are join-free: the pigeonhole buckets are a " +
    "grouped aggregation (one chunk-keyed shuffle + the bounded distinct), " +
    "never a pairwise join operator") {
    val p = plan("q_dedup_phash")
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("JPEG feature extraction keeps the PNG tier's shape: pruned " +
    "(doc_id, n_chars) scan, map-only decode/measure, no shuffle") {
    val p = plan("q_multimodal_jpeg")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("cross-container near-dup pairs stay join-free at the wider " +
    "radius: 11 pigeonhole chunks are still one grouped aggregation") {
    val p = plan("q_dedup_phash_cross")
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("GIF feature extraction and animated-GIF frame fan-out keep the " +
    "map-only shape: pruned planting scan, no shuffle, no join") {
    for (q <- Seq("q_multimodal_gif", "q_multimodal_gif_video")) {
      val p = plan(q)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), s"$q: $p")
      assert(!p.contains("Exchange hashpartitioning"), s"$q: $p")
      assert(!p.contains("Join"), s"$q: $p")
    }
  }

  test("the mixed-container scan is a shuffle-free union of four pruned " +
    "planting scans — per-payload dispatch, not a per-container job") {
    val p = plan("q_multimodal_mixed")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    assert("ReadSchema: struct<doc_id:bigint,n_chars:bigint>".r
      .findAllIn(p).size === 4, p)
  }

  test("BMP feature extraction and MJPEG frame fan-out keep the map-only " +
    "shape: pruned planting scan, no shuffle, no join") {
    for (q <- Seq("q_multimodal_bmp", "q_multimodal_mjpeg")) {
      val p = plan(q)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), s"$q: $p")
      assert(!p.contains("Exchange hashpartitioning"), s"$q: $p")
      assert(!p.contains("Join"), s"$q: $p")
    }
  }

  test("the mixed-container VIDEO scan is a shuffle-free union of three " +
    "pruned planting scans — per-payload dispatch across raw AVI, MJPEG " +
    "and animated GIF") {
    val p = plan("q_multimodal_video_mixed")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    assert("ReadSchema: struct<doc_id:bigint,n_chars:bigint>".r
      .findAllIn(p).size === 3, p)
  }

  test("subtitle parsing is map-only over a (doc_id, text) pruned scan; " +
    "cue-frame pairing is one equi-join + one generator — never a " +
    "nested-loop product, and no video payload anywhere") {
    val p = plan("q_subtitles_parse")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    val q = plan("q_subtitle_frame_pairs")
    assert(!q.contains("CartesianProduct") && !q.contains("BroadcastNestedLoop"), q)
    assert(q.contains("Generate"), q) // the sequence() frame fan-out
  }

  test("caption QA reuses ONE media_id shuffle across the lag window and " +
    "the aggregation — no join, no second exchange") {
    val p = plan("q_subtitles_quality")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Join"), p)
  }
}
