package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the reference's query surface:
  * deterministic sampling, benchmark decontamination, mixture weighting and
  * sequence packing. These are the corpus-curation steps a 100 TB pretraining
  * pipeline runs between ingestion and tokenization.
  *
  * Design rules shared by all four:
  *  - determinism without RNG state: selection decisions are pure functions
  *    of row content (md5), so re-runs, backfills and per-executor retries
  *    select identical rows with no seed coordination;
  *  - no corpus-wide shuffle unless semantically required: sampling and
  *    mixing are scan-fused map-side transforms, decontamination broadcasts
  *    the (small) benchmark gram set, packing shuffles once on its
  *    partitioning column only.
  */
object Pipeline {

  /** 8-hex-digit upper bound such that P[md5 hex < bound] == fraction.
    * Fixed-width lowercase hex compares lexicographically as unsigned
    * numeric, so the gate is a plain codegen'd string compare.
    */
  private def hexBound(fraction: Double): String = {
    val f = math.max(0.0, math.min(1.0, fraction))
    // fraction 1.0 must keep EVERY row: "g" sorts after any hex digest
    // (a clamped "ffffffff" bound would strictly-compare away the ~2^-32
    // of rows whose md5 starts with ffffffff)
    if (f >= 1.0) "g"
    // f*2^32 can ROUND to 2^32 for f just below 1.0 — %08x would then
    // print 9 digits ("100000000") and the gate would keep only ~1/16 of
    // rows; such fractions mean "keep everything", same as f == 1.0
    else {
      val scaled = (f * 4294967296.0).toLong
      if (scaled >= 4294967296L) "g" else f"$scaled%08x"
    }
  }

  /** Deterministic hash gate: true iff md5(key) falls below `fraction`'s
    * boundary. The sampling primitive — content-addressed, uniform,
    * reproducible across engines (any md5 implementation agrees).
    */
  def hashGate(key: Column, fraction: Double): Column =
    md5(key.cast("string")) < lit(hexBound(fraction))

  /** The first 15 md5 hex digits of the key as a 60-bit long — the
    * numerator of [[hashUniform]]. 60 bits fit a signed 64-bit int in
    * both Spark and the DuckDB oracle (16 digits would not).
    */
  private[operators] def hashPrefix60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Uniform [0,1) variate from the row key: [[hashPrefix60]] over 2^60.
    * Pure codegen'd expression, engine-portable. Use for ORDERING (the
    * double division is monotone in the prefix); for threshold tests use
    * [[uBelow]] — the long→double conversion rounds the 60-bit numerator
    * to 53 bits, so a raw `hashUniform(k) < bound` flips a ~2^-55 band
    * of keys at each dyadic boundary relative to [[hashGate]].
    */
  def hashUniform(key: Column): Column =
    hashPrefix60(key) / lit(1152921504606846976.0)

  /** Exact integer-domain test for "variate below p": prefix < ceil(p·2^60)
    * compared as longs, no double rounding of the variate. For dyadic `p`
    * this selects EXACTLY the [[hashGate]] rows (p·2^60 is an exact power
    * of two), so samples, splits and gates built on the shared variate
    * compose without boundary drift.
    */
  private[operators] def uBelow(key: Column, p: Column): Column =
    hashPrefix60(key) < ceil(p * lit(1152921504606846976.0))

  /** EXACT-k weighted sampling WITHOUT replacement — the
    * Efraimidis–Spirakis A-ES reservoir, deterministic: each row draws
    * u from the shared md5 variate (nudged into (0,1] so ln never hits
    * −∞) and the k largest u^(1/w) win, compared in the log domain
    * (ln(u)/w — the same ordering with no pow underflow at small
    * weights). Unlike [[weightedSample]] (Bernoulli, variable size)
    * this returns exactly min(k, |group|) rows per group, inclusion
    * probability proportional to weight. Rows with w ≤ 0 never sample.
    *
    * Shape at scale: grouped form cuts with the bounded top-k aggregate
    * (≤ k rows per group through the shuffle); the global form is a
    * TakeOrderedAndProject. Output adds `rn` (1-based rank by the A-ES
    * key).
    */
  def weightedReservoir(df: DataFrame, idCol: String, weight: Column, k: Int,
                        groupCols: Seq[String] = Nil): DataFrame = {
    require(k > 0, s"weightedReservoir: k must be positive, got $k")
    val safeU = (hashPrefix60(col(idCol)) + 1).cast("double") /
      lit(1152921504606846976.0)
    val marked = df.filter(weight > 0)
      .withColumn("_aes", log(safeU) / weight)
    if (groupCols.isEmpty) {
      // TakeOrderedAndProject bounds the cut; the rank window then runs
      // over ≤ k rows (single partition by construction — harmless)
      val top = marked.orderBy(col("_aes").desc, col(idCol)).limit(k)
      top.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("_aes").desc, col(idCol))).cast("int"))
        .drop("_aes")
    } else
      CqlOps.perPartitionLimitAgg(marked, groupCols,
        Seq(("_aes", true), (idCol, false)), k).drop("_aes")
  }

  /** Probability-proportional deterministic sampling — the soft quality
    * filter of DCLM/DataComp-style curation (keep each doc with
    * probability equal to its quality score, rather than a hard
    * threshold): keep iff the key's variate falls below `p` ([[uBelow]],
    * exact in the integer domain), with `p` a per-row column in [0,1]
    * (p <= 0 drops, p >= 1 keeps — the variate never reaches 1.0). Same
    * contract as the other samplers: selection is a pure function of row
    * content, so re-runs/backfills/retries agree with no seed
    * coordination, and the gate is one codegen'd predicate fused into
    * the scan — no shuffle at any scale.
    */
  def weightedSample(docs: DataFrame, key: Column, p: Column): DataFrame =
    docs.filter(uBelow(key, p))

  /** Deterministic dataset split (train/val/test): tag each row with the
    * first split whose strict upper [[hashUniform]] bound exceeds the
    * row's variate; rows past the last bound take `rest`. Bounds are
    * ascending cumulative boundaries on [0,1) (e.g. train->0.8, val->0.9,
    * rest "test" = 80/10/10). One codegen'd CASE fused into the scan — no
    * shuffle — and because the variate is shared with the samplers, a
    * doc's split never changes across re-runs, backfills, or corpus
    * growth, and splits compose consistently with `hashGate` samples.
    */
  def splitByHash(docs: DataFrame, key: Column, bounds: Seq[(String, Double)],
                  rest: String): DataFrame = {
    require(bounds.nonEmpty, "at least one split bound")
    require(bounds.map(_._2) == bounds.map(_._2).sorted, "bounds must ascend")
    val tag = bounds.reverse.foldLeft(lit(rest)) { case (acc, (name, b)) =>
      when(uBelow(key, lit(b)), lit(name)).otherwise(acc)
    }
    docs.withColumn("split", tag)
  }

  /** Per-stratum token-budget cap: walk each stratum's rows in the
    * deterministic [[hashUniform]] order and keep the maximal PREFIX whose
    * running token total stays within `budget` (prefix semantics: the row
    * that crosses the budget and everything after it drop — not a
    * knapsack). The standard per-domain token-budget enforcement of a
    * mixture spec, reproducible with no RNG.
    *
    * Shape: one shuffle on the stratum key plus an in-partition sort for
    * the prefix-sum window — the [[packSequences]] shape. A stratum is a
    * window partition, so a single colossal source serializes its own
    * prefix sum; if one stratum dominates the corpus, pre-bucket it
    * (stratum, hashUniform-range) and cap buckets against a per-bucket
    * budget share instead.
    */
  def capTokenBudget(docs: DataFrame, strataCol: String, key: Column,
                     tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(hashUniform(key), key)
    docs.withColumn("cum_tokens", sum(tokens).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Stratified deterministic sampling: per-stratum keep-fractions with a
    * default for unlisted strata. One codegen'd predicate fused into the
    * scan — no shuffle, no RNG, safe at any scale.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, key: Column,
                       fractions: Seq[(String, Double)],
                       default: Double): DataFrame = {
    val bound = fractions.foldLeft(lit(hexBound(default))) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(hexBound(f))).otherwise(acc)
    }
    docs.filter(md5(key.cast("string")) < bound)
  }

  /** IDs of corpus docs sharing at least one k-word-gram with the benchmark
    * set. The benchmark gram set is broadcast (eval suites are tiny next to
    * a training corpus), so contamination detection is a map-side semi-join
    * over the corpus scan; only the matched id set is distinct-shuffled.
    */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame, id: String,
                      text: String, k: Int): DataFrame = {
    val bg = Dedup.explodedShingles(bench, id, text, k).select("s").distinct()
    Dedup.explodedShingles(corpus, id, text, k)
      .join(broadcast(bg), "s")
      .select("doc_id").distinct()
  }

  /** Benchmark decontamination: drop every corpus doc sharing a k-gram with
    * the benchmark set (the standard eval-overlap guard before training).
    * Anti-join on the (small) contaminated-id set.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, id: String,
                    text: String, k: Int): DataFrame = {
    val bad = contaminatedIds(corpus, bench, id, text, k)
      .withColumnRenamed("doc_id", "_contaminated_id")
    corpus.join(broadcast(bad), corpus(id) === col("_contaminated_id"), "left_anti")
  }

  /** Contamination REPORT: per-doc benchmark-overlap fraction instead of a
    * binary drop — (doc_id, n_grams, n_contaminated, frac) for every corpus
    * doc with at least one distinct k-gram. Pipelines threshold on `frac`
    * (drop > x%, flag the rest) rather than dropping on any single shared
    * gram; the PaLM/GPT-3 reports count overlapped grams the same way.
    * Same shape as [[contaminatedIds]]: benchmark grams broadcast, overlap
    * counted map-side into the per-doc aggregate the gram explode already
    * feeds — no extra corpus shuffle.
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame, id: String,
                          text: String, k: Int): DataFrame = {
    val bg = Dedup.explodedShingles(bench, id, text, k).select("s").distinct()
      .withColumn("_hit", lit(1L))
    Dedup.explodedShingles(corpus, id, text, k)
      .join(broadcast(bg), Seq("s"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated") * lit(1.0) / col("n_grams"), 6).as("frac"))
  }

  /** Per-doc k-gram NOVELTY against a CORPUS-SIZED reference — the
    * complement of [[contaminationReport]] for references too big to
    * broadcast (the previous crawl epoch, the already-trained-on corpus):
    * the fraction of a document's distinct k-grams never seen in the
    * reference. Low novelty = redundant with what the model already has
    * (dedup-adjacent data valuation, Muennighoff-style repeat budgeting);
    * high novelty = new material. Same math as the contamination
    * fraction, different join physics: the reference gram set reduces to
    * distinct rows and joins on the GRAM KEY — a co-partitioned shuffle
    * equi-join that scales with gram volume, where the benchmark path's
    * broadcast would OOM. Pick by reference size; both are this one
    * derivation.
    */
  def ngramNovelty(corpus: DataFrame, reference: DataFrame, id: String,
                   text: String, k: Int): DataFrame = {
    val rg = Dedup.explodedShingles(reference, id, text, k).select("s").distinct()
      .withColumn("_seen", lit(1L))
    Dedup.explodedShingles(corpus, id, text, k)
      .join(rg, Seq("s"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_seen").isNull, lit(1L)).otherwise(lit(0L))).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel") * lit(1.0) / col("n_grams"), 6).as("novelty"))
  }

  /** Materialize packed training records: concatenate each pack's docs in
    * `orderCol` order into one text per (partition, pack) — the emission
    * step after [[packSequences]] assigns pack ids. One hash aggregation
    * on (partition, pack_id); each group holds ~budget characters by
    * construction, so per-group state is bounded by the pack budget, not
    * the corpus. The array_sort-then-join inside the aggregate makes the
    * concatenation order deterministic regardless of arrival order.
    */
  def emitPacked(packed: DataFrame, partCol: String, orderCol: String,
                 text: String): DataFrame =
    packed.groupBy(col(partCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(array_sort(collect_list(struct(col(orderCol), col(text)))),
            p => p.getField(text)), " ").as("pack_text"))

  /** Pack emission in the TRAINING-RECORD shape (the Megatron-style
    * .bin/.idx handoff): one row per (partCol, pack_id) with the pack's
    * token ids concatenated in doc order plus the DOC-BOUNDARY offsets
    * (every doc's start position and the total — length n_docs+1), which
    * the loader needs to reset attention/loss across document boundaries
    * inside a packed sequence. Same bounded aggregation as [[emitPacked]]
    * — per-group state is capped by the pack budget, the grouping reuses
    * the packing shuffle. Output: partCol, pack_id, n_docs, token_ids
    * (array<int>), boundaries (array<int>).
    */
  def emitPackedIds(packed: DataFrame, partCol: String, orderCol: String,
                    idsCol: String): DataFrame =
    packed.groupBy(col(partCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col(orderCol), col(idsCol)))).as("_r"))
      .select(col(partCol), col("pack_id"), col("n_docs"),
        flatten(transform(col("_r"), p => p.getField(idsCol))).as("token_ids"),
        aggregate(col("_r"), array(lit(0)),
          (acc, p) => concat(acc,
            array(element_at(acc, -1) + size(p.getField(idsCol)))))
          .as("boundaries"))

  /** Mixture weighting by integer epoch counts: repeat each source's docs
    * `weights(source)` times (default 1), tagging each copy with its epoch
    * index. The explode is map-side — upsampling never shuffles the corpus;
    * downstream training-order shuffles are the consumer's choice.
    */
  def mixEpochs(docs: DataFrame, sourceCol: String,
                weights: Seq[(String, Int)]): DataFrame = {
    require(weights.forall(_._2 >= 0), s"epoch weights must be >= 0: $weights")
    val reps = weights.foldLeft(lit(1L)) {
      case (acc, (s, n)) => when(col(sourceCol) === s, lit(n.toLong)).otherwise(acc)
    }
    // weight 0 = drop the source: sequence(1, 0) would count DOWN ([1, 0]),
    // so gate on reps >= 1 and let explode discard the empty arrays
    docs.withColumn("epoch",
      explode(when(reps >= 1L, sequence(lit(1L), reps))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Mixture weighting by FRACTIONAL epoch counts — the shape real mixture
    * recipes use (DoReMi / LLaMA-style weights like "2.3 epochs of web"):
    * weight w yields floor(w) full copies of the source plus one extra
    * epoch holding a deterministic [[hashGate]](frac(w)) sample of its
    * docs. Unlisted sources default to exactly one epoch; weight 0 drops
    * the source. Same map-side explode as [[mixEpochs]] — upsampling never
    * shuffles the corpus — and the fractional epoch's membership is
    * content-addressed, so re-runs and backfills pick identical rows.
    *
    * The gate key is SALTED (`mix:` prefix): the raw md5(id) variate is
    * shared by [[stratifiedSample]]/[[splitByHash]]/[[weightedSample]], and
    * an unsalted gate would be fully correlated with any upstream sampler —
    * e.g. after a 0.5 stratified sample, an unsalted 0.5 fractional epoch
    * would keep EVERY survivor (effective weight w+0.5, not w+0.25 of the
    * original). The salt makes this operator's draw independent.
    */
  /** Temperature-scaled mixture weights — the multilingual "α-sampling"
    * recipe (Devlin et al. 2019 mBERT; Conneau et al. 2020 XLM-R §3):
    * resample sources so the mixed corpus' share of source s is
    * proportional to (n_s/N)^α. α = 1 keeps natural proportions (every
    * weight 1); α → 0 approaches uniform across sources, upsampling the
    * tail. Returns per-source FRACTIONAL epoch counts
    * w_s = (p_s^α / Σ_t p_t^α) · N / n_s for [[mixEpochsFractional]].
    *
    * Pure driver arithmetic over the K-row per-source count header
    * (K = number of sources, never corpus-sized). Determinism: counts
    * are summed in source-name order and each weight rounds to 6 dp, so
    * replays and independent replicas reproduce the exact doubles.
    */
  def temperatureEpochs(counts: Seq[(String, Long)],
                        alpha: Double): Seq[(String, Double)] = {
    require(counts.nonEmpty && counts.forall(_._2 > 0),
      s"temperatureEpochs needs positive per-source counts: $counts")
    require(alpha >= 0.0, s"alpha must be >= 0: $alpha")
    val ordered = counts.sortBy(_._1)
    val total = ordered.map(_._2).sum.toDouble
    val powed = ordered.map { case (s, n) => (s, n, math.pow(n / total, alpha)) }
    val z = powed.map(_._3).sum
    powed.map { case (s, n, pw) =>
      s -> BigDecimal(pw / z * total / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  def mixEpochsFractional(docs: DataFrame, sourceCol: String, idCol: Column,
                          weights: Seq[(String, Double)]): DataFrame = {
    require(weights.forall(_._2 >= 0.0), s"epoch weights must be >= 0: $weights")
    val full = weights.foldLeft(lit(1L)) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(math.floor(w).toLong)).otherwise(acc)
    }
    val saltedId = concat(lit("mix:"), idCol.cast("string"))
    val fracKeep = weights.foldLeft(lit(false)) {
      case (acc, (s, w)) =>
        val frac = w - math.floor(w)
        when(col(sourceCol) === s,
          if (frac == 0.0) lit(false) else hashGate(saltedId, frac)).otherwise(acc)
    }
    val base = when(full >= 1L, sequence(lit(1L), full))
      .otherwise(array().cast("array<bigint>"))
    docs.withColumn("epoch",
      explode(when(fracKeep, concat(base, array(full + 1L))).otherwise(base)))
  }

  /** Budget-chunked sequence packing: within each `partCol` group, assign
    * docs (in `orderCol` order) to consecutive packs of cumulative `sizeCol`
    * up to `budget` — pack_id = floor(exclusive-prefix-sum / budget). One
    * window shuffle on the partitioning column; pack numbering never needs
    * a global order, so the plan holds at any corpus size.
    */
  def packSequences(docs: DataFrame, partCol: String, orderCol: String,
                    sizeCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("pack_id",
      floor((sum(sizeCol).over(w) - sizeCol) / lit(budget.toDouble)).cast("long"))
  }

  // ── seeded corpus shuffle + global prefix-sum sharding ─────────────

  /** Seeded shuffle variate: md5 over `"<seed>:" + key` — a fresh
    * deterministic permutation per seed, engine-portable like every gate
    * in this file (DuckDB's `md5('<seed>:' || CAST(key AS VARCHAR))` is
    * bit-identical). Ordering by (variate, key) is a uniform pseudorandom
    * TOTAL order — the "shuffle the corpus once before sharding" step
    * every training pipeline runs between curation and the data loader.
    */
  def shuffleVariate(key: Column, seed: Long): Column =
    md5(concat(lit(s"$seed:"), key.cast("string")))

  /** Order-aligned bucket of a shuffle variate: the first 4 hex digits
    * as an integer (0..65535), floor-scaled to `buckets`. The scaling is
    * monotone, so bucket order IS variate-prefix order and a per-bucket
    * pass composes into a global one — the partitioning trick under
    * [[shuffledOrdinal]] / [[assignShardsByBudget]]. Uniform by md5, so
    * buckets balance at any corpus size (no range-sampling step, whose
    * sampled boundaries would be job-order-dependent).
    */
  private def variateBucket(v: Column, buckets: Int): Column =
    // prefix16·buckets ≤ 65535·65536 < 2^53: the double product is exact,
    // so floor-scaling is the exact integer division (Column `/` is
    // always double division in Spark — `div` would widen the plan)
    floor(conv(substring(v, 1, 4), 16, 10).cast("long") * buckets / 65536.0)
      .cast("int")

  /** Per-bucket leading offsets of `agg` (count or token sum): ONE
    * bucket-keyed aggregation (map-side partial, ≤ `buckets` rows back to
    * the driver — the bounded-header pattern), cumulated in bucket order.
    * Returns a dense offsets array literal indexed by bucket id.
    */
  private def bucketOffsets(df: DataFrame, bucket: Column, agg: Column,
                            buckets: Int): Seq[Long] = {
    val totals = df.groupBy(bucket.as("_b")).agg(agg.as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val out = new Array[Long](buckets)
    var acc = 0L
    var b = 0
    while (b < buckets) { out(b) = acc; acc += totals.getOrElse(b, 0L); b += 1 }
    out.toSeq
  }

  /** Deterministic seeded shuffle with each row's global 0-based position
    * — the distributed ordinal a data loader checkpoints against.
    * Implementation is the two-level prefix sum: bucket by the variate's
    * order-aligned prefix ([[variateBucket]]), count per bucket (bounded
    * driver header), rank within buckets (ONE hash shuffle on `buckets`
    * uniform keys), add the bucket's leading offset. No corpus-wide
    * single-partition window, no RangePartitioner sampling — the
    * position is a pure function of row content, so re-runs and
    * backfills agree. Output: input columns + `pos` (long).
    */
  def shuffledOrdinal(docs: DataFrame, key: Column, seed: Long,
                      buckets: Int = 256,
                      materialize: Boolean = false): DataFrame = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in 1..65536, got $buckets")
    val withV0 = docs.withColumn("_v", shuffleVariate(key, seed))
      .withColumn("_b", variateBucket(col("_v"), buckets))
    // The two-phase shape reads the source twice by construction: once
    // for the offsets header (column-pruned to the key), once for the
    // ranking window. `materialize` checkpoints the variate projection so
    // the source is scanned ONCE — the right trade when the scan is
    // expensive (remote object store) or when a save/append action chains
    // right behind this call; the default keeps the cheap pruned re-scan
    // and writes nothing.
    val withV = if (materialize) withV0.localCheckpoint() else withV0
    val offsets = bucketOffsets(withV, col("_b"), count(lit(1)), buckets)
    val w = Window.partitionBy("_b").orderBy(col("_v"), key)
    withV.withColumn("pos",
        element_at(typedLit(offsets), col("_b") + 1) +
          row_number().over(w) - 1)
      .drop("_v", "_b")
  }

  /** Token-budget shard assignment over the seeded-shuffled order — the
    * GLOBAL form of [[packSequences]] (which packs within a partition
    * column): shard i covers the docs whose cumulative token count
    * starts in [i·budget, (i+1)·budget). Same two-level prefix sum as
    * [[shuffledOrdinal]] with token sums instead of counts: per-bucket
    * sums return as a bounded header, the in-bucket cumsum is one
    * window over the bucket hash shuffle, and a doc's shard is
    * `floor((global_cumsum − tokens) / budget)` — the shard its START
    * falls into, so shards hold whole documents and overflow by at most
    * one doc (standard cumulative-boundary sharding). Deterministic:
    * shard ids are a pure function of corpus content and seed. Output:
    * input columns + `shard` (long).
    */
  def assignShardsByBudget(docs: DataFrame, key: Column, seed: Long,
                           tokens: Column, budget: Long,
                           buckets: Int = 256,
                           startTokens: Long = 0L,
                           materialize: Boolean = false): DataFrame = {
    require(budget > 0, s"shard budget must be positive, got $budget")
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in 1..65536, got $buckets")
    require(startTokens >= 0, s"startTokens must be >= 0, got $startTokens")
    val withV0 = docs.withColumn("_v", shuffleVariate(key, seed))
      .withColumn("_b", variateBucket(col("_v"), buckets))
      .withColumn("_n", tokens.cast("long"))
    // see shuffledOrdinal: `materialize` collapses the offsets-header scan
    // and the window scan into ONE source read via a local checkpoint —
    // saveShardedCorpus/appendShardedCorpus turn it on because their
    // write action would otherwise be the source's SECOND full read
    val withV = if (materialize) withV0.localCheckpoint() else withV0
    val offsets = bucketOffsets(withV, col("_b"),
      coalesce(sum(col("_n")), lit(0L)), buckets)
    val w = Window.partitionBy("_b").orderBy(col("_v"), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withV.withColumn("shard",
        floor((lit(startTokens) + element_at(typedLit(offsets), col("_b") + 1) +
          sum(col("_n")).over(w) - col("_n")).cast("double") /
          lit(budget.toDouble)).cast("long"))
      .drop("_v", "_b", "_n")
  }

  // ── persistent sharded corpus (save / append / load) ───────────────

  /** Persist a budget-sharded training corpus: `dir/data` parquet
    * PARTITIONED BY shard (the loader reads one shard = one directory),
    * `dir/manifest` (shard, n_docs, n_tokens), `dir/meta` (seed, budget,
    * buckets, cumulative token total — the position on the cumulative
    * token line where the next append continues). Returns the assignment.
    */
  def saveShardedCorpus(docs: DataFrame, key: Column, seed: Long,
                        tokens: Column, budget: Long, dir: String,
                        buckets: Int = 256,
                        materialize: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // materialize defaults ON here (the write action would otherwise be
    // the source's second full read) but stays a caller choice: a local
    // checkpoint trades the re-scan for executor-local blocks that are
    // NOT recomputable on executor loss — long-running cluster jobs that
    // prefer the fault-tolerant re-scan of durable source data pass false
    val assigned = assignShardsByBudget(docs, key, seed, tokens, budget,
      buckets, materialize = materialize)
    assigned.write.partitionBy("shard").mode("overwrite").parquet(s"$dir/data")
    val manifest = shardManifest(assigned, tokens)
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    val total = manifest.agg(coalesce(sum(col("n_tokens")), lit(0L)))
      .head().getLong(0)
    Seq((seed, budget, buckets, total)).toDF("seed", "budget", "buckets", "total_tokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    assigned
  }

  /** Incremental append to a [[saveShardedCorpus]] directory — the
    * steady-state ingest path of a persistent training corpus, exact by
    * construction: the batch continues the cumulative token line where
    * the previous write stopped (`startTokens` = the saved total), so
    * its first docs TOP UP the last partial shard and the rest open new
    * shards; every existing row's shard assignment is untouched (no
    * re-shard, no rewrite — appended files land inside the partition
    * directories). Appending batches b1 then b2 produces the identical
    * data + manifest as appending them as one batch ONLY up to each
    * batch's internal seeded order (each batch shuffles within itself,
    * the stream-order semantics every batch-ingest pipeline has);
    * what IS exact: determinism given the batch sequence, and the
    * manifest/meta reconciling to the doc-level truth after every
    * append ([[shardManifest]] totals == corpus totals). The manifest
    * merge is driver-side over shard-count rows — the bounded-header
    * pattern (shards are corpus_tokens/budget, the artifact a loader
    * reads whole anyway). Returns the batch's assignment.
    */
  def appendShardedCorpus(spark: org.apache.spark.sql.SparkSession,
                          dir: String, newDocs: DataFrame, key: Column,
                          tokens: Column,
                          materialize: Boolean = true): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$dir/meta")
      .select("seed", "budget", "buckets", "total_tokens").head()
    val (seed, budget, buckets, total) =
      (meta.getLong(0), meta.getLong(1), meta.getInt(2), meta.getLong(3))
    // see saveShardedCorpus on the materialize fault-tolerance trade
    val assigned = assignShardsByBudget(newDocs, key, seed, tokens, budget,
      buckets, startTokens = total, materialize = materialize)
    assigned.write.partitionBy("shard").mode("append").parquet(s"$dir/data")
    val old = spark.read.parquet(s"$dir/manifest")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val add = shardManifest(assigned, tokens)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val merged = (old.keySet ++ add.keySet).toSeq.sorted.map { s =>
      val (d1, t1) = old.getOrElse(s, (0L, 0L))
      val (d2, t2) = add.getOrElse(s, (0L, 0L))
      (s, d1 + d2, t1 + t2)
    }
    merged.toDF("shard", "n_docs", "n_tokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    val newTotal = total + merged.map(_._3).sum - old.values.map(_._2).sum
    Seq((seed, budget, buckets, newTotal))
      .toDF("seed", "budget", "buckets", "total_tokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    assigned
  }

  /** Shard-level manifest of an [[assignShardsByBudget]] assignment —
    * the sidecar a training stack's loader reads (shard → doc count +
    * token count). One bucket-bounded aggregation over the assignment;
    * at 100 TB the manifest is shard-count rows, written once next to
    * the shard files.
    */
  def shardManifest(assigned: DataFrame, tokens: Column): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"))

  /** DSIR importance weight (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): documents are bags of hashed
    * word-bigram features over `buckets` md5 buckets; the target corpus
    * and the raw corpus each induce an add-1-smoothed categorical
    * distribution over buckets, and a document's log importance weight is
    * the sum over its bigrams of ln p_target(b) − ln p_corpus(b).
    * Documents that look more like the target than the raw corpus score
    * > 0 — DSIR resamples by these weights; the deterministic selection
    * rule `log_ratio > 0` needs no global pass at all.
    *
    * Determinism: each bucket's log ratio is rounded to 6 dp and the
    * per-doc sum runs in DECIMAL(18,6) — exact, so the result is
    * independent of partitioning and bit-equal across engines. The
    * bucket hash is the shared md5 60-bit prefix (engine-portable), not
    * a JVM-specific hash.
    *
    * Shape at scale: two bucket-count aggregations whose key space is
    * `buckets` (map-side partials, bounded result), the dense log-ratio
    * array returns as ONE broadcast row, and scoring is a per-row fold
    * fused into the corpus scan — no corpus-keyed shuffle anywhere.
    * Output: (id, log_ratio double).
    */
  def dsirLogRatio(corpus: DataFrame, target: DataFrame, id: String,
                   text: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"dsirLogRatio: buckets must be positive, got $buckets")
    def bucketOf(g: Column): Column = hashPrefix60(g) % buckets
    def bucketCounts(df: DataFrame): DataFrame = df
      .select(explode(Dedup.shingles(col(text), 2)).as("_g"))
      .select(bucketOf(col("_g")).as("_b"))
      .groupBy("_b").agg(count(lit(1)).as("_c"))
    def logProbArr(counts: DataFrame, name: String): DataFrame = counts
      .agg(map_from_arrays(collect_list(col("_b")), collect_list(col("_c"))).as("_m"),
        coalesce(sum(col("_c")), lit(0L)).as("_t"))
      .select(transform(sequence(lit(0), lit(buckets - 1)), i =>
        log((coalesce(element_at(col("_m"), i.cast("long")), lit(0L)) + lit(1.0)) /
          (col("_t") + lit(buckets.toDouble)))).as(name))
    val lr = logProbArr(bucketCounts(target), "_lp")
      .crossJoin(logProbArr(bucketCounts(corpus), "_lq"))
      .select(zip_with(col("_lp"), col("_lq"),
        (p, q) => round(p - q, 6).cast("decimal(18,6)")).as("_lr"))
    corpus.crossJoin(broadcast(lr))
      .select(col(id),
        aggregate(Dedup.shingles(col(text), 2),
          lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)"),
          (acc, g) => (acc + element_at(col("_lr"), (bucketOf(g) + 1).cast("int")))
            .cast("decimal(18,6)"))
          .cast("double").as("log_ratio"))
  }

  /** Corpus-drift report between two snapshots — the "did the new crawl
    * shift" monitor run before a generation enters training: per group
    * (language, source, domain tier…), each side's document count and
    * corpus share, plus the absolute share delta. A group present in
    * only one side reports zero on the other (full-outer, coalesced), so
    * appearing/vanishing groups surface instead of dropping out.
    *
    * Shape at scale: one group-keyed count per side (map-side partials),
    * a full-outer join on the group-bounded tables, and the two totals
    * broadcast as a 1-row cross join. Shares round to 6 dp; the delta is
    * |share_a − share_b| of the ROUNDED shares, so both engines agree at
    * boundaries.
    */
  def corpusDrift(a: DataFrame, b: DataFrame, groupCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) = df
      .groupBy(col(groupCol).as("_g")).agg(count(lit(1)).as(n))
    // totals re-aggregate the group-bounded count tables (a few rows),
    // not the inputs — localCheckpoint materializes each side's count
    // once, so each input is scanned exactly once
    def total(cnts: DataFrame, src: String, n: String) =
      cnts.agg(coalesce(sum(col(src)), lit(0L)).as(n))
    val ca = counts(a, "n_a").localCheckpoint()
    val cb = counts(b, "n_b").localCheckpoint()
    val joined = ca.join(cb, Seq("_g"), "full_outer")
      .crossJoin(broadcast(
        total(ca, "n_a", "_ta").crossJoin(total(cb, "n_b", "_tb"))))
    val shareA = when(col("_ta") > 0,
      round(coalesce(col("n_a"), lit(0L)).cast("double") / col("_ta"), 6))
      .otherwise(lit(0.0))
    val shareB = when(col("_tb") > 0,
      round(coalesce(col("n_b"), lit(0L)).cast("double") / col("_tb"), 6))
      .otherwise(lit(0.0))
    joined.select(col("_g").as(groupCol),
      coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      shareA.as("share_a"), shareB.as("share_b"),
      round(abs(shareA - shareB), 6).as("share_delta"))
  }

  /** One-row distribution-shift summary between two snapshots: group
    * count, Jensen–Shannon divergence (nats — always finite, the
    * alarm-threshold number a drift monitor pages on), and both KL
    * directions. KL(a‖b) reports NULL when some group has mass in `a`
    * but none in `b` (infinite divergence — the "a group vanished"
    * signal); JS handles zeros by construction. Computed over the 6-dp
    * share table ([[corpusDrift]], shares from identical long counts)
    * with every ln term rounded to integer micros and summed as longs —
    * the retrievalEval fixed-point arrangement, so both engines sum
    * identical operands. Shape: the group-bounded drift table reduces
    * to ONE row; nothing corpus-sized moves.
    */
  def corpusDivergence(a: DataFrame, b: DataFrame,
                       groupCol: String): DataFrame = {
    val d = corpusDrift(a, b, groupCol)
    val p = col("share_a")
    val q = col("share_b")
    val m = (p + q) / 2.0
    def micros(x: Column) = round(x * lit(1e6)).cast("long")
    val jsTerm = micros(when(p > 0, p * log(p / m)).otherwise(lit(0.0))) +
      micros(when(q > 0, q * log(q / m)).otherwise(lit(0.0)))
    val klabTerm = micros(when(p > 0 && q > 0, p * log(p / q)).otherwise(lit(0.0)))
    val klbaTerm = micros(when(q > 0 && p > 0, q * log(q / p)).otherwise(lit(0.0)))
    d.agg(
      count(lit(1)).as("n_groups"),
      round(sum(jsTerm).cast("double") / 2e6, 6).as("js"),
      when(max(when(p > 0 && q === 0, 1).otherwise(0)) === 1,
        lit(null).cast("double"))
        .otherwise(round(sum(klabTerm).cast("double") / 1e6, 6)).as("kl_ab"),
      when(max(when(q > 0 && p === 0, 1).otherwise(0)) === 1,
        lit(null).cast("double"))
        .otherwise(round(sum(klbaTerm).cast("double") / 1e6, 6)).as("kl_ba"))
  }
}
