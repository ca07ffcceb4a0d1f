package graft.operators

import graft.functions.Functions.murmur64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for LLM-pipeline workloads.
  *
  * All operators are pure DataFrame pipelines — shuffles are on (shingle),
  * (band, bucket) or (doc pair) keys only, never a full cross join, so each
  * stage stays linear-ish in corpus size and survives a 100 TB corpus:
  *
  *  - exact:   one hash aggregate on a text digest.
  *  - n-gram Jaccard: exploded distinct shingles, equi-join on shingle,
  *    count/union arithmetic. Exact but with a join fan-out on hot shingles —
  *    the scale path caps or prefers MinHash below.
  *  - MinHash+LSH: constant-size signature per doc (2 murmur passes +
  *    double-hashing), banded bucket join, then exact-Jaccard verification
  *    ONLY on candidate pairs.
  *  - SimHash: 64-bit signature via bit voting, pigeonhole chunk join
  *    (hamming ≤ 3 ⇒ one of 4 16-bit chunks equal), verification pass.
  */
object Dedup {

  /** Lowercased whitespace word split (shared with the DuckDB oracles). */
  def words(text: Column): Column = split(lower(text), " ")

  /** k-word shingles, at least one shingle per doc (clamped slice). */
  def shingles(text: Column, k: Int): Column = {
    val w = words(text)
    transform(
      sequence(lit(1), greatest(size(w) - (k - 1), lit(1))),
      i => array_join(slice(w, i, lit(k)), " "))
  }

  /** (doc_id, s) — one row per DISTINCT shingle of each document. */
  def explodedShingles(docs: DataFrame, id: String, text: String, k: Int): DataFrame =
    docs.select(col(id).as("doc_id"),
      explode(array_distinct(shingles(col(text), k))).as("s"))

  /** Exact dedup: digest-group. Output one row per distinct digest with the
    * canonical (minimum) doc id and the group size.
    */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    // no spread(): the partial hash-agg combines map-side, so a pre-shuffle
    // of the full text corpus costs a corpus-wide exchange and buys nothing
    docs.groupBy(md5(lower(col(text))).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col(id)).as("canonical_id"))

  /** Exact n-gram Jaccard similar pairs (jaccard >= threshold).
    * Output: (a, b, jaccard rounded to 6dp), a < b.
    *
    * This is the exact baseline (LSH is the approximate scale path), but
    * it is skew-safe at corpus scale too: candidates come from a
    * per-shingle GROUP (never a raw shingle self-join, whose hot-shingle
    * fan-out goes quadratic), each group's doc list is collected through a
    * BOUNDED aggregate (`topk_rows_agg`, buffer capped at maxShingleDf+1 —
    * a boilerplate shingle in 10M docs costs a fixed-size buffer, not an
    * OOM), and groups hotter than `maxShingleDf` are discarded before pair
    * expansion — a shingle shared by that many documents carries no
    * near-dup signal (standard document-frequency cutoff, as in Lee et al.
    * 2022's suffix/ngram dedup pipelines). Verification then computes the
    * EXACT jaccard — hot shingles included — per candidate pair via
    * [[verifyByShingleSets]], so the cutoff only bounds candidate
    * generation; it never perturbs reported similarity values. The only
    * pairs the cutoff can lose are those sharing NOTHING but
    * above-cutoff boilerplate shingles — at the default cutoff such a
    * pair's every shared shingle occurs in >maxShingleDf documents. That
    * deliberately excludes mass-duplicated boilerplate clusters (thousands
    * of near-identical copies): finding those via pair expansion would be
    * quadratic in the cluster size no matter what, and they are the job of
    * the exact digest tier ([[exact]]) and the span/URL tiers — not of an
    * all-pairs jaccard report. The cutoff is part of the operator's
    * contract and the DuckDB oracle mirrors it (Queries.jaccardDfOracle).
    */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String,
                        k: Int, threshold: Double,
                        maxShingleDf: Int = 5000): DataFrame = {
    val docsS = graft.Tables.spread(docs)
    val sh = explodedShingles(docsS, id, text, k)
    verifyCandidatePairs(docsS, id, text, k,
      ngramCandidates(sh, maxShingleDf), threshold)
  }

  /** DF-bounded candidate pairs from a per-shingle group (package-visible
    * so PlanSpec can assert the pre-checkpoint pipeline shape).
    */
  private[graft] def ngramCandidates(sh: DataFrame, maxShingleDf: Int): DataFrame = {
    // bounded per-shingle doc list: ≤ maxShingleDf+1 ids buffered per
    // group; df counts ALL occurrences so an over-cap group is detected
    // and dropped while every surviving group's list is complete
    val bounded = call_function("topk_rows_agg",
      struct(col("doc_id")), lit(maxShingleDf + 1), array(lit(0)), array(lit(false)))
    sh.groupBy("s")
      .agg(count(lit(1)).as("df"), bounded.as("ids"))
      .filter(col("df") > 1 && col("df") <= maxShingleDf)
      .select(explode(pairsOf(transform(col("ids"), r => r.getField("doc_id")))).as("p"))
      .select(col("p.a"), col("p.b"))
      .distinct()
  }

  /** Shared verification tail for candidate-pair generators: lazily
    * materialize the candidates (consumed three times), semi-join the
    * corpus down to candidate docs, and score the exact jaccard on their
    * hashed shingle sets.
    */
  private def verifyCandidatePairs(docsS: DataFrame, id: String, text: String,
                                   k: Int, cands0: DataFrame,
                                   threshold: Double): DataFrame = {
    val cands = cands0.localCheckpoint(eager = false)
    val candIds = cands.select(col("a").as("doc_id"))
      .union(cands.select(col("b").as("doc_id"))).distinct()
    val candSets = docsS.join(candIds, docsS(id) === candIds("doc_id"), "left_semi")
      .select(col(id).as("doc_id"), hashedShingleSet(col(text), k, 0x51c0L).as("shingles"))
    verifyByShingleSets(cands, candSets, threshold)
  }

  /** Duplicate-group labeling: connected components over a near-dup pair
    * set — every doc labeled with its component's minimum id (singletons
    * label themselves). Each round (1) spreads labels one hop along the
    * undirected edge set keeping the per-node minimum, then (2) pointer-
    * jumps: every node adopts its current label's label (path halving, as
    * in the alternating-star CC family — Kiveris et al. 2014). The jump
    * shortcuts label chains, so rounds-to-fixpoint is O(log diameter)
    * rather than the diameter itself — on a near-dup cluster of diameter
    * 2-4 it converges in 2-3 rounds, and a pathological long chain no
    * longer costs one full labels materialization per hop. Each round is
    * three narrow id-keyed shuffles; the convergence probe is an
    * `isEmpty` on the still-improving set, never a data collect;
    * `localCheckpoint` truncates the iterative lineage so the plan stays
    * bounded at any round count.
    */
  def dupGroups(nodes: DataFrame, pairs: DataFrame,
                id: String = "doc_id", maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
    var labels = nodes.select(col(id).as("doc_id"), col(id).as("group_id"))
      .localCheckpoint()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val spread = edges.join(labels, edges("b") === labels("doc_id"))
        .select(edges("a").as("doc_id"), col("group_id"))
      val hop = labels.union(spread)
        .groupBy("doc_id").agg(min("group_id").as("group_id"))
        .localCheckpoint() // the jump self-join below reads it twice
      // pointer jump: label(u) := label(label(u)). Every label IS a node
      // id of the same component (initialized to self, min over member
      // ids), so the lookup is total and the adopted label stays in the
      // component. The lookup side is a plain toDF rename of the
      // checkpointed frame — Catalyst's relation dedup handles the
      // self-join; both sides scan the stored blocks (no re-aggregation,
      // no row round-trip). (A subquery-alias self-join of the same plan
      // trips the union constraint rewrite — keep the bare rename.)
      val jumpMap = hop.toDF("_jd", "_jg")
      val next = hop.join(jumpMap, col("group_id") === col("_jd"), "left")
        .select(col("doc_id"),
          least(col("group_id"), coalesce(col("_jg"), col("group_id")))
            .as("group_id"))
        .localCheckpoint()
      // labels only ever decrease — fixpoint when no node improved (a
      // quiet round means neither the hop nor the jump found anything)
      done = next.join(labels.withColumnRenamed("group_id", "_prev"), "doc_id")
        .filter(col("group_id") < col("_prev")).isEmpty
      labels = next
      round += 1
    }
    // silent non-convergence would mis-split groups (a >maxRounds-diameter
    // chain keeps stale labels) — refuse rather than return wrong labels
    if (!done) throw new IllegalStateException(
      s"dupGroups did not converge within $maxRounds rounds " +
        "(component diameter exceeds maxRounds)")
    labels
  }

  /** Quality-aware canonical selection: keep the BEST-scoring member of
    * each duplicate group (score desc, lowest id on ties) instead of the
    * min-id convention — near-dup groups contain genuinely different
    * renditions, and curation wants the longest/cleanest one, not the
    * one with the smallest id. `labels` is any (id, group_id) table
    * ([[dupGroups]] output); `scored` carries the id and score. One
    * co-partitioned join + one max-of-struct aggregate per group —
    * nothing wider than the labels table moves. Output:
    * (group_id, id, score, n_members).
    */
  def keepBestPerGroup(labels: DataFrame, scored: DataFrame,
                       id: String = "doc_id",
                       scoreCol: String = "score"): DataFrame = {
    // min_by over (null-flag, −score, id) keeps the winner's id intact
    // for ANY id type (string host labels included — unary minus on the
    // id itself would cast strings to double and null out every winner).
    // BOTH output columns come from the SAME winning row via the SAME
    // ordering — a max(score) shortcut would pair the winner's id with
    // another row's score whenever the ordering and max disagree (null
    // scores, NaN — which sorts greatest, winning max while losing the
    // negated ordering). The leading null FLAG (not a sentinel value —
    // a -Infinity score negates to +∞ and would collide with any finite
    // sentinel) makes every real score, -Infinity and NaN included,
    // beat a null one; NaN ranks last among real scores.
    val ord = struct(col(scoreCol).isNull.cast("int").as("nu"),
      (-col(scoreCol)).cast("double").as("ns"), col(id).as("i"))
    labels.join(scored.select(col(id), col(scoreCol)), Seq(id))
      .groupBy("group_id")
      .agg(min_by(col(id), ord).as(id),
        min_by(col(scoreCol), ord).as(scoreCol),
        count(lit(1)).as("n_members"))
      .select(col("group_id"), col(id), col(scoreCol), col("n_members"))
  }

  /** MinHash signature: perm_j(s) = h1(s) + j * h2(s) (double hashing over
    * two 64-bit murmurs — 2 hash evaluations per shingle regardless of the
    * number of permutations). Computed by the one-pass
    * [[graft.functions.MinHashAgg]] native aggregate: a primitive long[]
    * buffer per doc instead of a numPerms-column aggregate plan.
    */
  def minhashSignatures(sh: DataFrame, numPerms: Int): DataFrame =
    sh.withColumn("h1", murmur64(col("s"), lit(1L)))
      .withColumn("h2", murmur64(col("s"), lit(2L)))
      .groupBy("doc_id")
      .agg(call_function("minhash_agg", col("h1"), col("h2"), lit(numPerms)).as("sig"))

  /** Scan-fused signatures: the whole signature per doc in one row-local
    * pass (`minhash_sig` native expression) — bit-identical to
    * [[minhashSignatures]] over [[explodedShingles]] (min is duplicate-
    * invariant) with NO shuffle and no per-shingle row materialization.
    * Null texts yield no signature row, matching the explode path's drop.
    */
  def minhashSignaturesFused(docs: DataFrame, id: String, text: String,
                             k: Int, numPerms: Int): DataFrame =
    docs.select(col(id).as("doc_id"),
        call_function("minhash_sig", shingles(col(text), k), lit(numPerms)).as("sig"))
      .filter(col("sig").isNotNull)

  /** Banded LSH buckets: (doc_id, band, bkey). bkey digests the band's rows
    * so the bucket join key is constant-width however many rows per band.
    */
  def lshBuckets(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("doc_id"), explode(bandKeyStructs(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

  /** The (band, bkey) struct array for one signature — ONE definition
    * shared by the batch bucket builder and the streaming ingest: a saved
    * index is only as good as its keys, so the key format must not be able
    * to drift between the writer and a reader.
    */
  private def bandKeyStructs(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val rowCols = (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1).cast("string"))
      struct(lit(b).as("band"), md5(concat_ws(",", rowCols: _*)).as("bkey"))
    }: _*)

  /** Candidate pairs from shared LSH buckets (distinct, a < b).
    *
    * One aggregation on (band, bkey) emitting each bucket's id-ordered
    * pairs, not a bucket self-join: the self-join evaluates the whole
    * shingle→signature pipeline once per side (Spark's exchange reuse does
    * not unify the two aliased subtrees), so the aggregate halves the
    * sketch work and shuffles the narrow (doc_id, band, bkey) rows exactly
    * once. Per-bucket memory is one id per member; a bucket of m docs
    * emits m(m-1)/2 pairs under either formulation — that fan-out is
    * intrinsic to LSH candidates (see SCALE.md for the skew knob).
    */
  def lshCandidates(buckets: DataFrame): DataFrame =
    buckets.groupBy("band", "bkey")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a"), col("p.b"))
      .distinct()

  /** All (a, b) element pairs of a sorted array, a before b (shared with
    * [[Similarity.embeddingNearDupPairs]]'s bucket aggregation).
    */
  private[operators] def pairsOf(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        y => struct(x.as("a"), y.as("b")))))

  /** Candidate verification by per-doc shingle-set intersection: the pair
    * list joins each side's shingle array once (candidates are few; each
    * doc's array ships once per side), and jaccard = |a∩b|/(|a|+|b|-|a∩b|)
    * — the same arithmetic as [[jaccardOfPairs]], without re-joining the
    * full exploded shingle table per side.
    */
  private def verifyByShingleSets(cands: DataFrame, perDoc: DataFrame,
                                  threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("sa"), col("sb")))
    cands
      .join(perDoc.select(col("doc_id").as("a"), col("shingles").as("sa")), "a")
      .join(perDoc.select(col("doc_id").as("b"), col("shingles").as("sb")), "b")
      .select(col("a"), col("b"),
        round(inter * lit(1.0) / (size(col("sa")) + size(col("sb")) - inter), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-doc hashed distinct-shingle set, computed inside the scan stage
    * (an 8-byte murmur per shingle instead of the string; collision odds
    * ~n²/2^64, negligible against the 6dp jaccard rounding).
    */
  private def hashedShingleSet(text: Column, k: Int, seed: Long): Column =
    transform(array_distinct(shingles(text, k)), s => murmur64(s, lit(seed)))

  /** Full MinHash+LSH dedup: candidates by banding, verified by exact
    * Jaccard on candidate pairs only. Output identical in shape (and, when
    * band/row parameters give ~1.0 recall at the threshold, in content) to
    * [[ngramJaccardPairs]] — but the join is on constant-size band keys, not
    * on raw shingles, so it scales to corpora where the shingle join would
    * fan out.
    *
    * 100 TB shape: [[MinHashAgg]] partially aggregates map-side, so the
    * signature shuffle carries one fixed 512-byte buffer per (doc,
    * partition) — never raw shingles; verification re-derives shingle sets
    * ONLY for candidate documents via a semi-join into a second scan — no
    * corpus-wide cache or collect_list to spill, ever.
    */
  def minhashLsh(docs: DataFrame, id: String, text: String, k: Int,
                 threshold: Double, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val docsS = graft.Tables.spread(docs)
    val sigs = minhashSignaturesFused(docsS, id, text, k, bands * rowsPerBand)
    // the candidate set is consumed three times below (both union branches
    // of candIds + the verify join) and Spark re-evaluates the whole
    // sketch pipeline per consumer — checkpoint the tiny (a, b) table so
    // it materializes once (lazily: construction/explain stay free of
    // jobs; the first action computes it and every consumer reads the
    // stored blocks)
    val cands = lshCandidates(lshBuckets(sigs, bands, rowsPerBand))
      .localCheckpoint(eager = false)
    val candIds = cands.select(col("a").as("doc_id"))
      .union(cands.select(col("b").as("doc_id"))).distinct()
    val candSets = docsS.join(candIds, docsS(id) === candIds("doc_id"), "left_semi")
      .select(col(id).as("doc_id"), hashedShingleSet(col(text), k, 1L).as("shingles"))
    verifyByShingleSets(cands, candSets, threshold)
  }

  /** Cross-corpus near-duplicate pairs: near-dups BETWEEN `newDocs` and
    * `corpus` only — the incremental-ingest shape (dedup a fresh crawl
    * against the already-ingested corpus; drop new docs with a match).
    * Runs the shared MinHash+LSH pipeline over the tagged union, then
    * keeps only pairs straddling the sides, oriented (new_id, corpus_id,
    * jaccard). Within-side duplicates are intentionally ignored — dedupe
    * each side with [[minhashLsh]] first if needed.
    *
    * Ids must be unique ACROSS both inputs (namespace upstream when two
    * crawls share an id space). Cost is one LSH pass over new+corpus; at
    * steady state the corpus side's signatures are worth persisting, the
    * same incremental trade as the IVF index.
    */
  def crossCorpusNearDups(newDocs: DataFrame, corpus: DataFrame, id: String,
                          text: String, k: Int, threshold: Double): DataFrame = {
    val union = newDocs.select(col(id), col(text))
      .unionByName(corpus.select(col(id), col(text)))
    val pairs = minhashLsh(union, id, text, k, threshold)
    // near-dup pairs are tiny next to the corpora: id-keyed joins tag each
    // end, then cross-side pairs orient new -> corpus
    val newIds = newDocs.select(col(id).as("_id")).withColumn("_new", lit(true))
    val tagged = pairs
      .join(newIds.withColumnRenamed("_id", "a").withColumnRenamed("_new", "_na"),
        Seq("a"), "left_outer")
      .join(newIds.withColumnRenamed("_id", "b").withColumnRenamed("_new", "_nb"),
        Seq("b"), "left_outer")
      .select(col("a"), col("b"), col("jaccard"),
        coalesce(col("_na"), lit(false)).as("_na"),
        coalesce(col("_nb"), lit(false)).as("_nb"))
    tagged.filter(col("_na") =!= col("_nb"))
      .select(
        when(col("_na"), col("a")).otherwise(col("b")).as("new_id"),
        when(col("_na"), col("b")).otherwise(col("a")).as("corpus_id"),
        col("jaccard"))
  }

  /** Persistent LSH dedup index: the corpus's banded buckets plus its
    * hashed shingle sets — the steady-state structure
    * [[crossCorpusNearDups]]'s doc promises. Built once per corpus epoch;
    * each ingest then sketches ONLY the crawl (see
    * [[ingestAgainstLshIndex]]) and never re-reads corpus text. [[save]]
    * partitions buckets by band (co-locates each band's bucket join) and
    * writes the shingle sets id-keyed; both reload with
    * [[lshIndexLoad]].
    */
  final case class LshIndex(buckets: DataFrame, shingleSets: DataFrame) {
    def save(dir: String): Unit = {
      buckets.write.mode("overwrite").partitionBy("band").parquet(s"$dir/buckets")
      shingleSets.write.mode("overwrite").parquet(s"$dir/shingles")
    }
  }

  /** Build the [[LshIndex]] for a corpus: scan-fused signatures → banded
    * buckets, plus the per-doc hashed shingle sets the verification stage
    * needs (seed matches [[minhashLsh]]'s verify pass, so index-served
    * results are bit-identical to the from-scratch pipeline).
    */
  def lshIndexBuild(corpus: DataFrame, id: String, text: String, k: Int,
                    bands: Int = 16, rowsPerBand: Int = 4): LshIndex = {
    val sigs = minhashSignaturesFused(corpus, id, text, k, bands * rowsPerBand)
    LshIndex(lshBuckets(sigs, bands, rowsPerBand),
      corpus.select(col(id).as("doc_id"),
        hashedShingleSet(col(text), k, 1L).as("shingles")))
  }

  def lshIndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String): LshIndex =
    LshIndex(spark.read.parquet(s"$dir/buckets"),
      spark.read.parquet(s"$dir/shingles"))

  /** Incremental-ingest near-dup detection against a persistent
    * [[LshIndex]]: same output as
    * `crossCorpusNearDups(newDocs, corpus, ...)` — (new_id, corpus_id,
    * jaccard >= threshold), cross-side pairs only — but the corpus side
    * costs ZERO text scans: the crawl alone is sketched, its buckets
    * equi-join the saved bucket table on (band, bkey), and verification
    * joins the saved shingle sets. Bucket/verify parameters must match the
    * ones the index was built with; ids must be unique across crawl and
    * corpus.
    */
  def ingestAgainstLshIndex(newDocs: DataFrame, index: LshIndex, id: String,
                            text: String, k: Int, threshold: Double,
                            bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val newSigs = minhashSignaturesFused(newDocs, id, text, k, bands * rowsPerBand)
    val cands = lshBuckets(newSigs, bands, rowsPerBand)
      .join(index.buckets.withColumnRenamed("doc_id", "b"), Seq("band", "bkey"))
      .select(col("doc_id").as("a"), col("b"))
      .distinct()
      .localCheckpoint(eager = false) // consumed by both verify joins
    val newSets = newDocs.select(col(id).as("doc_id"),
      hashedShingleSet(col(text), k, 1L).as("shingles"))
    // semi-join the (big) stored set table down to candidate ids before the
    // verify joins — the id set is tiny and broadcasts, so the corpus-side
    // sets are scanned once and never shuffled in full
    val candIds = cands.select(col("a").as("doc_id"))
      .union(cands.select(col("b").as("doc_id"))).distinct()
    val perDoc = newSets.unionByName(index.shingleSets)
      .join(candIds, Seq("doc_id"), "left_semi")
    verifyByShingleSets(cands, perDoc, threshold)
      .select(col("a").as("new_id"), col("b").as("corpus_id"), col("jaccard"))
  }

  /** Streaming-native LSH ingest: [[ingestAgainstLshIndex]] as an UNBOUNDED
    * append-mode stream — safe on a never-ending crawl, unlike the
    * foreachBatch form (which is still right when each micro-batch should
    * run the full batch operator).
    *
    * Unbounded-stream safety by construction:
    *  - signature AND hashed shingle set are sketched in ONE stateless
    *    projection per row (the stream never self-joins for verification —
    *    a stream-stream join would hold state forever);
    *  - the bucket lookup and the corpus shingle-set fetch are
    *    stream-STATIC equi-joins: stateless, append-safe, and the only
    *    corpus-side cost is the saved index, never the corpus text;
    *  - the one stateful op — collapsing the same pair surfacing from
    *    several bands — is `dropDuplicatesWithinWatermark`, so its state is
    *    BOUNDED by the event-time watermark instead of growing with every
    *    pair ever seen.
    */
  def ingestAgainstLshIndexStream(newDocs: DataFrame, index: LshIndex,
                                  id: String, text: String, tsCol: String,
                                  k: Int, threshold: Double,
                                  bands: Int = 16, rowsPerBand: Int = 4,
                                  watermarkDelay: Option[String] = Some("10 minutes")): DataFrame = {
    // None = the caller already watermarked tsCol upstream (Spark forbids
    // redefining a watermark, and one definition propagates downstream —
    // the composed-DAG case where an earlier dedup stage set it)
    val sk = watermarkDelay.fold(newDocs)(newDocs.withWatermark(tsCol, _))
      .select(col(tsCol), col(id).as("doc_id"),
        call_function("minhash_sig", shingles(col(text), k),
          lit(bands * rowsPerBand)).as("sig"),
        hashedShingleSet(col(text), k, 1L).as("sa"))
      .filter(col("sig").isNotNull)
    val bucketed = sk
      .select(col(tsCol), col("doc_id"), col("sa"),
        explode(bandKeyStructs(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col(tsCol), col("doc_id"), col("sa"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cands = bucketed
      .join(index.buckets.withColumnRenamed("doc_id", "b"), Seq("band", "bkey"))
      .select(col(tsCol), col("doc_id").as("a"), col("b"), col("sa"))
      .dropDuplicatesWithinWatermark("a", "b")
    val inter = size(array_intersect(col("sa"), col("sb")))
    cands
      .join(index.shingleSets.select(col("doc_id").as("b"), col("shingles").as("sb")), "b")
      .select(col("a").as("new_id"), col("b").as("corpus_id"),
        round(inter * lit(1.0) / (size(col("sa")) + size(col("sb")) - inter), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Bloom-prefiltered EXACT ingest dedup: keep the new-crawl docs whose
    * (lowercased) text does not already exist in the corpus. The companion
    * of [[crossCorpusNearDups]] for the exact-match tier of incremental
    * ingest — the result is IDENTICAL to a plain digest anti-join; the
    * Bloom filter only changes the cost shape:
    *
    *  - corpus digests fold into one bounded Bloom sketch (a tree-reduce;
    *    at steady state the sketch persists alongside the corpus and this
    *    build step disappears, the same incremental trade as the IVF
    *    index);
    *  - bloom-NEGATIVE new docs — at a real ingest ratio, almost all of
    *    them — are kept map-side with zero shuffle (a Bloom miss proves
    *    absence);
    *  - only bloom-POSITIVE docs (true re-crawls + the fpp sliver) reach
    *    the verification anti-join, so the join's left side is ~|dups|,
    *    not |crawl|. False positives are eliminated there: exactness
    *    never depends on the sketch.
    *
    * Size `expectedItems` to the corpus row count; the sketch is ~1.2 GB
    * per 10^9 docs at fpp=0.01 — broadcastable. The membership probe is a
    * Scala UDF (the sketch lives outside codegen); it gates rows only, so
    * the scan/prune pipeline around it is unaffected.
    */
  def bloomIngestDedup(newDocs: DataFrame, corpus: DataFrame, id: String,
                       text: String, expectedItems: Long = 1000000L,
                       fpp: Double = 0.01): DataFrame = {
    val digest = md5(lower(col(text)))
    val corpusDigests = corpus.select(digest.as("_digest"))
    val bloom = corpusDigests.stat.bloomFilter("_digest", expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((d: String) => d != null && bc.value.mightContainString(d))
    val tagged = newDocs.withColumn("_digest", digest)
      .withColumn("_maybe", mightContain(col("_digest")))
    val cleanFastPath = tagged.filter(!col("_maybe"))
    val verified = tagged.filter(col("_maybe"))
      .join(corpusDigests, Seq("_digest"), "left_anti")
    cleanFastPath.unionByName(verified).drop("_digest", "_maybe")
  }

  /** 64-bit SimHash from per-shingle murmurs: bit j of the signature is set
    * iff the sum of ±1 votes of that bit across shingles is >= 0.
    */
  /** Sentence-level cross-document dedup — the RefinedWeb/CCNet
    * line-dedup move at sentence granularity: a sentence appearing in
    * MORE THAN `maxDocFreq` distinct documents is boilerplate
    * ("subscribe to our newsletter", cookie banners, share-bar text)
    * and every occurrence is removed; each document rebuilds from its
    * surviving sentences in original order. Complements the span tier
    * ([[duplicatedSpans]] catches verbatim RUNS across doc pairs; this
    * catches short TEMPLATED sentences stamped across thousands of
    * docs).
    *
    * Shape at scale: one sentence-keyed distinct-doc count (map-side
    * partials), the over-frequency set joins back on the SENTENCE KEY
    * (co-partitioned; bounded by the boilerplate vocabulary, and only
    * the flag travels), and the rebuild is one doc-keyed aggregation
    * whose per-group state is the document's own sentence list. Output:
    * (doc_id, clean_text, n_kept, n_dropped) for every doc with ≥ 1
    * sentence.
    */
  def dedupSentences(docs: DataFrame, id: String, text: String,
                     maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, s"dedupSentences: maxDocFreq must be >= 1, got $maxDocFreq")
    val sents = docs.select(col(id).as("doc_id"),
      posexplode(TextAnalysis.sentenceSplit(col(text))).as(Seq("sent_idx", "sentence")))
    val common = sents.groupBy("sentence")
      .agg(countDistinct(col("doc_id")).as("_df"))
      .filter(col("_df") > maxDocFreq)
      .select(col("sentence"), lit(1).as("_dup"))
    sents.join(common, Seq("sentence"), "left")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("_dup").isNull,
            struct(col("sent_idx"), col("sentence"))))),
          x => x.getField("sentence")), " ").as("clean_text"),
        count(when(col("_dup").isNull, lit(1))).as("n_kept"),
        count(when(col("_dup").isNotNull, lit(1))).as("n_dropped"))
  }

  def simhashSignatures(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id")
      .agg(call_function("simhash_agg", murmur64(col("s"), lit(0x51c0L))).as("simhash"))

  /** Scan-fused SimHash: one row-local pass (`simhash_sig` expression,
    * internal distinct — bit-identical to [[simhashSignatures]] over
    * [[explodedShingles]]), no shuffle, no per-shingle rows.
    */
  def simhashSignaturesFused(docs: DataFrame, id: String, text: String,
                             k: Int): DataFrame =
    docs.select(col(id).as("doc_id"),
        call_function("simhash_sig", shingles(col(text), k)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash near-dup pairs: pigeonhole candidate join (any of four 16-bit
    * chunks equal ⇒ covers all pairs with hamming distance <= 3), hamming
    * filter, then exact-Jaccard verification like the other paths.
    */
  def simhashPairs(docs: DataFrame, id: String, text: String, k: Int,
                   maxHamming: Int, threshold: Double): DataFrame = {
    // signatures are scan-fused (simhash_sig) — no shingle rows, no
    // shuffle at all in the signature stage
    val docsS = graft.Tables.spread(docs)
    val perDoc = simhashSignaturesFused(docsS, id, text, k)
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("ci"), shiftright(col("simhash"), 16 * c).bitwiseAND(lit(0xffffL)).as("cv"))
    }
    val chunked = perDoc.select(col("doc_id"), col("simhash"), explode(array(chunks: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    // same one-pass bucket aggregation as lshCandidates (signature pipeline
    // evaluated once, one narrow shuffle); members carry their simhash so
    // the hamming filter runs inside the pair expansion
    val cands = chunked.groupBy("ci", "cv")
      .agg(sort_array(collect_set(struct(col("doc_id"), col("simhash")))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(pairsOf(col("ms"))).as("p"))
      .filter(bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash"))) <= maxHamming)
      .select(col("p.a.doc_id").as("a"), col("p.b.doc_id").as("b"))
      .distinct()
    verifyCandidatePairs(docsS, id, text, k, cands, threshold)
  }

  /** Exact-substring duplicated spans (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", the ExactSubstr variant):
    * every `w`-token window that occurs at least twice anywhere in the
    * corpus is a duplicated window; per document, overlapping-or-adjacent
    * duplicated windows merge into maximal spans. Output one row per span:
    * (doc_id, span_start, span_end, dup_windows) with 1-based inclusive
    * token positions.
    *
    * Shape at scale: the window explode restates the corpus ~w tokens deep;
    * fingerprints are 16-byte binary md5 digests, so the one corpus-sized
    * shuffle (groupBy fp) carries fixed-width keys, never window text.
    * Duplicated fingerprints are found and fanned back out in a single
    * aggregation (same bounded-bucket shape as [[lshCandidates]] — no
    * second corpus-wide shuffle for a semi-join probe); a pathological
    * boilerplate window shared by very many documents makes a hot bucket —
    * pre-filter such windows upstream if the corpus has one. The span
    * merge is a narrow per-document window over only the duplicated hits.
    *
    * `stride > 1` thins the explode by offset — it only matches duplicates
    * whose regions are ALIGNED mod stride across documents (identical
    * re-crawls, shared prefixes). For alignment-free thinning with a real
    * guarantee use [[winnowedSpans]].
    */
  def duplicatedSpans(docs: DataFrame, id: String, text: String,
                      w: Int, stride: Int = 1): DataFrame = {
    require(w >= 2, s"window width must be >= 2 tokens, got $w")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val toks = words(col(text))
    val win = docs
      .select(col(id).as("doc_id"), toks.as("t"))
      .where(size(col("t")) >= w)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - (w - 1), lit(stride))).as("s"),
        col("t"))
      .select(col("doc_id"), col("s").cast("long").as("s"),
        unhex(md5(array_join(slice(col("t"), col("s"), lit(w)), " "))).as("fp"))
    mergeDupSpans(win, w)
  }

  /** Excise duplicated spans — the REMOVAL step of Lee et al. 2021's
    * ExactSubstr dedup (the paper cuts the duplicated substrings out of
    * the corpus; [[duplicatedSpans]] only reports them). Every token
    * inside any of the doc's duplicated spans is dropped and the
    * survivors rejoin in order. Output text is the canonical lowercase
    * single-space token stream for EVERY doc (span-free docs included) so
    * the two branches agree; a fully-duplicated doc comes back empty.
    *
    * Shape at scale: the span table is tiny next to the corpus and joins
    * id-keyed; the excision itself is row-local (zip, per-token
    * span-membership test against the doc's own span array, rejoin) — no
    * explode of the corpus beyond the fingerprint pass already inside
    * [[duplicatedSpans]].
    */
  def removeDuplicatedSpans(docs: DataFrame, id: String, text: String,
                            w: Int): DataFrame = {
    val spans = duplicatedSpans(docs, id, text, w)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("_spans"))
    val toks = words(col(text))
    val indexed = zip_with(toks, sequence(lit(1), size(toks)),
      (t, i) => struct(t.as("t"), i.cast("long").as("i")))
    val sp = coalesce(col("_spans"),
      array().cast("array<struct<span_start:bigint,span_end:bigint>>"))
    docs.join(spans, docs(id) === spans("doc_id"), "left")
      .select(docs(id).as("doc_id"),
        array_join(
          transform(
            filter(indexed, p => !exists(sp,
              s => p("i") >= s("span_start") && p("i") <= s("span_end"))),
            p => p("t")),
          " ").as("clean_text"))
  }

  /** Winnowed duplicated spans (Schleimer et al. 2003, "Winnowing: Local
    * Algorithms for Document Fingerprinting" — the MOSS selection): instead
    * of every window, keep only the window whose md5 is the (leftmost)
    * minimum of each sliding group of `s` consecutive window hashes. The
    * selection depends on content, not offset, so it is ALIGNMENT-FREE and
    * carries winnowing's guarantee: any duplicated region of
    * >= w + s - 1 tokens shares at least one selected fingerprint. Expected
    * selection density is 2/(s+1) — the corpus-sized fingerprint shuffle
    * shrinks by ~s/2 while the guarantee holds, which strided thinning
    * cannot offer (see [[duplicatedSpans]]).
    *
    * Selection runs in the native one-pass
    * [[graft.functions.WinnowFps]] expression (window md5s computed once,
    * monotonic-deque sliding min) — scan-fused, no extra shuffle. The
    * equivalent declarative transform/slice/array_min form goes quadratic
    * under Catalyst's projection collapse (each lambda step re-inlines the
    * whole hash-array expression). Requires
    * [[graft.functions.Functions.ensure]] on the session. `s <= w` keeps
    * selected windows of one region overlapping-or-adjacent so the island
    * merge still emits one span per region.
    *
    * Output contract caveat: `dup_windows` counts only winnow-SELECTED
    * duplicated windows (expected ~2/(s+1) of [[duplicatedSpans]]'s count
    * for the same region) — span boundaries are comparable across the two
    * operators, window counts are not.
    */
  def winnowedSpans(docs: DataFrame, id: String, text: String,
                    w: Int, s: Int): DataFrame = {
    require(w >= 2, s"window width must be >= 2 tokens, got $w")
    require(s >= 1 && s <= w,
      s"winnow window must be in [1, $w] so selected spans still merge, got $s")
    val win = docs
      .select(col(id).as("doc_id"), words(col(text)).as("t"))
      .where(size(col("t")) >= w)
      .select(col("doc_id"),
        explode(call_function("winnow_fps", col("t"), lit(w), lit(s))).as("o"))
      .select(col("doc_id"), col("o.pos").cast("long").as("s"), col("o.fp").as("fp"))
    mergeDupSpans(win, w)
  }

  /** Shared tail of the span operators: windows (doc_id, s, fp) → spans.
    * One bucket aggregation finds+fans-out duplicated fingerprints; then a
    * narrow per-doc gaps-and-islands window merges overlapping-or-adjacent
    * hits into maximal spans.
    */
  private def mergeDupSpans(win: DataFrame, w: Int): DataFrame = {
    val hits = win.groupBy("fp")
      .agg(collect_list(struct(col("doc_id"), col("s"))).as("occ"))
      .where(size(col("occ")) >= 2)
      .select(explode(col("occ")).as("o"))
      .select(col("o.doc_id").as("doc_id"), col("o.s").as("s"),
        (col("o.s") + (w - 1)).as("e"))
    // gaps-and-islands: a hit starts a new span unless it overlaps or abuts
    // the running max of merged span ends
    val byDoc = Window.partitionBy("doc_id").orderBy("s")
    val prevEnd = max(col("e")).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("flag",
        when(prevEnd.isNull || prevEnd < col("s") - 1, 1).otherwise(0))
      .withColumn("island", sum(col("flag")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("s").as("span_start"), max("e").as("span_end"),
        count(lit(1)).as("dup_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("dup_windows"))
  }
}
