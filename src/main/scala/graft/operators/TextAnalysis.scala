package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. Every function
  * is a pure codegen'd Column expression (no UDFs) so the whole pipeline
  * stays inside one WholeStageCodegen span over the corpus scan.
  */
object TextAnalysis {

  def words(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count (regex split, robust to repeated whitespace). */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** Count of BPE-ish sub-tokens: runs of letters, runs of digits, or single
    * punctuation — a cheap deterministic proxy for a real tokenizer's token
    * count (the actual BPE merge table would be a broadcast lookup).
    */
  def subTokenCount(text: Column): Column =
    size(filter(split(lower(text), "(?<=[^a-z0-9])|(?=[^a-z0-9])"), w => trim(w) =!= ""))

  /** Compression-ratio quality signal: DEFLATE-compressed size over raw
    * UTF-8 size. Template spam and machine-generated repetition compress
    * far below natural prose (~0.4–0.7); random gibberish sits near/above
    * 1.0 — the cheap single-pass complement to the Gopher repetition
    * measures (a doc-level filter in the Dolma/RedPajama pipelines).
    * Native codegen'd `deflate_len` expression, so the signal fuses into
    * the corpus scan; empty text is defined as ratio 0.0 rather than a
    * 0/0 null. The ratio is the RAW IEEE quotient of the two exact integer
    * operands (never a rounded quotient — the Queries.scala determinism
    * rule), so it is bit-identical in every engine given the same ints.
    */
  def compressionRatio(text: Column): Column = {
    import graft.functions.Functions.deflate_len
    when(octet_length(text) === 0, lit(0.0))
      .otherwise(deflate_len(text).cast("double") / octet_length(text))
  }

  /** Unicode NFC normalization (canonical decomposition + composition) —
    * apply before digest/dedup keys and vocabulary counts so
    * canonically-equal texts ("é" vs "e"+U+0301) produce one key and one
    * vocabulary entry. Native codegen'd expression, scan-fused; DuckDB's
    * nfc_normalize implements the same Unicode algorithm, so outputs are
    * oracle-comparable byte-for-byte.
    */
  def nfcNormalize(text: Column): Column =
    graft.functions.Functions.nfc_normalize(text)

  /** HTML → text extraction for raw `response` WARC records (the step
    * WET files have already had applied — this makes the raw `.warc`
    * ingest path end at the same plain text): drop `<script>`/`<style>`
    * blocks and comments wholesale, turn every remaining tag into a word
    * boundary (a space — `<p>a</p><p>b</p>` must not fuse "ab"), decode
    * the HTML entities that appear in running text (`&amp;` LAST, so
    * double-escaped text un-escapes exactly one level, like a browser),
    * and collapse whitespace. Pure scan-fused regexp/replace work — one
    * WholeStageCodegen span, zero shuffles; all patterns are
    * RE2-compatible (no lookaround), so DuckDB executes the identical
    * specification for the oracle.
    *
    * Deliberately NOT a DOM parse: boilerplate/main-content extraction is
    * the job of the quality tier ([[graft.operators.Quality]] boilerplate
    * lines); this is the lexical layer under it.
    */
  def htmlToText(html: Column): Column = {
    // one pass per tag (not an open/close alternation): a script block must
    // only be closed by </script>, or `<script>…</style>x</script>` would
    // leak trailing script content into the extracted text on malformed
    // real-crawl HTML
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noBlocks = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&" // last: one un-escape level, browser-like
    ).foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Block-boundary tags for [[htmlBlockSignals]] — every tag that ends a
    * text flow in HTML rendering; inline markup (`a`, `b`, `span`, …)
    * stays inside its block. RE2-and-Java-compatible.
    */
  val HtmlBlockSplitRe: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "blockquote|pre|section|article|aside|nav|footer|header|main|figure|" +
      "figcaption|form|fieldset|br|hr)[^>]*>"

  /** jusText/trafilatura-style block-level content classification — the
    * main-content extraction step between [[htmlToText]]'s lexical layer
    * and the document-level quality tier: split the page into rendering
    * blocks, measure each block's anchor-text share, and flag a block as
    * content iff its link density stays under `maxLinkDensity` AND it
    * carries at least `minChars` characters (nav bars, footers, and
    * link-farm lists are short and link-dense; body paragraphs are long
    * and link-sparse — Kohlschütter 2010 / Pomikálek 2011's core
    * signal).
    *
    * Output one row per non-empty block: (id, block_idx, text, n_chars,
    * link_chars, link_density, is_content); block_idx is the 1-based raw
    * split position (stable even though empty blocks drop). `text` is
    * tag-stripped and whitespace-collapsed; `link_chars` sums the
    * collapsed anchor texts, so density compares like with like. The
    * classification threshold compares the ROUNDED (6 dp) density, so
    * both engines decide boundaries identically.
    *
    * Shape at scale: pure scan-fused regexp work + one posexplode — the
    * page restates as its blocks, no shuffle, no join; classification is
    * a per-row predicate. All patterns are RE2-compatible, so DuckDB
    * executes the identical specification for the oracle.
    */
  def htmlBlockSignals(pages: org.apache.spark.sql.DataFrame, id: String,
                       htmlCol: String, maxLinkDensity: Double = 0.33,
                       minChars: Int = 25): org.apache.spark.sql.DataFrame = {
    require(maxLinkDensity >= 0 && minChars >= 1,
      s"htmlBlockSignals: bad thresholds ($maxLinkDensity, $minChars)")
    val collapse = (c: Column) => trim(regexp_replace(c, "\\s+", " "))
    val btext = collapse(regexp_replace(col("_blk"), "(?s)<[^>]+>", " "))
    val linkChars = aggregate(
      regexp_extract_all(col("_blk"), lit("(?is)<a [^>]*>([^<]*)</a>"), lit(1)),
      lit(0L), (acc, a) => acc + length(collapse(a)).cast("long"))
    pages
      .select(col(id), posexplode(split(col(htmlCol), HtmlBlockSplitRe))
        .as(Seq("_p", "_blk")))
      .select(col(id), (col("_p") + 1).cast("long").as("block_idx"),
        btext.as("text"), linkChars.as("link_chars"))
      .filter(length(col("text")) > 0)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("link_density",
        round(col("link_chars").cast("double") / col("n_chars"), 6))
      .withColumn("is_content",
        col("link_density") <= lit(maxLinkDensity) &&
          col("n_chars") >= lit(minChars.toLong))
      .select(col(id), col("block_idx"), col("text"), col("n_chars"),
        col("link_chars"), col("link_density"), col("is_content"))
  }

  /** Stopword lists for the n-gram language-ID heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Number of words of `text` appearing in `list`. */
  def stopwordCount(text: Column, list: Seq[String]): Column =
    stopwordCountOf(words(text), list)

  /** [[stopwordCount]] over a caller-supplied word segmentation. */
  def stopwordCountOf(w: Column, list: Seq[String]): Column = {
    val lits = array(list.map(lit): _*)
    size(filter(w, x => array_contains(lits, x)))
  }

  /** CJK-isolated word segmentation — the quality-tier counterpart of
    * the tokenizer's [[graft.functions.Bpe.preTokenize]] spec: every
    * space-free-script character ([[graft.functions.Bpe.CjkCharClass]] —
    * Han/kana/Thai) becomes its own word, Latin runs split on
    * whitespace, empties dropped. Pass this to [[langIdOf]] /
    * [[graft.operators.Quality.gopherWordSignalsOf]] so word counts,
    * stopword hits (the zh list is single characters), and the Gopher
    * thresholds stay meaningful on text that carries no whitespace word
    * boundaries — [[words]]' plain space split would see one giant word
    * per document there. Scan-fused regexp work, zero shuffles.
    */
  def wordsSegmented(text: Column): Column =
    filter(split(regexp_replace(lower(text),
      s"(${graft.functions.Bpe.CjkCharClass})", " $1 "), "\\s+"),
      w => length(w) > 0)

  /** Language-ID: argmax of per-language stopword counts, deterministic
    * first-wins tie-break in declaration order (en, es, de, fr, zh).
    */
  def langId(text: Column): Column = langIdOf(words(text))

  /** [[langId]] over a caller-supplied segmentation — with
    * [[wordsSegmented]], the single-character zh stopwords match inside
    * space-free Chinese text, which the whitespace split never surfaces.
    */
  def langIdOf(w: Column): Column = {
    val counts = stopwords.map { case (lang, list) => lang -> stopwordCountOf(w, list) }
    val branches = counts.zipWithIndex.dropRight(1).map { case ((lang, c), i) =>
      val later = counts.drop(i + 1).map(_._2)
      (later.map(o => c >= o).reduce(_ && _), lang)
    }
    branches.foldRight(lit(counts.last._1): Column) {
      case ((cond, lang), els) => when(cond, lang).otherwise(els)
    }
  }

  /** Quality score in [0,1]: length component (saturating at 100 words),
    * English-stopword-ratio component, and an all-alnum cleanliness
    * component. Deterministic double arithmetic, rounded to 6dp.
    */
  def qualityScore(text: Column): Column = {
    val nWords = size(words(text))
    val stopRatio = stopwordCount(text, stopwords.head._2) * lit(1.0) / nWords
    val lenComponent = least(lit(1.0), nWords * lit(1.0) / lit(100.0))
    val punct = length(regexp_replace(lower(text), "[a-z0-9 ]", ""))
    val cleanComponent = lit(1.0) - punct * lit(1.0) / length(text)
    round(lenComponent * 0.4 + stopRatio * 0.3 + cleanComponent * 0.3, 6)
  }

  /** Canonical-form fingerprint: lowercase, strip non-alphanumerics, split,
    * dedupe, sort, re-join, digest — near-identical editorial variants of a
    * document collapse to one fingerprint (key for a dedup group-by).
    */
  def fingerprint(text: Column): Column = {
    val canon = regexp_replace(lower(text), "[^a-z0-9 ]", "")
    md5(concat_ws(" ", array_sort(array_distinct(split(canon, " ")))))
  }

  /** Rolling polynomial hash of the word sequence (order-sensitive, unlike
    * [[fingerprint]]): fold h = h*31 + murmur(word) in 64-bit space.
    */
  def rollingHash(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => acc * lit(31L) + graft.functions.Functions.murmur64(w, lit(5L)))

  /** Training-corpus text normalization: lowercase, URLs/emails replaced by
    * placeholder tokens, non-text control characters stripped, whitespace
    * collapsed. Pure regexp chain — fuses into the scan, byte-identical to
    * the same chain in any engine.
    */
  def normalize(text: Column): Column = {
    val lowered = lower(text)
    val noUrl = regexp_replace(lowered, "https?://[^\\s]+", "<url>")
    val noMail = regexp_replace(noUrl, "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<email>")
    val noCtl = regexp_replace(noMail, "[\\x00-\\x1f]", " ")
    trim(regexp_replace(noCtl, " {2,}", " "))
  }

  /** Overlapping word-window chunks for context-length-bounded training:
    * starts at 0, stride, 2·stride, … while start < |words|; each chunk is
    * the (clamped) `window`-word slice. Returns array<struct<idx, chunk>> —
    * explode it for the (doc, chunk) relation. Pure per-row expression: the
    * chunk fan-out happens inside the scan stage, no shuffle.
    */
  def chunks(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0)
    val w = words(text)
    val n = ceil(size(w) / lit(stride.toDouble)).cast("int")
    transform(sequence(lit(0), greatest(n, lit(1)) - 1), i =>
      struct(i.as("idx"), array_join(slice(w, i * stride + 1, lit(window)), " ").as("chunk")))
  }

  /** TF-IDF top-k terms per document (keyword extraction): tf = raw term
    * count in the doc, idf = ln(N / df) with N the corpus document count
    * and df the number of documents containing the term. Ranking is on the
    * 6-dp-ROUNDED score (ties broken by term ascending) so the order is
    * reproducible across engines.
    *
    * Shape at scale: two hash aggregations ((doc, term) then term), a
    * term-keyed join of the doc-term table with the vocabulary-sized df
    * table, a 1-row broadcast for N, and a bounded top-k aggregate
    * ([[graft.functions.TopKRowsAgg]]) for the per-doc cut — the final
    * shuffle ships <= k rows per document, never the full term table.
    * Requires [[graft.functions.Functions.ensure]] on the session.
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, id: String,
                    text: String, topK: Int): org.apache.spark.sql.DataFrame = {
    val terms = docs.select(col(id).as("doc_id"), explode(words(col(text))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("score"))
    CqlOps.perPartitionLimitAgg(scored, Seq("doc_id"),
      Seq(("score", true), ("term", false)), topK, "rank")
  }

  /** BM25 keyword search (Robertson et al.; the Lucene-practical variant):
    * top-k documents per query for a small set of keyword queries — the
    * sparse-retrieval complement to the ANN stack (fuse the two ranked
    * lists with [[rrfFuse]] for hybrid retrieval). idf is Lucene's
    * non-negative form ln(1 + (N − df + 0.5)/(df + 0.5)); tf saturates
    * under k1 with b-weighted length normalization against the mean
    * token count.
    *
    * Determinism: avgdl is an exact long sum divided once; per-term
    * scores round to 6 dp and sum as DECIMAL(18,6)
    * (term-order-independent); every float step is double-double (never
    * a decimal-typed intermediate) and the constants combine inside the
    * expression ((k1 + 1.0), (1.0 − b)) so both engines run the
    * identical IEEE op sequence; ranks tie-break doc_id ascending.
    *
    * Shape at scale: the corpus token explode joins the BROADCAST query
    * term table, so only matching rows survive map-side — the only
    * corpus-sized shuffle is the (query, doc, term) tf aggregation over
    * MATCHES; df/N/avgdl are bounded aggregates riding broadcasts; the
    * per-query cut is the bounded top-k aggregate, never a rank window.
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, id: String, text: String,
               queries: Seq[(Long, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"bm25TopK: need k >= 1, got $k")
    val w = words(col(text))
    val toks = docs.select(col(id).as("doc_id"), size(w).as("dl"),
      explode(w).as("term"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum(size(w)).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.join(broadcast(queryTermsDf(docs.sparkSession, queries)), "term")
      .groupBy("query_id", "doc_id", "term")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    val dfreq = tf.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    bm25Rank(tf, dfreq, stats, k, k1, b)
  }

  /** Hard-negative mining for retrieval training (the DPR/contrastive
    * data-prep shape): per query, the strongest BM25 candidates that are
    * NOT known positives, re-ranked 1..kneg — the "close but wrong"
    * documents a bi-encoder trains against. The anti-join removes
    * positives AFTER the bounded top-k cut, so per-query state stays
    * ≤ k rows and the re-rank window runs over those ≤ k survivors —
    * bounded, never a corpus window. Choose k > |positives per query| +
    * kneg so removals can't starve the negative set. `positives` is
    * (query_id, doc_id) — corpus-sized is fine, the join carries ids
    * only.
    */
  def hardNegatives(docs: org.apache.spark.sql.DataFrame, id: String,
                    text: String, queries: Seq[(Long, Seq[String])],
                    positives: org.apache.spark.sql.DataFrame,
                    k: Int, kneg: Int,
                    k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(kneg >= 1 && kneg <= k,
      s"hardNegatives: need 1 <= kneg <= k, got kneg=$kneg k=$k")
    val cand = bm25TopK(docs, id, text, queries, k, k1, b)
    val neg = cand.join(
      positives.select(col("query_id"), col("doc_id")),
      Seq("query_id", "doc_id"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    neg.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= kneg)
      .select("query_id", "doc_id", "score", "neg_rank")
  }

  /** Retrieval-quality evaluation at cutoff `k` — the metric harness a
    * retrieval stack ships with (trec_eval's core set): per query,
    * hits / precision@k / recall@k / reciprocal rank / average precision
    * / nDCG@k of a ranked run against a binary qrels table.
    *
    * `results` is any ranked run (query_id, doc_id, rank) — BM25, ANN,
    * or RRF-fused; `qrels` is (query_id, doc_id) binary relevance.
    *
    * Shape at scale: the run is already top-k (≤ k rows per query), so
    * the qrels join ships ids only, the cumulative-hits window runs
    * over ≤ k rows per key, and the output is one row per query. n_rel
    * is the only corpus-sized aggregation (one count per query).
    *
    * Determinism (house fixed-point recipe): each AP / DCG term rounds
    * ONCE to integer micros (HALF_UP on the double, e.g.
    * round(cum/rank·1e6)) and sums as longs — partitioning-independent;
    * nDCG divides the two micro sums directly (the scale cancels), and
    * every output metric rounds to 6 dp. IDCG folds over
    * sequence(1, min(n_rel, k)) with a long accumulator, the same
    * per-term rounding, guarded for n_rel = 0 (all metrics 0 when a
    * query has no relevant documents).
    */
  def retrievalEval(results: org.apache.spark.sql.DataFrame,
                    qrels: org.apache.spark.sql.DataFrame,
                    k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"retrievalEval: need k >= 1, got $k")
    val rel = qrels.select(col("query_id"), col("doc_id")).distinct()
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val flagged = results.select(col("query_id"), col("doc_id"), col("rank"))
      .filter(col("rank") <= k)
      .join(rel.withColumn("_r", lit(1)), Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("_r"), lit(0)).as("rel"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rank")
    val ln2 = log(lit(2.0))
    def micros(x: org.apache.spark.sql.Column) =
      round(x * lit(1e6)).cast("long")
    val per = flagged.withColumn("cum", sum(col("rel")).over(w))
      .groupBy("query_id").agg(
        sum(col("rel")).as("hits"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"),
        sum(when(col("rel") === 1,
            micros(col("cum").cast("double") / col("rank")))
          .otherwise(lit(0L))).as("ap_sum"),
        sum(when(col("rel") === 1,
            micros(ln2 / log(col("rank").cast("double") + lit(1.0))))
          .otherwise(lit(0L))).as("dcg_sum"))
    val lmin = least(col("n_rel"), lit(k))
    val idcg = aggregate(sequence(lit(1), lmin.cast("int")), lit(0L),
      (acc, i) => acc + micros(ln2 / log(i.cast("double") + lit(1.0))))
    per.join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 6).as("prec_k"),
        when(col("n_rel") > 0,
            round(col("hits").cast("double") / col("n_rel"), 6))
          .otherwise(lit(0.0)).as("recall_k"),
        coalesce(round(lit(1.0) / col("first_rel"), 6), lit(0.0)).as("rr"),
        when(col("n_rel") > 0,
            round(col("ap_sum").cast("double") /
              (lmin.cast("double") * lit(1e6)), 6))
          .otherwise(lit(0.0)).as("ap"),
        when(col("n_rel") > 0,
            round(col("dcg_sum").cast("double") / idcg.cast("double"), 6))
          .otherwise(lit(0.0)).as("ndcg"))
  }

  private def queryTermsDf(ss: org.apache.spark.sql.SparkSession,
                           queries: Seq[(Long, Seq[String])]): org.apache.spark.sql.DataFrame = {
    import ss.implicits._
    queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_id", "term")
  }

  /** Shared BM25 scoring tail: per-term score (rounded 6 dp, summed as
    * DECIMAL(18,6)) then the bounded per-query top-k cut.
    */
  private def bm25Rank(tf: org.apache.spark.sql.DataFrame,
                       dfreq: org.apache.spark.sql.DataFrame,
                       stats: org.apache.spark.sql.DataFrame,
                       k: Int, k1: Double, b: Double): org.apache.spark.sql.DataFrame = {
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val num = col("tf").cast("double") * (lit(k1) + lit(1.0))
    val den = col("tf").cast("double") +
      lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round((idf * num) / den, 6).cast("decimal(18,6)").as("_s"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("_s")).as("_sd"))
      .select(col("query_id"), col("doc_id"), col("_sd").cast("double").as("score"))
    CqlOps.perPartitionLimitAgg(scored, Seq("query_id"),
      Seq(("score", true), ("doc_id", false)), k, "rank")
  }

  /** Persistent BM25 inverted index — the IVF-list design for sparse
    * retrieval: postings and per-term document frequencies live
    * term-BUCKET-partitioned on disk, so a keyword query reads only the
    * handful of `bucket=K/` directories its terms hash into (parquet
    * partition pruning — the posting-list read of a real inverted index),
    * never the corpus and never the full vocabulary. Build once per
    * corpus epoch, search many.
    *
    * The bucket hash is the seeded murmur64 the engine pins bit-exact
    * (expression and JVM sides agree), so the driver can compute a
    * query's bucket set without touching the index.
    */
  final case class Bm25Index(postings: org.apache.spark.sql.DataFrame,
                             dfreq: org.apache.spark.sql.DataFrame,
                             stats: org.apache.spark.sql.DataFrame) {
    def save(dir: String): Unit = {
      // cluster each bucket-partitioned write by its partition key (the
      // cid-write rule: unclustered, every task opens a file per bucket —
      // tasks x buckets tiny files whose open/footer cost dominates the
      // pruned search read) and overlap the three independent writes
      Similarity.inParallel(
        clusterByBucket(postings).write.mode("overwrite")
          .partitionBy("bucket").parquet(s"$dir/postings"),
        Similarity.inParallel(
          clusterByBucket(dfreq).write.mode("overwrite")
            .partitionBy("bucket").parquet(s"$dir/df"),
          stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")))
      ()
    }
  }

  /** See [[Similarity]]'s cid-write rule: hash-cluster a bucket-partitioned
    * write on its partition key with a pinned partition count (AQE would
    * coalesce the small shuffle to one task and serialize the write).
    */
  private def clusterByBucket(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col("bucket"))

  private val Bm25BucketSeed = 97L

  private def bm25Bucket(term: org.apache.spark.sql.Column,
                         buckets: Int): org.apache.spark.sql.Column = {
    import graft.functions.Functions.murmur64
    pmod(murmur64(term, lit(Bm25BucketSeed)), lit(buckets.toLong)).cast("int")
  }

  /** Driver-side twin of [[bm25Bucket]] — MUST stay bit-identical to the
    * Column form or partition pruning silently reads the wrong bucket
    * (empty search results, no error). Shared by every index prober.
    */
  private def termBucket(t: String, buckets: Int): Int =
    ((graft.functions.CassandraMurmur3.hashString(t, Bm25BucketSeed)
      % buckets + buckets) % buckets).toInt

  def bm25IndexBuild(docs: org.apache.spark.sql.DataFrame, id: String,
                     text: String, buckets: Int = 64): Bm25Index = {
    require(buckets >= 1, s"bm25IndexBuild: need buckets >= 1, got $buckets")
    val w = words(col(text))
    val toks = docs.select(col(id).as("doc_id"), size(w).as("dl"),
      explode(w).as("term"))
    val postings = toks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
      .withColumn("bucket", bm25Bucket(col("term"), buckets))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bucket", bm25Bucket(col("term"), buckets))
    // sum_dl rides along so incremental appends can re-derive avgdl from
    // exact integer sums (avgdl = CAST(sum_dl AS DOUBLE)/n_docs — the
    // identical operands an all-at-once build divides)
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(size(w)).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("buckets", lit(buckets))
    Bm25Index(postings, dfreq, stats)
  }

  /** Positional inverted index + exact token-phrase search — the IR
    * feature BM25's bag-of-words scoring can't express ("slow hash
    * batch" as a phrase, not three independent terms).
    *
    * Postings are one (term, doc_id, pos) row per token occurrence,
    * bucket-partitioned by the same term hash as the BM25 index, so a
    * k-term phrase query reads ≤ k posting buckets at any corpus size
    * (partition-directory pruning + residual term filter). Phrase
    * matching joins the k posting lists pairwise on (doc_id, pos −
    * term offset): each join is keyed on (doc_id, pos) and carries
    * df(term)-sized lists, never the corpus; after the first shuffle
    * the chain stays co-partitioned. Repeated phrase terms work (the
    * same posting list joins itself at different offsets); n_matches
    * counts aligned occurrences per doc.
    */
  final case class PositionalIndex(postings: org.apache.spark.sql.DataFrame,
                                   buckets: Int)

  def positionalIndexBuild(docs: org.apache.spark.sql.DataFrame, id: String,
                           text: String, buckets: Int = 64): PositionalIndex = {
    require(buckets >= 1, s"positionalIndexBuild: need buckets >= 1, got $buckets")
    val postings = docs
      .select(col(id).as("doc_id"),
        posexplode(words(col(text))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .withColumn("bucket", bm25Bucket(col("term"), buckets))
    PositionalIndex(postings, buckets)
  }

  def positionalIndexSave(index: PositionalIndex, dir: String): Unit = {
    clusterByBucket(index.postings).write.partitionBy("bucket")
      .mode("overwrite").parquet(s"$dir/postings")
    val ss = index.postings.sparkSession
    import ss.implicits._
    Seq(index.buckets).toDF("buckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def positionalIndexLoad(spark: org.apache.spark.sql.SparkSession,
                          dir: String): PositionalIndex =
    PositionalIndex(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/meta").head().getInt(0))

  /** Merge two saved positional indexes over DISJOINT document sets into
    * a third directory — the shard-then-merge companion of
    * [[bm25IndexMerge]] for the phrase/proximity tier. Positional
    * postings carry no corpus-wide state (no df, no avgdl), so the merge
    * is PURELY a partition-preserving union of the bucket-partitioned
    * posting files — no shuffle, no recompute; phrase and proximity
    * searches over the merged index are row-identical to a from-scratch
    * build of the union. Bucket moduli must agree (checked) so the
    * merged partitioning prunes identically.
    */
  def positionalIndexMerge(spark: org.apache.spark.sql.SparkSession,
                           dirA: String, dirB: String, outDir: String): Unit = {
    val bucketsA = spark.read.parquet(s"$dirA/meta").head().getInt(0)
    val bucketsB = spark.read.parquet(s"$dirB/meta").head().getInt(0)
    require(bucketsA == bucketsB,
      s"positionalIndexMerge: bucket moduli differ ($bucketsA vs $bucketsB) " +
        "— shards must be built with one modulus for the merged " +
        "partitioning to prune correctly")
    spark.read.parquet(s"$dirA/postings").unionByName(
        spark.read.parquet(s"$dirB/postings"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings")
    import spark.implicits._
    Seq(bucketsA).toDF("buckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/meta")
  }

  /** Incremental positional-index ingest: append a NEW batch of documents
    * (ids disjoint from the indexed corpus — exact-dedup upstream) under
    * the saved bucket modulus. Positional postings carry no corpus-wide
    * state (no df table, no avgdl), so the append is PURELY additive —
    * new rows land in their bucket partitions and every existing file is
    * untouched; a phrase search over the appended index is row-identical
    * to a from-scratch build of the union (spec-pinned).
    */
  def positionalIndexAppend(spark: org.apache.spark.sql.SparkSession,
                            dir: String, newDocs: org.apache.spark.sql.DataFrame,
                            id: String, text: String): Unit = {
    val buckets = spark.read.parquet(s"$dir/meta").head().getInt(0)
    positionalIndexBuild(newDocs, id, text, buckets).postings
      .write.partitionBy("bucket").mode("append").parquet(s"$dir/postings")
  }

  /** Docs containing the exact token phrase, with per-doc occurrence
    * counts — see [[PositionalIndex]] for the join shape.
    */
  def phraseSearch(index: PositionalIndex,
                   phrase: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val buckets = index.buckets
    def side(t: String, off: Int) = {
      index.postings
        .filter(col("bucket") === termBucket(t, buckets) && col("term") === t)
        .select(col("doc_id"), (col("pos") - off).as("pos"))
    }
    phrase.zipWithIndex.drop(1)
      .foldLeft(side(phrase.head, 0)) { case (acc, (t0, i)) =>
        acc.join(side(t0, i), Seq("doc_id", "pos"))
      }
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }

  /** Windowed collocation mining: the top-k term pairs by pointwise
    * mutual information over co-occurrences within `window` token
    * positions — the collocation/phrase-discovery analytic (tokenizer
    * seeding, multi-word expression lists). PMI compares the pair's
    * windowed co-occurrence rate against the independence baseline:
    * ln(n_ab) + 2·ln(M) − ln(T) − ln(n_a) − ln(n_b) over exact long
    * counts (identical operands in both engines, summed left to
    * right), with a min-count floor so rare accidental pairs can't
    * dominate.
    *
    * Shape at scale: positions explode to `window` offset rows (keys
    * only, no payload) and pair up through ONE co-partitioned
    * (doc, pos) equi-join — never a per-doc cross product; counts
    * reduce onto the pair/vocab key spaces with map-side partials, the
    * two totals broadcast as one row, and the final cut is a bounded
    * top-k.
    */
  def collocations(docs: org.apache.spark.sql.DataFrame, id: String,
                   text: String, window: Int, minCount: Long,
                   k: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"collocations: window must be >= 1, got $window")
    require(minCount >= 1 && k >= 1,
      s"collocations: minCount/k must be >= 1, got $minCount/$k")
    val p = collocationStream(docs, id, text)
    collocationsCore(p, p.groupBy(col("term")).agg(count(lit(1)).as("n")),
      window, minCount, k)
  }

  /** Vocabulary-pruned collocation mining — the scale rung over
    * [[collocations]]: exact pair counting grows with observed pair
    * volume (the steepest curve in the ScaleProof set), and almost all
    * of that volume is pairs that can never rank — one rare member
    * caps n_ab below any useful floor. Pruning the position stream to
    * the top-`topVocab` terms (count-desc, term-asc — a deterministic
    * bounded cut) BEFORE the offset explode + pair join shrinks the
    * quadratic stage to the head of the Zipf curve while the per-term
    * counts stay exact (pruning drops whole terms, never occurrences of
    * kept ones). PMI is over the pruned event space — n_a, n_b, M and T
    * all count kept-term events, so the score is self-consistent and
    * both engines state it identically. At full-corpus cadence the
    * exact top-m vocabulary cut would swap for the Misra-Gries heavy
    * hitters ([[heavyHitters]]) with identical downstream shape.
    */
  def collocationsPruned(docs: org.apache.spark.sql.DataFrame, id: String,
                         text: String, window: Int, minCount: Long,
                         k: Int, topVocab: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"collocationsPruned: window must be >= 1, got $window")
    require(minCount >= 1 && k >= 1 && topVocab >= 2,
      s"collocationsPruned: minCount/k/topVocab out of range: $minCount/$k/$topVocab")
    val p0 = collocationStream(docs, id, text)
    // bounded vocabulary header: topVocab rows through TakeOrderedAndProject
    val kept = p0.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(topVocab)
    val p = p0.join(broadcast(kept.select("term")), "term")
    collocationsCore(p, kept, window, minCount, k)
  }

  /** Sentence segmentation as a scan-fused expression — the boundary
    * layer between document-level curation and sentence-level consumers
    * (alignment, sentence-dedup, citation chunking): split after
    * terminal punctuation ([.!?]) followed by whitespace, trim, drop
    * empties. Deliberately regex-lexical (RE2-compatible — no
    * lookbehind, so DuckDB states the identical spec): abbreviation
    * handling belongs to a model-based splitter, not this layer. The
    * separator is injected (punct + U+0001) rather than split-with-
    * lookbehind, keeping the terminal punctuation inside its sentence.
    */
  def sentenceSplit(text: Column): Column =
    filter(
      transform(
        split(regexp_replace(text, "([.!?])\\s+", "$1\u0001"), "\u0001"),
        s => trim(s)),
      s => s =!= "")

  /** Vocabulary coverage / out-of-vocabulary analytics — the "will the
    * tokenizer built on corpus A still fit corpus B" check run before
    * reusing a trained vocabulary on a new crawl snapshot or domain mix:
    * the vocabulary is corpus A's words at frequency ≥ `minFreq`, and
    * each eval document reports its token count, OOV token count, and
    * OOV rate. A drifting corpus (new language, new jargon, encoding
    * rot) shows up as a per-doc oov_rate shift long before downstream
    * fertility degrades; the per-doc table feeds the same
    * quantile/drift reporting as the quality signals.
    *
    * Shape at scale: the vocabulary is ONE term-keyed aggregation over
    * the train corpus (map-side partials); eval tokens left-join it on
    * the term key — co-partitioned, vocabulary-sized build side, never
    * a collect — and reduce onto the doc key. The rate is the raw IEEE
    * quotient of the two exact longs, rounded 6 dp.
    */
  def vocabCoverage(train: org.apache.spark.sql.DataFrame,
                    eval: org.apache.spark.sql.DataFrame, id: String,
                    text: String, minFreq: Long): org.apache.spark.sql.DataFrame = {
    require(minFreq >= 1, s"vocabCoverage: minFreq must be >= 1, got $minFreq")
    val vocab = train
      .select(explode(words(col(text))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .select(col("word"), lit(1).as("_in"))
    val toks = eval
      .select(col(id), explode(words(col(text))).as("word"))
      .filter(col("word") =!= "")
    val oov = sum(when(col("_in").isNull, lit(1L)).otherwise(lit(0L)))
    toks.join(vocab, Seq("word"), "left")
      .groupBy(id)
      .agg(count(lit(1)).as("n_tokens"), oov.as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
  }

  private def collocationStream(docs: org.apache.spark.sql.DataFrame,
                                id: String, text: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(id).as("_d"), posexplode(words(col(text))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** Shared pair-mining tail: windowed co-occurrence join over position
    * stream `p`, PMI against unigram table `na` (term, n), bounded top-k.
    */
  private def collocationsCore(p: org.apache.spark.sql.DataFrame,
                               na: org.apache.spark.sql.DataFrame,
                               window: Int, minCount: Long,
                               k: Int): org.apache.spark.sql.DataFrame = {
    val right = p.select(col("_d"), col("pos").as("_rp"), col("term").as("_rt"))
    val pairs = p.withColumn("_o", explode(sequence(lit(1), lit(window))))
      .select(col("_d"), (col("pos") + col("_o")).as("_rp"), col("term").as("_lt"))
      .join(right, Seq("_d", "_rp"))
      .filter(col("_lt") =!= col("_rt"))
      .select(least(col("_lt"), col("_rt")).as("term_a"),
        greatest(col("_lt"), col("_rt")).as("term_b"))
    val nab = pairs.groupBy("term_a", "term_b").agg(count(lit(1)).as("n_ab"))
    val totals = nab.agg(sum(col("n_ab")).as("t"))
      .crossJoin(na.agg(sum(col("n")).as("m")))
    def ln(c: org.apache.spark.sql.Column) = log(c.cast("double"))
    nab.filter(col("n_ab") >= minCount)
      .join(na.select(col("term").as("term_a"), col("n").as("n_a")), "term_a")
      .join(na.select(col("term").as("term_b"), col("n").as("n_b")), "term_b")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(ln(col("n_ab")) + ln(col("m")) + ln(col("m"))
        - ln(col("t")) - ln(col("n_a")) - ln(col("n_b")), 6))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
      .limit(k)
      .select("term_a", "term_b", "n_ab", "pmi")
  }

  /** Pair-proximity search over the positional index (the NEAR/n
    * operator): docs where the two terms co-occur within `window` token
    * positions, with the minimum absolute distance and the count of
    * qualifying position pairs — looser than exact phrase, stronger
    * than BM25's bag-of-words. Both posting lists prune to their bucket
    * partitions; the per-doc pair join is bounded by the terms' per-doc
    * frequencies (tf_a × tf_b), never the corpus.
    */
  def proximitySearch(index: PositionalIndex, termA: String, termB: String,
                      window: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"proximitySearch: window must be >= 1, got $window")
    require(termA != termB, "proximitySearch: terms must differ")
    val buckets = index.buckets
    def side(t: String, as: String) = index.postings
      .filter(col("bucket") === termBucket(t, buckets) && col("term") === t)
      .select(col("doc_id"), col("pos").as(as))
    side(termA, "pa").join(side(termB, "pb"), "doc_id")
      .withColumn("dist", abs(col("pa") - col("pb")))
      .filter(col("dist") <= window)
      .groupBy("doc_id")
      .agg(min(col("dist")).as("min_dist"), count(lit(1)).as("n_pairs"))
  }

  def bm25IndexLoad(spark: org.apache.spark.sql.SparkSession, dir: String): Bm25Index =
    Bm25Index(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/df"),
      spark.read.parquet(s"$dir/stats"))

  /** Incremental BM25 index ingest: append a NEW batch of documents (ids
    * must be disjoint from the indexed corpus — exact-dedup upstream) to
    * a saved index. Postings for the batch append into their bucket
    * partitions untouched-in-place; the df table merges by term-wise
    * integer addition (disjoint doc sets, so df_union = df_old + df_new
    * exactly); stats re-derive from summed longs. Every stored quantity
    * equals the all-at-once union build's, so a search over the appended
    * index is bit-identical to a from-scratch search over the union
    * (spec-pinned). The df/stats rewrites touch vocabulary-sized and
    * 1-row tables — the corpus-sized postings are append-only.
    */
  def bm25IndexAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                      newDocs: org.apache.spark.sql.DataFrame, id: String,
                      text: String): Unit = {
    val oldStats = spark.read.parquet(s"$dir/stats").head()
    val buckets = oldStats.getAs[Int]("buckets")
    val w = words(col(text))
    // batch stats BEFORE any write: an EMPTY batch must be a no-op, not a
    // half-applied append — and sum() over zero rows is null, so coalesce
    // to 0. (An all-null-text batch is NOT a no-op: its rows still count
    // into n_docs with dl 0, exactly as a from-scratch union build would
    // count them.)
    val delta = newDocs
      .agg(count(lit(1)).as("n"), coalesce(sum(size(w)), lit(0L)).as("s")).head()
    if (delta.getLong(0) == 0L) return
    val toks = newDocs.select(col(id).as("doc_id"), size(w).as("dl"),
      explode(w).as("term"))
    val newPostings = toks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
      .withColumn("bucket", bm25Bucket(col("term"), buckets))
    newPostings.write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
    // merge df term-wise; localCheckpoint breaks the lineage on the path
    // being overwritten (vocabulary-sized — tiny next to postings)
    val newDf = newPostings.groupBy("term").agg(count(lit(1)).as("df"))
    val merged = spark.read.parquet(s"$dir/df").select("term", "df")
      .unionByName(newDf)
      .groupBy("term").agg(sum(col("df")).as("df"))
      .withColumn("bucket", bm25Bucket(col("term"), buckets))
      .localCheckpoint(true)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/df")
    val nDocs = oldStats.getAs[Long]("n_docs") + delta.getLong(0)
    val sumDl = oldStats.getAs[Long]("sum_dl") + delta.getLong(1)
    import spark.implicits._
    Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("buckets", lit(buckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Merge two saved BM25 indexes over DISJOINT document sets into a
    * third directory — the shard-then-merge build a 100 TB corpus needs:
    * each ingest partition (crawl snapshot, corpus shard) builds its
    * index independently with no cross-shard shuffle, and merges combine
    * pairwise (or in a reduction tree) afterwards. Every stored quantity
    * of the merged index equals the all-at-once union build's:
    * postings rows are per-(term, doc) and doc sets are disjoint, so the
    * union IS the build; df merges by term-wise integer addition; stats
    * re-derive avgdl from the summed exact longs. The bucket moduli must
    * agree (checked) — the merged postings keep their bucket partitioning
    * so searches prune identically. The corpus-sized postings move
    * through a partition-preserving union write (no shuffle — bucket is
    * a partition column on both sides); only the vocabulary-sized df and
    * the 1-row stats are recomputed.
    */
  def bm25IndexMerge(spark: org.apache.spark.sql.SparkSession, dirA: String,
                     dirB: String, outDir: String): Unit = {
    val statsA = spark.read.parquet(s"$dirA/stats").head()
    val statsB = spark.read.parquet(s"$dirB/stats").head()
    val buckets = statsA.getAs[Int]("buckets")
    require(buckets == statsB.getAs[Int]("buckets"),
      s"bm25IndexMerge: bucket moduli differ ($buckets vs " +
        s"${statsB.getAs[Int]("buckets")}) — shards must be built with one " +
        "modulus for the merged partitioning to prune correctly")
    spark.read.parquet(s"$dirA/postings").unionByName(
        spark.read.parquet(s"$dirB/postings"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings")
    spark.read.parquet(s"$dirA/df").select("term", "df").unionByName(
        spark.read.parquet(s"$dirB/df").select("term", "df"))
      .groupBy("term").agg(sum(col("df")).as("df"))
      .withColumn("bucket", bm25Bucket(col("term"), buckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/df")
    val nDocs = statsA.getAs[Long]("n_docs") + statsB.getAs[Long]("n_docs")
    val sumDl = statsA.getAs[Long]("sum_dl") + statsB.getAs[Long]("sum_dl")
    import spark.implicits._
    Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("buckets", lit(buckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** Search a (built or loaded) [[Bm25Index]] — bit-identical results to
    * the from-scratch [[bm25TopK]] over the same corpus, but the scan is
    * pruned to the query terms' bucket partitions: at any corpus size a
    * q-term query reads ≤ q posting buckets of vocabulary-sized tables.
    * The bucket count travels in the stats row, so the caller can't probe
    * with the wrong modulus.
    */
  def bm25SearchIndex(index: Bm25Index, queries: Seq[(Long, Seq[String])],
                      k: Int, k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"bm25SearchIndex: need k >= 1, got $k")
    val ss = index.postings.sparkSession
    val buckets = index.stats.select(col("buckets")).head().getInt(0)
    val terms = queries.flatMap(_._2).distinct
    val qBuckets = terms.map(t => termBucket(t, buckets)).distinct
    // bucket filter prunes at the partition-directory level; the term
    // filter prunes residual same-bucket terms inside the read files
    val postings = index.postings
      .filter(col("bucket").isin(qBuckets: _*))
      .filter(col("term").isin(terms: _*))
    val dfreq = index.dfreq
      .filter(col("bucket").isin(qBuckets: _*))
      .filter(col("term").isin(terms: _*))
      .select("term", "df")
    val tf = postings.join(broadcast(queryTermsDf(ss, queries)), "term")
      .select("query_id", "doc_id", "term", "tf", "dl")
    bm25Rank(tf, dfreq, index.stats.select("n_docs", "avgdl"), k, k1, b)
  }

  /** Typo-tolerant vocabulary matching via deletion neighborhoods (the
    * SymSpell candidate scheme, Garbe): two terms within edit distance k
    * share a member of each other's {self} ∪ {deletions to depth k} sets,
    * so candidates come from an equi-join on variants — never a cross
    * join against the vocabulary — and an exact Levenshtein pass keeps
    * precision (the deletion join admits some shapes past the radius,
    * e.g. transpositions at k=1). `maxEdits` ∈ {1, 2} — SymSpell's
    * practical range, since the variant fan-out grows O(len^k).
    * Query-expansion / OCR-cleanup primitive: map a misspelled keyword
    * onto the corpus vocabulary with its frequencies.
    *
    * Shape at scale: the vocabulary aggregation is the only corpus-keyed
    * shuffle; the variant explode multiplies the VOCABULARY (≤ len+1
    * rows per term at k=1, ≤ 1+len+len(len-1)/2 at k=2), the tiny
    * query-variant table broadcasts, and the verify runs on the candidate
    * set only. Output: (q, term, dist, tf_corpus).
    */
  def fuzzyTermMatch(docs: org.apache.spark.sql.DataFrame, text: String,
                     queryTerms: Seq[String], maxEdits: Int = 1): org.apache.spark.sql.DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 2,
      s"fuzzyTermMatch: SymSpell deletion neighborhoods support maxEdits 1 or 2 " +
        s"(the scheme's practical radius — variant fan-out is O(len^k)), got $maxEdits")
    val ss = docs.sparkSession
    import ss.implicits._
    // driver side: {self} ∪ deletions to depth maxEdits for each query term
    def delClosure(s: String, k: Int): Set[String] = {
      var cur = Set(s)
      var all = Set(s)
      (1 to k).foreach { _ =>
        cur = cur.flatMap(w => (0 until w.length).map(i =>
          w.substring(0, i) + w.substring(i + 1)))
        all ++= cur
      }
      all
    }
    val qv = queryTerms.distinct
      .flatMap(q => delClosure(q, maxEdits).toSeq.map(v => (q, v)))
      .toDF("q", "variant")
    val vocab = docs.select(explode(words(col(text))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf_corpus"))
    val t = col("term")
    // vocabulary side, as scan expressions: single deletions, and for
    // radius 2 the delete-at-(i<j) pairs — fan-out 1 + L + L(L-1)/2 per
    // term, multiplying the VOCABULARY (never the corpus, never a cross
    // join). sequence() guards keep short terms off descending ranges.
    val del1 = transform(sequence(lit(1), length(t)), i =>
      concat(t.substr(lit(1), i - lit(1)), t.substr(i + lit(1), length(t))))
    val del2 = flatten(transform(sequence(lit(1), length(t) - 1), i =>
      transform(sequence(i + lit(1), length(t)), j =>
        concat(t.substr(lit(1), i - lit(1)),
          t.substr(i + lit(1), j - i - lit(1)),
          t.substr(j + lit(1), length(t) - j)))))
    val variants = array_distinct(maxEdits match {
      case 1 => concat(array(t), del1)
      case _ => concat(array(t), del1,
        when(length(t) >= 2, del2).otherwise(array().cast("array<string>")))
    })
    vocab.select(col("term"), col("tf_corpus"), explode(variants).as("variant"))
      .join(broadcast(qv), "variant")
      .select("q", "term", "tf_corpus").distinct()
      .filter(levenshtein(col("q"), col("term")) <= maxEdits)
      .select(col("q"), col("term"),
        levenshtein(col("q"), col("term")).as("dist"), col("tf_corpus"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): merge two ranked
    * retrieval lists per query by Σ 1/(c + rank) — the standard way to
    * combine BM25 and embedding-ANN results without score calibration.
    * Ids missing from one list contribute nothing for it. Both inputs are
    * already bounded (k rows per query), so the join and re-rank touch
    * k-sized frames however large the corpus behind them was; the cut is
    * the bounded top-k aggregate, ties break id-ascending.
    */
  def rrfFuse(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
              queryCol: String, idCol: String, rankCol: String,
              k: Int, c: Int = 60): org.apache.spark.sql.DataFrame = {
    val fa = a.select(col(queryCol), col(idCol), col(rankCol).as("_ra"))
    val fb = b.select(col(queryCol), col(idCol), col(rankCol).as("_rb"))
    val fused = fa.join(fb, Seq(queryCol, idCol), "full_outer")
      .select(col(queryCol), col(idCol),
        (coalesce(lit(1.0) / (lit(c) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("_rb")), lit(0.0))).as("rrf"))
    CqlOps.perPartitionLimitAgg(fused, Seq(queryCol),
      Seq(("rrf", true), (idCol, false)), k, "rank")
  }

  /** Corpus-global top-k n-gram counts — the vocabulary-induction /
    * BPE-merge-candidate analytic (rank the adjacent-token pairs a first
    * merge step would consider). Docs shorter than n words contribute
    * nothing (no clamping — this is a corpus statistic, not a dedup key).
    * Ties at the cut break by gram ascending, so the selected SET is
    * deterministic and engine-reproducible.
    *
    * Shape at scale: the explode restates the corpus n tokens deep, the
    * count is one partial→final hash aggregation (hot grams combine
    * map-side), and the cut is TakeOrderedAndProject — k rows per
    * partition then k at the driver, never a full sort of the vocabulary.
    */
  def topNgrams(docs: org.apache.spark.sql.DataFrame, text: String,
                n: Int, k: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1 && k >= 1, s"topNgrams: need n >= 1 and k >= 1, got ($n, $k)")
    val w = words(col(text))
    val grams = when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    docs.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }

  /** Exact corpus heavy hitters with a bounded-memory candidate pass: all
    * n-grams with count >= `threshold`, found WITHOUT aggregating the full
    * vocabulary. Pass 1 is a Misra-Gries summary
    * ([[graft.functions.FreqItemsAgg]], O(sketchK) memory per task) whose
    * candidate set provably contains every item above n_total/(sketchK+1);
    * pass 2 filters the gram stream to the broadcast candidate array and
    * counts exactly, so the final aggregation keys on <= sketchK grams
    * instead of the corpus vocabulary (~10^10 at web scale for
    * [[topNgrams]]' full group-by). The output is exact and deterministic
    * even though the sketch's internal counts are partitioning-dependent.
    *
    * The caller must pick `sketchK` so that threshold >= n_total/(sketchK+1)
    * — below that the guarantee lapses; the require can only check it
    * after the fact, so it is documented, not enforced.
    * Requires [[graft.functions.Functions.ensure]] on the session.
    */
  def heavyHitters(docs: org.apache.spark.sql.DataFrame, text: String,
                   n: Int, sketchK: Int, threshold: Long): org.apache.spark.sql.DataFrame = {
    require(n >= 1 && sketchK >= 1 && threshold >= 1,
      s"heavyHitters: need n, sketchK, threshold >= 1, got ($n, $sketchK, $threshold)")
    val w = words(col(text))
    val gramsCol = when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val grams = docs.select(explode(gramsCol).as("gram"))
    val candidates = grams
      .agg(call_function("freq_items_agg", col("gram"), lit(sketchK)).as("_cand"))
    grams.crossJoin(broadcast(candidates))
      .filter(array_contains(col("_cand"), col("gram")))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col("gram"))
  }

  /** Markdown→text — the OTHER huge non-HTML document source (READMEs,
    * docs sites, forum exports ship as Markdown): one codegen'd
    * `regexp_replace` chain, no UDF, the [[htmlToText]] discipline. The
    * lexical layer strips structure and keeps content: fence lines and
    * their info strings, link definitions, table separator rows and
    * horizontal rules vanish; links/images/reference links collapse to
    * their text (URLs never leak into training text); inline code,
    * emphasis (`**` `*` `__` `_`), heading/blockquote/list markers and
    * table pipes unwrap to their content. Whitespace collapses to
    * single spaces and trims, like [[htmlToText]]. Replacement ORDER is
    * load-bearing: fences and definitions go first (line-anchored),
    * list markers strip before emphasis (a `* item` bullet must not
    * pair with a later `*`), pipes last before the collapse. Patterns
    * are RE2-compatible (no lookaround) like the rest of the file.
    */
  def markdownToText(md: Column): Column = {
    val lineDrops = Seq(
      "(?m)^\\s*```[^\\n]*$",                 // code-fence lines (+ info string)
      "(?m)^\\s*\\[[^\\]]+\\]:[^\\n]*$",      // reference-link definitions
      "(?m)^\\s*\\|[\\s:|-]*\\|\\s*$",        // table separator rows
      "(?m)^\\s*(?:[-*_]\\s*){3,}$"           // horizontal rules
    ).foldLeft(md) { case (c, re) => regexp_replace(c, re, " ") }
    val unwrapped = Seq(
      "!\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",  // images → alt text
      "\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",   // inline links → text
      "\\[([^\\]]*)\\]\\[[^\\]]*\\]" -> "$1", // reference links → text
      "`([^`\\n]*)`" -> "$1",                 // inline code
      "(?m)^\\s{0,3}#{1,6}\\s+" -> "",        // ATX headings
      "(?m)^\\s{0,3}>\\s?" -> "",             // blockquote markers
      "(?m)^\\s*[-*+]\\s+" -> "",             // unordered list markers
      "(?m)^\\s*[0-9]+\\.\\s+" -> "",         // ordered list markers
      "\\*\\*([^*\\n]+)\\*\\*" -> "$1",       // strong
      "__([^_\\n]+)__" -> "$1",
      "\\*([^*\\n]+)\\*" -> "$1",             // emphasis
      "(^|[^A-Za-z0-9_])_([^_\\n]+)_($|[^A-Za-z0-9_])" -> "$1$2$3",
      "\\|" -> " "                            // table pipes
    ).foldLeft(lineDrops) { case (c, (re, to)) => regexp_replace(c, re, to) }
    trim(regexp_replace(unwrapped, "\\s+", " "))
  }

  /** Markdown plant (spec for the fixture replica): the doc's whitespace
    * words — with markdown metacharacters normalized to ',' first
    * (`*_\`#>|![]()` anywhere, `-`/`+` word-initial, and a final '.' on
    * an all-digit word — "2021." WOULD fabricate an ordered-list marker
    * at line start; ',' because it is the one punctuation mark markdown
    * assigns no meaning), the PDF-tier normalization convention — render in lines of 5, line i
    * styled by i % 7: 0 heading (level 1 + id%3), 1 plain (wrapped in a
    * code fence with info string `codetag` on id%4==0 docs), 2
    * blockquote, 3 one-item unordered list, 4 per-word emphasis (j%3:
    * `**w**`, `*w*`, plain), 5 a link/code/image/ref-link line
    * (`[w0](url)`, w1, `` `w2` ``, `![w3](url)`, `[w4][rN]`), 6 a table
    * row; id%7==0 docs append a horizontal rule, and every doc ends
    * with the `[rN]:` link-definition line. Extraction must return
    * EXACTLY the normalized words joined by single spaces: every
    * construct preserves its content words, and every URL, info string,
    * separator and definition line vanishes.
    */
  def normalizeMdWord(w: String): String = {
    val cleaned = w.map(c => if ("*_`#>|![]()".indexOf(c) >= 0) ',' else c)
    val dashed =
      if (cleaned.nonEmpty && (cleaned(0) == '-' || cleaned(0) == '+'))
        ',' + cleaned.substring(1)
      else cleaned
    // an all-digit word with a final '.' ("2021.") would fabricate an
    // ordered-list marker at line start and be eaten by the extractor;
    // neutralize the dot the same way the metachars neutralize (→ ',')
    if (dashed.length >= 2 && dashed.last == '.' &&
        dashed.init.forall(c => c >= '0' && c <= '9'))
      dashed.init + ","
    else dashed
  }

  def plantMarkdown(id: Long, text: String): Option[String] = {
    val words = Option(text).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
      .map(normalizeMdWord)
    if (words.isEmpty) return None
    val lines = words.grouped(5).toSeq.zipWithIndex.map { case (g, i) =>
      i % 7 match {
        case 0 => ("#" * (1 + (id % 3)).toInt) + " " + g.mkString(" ")
        case 2 => "> " + g.mkString(" ")
        case 3 => "- " + g.mkString(" ")
        case 4 => g.zipWithIndex.map { case (w, j) =>
          j % 3 match {
            case 0 => s"**$w**"
            case 1 => s"*$w*"
            case _ => w
          }
        }.mkString(" ")
        case 5 => g.zipWithIndex.map { case (w, j) =>
          j % 5 match {
            case 0 => s"[$w](https://ex.invalid/$id)"
            case 2 => s"`$w`"
            case 3 => s"![$w](https://img.invalid/$id.png)"
            case 4 => s"[$w][r$id]"
            case _ => w
          }
        }.mkString(" ")
        case 6 => "| " + g.mkString(" | ") + " |"
        case _ => g.mkString(" ")
      }
    }
    val sb = new StringBuilder
    lines.zipWithIndex.foreach { case (l, i) =>
      // id%4==0 docs wrap plain line 1 in a code fence with an info
      // string that must NOT leak into the extraction
      if (i == 1 && id % 4 == 0) sb.append("```codetag\n").append(l).append("\n```\n")
      else sb.append(l).append("\n\n")
    }
    if (id % 7 == 0) sb.append("---\n\n")      // horizontal rule: vanishes
    sb.append(s"[r$id]: https://ref.invalid/$id\n") // ref-link definition: vanishes
    Some(sb.toString)
  }
}
