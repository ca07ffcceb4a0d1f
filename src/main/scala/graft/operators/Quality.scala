package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality signals and cleaning for LLM training-data pipelines:
  * the repetition measures of Rae et al. 2021 (Gopher, §A1.1), regex PII
  * detection/redaction, and C4-style (Raffel et al. 2020, §2.2) line
  * filtering.
  *
  * Every operator here is a pure per-row expression over the document —
  * signals fuse into the scan stage with zero shuffles (the per-doc
  * n-gram/line frequency tables are computed by a sorted run-length fold
  * *inside* the row, never by an explode + groupBy), so at 100 TB each
  * is a single bandwidth-bound map pass.
  */
object Quality {

  /** Run-length stats over a pre-sorted array: struct(top_chars, dup_chars)
    * where top_chars = max over distinct elements of count*length (the
    * character mass of the most repeated element) and dup_chars = total
    * character mass of elements occurring more than once. One fold, no
    * per-row hash map.
    */
  private def runCharStats(sorted: Column): Column = {
    def flushBest(acc: Column) =
      greatest(acc.getField("best"), acc.getField("run") * length(acc.getField("prev")))
    def flushDup(acc: Column) =
      acc.getField("dup") + when(acc.getField("run") > 1,
        acc.getField("run") * length(acc.getField("prev"))).otherwise(lit(0L))
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit(0L).as("dup"))
    aggregate(sorted, zero,
      (acc, x) => {
        val same = acc.getField("prev") === x
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          when(same, acc.getField("best")).otherwise(flushBest(acc)).as("best"),
          when(same, acc.getField("dup")).otherwise(flushDup(acc)).as("dup"))
      },
      acc => struct(flushBest(acc).as("top_chars"), flushDup(acc).as("dup_chars")))
  }

  /** struct(top_chars, dup_chars) over the document's word n-grams
    * (shared shingle definition with [[Dedup.shingles]] — includes
    * duplicate occurrences). Divide by length(text) for the Gopher
    * top-/duplicate-n-gram character fractions.
    */
  def ngramRunStats(text: Column, n: Int): Column =
    runCharStats(array_sort(Dedup.shingles(text, n)))

  /** struct(top_chars, dup_chars) over an array of lines. */
  def lineRunStats(lines: Column): Column = runCharStats(array_sort(lines))

  /** Fraction of lines that are repeats of an earlier line. */
  def duplicateLineFrac(lines: Column): Column =
    round((size(lines) - size(array_distinct(lines))) * lit(1.0) / size(lines), 6)

  /** Total characters across an array of lines. */
  def lineCharTotal(lines: Column): Column =
    aggregate(lines, lit(0L), (acc, l) => acc + length(l))

  // PII patterns: RE2-and-Java-compatible (no lookaround, explicit
  // classes) so the same pattern string runs in Spark and the DuckDB
  // oracle.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d-\\d{3}-\\d{4}"

  /** struct(n_emails, n_ipv4, n_phones) match counts. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).as("n_emails"),
    regexp_count(text, lit(Ipv4Re)).as("n_ipv4"),
    regexp_count(text, lit(PhoneRe)).as("n_phones"))

  /** Redact PII spans with typed placeholders (email → ip → phone order;
    * the placeholders contain no digits, so later passes cannot re-match
    * inside an earlier replacement).
    */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** C4-style line filter: keep lines with at least `minWords` words and
    * no blacklisted word (Raffel et al. drop short lines and pages with
    * "bad words"; the terminal-punctuation rule is omitted — the caller
    * can pre-filter with a regex when the corpus carries punctuation).
    */
  def cleanLines(lines: Column, minWords: Int, blacklist: Seq[String]): Column = {
    // case-insensitive, like C4's bad-word filter (and the rest of this
    // module's lowercased matching)
    val bl = array(blacklist.map(w => lit(w.toLowerCase(java.util.Locale.ROOT))): _*)
    filter(lines, l => {
      val ws = split(l, " ")
      size(ws) >= minWords && !arrays_overlap(split(lower(l), " "), bl)
    })
  }

  /** Corpus-wide boilerplate-line removal (the CCNet dedup stage, Wenzek
    * et al. 2020 §4.1 — common crawl pipelines drop lines repeated across
    * documents: nav bars, cookie banners, legal footers). A line occurring
    * in >= `minDocs` DISTINCT documents is boilerplate and is dropped from
    * every document. Output: (id, n_lines, n_dropped, cleaned).
    *
    * The one corpus-level operator in this module (the others are per-row):
    * one line-keyed count aggregation (map-side partial combine;
    * `array_distinct` inside the row keeps within-doc repeats from
    * inflating the doc count), then the boilerplate set — bounded by the
    * threshold, tiny next to the corpus — comes back as a single-row
    * broadcast and the drop is a per-row `filter()` fused into a second
    * scan. No join against the corpus, no second shuffle. At extreme
    * vocabulary the membership probe is the knob: `array_contains` is
    * linear in the set, so shard the count by line hash and swap in a
    * hashed-set probe when the boilerplate set stops being small.
    */
  def removeBoilerplateLines(docs: DataFrame, id: String, lines: Column,
                             minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val withLines = docs.select(col(id), lines.as("_lines"))
    val boiler = withLines
      .select(explode(array_distinct(col("_lines"))).as("_line"))
      .groupBy("_line").agg(count(lit(1)).as("_docs"))
      .filter(col("_docs") >= minDocs)
      .agg(sort_array(collect_set(col("_line"))).as("_boiler"))
    withLines.crossJoin(broadcast(boiler))
      .select(col(id), size(col("_lines")).as("n_lines"),
        size(filter(col("_lines"), l => array_contains(col("_boiler"), l)))
          .as("n_dropped"),
        array_join(filter(col("_lines"),
          l => !array_contains(col("_boiler"), l)), " ").as("cleaned"))
  }

  /** Unigram-LM document score (the CCNet / Wenzek et al. 2020 perplexity
    * filter, with the corpus itself as the LM): mean token log-probability
    * under corpus unigram frequencies. More-negative = rarer tokens;
    * pipelines keep the mid band and drop both tails.
    *
    * Determinism: per-token ln p is rounded to 6 dp and summed as
    * DECIMAL(18,6) — an exact, summation-order-independent aggregate — then
    * the mean is computed once in double at the end. A float sum here would
    * hash-differ per partition order.
    *
    * Shape at scale: one term-keyed aggregation for corpus frequencies (a
    * vocabulary-sized table), a 1-row total broadcast, a term-keyed join of
    * the exploded corpus against the frequency table, one doc-keyed
    * aggregation. No corpus self-joins; the frequency join key is the term
    * the row already carries.
    */
  def unigramLogProb(docs: org.apache.spark.sql.DataFrame, id: String,
                     text: String): org.apache.spark.sql.DataFrame = {
    val terms = docs.select(col(id).as("doc_id"),
      explode(TextAnalysis.words(col(text))).as("term"))
    val freq = terms.groupBy("term").agg(count(lit(1)).as("tf_corpus"))
    val total = freq.agg(sum(col("tf_corpus")).as("t_total"))
    terms.join(freq, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(col("tf_corpus").cast("double") / col("t_total")), 6)
          .cast("decimal(18,6)").as("lp"))
      .groupBy("doc_id")
      .agg(sum(col("lp")).as("sum_lp"), count(lit(1)).as("n_tok"))
      .select(col("doc_id"),
        round(col("sum_lp").cast("double") / col("n_tok"), 6).as("mean_logprob"),
        col("n_tok"))
  }

  /** Bigram-LM document score — the next step up from [[unigramLogProb]]
    * toward CCNet's KenLM perplexity filter: mean conditional token
    * log-probability under corpus bigram statistics with add-α smoothing,
    * ln((c(w1 w2) + α) / (c(w1) + α·V)). Documents of improbable word
    * SEQUENCES (not just rare words) score low. Docs with fewer than two
    * words have no bigrams and drop out.
    *
    * Determinism: per-bigram ln rounds to 6 dp and sums as DECIMAL(18,6)
    * (order-independent); the mean divides once in double at the end and
    * is NOT re-rounded — a 6-dp round after the division can land on a
    * rounding boundary where the JVM (exact binary HALF_UP) and other
    * engines (shortest-representation rounding) disagree by 1e-6, while
    * the raw IEEE quotient of identical operands is bit-identical
    * everywhere (observed once in 5000 docs at sf0.1 before the fix).
    *
    * Shape at scale: two vocabulary-keyed count aggregations (map-side
    * partials), a 1-row vocab-size broadcast, two key-carried joins of
    * the exploded corpus (bigram, then its leading word — each row
    * already holds both keys), one doc-keyed aggregation. No corpus
    * self-joins. Output: (id, mean_lp, n_bigrams).
    */
  def bigramLogProb(docs: DataFrame, id: String, text: String,
                    alpha: Double = 0.5): DataFrame =
    bigramLogProbAgainst(docs, docs, id, text, alpha)

  /** [[bigramLogProb]] with the LM statistics trained on a SEPARATE
    * reference corpus — CCNet's actual arrangement (Wenzek et al. 2020:
    * the LM trains on Wikipedia, the crawl is scored by how target-like
    * it reads). Bigrams and leading words the reference never saw take
    * the pure add-α backoff, ln(α / (c(w1) + α·V)) with c(w1) possibly 0
    * — the left joins are what the self-trained path (where every scored
    * bigram exists in the statistics, so inner == left) never exercises.
    * Same determinism and shape: reference-keyed count aggs, a 1-row
    * vocab broadcast, key-carried joins of the exploded scored corpus.
    */
  def bigramLogProbAgainst(reference: DataFrame, docs: DataFrame, id: String,
                           text: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"bigramLogProbAgainst: alpha must be positive, got $alpha")
    val pairs = docs
      .select(col(id).as("doc_id"),
        explode(Dedup.shingles(col(text), 2)).as("bg"))
      .filter(col("bg").contains(" ")) // 1-word docs yield a degenerate shingle
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val uni = reference.select(explode(TextAnalysis.words(col(text))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("_c1"))
    val vocab = uni.agg(count(lit(1)).as("_v"))
    val bi = reference
      .select(explode(Dedup.shingles(col(text), 2)).as("bg"))
      .filter(col("bg").contains(" "))
      .groupBy("bg").agg(count(lit(1)).as("_c2"))
    pairs.join(bi, Seq("bg"), "left").join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("_c2"), lit(0L)) + lit(alpha)) /
          (coalesce(col("_c1"), lit(0L)) + lit(alpha) * col("_v"))), 6)
          .cast("decimal(18,6)").as("_lp"))
      .groupBy("doc_id")
      .agg(sum(col("_lp")).as("_slp"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"),
        (col("_slp").cast("double") / col("n_bigrams")).as("mean_lp"),
        col("n_bigrams"))
  }

  /** Interpolated Kneser-Ney trigram log-probability (Chen & Goodman
    * 1999 §3; the smoothing family CCNet's KenLM scorer uses, here at
    * order 3 with a single fixed discount D) — the rank-quality step up
    * from [[bigramLogProb]]: continuation counts reward words that
    * appear in MANY contexts rather than often in one, which is what
    * separates templated boilerplate from prose.
    *
    *   p(w3|w1w2) = (max(c(w1w2w3)−D, 0) + D·N1+(w1w2·)·p(w3|w2)) / c(w1w2)
    *   p(w3|w2)   = (max(N1+(·w2w3)−D, 0) + D·N1+(w2·)·p(w3)) / N1+(·w2·)
    *   p(w3)      = (N1+(·w3) + α) / (N1+(··) + α·(V+1))
    *
    * A context with no observed continuations (possible when scoring
    * against a separate reference: c(w1w2) > 0 only at document edges)
    * backs off a full order instead of emitting p = 0; the unigram level
    * carries an add-α floor so OOV words stay finite. Everything is
    * integer counts + one fixed double expression per trigram, ln rounded
    * to 6 dp and DECIMAL-summed per doc — engine-portable like the
    * bigram scorer.
    *
    * Shape at scale: reference-keyed type/token aggregations (trigram
    * types, bigram types — each one shuffle), the scored corpus exploded
    * once and joined on its four n-gram keys, a 1-row totals broadcast.
    * No corpus self-joins.
    */
  def knTrigramLogProb(docs: DataFrame, id: String, text: String): DataFrame =
    knTrigramLogProbAgainst(docs, docs, id, text)

  /** [[knTrigramLogProb]] trained on a SEPARATE reference corpus — the
    * CCNet arrangement; the left-join backoff paths (unseen trigram /
    * context / word) only this variant exercises.
    */
  def knTrigramLogProbAgainst(reference: DataFrame, docs: DataFrame,
                              id: String, text: String,
                              discount: Double = 0.75,
                              alpha: Double = 0.5): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    require(alpha > 0, s"alpha must be positive: $alpha")
    val d = lit(discount)
    // reference statistics: token counts + N1+ type counts
    val tris = reference
      .select(explode(Dedup.shingles(col(text), 3)).as("tg"))
      .filter(size(split(col("tg"), " ")) === 3)
    val triTypes = tris.groupBy("tg").agg(count(lit(1)).as("_c3"))
      .withColumn("_bg12", substring_index(col("tg"), " ", 2))
      .withColumn("_bg23", substring_index(col("tg"), " ", -2))
      .withColumn("_w2", substring_index(col("_bg23"), " ", 1))
    val bis = reference
      .select(explode(Dedup.shingles(col(text), 2)).as("bg"))
      .filter(col("bg").contains(" "))
    val biTypes = bis.groupBy("bg").agg(count(lit(1)).as("_c2tok"))
      .withColumn("_bw1", substring_index(col("bg"), " ", 1))
      .withColumn("_bw2", substring_index(col("bg"), " ", -1))
    // keyed stat tables (each bounded by the reference's type counts)
    val ctx12 = triTypes.groupBy(col("_bg12").as("_bg12"))
      .agg(count(lit(1)).as("_f12")) // N1+(w1w2·)
      .join(biTypes.select(col("bg").as("_bg12"), col("_c2tok")), Seq("_bg12"), "outer")
    val cont23 = triTypes.groupBy(col("_bg23").as("_bg23"))
      .agg(count(lit(1)).as("_cb")) // N1+(·w2w3)
    val w2Stats = triTypes.groupBy(col("_w2").as("_w2"))
      .agg(count(lit(1)).as("_mc")) // N1+(·w2·)
      .join(biTypes.groupBy(col("_bw1").as("_w2"))
        .agg(count(lit(1)).as("_fw2")), Seq("_w2"), "outer") // N1+(w2·)
    val contUni = biTypes.groupBy(col("_bw2").as("_w3"))
      .agg(count(lit(1)).as("_cu")) // N1+(·w3)
    val totals = biTypes.agg(count(lit(1)).as("_tc")) // N1+(··)
      .crossJoin(reference.select(explode(TextAnalysis.words(col(text))).as("w"))
        .agg(count_distinct(col("w")).as("_v")))
    // scored corpus: one explode, four key joins, one broadcast
    val scored = docs
      .select(col(id).as("doc_id"), explode(Dedup.shingles(col(text), 3)).as("tg"))
      .filter(size(split(col("tg"), " ")) === 3)
      .withColumn("_bg12", substring_index(col("tg"), " ", 2))
      .withColumn("_bg23", substring_index(col("tg"), " ", -2))
      .withColumn("_w2", substring_index(col("_bg23"), " ", 1))
      .withColumn("_w3", substring_index(col("tg"), " ", -1))
    val joined = scored
      .join(triTypes.select("tg", "_c3"), Seq("tg"), "left")
      .join(ctx12, Seq("_bg12"), "left")
      .join(cont23, Seq("_bg23"), "left")
      .join(w2Stats, Seq("_w2"), "left")
      .join(contUni, Seq("_w3"), "left")
      .crossJoin(broadcast(totals))
    val c3 = coalesce(col("_c3"), lit(0L))
    val c2 = coalesce(col("_c2tok"), lit(0L))
    val f12 = coalesce(col("_f12"), lit(0L))
    val cb = coalesce(col("_cb"), lit(0L))
    val mc = coalesce(col("_mc"), lit(0L))
    val fw2 = coalesce(col("_fw2"), lit(0L))
    val cu = coalesce(col("_cu"), lit(0L))
    val p1 = (cu + lit(alpha)) / (col("_tc") + lit(alpha) * (col("_v") + lit(1L)))
    val p2 = when(mc > 0, (greatest(cb - d, lit(0.0)) + d * fw2 * p1) / mc)
      .otherwise(p1)
    val p3 = when(c2 > 0 && f12 > 0,
        (greatest(c3 - d, lit(0.0)) + d * f12 * p2) / c2)
      .otherwise(p2)
    joined
      .select(col("doc_id"),
        round(log(p3), 6).cast("decimal(18,6)").as("_lp"))
      .groupBy("doc_id")
      .agg(sum(col("_lp")).as("_slp"), count(lit(1)).as("n_trigrams"))
      .select(col("doc_id"),
        (col("_slp").cast("double") / col("n_trigrams")).as("mean_lp"),
        col("n_trigrams"))
  }

  /** CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): within
    * each language, split documents into three equal-count bands by their
    * LM score — "head" = the most-probable third (score ≥ the language's
    * 2/3 quantile), "tail" = the least; CCNet keeps head(+middle) for
    * pretraining. Any per-doc score works ([[unigramLogProb]] /
    * [[bigramLogProb]] are the in-repo LMs; higher = more probable —
    * CCNet ranks by perplexity, which is a monotone flip of mean log-prob,
    * so the band boundaries are identical).
    *
    * Determinism: thresholds are EXACT interpolated quantiles (Spark
    * `percentile` == DuckDB `quantile_cont`, the q_length_quantiles
    * parity) rounded to 6 dp, and the score is rounded to 6 dp before the
    * ≥ comparison, so a band assignment can't flip on a sub-ulp
    * disagreement between engines.
    *
    * Shape at scale: one language-keyed quantile aggregation (per-group
    * sort state is that language's score multiset — swap
    * `percentile_approx` in at the 100 TB tier, the documented
    * q_length_quantiles trade), the |languages|-row threshold table
    * broadcast back, and the band tag is a scan-fused CASE. No corpus
    * self-joins; the only corpus-sized shuffle is whatever produced the
    * score.
    */
  def ccnetBuckets(scored: DataFrame, lang: String, score: String): DataFrame = {
    val thr = scored.groupBy(col(lang))
      .agg(round(expr(s"percentile($score, 0.3333333333333333D)"), 6).as("_t_lo"),
           round(expr(s"percentile($score, 0.6666666666666666D)"), 6).as("_t_hi"))
      .withColumnRenamed(lang, "_thr_lang")
    // null-safe join key: docs with a null language form their own quantile
    // group and must bucket against it, not vanish from the output
    scored.join(broadcast(thr), col(lang) <=> col("_thr_lang"))
      .withColumn("bucket",
        when(round(col(score), 6) >= col("_t_hi"), "head")
          .when(round(col(score), 6) >= col("_t_lo"), "middle")
          .otherwise("tail"))
      .drop("_t_lo", "_t_hi", "_thr_lang")
  }

  /** The stop words Gopher's "at least 2 of" rule requires (Rae et al.
    * 2021, §A1.1: the, be, to, of, and, that, have, with).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The word-level Gopher quality signals (Rae et al. 2021, §A1.1) the
    * repetition measures above don't cover: word count, mean word length,
    * symbol-to-word ratio (`#` or `...`), fraction of words with at least
    * one alphabetic character, and the count of distinct required stop
    * words present. One struct-valued per-row expression — fuses into the
    * scan like every other signal in this module. Ratios round to 6 dp so
    * threshold comparisons are engine-portable.
    */
  def gopherWordSignals(text: Column): Column =
    gopherWordSignalsOf(text, TextAnalysis.words(text), "[a-z]")

  /** [[gopherWordSignals]] over a CALLER-SUPPLIED segmentation — the
    * space-free-script entry point: pass
    * [[TextAnalysis.wordsSegmented]] and every Han/kana/Thai character
    * counts as one word, with `alphaRe` widened so those characters
    * count as alphabetic (Gopher's alpha rule means "carries a letter",
    * and a Han character is one) — the published thresholds then stay
    * meaningful on CJK text instead of reading one giant non-alpha word
    * per document (re-tune the per-language cutoffs like Gopher's
    * authors do; mean_word_len ≈ 1 by construction there).
    */
  def gopherWordSignalsOf(text: Column, w: Column,
      alphaRe: String = s"[a-z]|${graft.functions.Bpe.CjkCharClass}"): Column = {
    val n = size(w)
    val charTotal = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    val symbols = regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\."))
    val stopLits = array(GopherStopwords.map(lit): _*)
    struct(
      n.as("n_words"),
      round(charTotal * lit(1.0) / n, 6).as("mean_word_len"),
      round(symbols * lit(1.0) / n, 6).as("symbol_ratio"),
      round(size(filter(w, x => x.rlike(alphaRe))) * lit(1.0) / n, 6).as("alpha_frac"),
      size(filter(stopLits, s => array_contains(w, s))).as("stop_hits"))
  }

  /** The line-level Gopher signals: fraction of lines starting with a
    * bullet (`- ` or `• `) and fraction ending with an ellipsis. The
    * caller derives `lines` however its corpus delimits them (newline
    * split, fixed word windows, …).
    */
  def gopherLineSignals(lines: Column): Column = {
    val n = size(lines)
    struct(
      n.as("n_lines"),
      round(size(filter(lines, l => l.startsWith("- ") || l.startsWith("• ")))
        * lit(1.0) / n, 6).as("bullet_frac"),
      round(size(filter(lines, l => l.endsWith("..."))) * lit(1.0) / n, 6)
        .as("ellipsis_frac"))
  }

  /** The composed Gopher keep/drop verdict over [[gopherWordSignals]] +
    * [[gopherLineSignals]], published thresholds: 50 <= words <= 100000,
    * 3 <= mean word length <= 10, symbol ratio <= 0.1, >= 80% alphabetic
    * words, >= 2 required stop words, <= 90% bullet lines, <= 30%
    * ellipsis lines. Returns the comma-joined failure reasons (empty =
    * keep), reason order fixed for reproducibility.
    */
  /** Encoding-sanity signals (the ftfy/CCNet preprocessing tier): count +
    * fraction of U+FFFD replacement characters (a decoder already gave
    * up), count + fraction of C0 control characters other than
    * tab/newline/CR (binary spill into "text"), and UTF-8-read-as-Latin-1
    * mojibake marker hits (`Ã`/`Â`/`â` followed by a U+0080–U+00BF
    * continuation form — the signature of a double-decoded page, e.g.
    * `café` → `cafÃ©`). One struct-valued scan-fused expression, RE2-safe
    * character classes so DuckDB shares the spec verbatim; fractions
    * round to 6 dp over a max(len, 1) denominator.
    */
  def encodingSignals(text: Column): Column = {
    val n = greatest(length(text), lit(1))
    val repl = regexp_count(text, lit("�"))
    val ctrl = regexp_count(text,
      lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"))
    val moji = regexp_count(text,
      lit("[ÃÂâ][\\x{0080}-\\x{00bf}]"))
    struct(
      length(text).as("n_chars"),
      repl.cast("int").as("replacement_hits"),
      round(repl * lit(1.0) / n, 6).as("replacement_frac"),
      ctrl.cast("int").as("ctrl_hits"),
      round(ctrl * lit(1.0) / n, 6).as("ctrl_frac"),
      moji.cast("int").as("mojibake_hits"),
      (repl === 0 && ctrl === 0 && moji === 0).as("clean"))
  }

  /** Quality gate at a TARGET KEEP RATE — "keep the best 25%" stated
    * directly instead of hand-tuning an absolute threshold that rots as
    * the score distribution drifts between crawl epochs: the threshold
    * is the exact interpolated (1 − keepRate) percentile of the score
    * (Spark `percentile` == DuckDB `quantile_cont`, the parity
    * q_length_quantiles pins), computed in ONE global aggregation whose
    * single-row result broadcasts back over the scan; rows at or above
    * it survive. Ties at the threshold keep everything equal to it, so
    * the realized rate can exceed the target on heavy ties — the
    * deterministic choice both engines state identically. Output keeps
    * the input columns plus `thr` (6 dp) for observability.
    */
  def gateAtKeepRate(docs: org.apache.spark.sql.DataFrame, scoreCol: String,
                     keepRate: Double): org.apache.spark.sql.DataFrame = {
    require(keepRate > 0.0 && keepRate <= 1.0,
      s"gateAtKeepRate: keepRate must be in (0, 1], got $keepRate")
    val p = 1.0 - keepRate
    val thr = docs.agg(
      org.apache.spark.sql.functions.expr(s"percentile($scoreCol, ${p}D)").as("_thr"))
    docs.crossJoin(org.apache.spark.sql.functions.broadcast(thr))
      .filter(col(scoreCol) >= col("_thr"))
      .withColumn("thr", round(col("_thr"), 6))
      .drop("_thr")
  }

  def gopherReasons(wordSig: Column, lineSig: Column): Column = concat_ws(",",
    when(wordSig.getField("n_words") < 50 || wordSig.getField("n_words") > 100000,
      lit("word_count")),
    when(wordSig.getField("mean_word_len") < 3.0 || wordSig.getField("mean_word_len") > 10.0,
      lit("word_len")),
    when(wordSig.getField("symbol_ratio") > 0.1, lit("symbols")),
    when(wordSig.getField("alpha_frac") < 0.8, lit("non_alpha")),
    when(wordSig.getField("stop_hits") < 2, lit("stop_words")),
    when(lineSig.getField("bullet_frac") > 0.9, lit("bullets")),
    when(lineSig.getField("ellipsis_frac") > 0.3, lit("ellipses")))
}
