package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain-level corpus curation — the web-pipeline stages that key
  * on a document's source URL (C4 §2.2 dedupes by URL, RefinedWeb §3.1
  * filters and balances by registered domain): URL extraction, host and
  * registered-domain normalization, and deterministic per-domain document
  * caps.
  *
  * Extraction and normalization are pure codegen'd regexp expressions that
  * fuse into the corpus scan. The domain cap reuses the bounded top-k
  * aggregate ([[graft.functions.TopKRowsAgg]] via
  * [[CqlOps.perPartitionLimitAgg]]): map-side partial buffers hold at most
  * `n` rows per domain, so the one domain-keyed shuffle ships the
  * survivors, never the corpus — at 100 TB a hot domain (the whole point
  * of capping) would otherwise be exactly the key that skews a rank
  * window's shuffle.
  */
object WebCuration {

  /** URL pattern, RE2-and-Java-compatible so the same string runs in
    * Spark and the DuckDB oracle (scheme + maximal non-space run).
    */
  val UrlRe = "https?://[^\\s]+"

  /** All URLs appearing in `text`, in document order. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** Host of a URL: the authority between the scheme and the first '/'. */
  def hostOf(url: Column): Column =
    regexp_extract(url, "https?://([^/\\s]+)", 1)

  /** Registered domain: the host with a leading `www.` stripped (the
    * normalization C4-style URL dedup keys on; full public-suffix-list
    * resolution would be a broadcast lookup table in front of this).
    */
  def domainOf(host: Column): Column = regexp_replace(host, "^www\\.", "")

  /** Keep at most `n` documents per domain — a deterministic
    * pseudo-random subset: survivors are the first `n` in (60-bit md5
    * variate, id) order, so the kept set is reproducible across runs and
    * engines and unbiased w.r.t. document content. Output adds `rn`
    * (1-based rank within the domain). Ordering uses the exact integer
    * variate ([[Pipeline.hashPrefix60]]), not its double projection — two
    * prefixes agreeing in the top 53 bits would tie as doubles and leave
    * the survivor set engine-dependent.
    */
  def capPerDomain(docs: DataFrame, domainCol: String, idCol: String,
                   n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    CqlOps.perPartitionLimitAgg(
      docs.withColumn("_m", Pipeline.hashPrefix60(col(idCol))),
      Seq(domainCol), Seq(("_m", false), (idCol, false)), n,
      rowNumberCol = "rn").drop("_m")
  }
}
