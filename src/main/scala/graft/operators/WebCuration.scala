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

  /** Registered domain: the host lowercased (RFC 3986 — the authority is
    * case-insensitive) with a leading `www.` stripped (the normalization
    * C4-style URL dedup keys on; full public-suffix-list resolution
    * would be a broadcast lookup table in front of this).
    */
  def domainOf(host: Column): Column =
    regexp_replace(lower(host), "^www\\.", "")

  /** Every dot-suffix of a host, most-specific first (`a.b.c` →
    * `["a.b.c", "b.c", "c"]`) — the candidate keys a domain-blocklist
    * entry can match at any depth (an entry `b.c` blocks `a.b.c`).
    */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(0), size(labels) - 1), i =>
      array_join(slice(labels, i + 1, size(labels) - i), "."))
  }

  /** UT1-style domain-blocklist filtering (the RefinedWeb/FineWeb
    * curation step that drops documents whose source host falls under a
    * blocked domain at ANY depth): keep exactly the docs none of whose
    * host suffixes appears in the blocklist. Matching is
    * case-insensitive on both sides (RFC 3986 authority).
    *
    * Shape at scale: candidate ids come from one COLUMN-PRUNED scan
    * (only id + the ≤ label-count exploded suffixes travel — the
    * document payload is never duplicated), the blocklist broadcasts
    * into that scan, and the surviving corpus is a left-anti join
    * against the DISTINCT blocked-id set — typically a small fraction
    * of the corpus, which AQE broadcasts; the full corpus is never
    * shuffled on content.
    */
  def urlBlocklistFilter(docs: DataFrame, hostCol: String, idCol: String,
                         blocklist: DataFrame): DataFrame = {
    val entries = blocklist
      .select(lower(col(blocklist.columns.head)).as("_sfx")).distinct()
    val blockedIds = docs
      .select(col(idCol), explode(domainSuffixes(lower(col(hostCol)))).as("_sfx"))
      .join(broadcast(entries), "_sfx")
      .select(col(idCol)).distinct()
    docs.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** Personalized (topic-sensitive) PageRank: the random surfer
    * teleports back to a SEED set instead of everywhere — rank measures
    * proximity to the seeds, the topical-authority prior crawl
    * prioritization and seed-expansion use (Haveliwala 2002). p is
    * uniform over the seed hosts PRESENT in the graph (absent seeds are
    * ignored; at least one must be present); rank initializes to p and
    * iterates rank' = (1−d)·p + d·(in-flow + danglingMass·p). Same
    * fixed-point per-edge contribution recipe and iteration shape as
    * [[pageRank]] (scaled-long HALF_UP rounds, long sums,
    * node-bounded tables, checkpointed lineage); kept separate so the
    * uniform operator's pinned bit-exact fixtures stay untouched.
    */
  /** Driver replica of Spark's `round(doubleCol).cast("long")` — HALF_UP on
    * the shortest-decimal form (java BigDecimal.valueOf == Double.toString),
    * exactly the RoundBase path codegen runs — so the local fixed-point
    * folds below stay bit-equal to the distributed loops they replace.
    */
  private def roundHalfUpLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  def pageRankPersonalized(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val scale = graft.operators.Similarity.fixedPointScale
    val e = edges.select(col("src"), col("dst")).distinct()
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .localCheckpoint()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val eD = e.join(outDeg, "src").localCheckpoint()
    // same size-adaptive driver fold as [[pageRankWeighted]]: bounded
    // graphs run all rounds in one collect+fold of the identical
    // fixed-point arithmetic (spec-pinned bit-equal); big graphs take the
    // distributed loop below. The seed list is bounded by contract, so
    // collecting its distinct hosts on this path costs what the broadcast
    // side of the semi-join would.
    val localMaxEdges = edges.sparkSession.conf
      .get("spark.graft.pagerank.localIterMaxEdges", (1L << 20).toString).toLong
    if (eD.count() <= localMaxEdges) {
      val rows = eD.select("src", "dst", "deg").collect()
      val hosts = rows.iterator
        .flatMap(r => Iterator(r.getString(0), r.getString(1)))
        .toArray.distinct
      val idx = hosts.zipWithIndex.toMap
      val seedSet = seeds.select(col("host")).distinct().collect()
        .map(_.getString(0)).toSet.intersect(hosts.toSet)
      val ns = seedSet.size
      require(ns > 0, "pageRankPersonalized: no seed host present in the graph")
      val p = hosts.map(h => if (seedSet.contains(h)) 1.0 / ns else 0.0)
      val srcI = rows.map(r => idx(r.getString(0)))
      val dstI = rows.map(r => idx(r.getString(1)))
      val degArr = rows.map(_.getLong(2))
      val isSrc = new Array[Boolean](hosts.length)
      srcI.foreach(isSrc(_) = true)
      var rank = p.clone()
      var it = 0
      while (it < iters) {
        val cs = new Array[Long](hosts.length)
        var i = 0
        while (i < srcI.length) {
          cs(dstI(i)) += roundHalfUpLong(
            rank(srcI(i)) / degArr(i).toDouble * scale)
          i += 1
        }
        var dang = 0L
        var j = 0
        while (j < hosts.length) {
          if (!isSrc(j)) dang += roundHalfUpLong(rank(j) * scale)
          j += 1
        }
        rank = Array.tabulate(hosts.length) { k =>
          (1.0 - damping) * p(k) + damping *
            (cs(k).toDouble / scale + dang.toDouble / scale * p(k))
        }
        it += 1
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return hosts.zip(rank).toSeq.toDF("host", "rank")
        .select(col("host"), round(col("rank"), 6).as("rank"))
    }
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct().localCheckpoint()
    val seedNodes = nodes
      .join(seeds.select(col("host")).distinct(), Seq("host"), "left_semi")
      .localCheckpoint()
    val ns = seedNodes.count()
    require(ns > 0, "pageRankPersonalized: no seed host present in the graph")
    val pTbl = nodes.join(seedNodes.withColumn("_s", lit(1)), Seq("host"), "left")
      .select(col("host"),
        when(col("_s").isNotNull, lit(1.0 / ns)).otherwise(lit(0.0)).as("p"))
      .localCheckpoint()
    val danglingNodes = nodes
      .join(e.select(col("src").as("host")).distinct(), Seq("host"), "left_anti")
      .localCheckpoint()
    var ranks = pTbl.select(col("host"), col("p").as("rank")).localCheckpoint()
    var it = 0
    while (it < iters) {
      val contribs = eD.join(ranks, eD("src") === ranks("host"))
        .select(col("dst"),
          round(col("rank") / col("deg") * lit(scale)).cast("long").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("cs"))
      // same one-job-per-iteration fold as [[pageRankWeighted]]: the 1-row
      // dangling aggregate cross-joins into the update instead of a
      // per-iteration collect(); identical long sum and IEEE op order.
      val danglingAgg = danglingNodes.join(ranks, Seq("host"))
        .agg(coalesce(sum(round(col("rank") * lit(scale)).cast("long")), lit(0L))
          .as("_dang"))
      ranks = pTbl.join(contribs, pTbl("host") === contribs("dst"), "left")
        .crossJoin(broadcast(danglingAgg))
        .select(pTbl("host"),
          (lit(1.0 - damping) * col("p") + lit(damping) *
            (coalesce(col("cs"), lit(0L)).cast("double") / lit(scale) +
              col("_dang").cast("double") / lit(scale) * col("p"))).as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks.select(col("host"), round(col("rank"), 6).as("rank"))
  }

  /** Semi-supervised label propagation (LPA with clamped seeds) over a
    * (src, dst) edge table: each round, every NON-seed node takes the
    * majority label among its labeled neighbors (ties break to the
    * lexicographically smallest label; nodes with no labeled neighbor
    * keep their current label), seeds never change. Deterministic by
    * the pinned tie rules and synchronous rounds. The category-spread
    * primitive: a handful of hand-labeled hosts classifies the
    * connected neighborhood (domain topics, language communities,
    * spam rings).
    *
    * Shape at scale: per round, ONE join of the edge table against the
    * node-bounded label table (never edges×edges), a (node,
    * label)-keyed count with map-side partials, a min_by winner per
    * node, and the clamp join — all node/edge-bounded;
    * `localCheckpoint` truncates the iterative lineage. Unreached
    * nodes stay null.
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"labelPropagation: iters must be >= 1, got $iters")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    val nodes = und.select(col("a").as("host")).distinct()
    val seedTbl = seeds.select(col("host"), col("label").as("_seed"))
    var labels = nodes.join(seedTbl, Seq("host"), "left")
      .select(col("host"), col("_seed").as("label"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val winner = und
        .join(labels.select(col("host").as("b"), col("label").as("nl")), "b")
        .filter(col("nl").isNotNull)
        .groupBy(col("a"), col("nl")).agg(count(lit(1)).as("c"))
        .groupBy(col("a"))
        .agg(min_by(col("nl"), struct((-col("c")).as("nc"), col("nl")))
          .as("prop"))
      labels = labels
        .join(seedTbl, Seq("host"), "left")
        .join(winner.withColumnRenamed("a", "host"), Seq("host"), "left")
        .select(col("host"),
          coalesce(col("_seed"), col("prop"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** robots.txt rules for the wildcard agent: one (host, allow, prefix)
    * row per Allow/Disallow line inside any `User-agent: *` section of
    * the host's robots.txt content. Scan-fused parse — a section split
    * on `user-agent:` (case-insensitive) plus a per-section multiline
    * rule extraction, no UDF; multiple wildcard sections merge. Lines
    * with an EMPTY path value (`Disallow:` = allow everything) carry no
    * restriction and are dropped; named-agent sections are out of scope
    * (the pipeline crawls as `*`).
    */
  def robotsRules(robots: DataFrame, hostCol: String,
                  contentCol: String): DataFrame =
    robots
      .select(col(hostCol).as("host"),
        explode(split(col(contentCol), "(?i)user-agent:")).as("_sec"))
      .filter(regexp_extract(col("_sec"), "^[ \\t]*\\*", 0) =!= "")
      .select(col("host"), explode(regexp_extract_all(col("_sec"),
        lit("(?im)^[ \\t]*(?:allow|disallow):[ \\t]*(\\S+)"), lit(0)))
        .as("_line"))
      .select(col("host"),
        (lower(regexp_extract(col("_line"), "(?i)(allow|disallow)", 1))
          === "allow").as("allow"),
        regexp_extract(col("_line"), ":[ \\t]*(\\S+)", 1).as("prefix"))

  /** Crawl-politeness filtering under parsed robots rules: a URL
    * survives iff NO rule of its host matches its path, or the
    * longest-prefix matching rule is an Allow (Allow wins equal-length
    * ties — the Google precedence). A URL with no path normalizes to
    * `/`.
    *
    * Shape at scale: the rule table is host-bounded (broadcast), the
    * match scan is column-pruned (id/host/path only — no payload), the
    * verdict reduces per id with a bounded max-of-struct, and survivors
    * come from a left-anti join against the small blocked-id set —
    * the [[urlBlocklistFilter]] geometry.
    */
  def robotsFilter(urls: DataFrame, idCol: String, urlCol: String,
                   rules: DataFrame): DataFrame = {
    val path = regexp_extract(col(urlCol), "https?://[^/\\s]+(/[^\\s]*)", 1)
    val withHp = urls.select(col(idCol),
      hostOf(col(urlCol)).as("_h"),
      when(path === "", "/").otherwise(path).as("_p"))
    val blocked = withHp
      .join(broadcast(rules), withHp("_h") === rules("host"))
      .filter(col("_p").startsWith(col("prefix")))
      .groupBy(idCol)
      .agg(max(struct(length(col("prefix")).as("l"), col("allow").as("a")))
        .as("_w"))
      .filter(!col("_w.a"))
      .select(col(idCol))
    urls.join(blocked, Seq(idCol), "left_anti")
  }

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

  /** Host-graph edges from a page table: page host × each outlink host,
    * self-loops dropped, multi-edges collapsed. Both endpoints normalize
    * through [[domainOf]]∘[[hostOf]]; the outlink explode is map-side
    * (no payload duplicated — only the two host strings reach the
    * distinct's shuffle).
    */
  def hostEdges(pages: DataFrame, urlCol: String, linksCol: String): DataFrame =
    pages.select(
        domainOf(hostOf(col(urlCol))).as("src"),
        explode(col(linksCol)).as("_l"))
      .select(col("src"), domainOf(hostOf(col("_l"))).as("dst"))
      .filter(col("src") =!= "" && col("dst") =!= "" &&
        col("src") =!= col("dst"))
      .distinct()

  /** HITS hubs-and-authorities (Kleinberg 1999) over a (src, dst) edge
    * table — PageRank's companion link metric: an AUTHORITY is pointed
    * to by good hubs, a HUB points to good authorities (directories vs
    * content hosts — the distinction a single PageRank score blurs).
    *
    * Synchronous mutual iteration with L1 normalization each half-step:
    * auth(v) = Σ_{u→v} hub(u) / Σ, then hub(u) = Σ_{u→v} auth(v) / Σ.
    * Same scale shape as [[pageRank]]: each half-step is ONE keyed join
    * of the checkpointed edge table against a node-bounded score table
    * plus one keyed aggregation; the L1 total collects a single long.
    *
    * Determinism (house recipe): per-edge contributions round ONCE to
    * 2^24-scaled longs and sum as longs (partitioning-independent); the
    * normalizer is the exact long total, and the only double division is
    * contribution/total. Output rounds to 6 dp; each of hub/authority
    * sums to ~1.
    */
  def hits(edges: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val scale = graft.operators.Similarity.fixedPointScale
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "hits: empty graph")
    // one half-step: scores keyed on `from` flow along (from -> to) edges
    def halfStep(scores: DataFrame, scoreCol: String, from: String,
                 to: String, outCol: String): DataFrame = {
      val contribs = e.join(scores, e(from) === scores("host"))
        .select(col(to),
          round(col(scoreCol) * lit(scale)).cast("long").as("c"))
        .groupBy(to).agg(sum(col("c")).as("cs"))
      val total = contribs
        .agg(coalesce(sum(col("cs")), lit(0L))).collect()(0).getLong(0)
      require(total > 0, s"hits: zero $outCol mass (degenerate graph)")
      nodes.join(contribs, nodes("host") === contribs(to), "left")
        .select(nodes("host"),
          (coalesce(col("cs"), lit(0L)).cast("double") /
            lit(total.toDouble)).as(outCol))
        .localCheckpoint()
    }
    var hub = nodes.withColumn("hub", lit(1.0 / n)).localCheckpoint()
    var auth = hub.select(col("host"), col("hub").as("authority"))
    var it = 0
    while (it < iters) {
      auth = halfStep(hub, "hub", "src", "dst", "authority")
      hub = halfStep(auth, "authority", "dst", "src", "hub")
      it += 1
    }
    hub.join(auth, "host")
      .select(col("host"), round(col("hub"), 6).as("hub"),
        round(col("authority"), 6).as("authority"))
  }

  /** Per-node triangle counts and local clustering coefficient over the
    * undirected view of a (src, dst) edge table — the graph-density
    * signal PageRank/HITS can't see: link farms and mirror clusters are
    * near-cliques (coefficient → 1) while organic hub neighborhoods are
    * sparse, so the coefficient separates manufactured link
    * neighborhoods from earned ones (a SEO-spam feature alongside
    * [[hostQualityStats]]).
    *
    * Enumeration is the degree-ordered compact-forward scheme (Schank &
    * Wagner; Latapy 2008): canonicalize to undirected a<b edges, orient
    * every edge from its lower-(degree, name) endpoint to the higher,
    * and count each triangle exactly once at its minimum-order vertex —
    * wedges pair through ONE self-join on the orientation source (per-
    * source fan-out is bounded by O(√m) out-degree, the property that
    * keeps star hubs from exploding the wedge stage) and close with one
    * join against the oriented edge set. Per-node counts explode each
    * closed triangle to its three corners and reduce on the node key;
    * coefficient = 2·T(v) / (d(v)·(d(v)−1)) as one exact-integer divide
    * rounded 6 dp, defined 0.0 below degree 2.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("degree").as("db")), "b")
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi"), col("db").as("dhi")))
          .otherwise(
            struct(col("b").as("lo"), col("a").as("hi"), col("da").as("dhi")))
          .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"), col("e.dhi").as("dhi"))
      .localCheckpoint()
    val e1 = oriented.select(col("lo"), col("hi").as("v"), col("dhi").as("dv"))
    val e2 = oriented.select(col("lo"), col("hi").as("w"), col("dhi").as("dw"))
    val wedges = e1.join(e2, "lo")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("lo").as("u"), col("v"), col("w"))
    val closing = oriented.select(col("lo").as("v"), col("hi").as("w"))
    val triangles = wedges.join(closing, Seq("v", "w"), "left_semi")
    val corners = triangles.select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("triangles"))
    deg.join(corners, "v", "left")
      .select(col("v").as("host"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          round((coalesce(col("triangles"), lit(0L)) * lit(2L)).cast("double") /
            (col("degree") * (col("degree") - lit(1L))).cast("double"), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Per-host link reciprocity over a DIRECTED (src, dst) edge table —
    * the link-exchange signal: organic linking is largely one-way
    * (content → reference), while reciprocal-link schemes ("you link me,
    * I link you") push a host's reciprocity toward 1. For each host with
    * outgoing edges: distinct out-degree, the count of those edges whose
    * reverse edge also exists, and their exact-quotient ratio (6 dp).
    *
    * Shape at scale: edges dedup on their own key, the reverse check is
    * ONE self-semi-join on the (dst, src) key — co-partitioned equi-join,
    * never a matrix product — and the reduce is host-keyed.
    */
  def linkReciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val marked = e.join(rev, Seq("src", "dst"), "left_semi")
      .select(col("src"), lit(1L).as("_r"))
      .groupBy("src").agg(sum(col("_r")).as("reciprocal"))
    e.groupBy("src").agg(count(lit(1)).as("out_degree"))
      .join(marked, Seq("src"), "left")
      .select(col("src").as("host"), col("out_degree"),
        coalesce(col("reciprocal"), lit(0L)).as("reciprocal"),
        round(coalesce(col("reciprocal"), lit(0L)).cast("double") /
          col("out_degree").cast("double"), 6).as("reciprocity"))
  }

  /** k-core decomposition (coreness) over the undirected view of a
    * (src, dst) edge table — the cohesion signal that separates densely
    * interlinked communities (and link farms — a farm is a high-core
    * near-clique) from tree-like organic periphery: a node's coreness is
    * the largest k such that it survives in a subgraph of minimum degree
    * k. Peeling algorithm (Matula & Beck): for k = 1, 2, …, repeatedly
    * delete nodes of degree < k until stable; nodes deleted during stage
    * k have coreness k − 1. Both loops are node-bounded DataFrame
    * rounds: each inner step is one degree aggregation + one semi-join
    * filter on the node key (edges carry no payload), checkpointed per
    * round; the outer loop runs max-coreness times, the inner one peel
    * depth per stage — at web scale both are small (coreness is bounded
    * by √m and real host graphs peel in tens of rounds).
    */
  def kCore(edges: DataFrame): DataFrame = {
    val und0 = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    // explicit alive set: a node that loses its LAST edge mid-stage must
    // still be peeled (degree 0 < k), not silently vanish from the edge
    // table — a star center drains with its leaves, at the same coreness
    var alive = und0.select(col("a").as("v"))
      .union(und0.select(col("b").as("v")))
      .distinct().localCheckpoint()
    var aliveCount = alive.count()
    var remaining = und0
    // seed schema derives from the edge table's node type — a hardcoded
    // String seed would coerce numeric node ids to string via unionByName
    var out: DataFrame = und0.select(col("a").as("host")).limit(0)
      .withColumn("coreness", lit(0L))
    var k = 1L
    while (aliveCount > 0) {
      // peel everything that cannot sit in the k-core; what falls out
      // during stage k has coreness k - 1. Terminates: each inner pass
      // shrinks `alive` or goes stable; each stable stage bumps k, and
      // k > max degree dooms everything.
      var stable = false
      while (!stable && aliveCount > 0) {
        val deg = remaining.select(col("a").as("v"))
          .union(remaining.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
        val doomed = alive.join(deg, Seq("v"), "left")
          .filter(coalesce(col("d"), lit(0L)) < k)
          .select("v").localCheckpoint()
        if (doomed.isEmpty) stable = true
        else {
          out = out.unionByName(
            doomed.select(col("v").as("host"), lit(k - 1).as("coreness")))
            .localCheckpoint()
          alive = alive.join(doomed, Seq("v"), "left_anti").localCheckpoint()
          aliveCount = alive.count()
          remaining = remaining
            .join(doomed.withColumnRenamed("v", "a"), Seq("a"), "left_anti")
            .join(doomed.withColumnRenamed("v", "b"), Seq("b"), "left_anti")
            .localCheckpoint()
        }
      }
      if (aliveCount > 0) k += 1
    }
    out
  }

  /** Crawl-snapshot diff — the "what changed since the last crawl"
    * decision table incremental ingest starts from: per key (URL), the
    * new snapshot vs the standing corpus classifies as `new` (key absent
    * from the corpus), `changed` (present, different content digest),
    * `unchanged` (same digest), or `gone` (corpus key absent from the
    * snapshot — the tombstone/recrawl candidate). Inputs must be
    * key-deduped on their side (C4-style keep-one-page-per-URL upstream).
    *
    * Shape at scale: one co-partitioned full-outer join on the key — both
    * sides carry only (key, digest), never payloads; downstream stages
    * join the status back by key and reuse the partitioning, so only the
    * `new`/`changed` slice ever reaches the expensive operators.
    */
  def snapshotDiff(snapshot: DataFrame, corpus: DataFrame, keyCol: String,
                   digestCol: String): DataFrame = {
    // presence rides as an explicit marker — classifying on digest
    // nullness would misread a legitimately-null digest on a key present
    // in BOTH sides as new/gone; digests compare null-safe (two missing
    // digests are "unchanged", one missing is a change)
    val s0 = snapshot.select(col(keyCol).as("_k"), col(digestCol).as("_dn"),
      lit(true).as("_sp"))
    val c0 = corpus.select(col(keyCol).as("_k"), col(digestCol).as("_dc"),
      lit(true).as("_cp"))
    s0.join(c0, Seq("_k"), "full_outer")
      .select(col("_k").as(keyCol),
        when(col("_cp").isNull, "new")
          .when(col("_sp").isNull, "gone")
          .when(col("_dn") <=> col("_dc"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Host-level quality roll-up (the RefinedWeb-style host filter: page
    * signals aggregate per host, and hosts — not pages — get the
    * keep/drop decision; at 100 TB a host verdict is ~10^7 rows of state
    * for a corpus-sized effect). One host-keyed aggregation; the mean is
    * the house fixed-point form (per-doc scores round ONCE to integer
    * micros, sum as longs, divide once) so it hashes identically under
    * any partitioning. `keep` compares the 6-dp-rounded mean, so the
    * decision is engine-portable at threshold boundaries.
    */
  def hostQualityStats(docs: DataFrame, hostCol: String, scoreCol: String,
                       minMean: Double): DataFrame = {
    val mean = round(col("_s").cast("double") /
      (col("n_docs").cast("double") * lit(1e6)), 6)
    docs.groupBy(col(hostCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(round(col(scoreCol) * lit(1e6)).cast("long")).as("_s"))
      .select(col(hostCol), col("n_docs"), mean.as("mean_score"),
        (mean >= lit(minMean)).as("keep"))
  }

  /** Drop every page of a below-threshold host: the stats table is
    * host-bounded, so the verdict attaches by broadcast semi-join — the
    * corpus is never shuffled for the filter.
    */
  def hostQualityFilter(docs: DataFrame, hostCol: String,
                        stats: DataFrame): DataFrame =
    docs.join(broadcast(stats.filter(col("keep")).select(col(hostCol))),
      Seq(hostCol), "left_semi")

  /** [[hostEdges]] with multiplicity: multi-edges aggregate to a weight
    * (#pages of src linking dst) instead of collapsing — the input
    * [[pageRankWeighted]] splits rank over. Same normalization and
    * map-side explode; only (src, dst) strings reach the count shuffle.
    */
  def hostEdgesWeighted(pages: DataFrame, urlCol: String,
                        linksCol: String): DataFrame =
    pages.select(
        domainOf(hostOf(col(urlCol))).as("src"),
        explode(col(linksCol)).as("_l"))
      .select(col("src"), domainOf(hostOf(col("_l"))).as("dst"))
      .filter(col("src") =!= "" && col("dst") =!= "" &&
        col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))

  /** Anchor-term stream from page HTML: one (src, dst, term) row per
    * whitespace token of each cross-host link's anchor text — the
    * incoming-anchor-text signal web curation and retrieval stacks
    * aggregate per target host (anchors describe the TARGET better than
    * its own boilerplate; the classic query-log substitute). Pairing is
    * positional over the same RE2-and-Java-compatible pattern (no
    * backrefs), hosts normalize through [[domainOf]]∘[[hostOf]],
    * schemeless/relative hrefs and same-host self-links drop (nav links
    * carry no cross-host signal). Everything fuses into the page scan —
    * only (src, dst, term) strings survive the explode.
    */
  def anchorTermEdges(pages: DataFrame, urlCol: String,
                      htmlCol: String): DataFrame = {
    val pairRe = "<a [^>]*href=\"([^\"]+)\"[^>]*>([^<]*)</a>"
    val hrefs = regexp_extract_all(col(htmlCol), lit(pairRe), lit(1))
    val texts = regexp_extract_all(col(htmlCol), lit(pairRe), lit(2))
    pages.select(
        domainOf(hostOf(col(urlCol))).as("src"),
        explode(zip_with(hrefs, texts,
          (h, a) => struct(h.as("h"), a.as("a")))).as("_l"))
      .select(col("src"),
        domainOf(hostOf(col("_l.h"))).as("dst"),
        explode(TextAnalysis.words(col("_l.a"))).as("term"))
      .filter(col("src") =!= "" && col("dst") =!= "" &&
        col("src") =!= col("dst") && col("term") =!= "")
  }

  /** Host-level PageRank over a (src, dst) edge table — the link-graph
    * quality prior web-curation stacks attach to every crawled page
    * (harvest-rank / seed-quality style host scoring: a host linked by
    * many well-linked hosts outranks a link farm nobody references).
    *
    * Scale shape: the classic synchronous iteration — each round is ONE
    * src-keyed join of the (deduped, checkpointed) edge table against
    * the rank table and ONE dst-keyed aggregation; the edge table
    * carries only (src, dst, deg) strings+long, never page payloads,
    * and `localCheckpoint` truncates the growing lineage each round
    * (the [[Dedup.dupGroups]] pattern). The dangling-mass probe
    * collects a single long per round. Host graphs are node-bounded
    * (~10^7 hosts for a full web crawl — each round's rank table is
    * tiny next to the corpus the prior gets joined onto).
    *
    * Determinism (the house fixed-point recipe): every per-edge
    * contribution rank/deg is scaled by 2^24 and rounded ONCE (Spark
    * `round` = HALF_UP), then summed as longs — partitioning-
    * independent; the dangling mass sums the same way. Rank update:
    * r' = (1−d)/N + d·(Σc/2^24 + dangling/2^24/N), every double op in
    * one fixed expression. Output ranks round to 6 dp and sum to ~1.
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame =
    pageRankWeighted(
      edges.select(col("src"), col("dst")).distinct()
        .withColumn("weight", lit(1L)),
      "weight", iters, damping)

  /** Weighted PageRank: a source's rank splits across its out-edges
    * proportionally to edge weight (link multiplicity, anchor volume)
    * instead of uniformly — the harvest-rank refinement where a host
    * linking another 500 times endorses it more than a single footer
    * link. Parallel (src, dst) rows sum their weights. With all weights
    * 1 this IS [[pageRank]] bit-for-bit (rank·1 is exact, so the
    * contribution expression degenerates to the uniform split).
    * Same iteration shape and fixed-point recipe as [[pageRank]] —
    * per-edge contribution rank·w/W(src) rounds ONCE to 2^24-scaled
    * longs.
    */
  def pageRankWeighted(edges: DataFrame, weightCol: String, iters: Int = 10,
                       damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val scale = graft.operators.Similarity.fixedPointScale
    val e = edges.select(col("src"), col("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst") && col("w") > 0)
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .localCheckpoint() // reused every iteration — never recomputed
    val outW = e.groupBy("src").agg(sum(col("w")).as("wsum"))
    val eW = e.join(outW, "src").localCheckpoint()
    // Size-adaptive iteration strategy (the broadcast-join principle
    // applied to the fixed-point loop): the AGGREGATED (src, dst, w, wsum)
    // edge table is node/edge-bounded — when it fits in the same budget a
    // broadcast relation would (conf'd max edges, default 2^20 ≈ 100-200 MB
    // framed), ship it to the driver ONCE and run all `iters` rounds as a
    // tight in-memory fold of the IDENTICAL fixed-point arithmetic
    // (HALF_UP 2^24-scaled long contributions, long sums, the same IEEE op
    // order in the update — spec-pinned bit-equal to the distributed loop).
    // A 10^7-host/10^8-edge full-web graph stays on the distributed path;
    // what this removes is 2·iters Spark jobs of pure scheduling overhead
    // on bounded graphs — per-round latency the synchronous formulation
    // otherwise pays no matter how small the graph is.
    val localMaxEdges = edges.sparkSession.conf
      .get("spark.graft.pagerank.localIterMaxEdges", (1L << 20).toString).toLong
    if (eW.count() <= localMaxEdges) {
      // every node appears on some edge (self-loops and nulls dropped), so
      // the host set derives from the collected edges — no separate nodes
      // job on this path; index order is irrelevant to the result (all
      // cross-host combination is exact long addition)
      val rows = eW.select("src", "dst", "w", "wsum").collect()
      val hosts = rows.iterator
        .flatMap(r => Iterator(r.getString(0), r.getString(1)))
        .toArray.distinct
      val n = hosts.length
      require(n > 0, "pageRank: empty graph")
      val idx = hosts.zipWithIndex.toMap
      val srcI = rows.map(r => idx(r.getString(0)))
      val dstI = rows.map(r => idx(r.getString(1)))
      val wArr = rows.map(_.getLong(2))
      val wsumArr = rows.map(_.getLong(3))
      val isSrc = new Array[Boolean](hosts.length)
      srcI.foreach(isSrc(_) = true)
      var rank = Array.fill(hosts.length)(1.0 / n)
      var it = 0
      while (it < iters) {
        val cs = new Array[Long](hosts.length)
        var i = 0
        while (i < srcI.length) {
          cs(dstI(i)) += roundHalfUpLong(
            rank(srcI(i)) * wArr(i).toDouble / wsumArr(i).toDouble * scale)
          i += 1
        }
        var dang = 0L
        var j = 0
        while (j < hosts.length) {
          if (!isSrc(j)) dang += roundHalfUpLong(rank(j) * scale)
          j += 1
        }
        rank = Array.tabulate(hosts.length) { k =>
          (1.0 - damping) / n + damping *
            (cs(k).toDouble / scale + dang.toDouble / scale / n)
        }
        it += 1
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return hosts.zip(rank).toSeq.toDF("host", "rank")
        .select(col("host"), round(col("rank"), 6).as("rank"))
    }
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val danglingNodes = nodes
      .join(e.select(col("src").as("host")).distinct(), Seq("host"), "left_anti")
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var it = 0
    while (it < iters) {
      val contribs = eW.join(ranks, eW("src") === ranks("host"))
        .select(col("dst"),
          round(col("rank") * col("w") / col("wsum") * lit(scale))
            .cast("long").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("cs"))
      // dangling mass rides the SAME action as the rank update (a 1-row
      // aggregate cross-joined in) instead of a per-iteration collect():
      // one Spark job per iteration, not two. Arithmetic is unchanged —
      // the same long sum, then the same two IEEE divides in the same
      // order (dang/scale/n), so ranks stay bit-identical.
      val danglingAgg = danglingNodes
        .join(ranks, Seq("host"))
        .agg(coalesce(sum(round(col("rank") * lit(scale)).cast("long")), lit(0L))
          .as("_dang"))
      ranks = nodes.join(contribs, nodes("host") === contribs("dst"), "left")
        .crossJoin(broadcast(danglingAgg))
        .select(nodes("host"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("cs"), lit(0L)).cast("double") / lit(scale) +
              col("_dang").cast("double") / lit(scale) / lit(n.toDouble)))
            .as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks.select(col("host"), round(col("rank"), 6).as("rank"))
  }
}
