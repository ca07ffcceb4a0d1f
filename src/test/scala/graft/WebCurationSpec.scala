package graft

import graft.operators.{CqlOps, WebCuration}
import org.apache.spark.sql.functions._

class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  test("extractUrls finds every scheme'd URL in document order") {
    val df = Seq(
      (1L, "see https://a.example.com/x then http://b.org/y?q=1 done"),
      (2L, "no urls here")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), WebCuration.extractUrls(col("text")).as("u"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(got(0)._2 === Seq("https://a.example.com/x", "http://b.org/y?q=1"))
    assert(got(1)._2 === Seq.empty)
  }

  test("hostOf and domainOf normalize authority and strip www") {
    val df = Seq(
      "https://www.example.com/path/x",
      "http://sub.example.org",
      "https://example.net/?q=www.other.com").toDF("url")
    val got = df.select(WebCuration.domainOf(WebCuration.hostOf(col("url"))))
      .as[String].collect().toSeq
    assert(got === Seq("example.com", "sub.example.org", "example.net"))
  }

  test("capPerDomain matches the rank-window form and bounds every domain") {
    graft.functions.Functions.ensure(spark)
    val docs = spark.range(200).select(
      col("id").as("doc_id"),
      concat(lit("d"), (col("id") % 7).cast("string")).as("domain"))
    val capped = WebCuration.capPerDomain(docs, "domain", "doc_id", 5)
    val sizes = capped.groupBy("domain").count().as[(String, Long)].collect()
    assert(sizes.length === 7 && sizes.forall(_._2 === 5L))
    // same survivors + ranks as the window form over the same variate
    val m = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    val win = CqlOps.perPartitionLimit(
      docs.withColumn("_m", m), Seq("domain"), Seq(col("_m"), col("doc_id")), 5)
      .select(col("domain"), col("doc_id"), col("rn"))
    val a = capped.select("domain", "doc_id", "rn").as[(String, Long, Int)]
      .collect().sortBy(r => (r._1, r._3))
    val b = win.as[(String, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(a.toSeq === b.toSeq)
  }

  test("capPerDomain keeps domains smaller than the cap whole") {
    graft.functions.Functions.ensure(spark)
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "domain")
    val got = WebCuration.capPerDomain(docs, "domain", "doc_id", 10)
      .select("domain", "doc_id").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("q_web_e2e: per-domain counts respect the cap; the DAG plans the " +
      "bounded aggregate and no rank window") {
    val df = Queries.byName("q_web_e2e").impl(spark, sf)
    val rows = df.as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (dom, n, chars, first) =>
      assert(n >= 1L && n <= 10L, s"$dom kept $n docs")
      assert(chars > 0L && first >= 0L)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "cap must not plan a rank window")
    assert(plan.contains("ObjectHashAggregate"), "cap should use TopKRowsAgg")
  }

  test("hostEdges normalizes endpoints, drops self-loops, collapses multi-edges") {
    val pages = Seq(
      (1L, "https://www.a.com/x",
        Seq("http://b.com/1", "https://www.b.com/2", "https://a.com/self")),
      (2L, "https://b.com/y", Seq("https://a.com/z", "https://a.com/z2")))
      .toDF("doc_id", "url", "links")
    val got = WebCuration.hostEdges(pages, "url", "links")
      .as[(String, String)].collect().toSet
    assert(got === Set(("a.com", "b.com"), ("b.com", "a.com")))
  }

  test("snapshotDiff classifies new/changed/unchanged/gone per key; a null " +
      "digest on a both-sides key is a change, not presence") {
    val snap = Seq(("u1", "d1"), ("u2", "d2x"), ("u3", "d3"),
      ("u5", null), ("u6", null)).toDF("url", "dg")
    val corp = Seq(("u2", "d2"), ("u3", "d3"), ("u4", "d4"),
      ("u5", "d5"), ("u6", null)).toDF("url", "dg")
    val got = WebCuration.snapshotDiff(snap, corp, "url", "dg")
      .as[(String, String)].collect().toMap
    assert(got === Map("u1" -> "new", "u2" -> "changed",
      "u3" -> "unchanged", "u4" -> "gone",
      "u5" -> "changed", "u6" -> "unchanged"))
  }

  test("hostQualityStats: fixed-point mean and threshold verdict; the " +
      "filter drops every page of a below-threshold host") {
    val docs = Seq(
      ("a.com", 1L, 0.9), ("a.com", 2L, 0.8),
      ("b.com", 3L, 0.2), ("b.com", 4L, 0.3))
      .toDF("host", "doc_id", "q")
    val stats = WebCuration.hostQualityStats(docs, "host", "q", minMean = 0.5)
    val m = stats.as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(m("a.com") === (("a.com", 2L, 0.85, true)))
    assert(m("b.com") === (("b.com", 2L, 0.25, false)))
    val kept = WebCuration.hostQualityFilter(docs, "host", stats)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("anchorTermEdges pairs href/text positionally, drops relative and " +
      "self-host links, tokenizes lowercase") {
    val pages = Seq(
      (1L, "https://www.a.com/p",
        """<a href="https://B.com/x">Fast DB</a> mid <a href="/rel">skip</a>""" +
          """<a class="y" href="http://a.com/self">self nav</a>""" +
          """<a href="https://c.org/z">graft</a>"""))
      .toDF("doc_id", "url", "html")
    val got = WebCuration.anchorTermEdges(pages, "url", "html")
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("a.com", "b.com", "fast"), ("a.com", "b.com", "db"),
      ("a.com", "c.org", "graft")))
  }

  test("pageRank: symmetric cycle is uniform and mass-conserving") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = WebCuration.pageRank(edges, iters = 10)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === Set("a", "b", "c"))
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-5))
  }

  test("pageRank: well-linked host outranks leaves; dangling mass is redistributed") {
    val edges = Seq(("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("l4", "hub"),
      ("hub", "l1"), ("l1", "d1")).toDF("src", "dst")
    val df = WebCuration.pageRank(edges, iters = 20)
    val got = df.as[(String, Double)].collect().toMap
    assert(got("hub") > got("l2") && got("hub") > got("d1"))
    assert(math.abs(got.values.sum - 1.0) < 1e-3,
      s"dangling d1 must not leak mass: ${got.values.sum}")
    // the DISTRIBUTED path's iteration lineage is truncated: the final plan
    // reads checkpointed RDDs, not a 20-deep join/agg tree over the input
    spark.conf.set("spark.graft.pagerank.localIterMaxEdges", "0")
    try {
      val dist = WebCuration.pageRank(edges, iters = 20)
      val plan = dist.queryExecution.optimizedPlan.toString
      assert(plan.contains("LogicalRDD"), "expected checkpointed lineage")
    } finally spark.conf.unset("spark.graft.pagerank.localIterMaxEdges")
  }

  test("pageRank local driver fold is bit-equal to the distributed loop " +
      "(uniform, weighted and personalized) — the size-adaptive switch " +
      "never changes a rank") {
    val w = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 3L), ("c", "d", 1L),
      ("d", "a", 2L), ("b", "e", 7L)).toDF("src", "dst", "weight")
    val seeds = Seq("a", "e").toDF("host")
    val localU = WebCuration.pageRank(w.select("src", "dst"), iters = 10)
      .as[(String, Double)].collect().toSet
    val localW = WebCuration.pageRankWeighted(w, "weight", iters = 10)
      .as[(String, Double)].collect().toSet
    val localP = WebCuration.pageRankPersonalized(w.select("src", "dst"),
        seeds, iters = 10)
      .as[(String, Double)].collect().toSet
    spark.conf.set("spark.graft.pagerank.localIterMaxEdges", "0")
    try {
      val distU = WebCuration.pageRank(w.select("src", "dst"), iters = 10)
        .as[(String, Double)].collect().toSet
      val distW = WebCuration.pageRankWeighted(w, "weight", iters = 10)
        .as[(String, Double)].collect().toSet
      val distP = WebCuration.pageRankPersonalized(w.select("src", "dst"),
          seeds, iters = 10)
        .as[(String, Double)].collect().toSet
      assert(localU === distU)
      assert(localW === distW)
      assert(localP === distP)
    } finally spark.conf.unset("spark.graft.pagerank.localIterMaxEdges")
  }

  test("pageRankWeighted: rank splits by weight; all-1 weights reproduce " +
      "the unweighted form bit-for-bit; parallel edges sum") {
    val w = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "weight")
    val got = WebCuration.pageRankWeighted(w, "weight", iters = 10)
      .as[(String, Double)].collect().toMap
    assert(got("b") > got("c"), s"the 9x-endorsed host must lead: $got")
    val uw = WebCuration.pageRank(w.select("src", "dst"), iters = 10)
      .as[(String, Double)].collect().toSet
    val w1 = WebCuration.pageRankWeighted(
        w.withColumn("weight", lit(1L)), "weight", iters = 10)
      .as[(String, Double)].collect().toSet
    assert(uw === w1)
    // parallel (src, dst) rows aggregate: 4+5 behaves exactly like 9
    val split = Seq(("a", "b", 4L), ("a", "b", 5L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)).toDF("src", "dst", "weight")
    val got2 = WebCuration.pageRankWeighted(split, "weight", iters = 10)
      .as[(String, Double)].collect().toMap
    assert(got2 === got)
  }

  test("hits: star graph concentrates authority; mutual reinforcement " +
      "ranks the 2-link hub above the 1-link hub; masses sum to ~1") {
    val star = Seq(("l1", "a"), ("l2", "a"), ("l3", "a")).toDF("src", "dst")
    val s0 = WebCuration.hits(star, iters = 5)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(s0("a")._3 === 1.0 && s0("a")._2 === 0.0)
    Seq("l1", "l2", "l3").foreach { l =>
      assert(math.abs(s0(l)._2 - 1.0 / 3) < 1e-5 && s0(l)._3 === 0.0)
    }
    val bi = Seq(("l1", "a1"), ("l1", "a2"), ("l2", "a1")).toDF("src", "dst")
    val s1 = WebCuration.hits(bi, iters = 10)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(s1("l1")._2 > s1("l2")._2, s"2-link hub must lead: $s1")
    assert(s1("a1")._3 > s1("a2")._3, s"2-hub authority must lead: $s1")
    assert(math.abs(s1.values.map(_._2).sum - 1.0) < 1e-3)
    assert(math.abs(s1.values.map(_._3).sum - 1.0) < 1e-3)
  }

  test("q_host_pagerank: planted host graph ranks sum to ~1") {
    val rows = Queries.byName("q_host_pagerank").impl(spark, sf)
      .as[(String, Double)].collect()
    assert(rows.length >= 13, s"expected the 13 site hosts, got ${rows.length}")
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3)
  }

  test("q_domain_cap plans the bounded aggregate, not a rank window") {
    val df = Queries.byName("q_domain_cap").impl(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "cap must not plan a rank window")
    assert(plan.contains("ObjectHashAggregate"), "cap should use TopKRowsAgg")
  }

  test("label propagation: majority wins, equal counts break to the " +
    "smallest label, seeds stay clamped, unreached nodes stay null") {
    // x sits between a 'zz'-seeded and a 'aa'-seeded neighbor (tie → aa);
    // y has two 'zz' neighbors and one 'aa' (majority → zz); the seed s1
    // is also y's neighbor but keeps its own label; lone-pair node u
    // only reaches unlabeled v, so both stay null after round 1 and v
    // picks nothing up in round 2 either
    val edges = Seq(
      ("s1", "x"), ("s2", "x"),
      ("s1", "y"), ("s3", "y"), ("s4", "y"),
      ("u", "v")
    ).toDF("src", "dst")
    val seeds = Seq(("s1", "zz"), ("s2", "aa"), ("s3", "zz"), ("s4", "zz"))
      .toDF("host", "label")
    val out = WebCuration.labelPropagation(edges, seeds, iters = 2)
      .as[(String, Option[String])].collect().toMap
    assert(out("x") === Some("aa"), "equal counts must break to the smallest label")
    assert(out("y") === Some("zz"), "majority label must win")
    assert(out("s1") === Some("zz") && out("s2") === Some("aa"),
      "seeds stay clamped")
    assert(out("u").isEmpty && out("v").isEmpty, "unreached nodes stay null")
  }

  test("personalized PageRank conserves mass and concentrates it near " +
    "the seeds; absent seeds are ignored, all-absent rejects") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "c")).toDF("src", "dst")
    val out = WebCuration.pageRankPersonalized(edges,
        Seq("a", "zz-not-in-graph").toDF("host"), iters = 20)
      .as[(String, Double)].collect().toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-3, s"mass must conserve: $out")
    assert(out("a") > out("d"),
      s"the seed must outrank the far node: $out")
    val ex = intercept[IllegalArgumentException](
      WebCuration.pageRankPersonalized(edges, Seq("zz").toDF("host"), 5))
    assert(ex.getMessage.contains("seed"))
  }

  test("label propagation equals a naive synchronous iteration on seeded " +
    "random graphs (3 rounds, clamped seeds, pinned tie rules)") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 3) {
      val n = 25
      val edges = (0 until 60).map { _ =>
        (s"h${rnd.nextInt(n)}", s"h${rnd.nextInt(n)}")
      }.filter(e => e._1 != e._2).distinct
      val seeds = (0 until 5).map(i => (s"h${rnd.nextInt(n)}", s"L${rnd.nextInt(3)}"))
        .distinct.groupBy(_._1).map(_._2.head).toSeq // one label per seed host
      val adj = (edges ++ edges.map(e => (e._2, e._1))).distinct
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val nodes = adj.keySet
      val seedMap = seeds.toMap.view.filterKeys(nodes).toMap
      var lab: Map[String, Option[String]] =
        nodes.map(h => h -> seedMap.get(h)).toMap
      for (_ <- 1 to 3) {
        val next = nodes.map { h =>
          h -> (seedMap.get(h) match {
            case Some(s) => Some(s)
            case None =>
              val counts = adj(h).flatMap(lab(_)).groupBy(identity)
                .map { case (l, occ) => (l, occ.size) }
              if (counts.isEmpty) lab(h)
              else Some(counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
          })
        }.toMap
        lab = next
      }
      val got = WebCuration.labelPropagation(edges.toDF("src", "dst"),
          seeds.toDF("host", "label"), iters = 3)
        .as[(String, Option[String])].collect().toMap
      assert(got === lab, s"trial $trial")
    }
  }

  test("robots parse: wildcard sections (any case) merge, named agents " +
    "ignored, empty-path lines dropped; filter honors longest-prefix " +
    "with Allow winning ties and passes rule-less hosts") {
    val robots = Seq(
      ("a.test", "User-agent: bot\nDisallow: /\n\nUSER-agent: *\n" +
        "Disallow: /x\nAllow: /x/ok\nDisallow:\n\nuser-agent: *\nDisallow: /y\n"),
      ("b.test", "User-agent: bot\nDisallow: /\n")
    ).toDF("host", "content")
    val rules = WebCuration.robotsRules(robots, "host", "content")
      .as[(String, Boolean, String)].collect().toSet
    assert(rules === Set(("a.test", false, "/x"), ("a.test", true, "/x/ok"),
      ("a.test", false, "/y")))
    val urls = Seq(
      (1L, "https://a.test/x/1"),     // disallowed by /x
      (2L, "https://a.test/x/ok/2"),  // allowed back (longer Allow)
      (3L, "https://a.test/z"),       // no matching rule
      (4L, "https://a.test"),         // no path → '/': no rule matches
      (5L, "https://b.test/x/5")      // only a named-agent section
    ).toDF("id", "url")
    val kept = WebCuration.robotsFilter(urls, "id", "url", robots
        .transform(r => WebCuration.robotsRules(r, "host", "content")))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L, 4L, 5L))
  }

  test("robots filter: equal-length Allow and Disallow → Allow wins") {
    val rules = Seq(("h.test", false, "/ab"), ("h.test", true, "/ab"))
      .toDF("host", "allow", "prefix")
    val urls = Seq((1L, "https://h.test/ab/z")).toDF("id", "url")
    val kept = WebCuration.robotsFilter(urls, "id", "url", rules)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("triangleStats: K4 counts 3 triangles per node at coefficient 1.0, " +
    "a pendant reads 0.0, and duplicate/reversed edges canonicalize away") {
    graft.functions.Functions.ensure(spark)
    // K4 over {a,b,c,d} stated with duplicates and both directions,
    // plus pendant d—e (degree-1 e defines coefficient 0.0)
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("d", "c"), ("d", "e"), ("e", "e"))
      .toDF("src", "dst")
    val got = WebCuration.triangleStats(edges).orderBy("host")
      .as[(String, Long, Long, Double)].collect().toSeq
    // K4: each of a,b,c in 3 triangles at degree 3 → 2·3/(3·2) = 1.0;
    // d: 3 triangles at degree 4 → 6/12 = 0.5; e: degree 1 → 0 by definition
    assert(got === Seq(
      ("a", 3L, 3L, 1.0), ("b", 3L, 3L, 1.0), ("c", 3L, 3L, 1.0),
      ("d", 4L, 3L, 0.5), ("e", 1L, 0L, 0.0)))
  }

  test("triangleStats equals a naive per-node triple count on a seeded " +
    "random graph (degree-ordered wedge enumeration is an optimization, " +
    "not a semantics change)") {
    graft.functions.Functions.ensure(spark)
    val rnd = new scala.util.Random(42)
    val n = 24
    val edges = (0 until 140).map { _ =>
      (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
    }
    val got = WebCuration.triangleStats(edges.toDF("src", "dst"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // independent naive reference: adjacency sets, count triples
    val und = edges.collect { case (a, b) if a != b =>
      if (a < b) (a, b) else (b, a)
    }.toSet
    val adj = und.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val naive = adj.map { case (v, nb) =>
      val t = nb.toSeq.combinations(2).count { pair =>
        und.contains(if (pair(0) < pair(1)) (pair(0), pair(1))
                     else (pair(1), pair(0)))
      }
      v -> ((nb.size.toLong, t.toLong))
    }
    assert(got === naive)
  }

  test("linkReciprocity: reverse edges count once per deduped out-edge, " +
    "hosts with no out-links are absent, self-loops drop") {
    graft.functions.Functions.ensure(spark)
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"), ("a", "c"), ("c", "c"))
      .toDF("src", "dst")
    val got = WebCuration.linkReciprocity(edges).orderBy("host")
      .as[(String, Long, Long, Double)].collect().toSeq
    // a: out {b, c}, reciprocal {b} → 0.5; b: out {a}, reciprocal → 1.0;
    // c has no real out-edge (self-loop dropped) → absent
    assert(got === Seq(("a", 2L, 1L, 0.5), ("b", 1L, 1L, 1.0)))
  }

  test("kCore: K4 reads coreness 3, an attached tail peels at 1, a star " +
    "drains center and leaves together at 1") {
    graft.functions.Functions.ensure(spark)
    val edges = Seq(
      // K4 {a,b,c,d} with a tail d—e—f
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("e", "f"),
      // star: center x with leaves
      ("x", "l1"), ("x", "l2"), ("x", "l3"))
      .toDF("src", "dst")
    val got = WebCuration.kCore(edges)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "e" -> 1L, "f" -> 1L, "x" -> 1L, "l1" -> 1L, "l2" -> 1L, "l3" -> 1L))
  }

  test("kCore preserves NUMERIC node-id types (no silent string coercion " +
    "of the seed schema)") {
    graft.functions.Functions.ensure(spark)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = WebCuration.kCore(edges)
    assert(got.schema("host").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(got.as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("kCore equals the sequential min-degree-peel (degeneracy order) " +
    "reference on a seeded random graph — independent algorithms, same " +
    "core numbers") {
    graft.functions.Functions.ensure(spark)
    val rnd = new scala.util.Random(11)
    val n = 20
    val raw = (0 until 90).map { _ =>
      (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
    }
    val got = WebCuration.kCore(raw.toDF("src", "dst"))
      .as[(String, Long)].collect().toMap
    // textbook reference: repeatedly remove a minimum-degree vertex;
    // coreness = running max of the min degree at removal time
    val und = raw.collect { case (a, b) if a != b =>
      if (a < b) (a, b) else (b, a)
    }.toSet
    val adj = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.Set[String]]
    und.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val core = scala.collection.mutable.Map.empty[String, Long]
    var kmax = 0L
    while (adj.nonEmpty) {
      val (v, nb) = adj.minBy { case (w, s) => (s.size, w) }
      kmax = math.max(kmax, nb.size.toLong)
      core(v) = kmax
      nb.foreach(u => adj(u) -= v)
      adj -= v
    }
    assert(got === core.toMap)
  }

  test("blocklist filter drops any suffix depth case-insensitively and " +
    "stays label-aligned (notbad.com is not under bad.com)") {
    val sfx = Seq(Tuple1("a.b.c")).toDF("h")
      .select(WebCuration.domainSuffixes(col("h"))).head.getSeq[String](0)
    assert(sfx === Seq("a.b.c", "b.c", "c"))
    val docs = Seq((1L, "x.Bad.com"), (2L, "bad.com"), (3L, "good.com"),
      (4L, "notbad.com")).toDF("id", "host")
    val bl = Seq("BAD.com").toDF("domain")
    val kept = WebCuration.urlBlocklistFilter(docs, "host", "id", bl)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L))
  }
}
