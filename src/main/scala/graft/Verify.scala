package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.get("graft-verify")
    new java.io.File(outDir).mkdirs()
    // Fixtures live in a SIBLING dir, not outDir: the correctness driver
    // enumerates outDir/<name> as query results, and fixture dumps would
    // surface as spurious no_oracle rows (ADVICE r6). Oracle SQL reaches
    // them via the {FIX} placeholder.
    val fixDir = outDir.stripSuffix("/") + ".fixtures"
    try writeFixtures(spark, sfDir, fixDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] fixture stage failed: ${e.getMessage}")
    }
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete(); ()
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      // a stale run-N dump must not survive a run-N+1 failure — the
      // correctness gate would silently PASS on the old results
      val target = new java.io.File(s"$outDir/$name")
      if (target.exists()) deleteRec(target)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(target.getPath)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{FIX}", fixDir).replace("{OUT}", outDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Reference fixtures for queries whose core function DuckDB cannot
    * express (murmur3 token, v1 timeuuid construction). Values are computed
    * OUTSIDE the Catalyst expressions under test — driver-side through the
    * plain Scala functions that TokenSpec/FunctionsSpec pin to reference
    * vectors — so the DuckDB compare checks the codegen'd expression
    * pipeline against an independent evaluation path — weaker than a true
    * third-party oracle (the fixture generator shares this repo's Scala
    * functions), but those functions are themselves pinned to published
    * reference vectors. Oracle SQL reads them via
    * `parquet_scan('{FIX}/_fixture_*')`; `{FIX}` is substituted with the
    * runtime fixture dir when oracle_sql.json is dumped.
    */
  private def writeFixtures(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Each fixture is isolated: one fixture crashing costs at most the
    // queries whose oracle reads it, never the whole gate. Round 8's gate
    // zeroed because a single analysis error here aborted main() before any
    // query dump or oracle_sql.json was written (VERDICT r8 §wrong 1).
    def fixture(name: String)(body: => Unit): Unit =
      try body
      catch { case e: Throwable =>
        System.err.println(s"[verify] fixture $name failed: ${e.getMessage}")
      }
    fixture("_fixture_tokens") {
      val toks = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey").as[Long].collect().toIndexedSeq
        .map(k => (k, graft.functions.CassandraMurmur3.tokenOfLong(k)))
      toks.toDF("o_orderkey", "tok").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/_fixture_tokens")
    }
    fixture("_fixture_simhash") {
      // Plain-Scala re-run of the ENTIRE simhash near-dup pipeline
      // (shingle → distinct-vote simhash → 16-bit pigeonhole candidates →
      // hamming<=3 → exact-Jaccard verify) over the corpus, driver-side.
      // Independent of every Catalyst expression under test
      // (SimHashSig/Murmur64/pairsOf/array_intersect verify); shares only
      // CassandraMurmur3.hashString, which TokenSpec pins to reference
      // vectors. Parameters mirror q_dedup_simhash: k=3, maxHamming=3,
      // threshold=0.7.
      val k = 3
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)].collect()
      def shingleList(text: String): IndexedSeq[String] = {
        // exact split(lower(text), ' ') semantics: Java limit -1 keeps
        // interior AND trailing empty tokens, like Spark's StringSplit
        val w = text.toLowerCase.split(" ", -1).toIndexedSeq
        (1 to math.max(w.length - (k - 1), 1))
          .map(i => w.slice(i - 1, i - 1 + k).mkString(" "))
      }
      val sigs = docs.map { case (id, text) =>
        val distinctShingles = shingleList(text).distinct
        val votes = new Array[Int](64)
        distinctShingles.foreach { s =>
          val hv = graft.functions.CassandraMurmur3.hashString(s, 0x51c0L)
          (0 until 64).foreach { j =>
            if (((hv >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          }
        }
        val sig = (0 until 64).foldLeft(0L) { (acc, j) =>
          if (votes(j) >= 0) acc | (1L << j) else acc
        }
        val hashedSet = distinctShingles
          .map(s => graft.functions.CassandraMurmur3.hashString(s, 0x51c0L)).toSet
        (id, sig, hashedSet)
      }
      val pairs = for {
        i <- sigs.indices.iterator
        j <- (i + 1) until sigs.length
        (ida, siga, seta) = sigs(i)
        (idb, sigb, setb) = sigs(j)
        (a, sa, sb) = if (ida < idb) (ida, seta, setb) else (idb, setb, seta)
        b = math.max(ida, idb)
        if (0 until 4).exists(c => ((siga >>> (16 * c)) & 0xffffL) == ((sigb >>> (16 * c)) & 0xffffL))
        if java.lang.Long.bitCount(siga ^ sigb) <= 3
        inter = (seta & setb).size
        jac = BigDecimal(inter.toDouble / (seta.size + setb.size - inter))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        if jac >= 0.7
      } yield (a, b, jac)
      pairs.toIndexedSeq.toDF("a", "b", "jaccard").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/_fixture_simhash")
    }
    fixture("_fixture_annlsh") {
      // Plain-Scala driver-side re-run of the LSH ANN pipeline — chunked
      // candidate generation over seeded sign-random-projection codes,
      // exact cosine re-score, bounded top-k — mirroring q_ann_lsh's
      // parameters (bits=32, bands=8, seed=7, k=10, queries vec_id<8).
      // Deterministic because the hyperplanes derive from the seed; shares
      // only VectorMath's scalar kernels with the expressions under test,
      // so the distributed plan (band join, distinct, bounded top-k agg)
      // is checked against an independent evaluation path.
      val bits = 32; val bands = 8; val seed = 7L; val k = 10
      val chunkBits = bits / bands
      val mask = (1L << chunkBits) - 1
      val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      val codes = vecs.map { case (id, e) =>
        (id, e, graft.functions.VectorMath.lshCode(e, bits, seed))
      }
      def chunks(code: Long): Set[(Int, Long)] =
        (0 until bands).map(c => (c, (code >>> (c * chunkBits)) & mask)).toSet
      val rows = for {
        (qid, qe, qc) <- codes.filter(_._1 < 8).sortBy(_._1)
        qch = chunks(qc)
        ranked = codes.iterator
          .filter { case (nid, _, nc) => nid != qid && chunks(nc).exists(qch) }
          .map { case (nid, ne, _) =>
            val sim = BigDecimal(graft.functions.VectorMath.cosineF(ne, qe))
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
            (nid, sim)
          }
          .toIndexedSeq.sortBy { case (nid, sim) => (-sim, nid) }
          .take(k)
        ((nid, sim), i) <- ranked.zipWithIndex
      } yield (qid, nid, sim, i + 1)
      rows.toIndexedSeq.toDF("query_id", "neighbor_id", "sim", "rnk").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/_fixture_annlsh")
    }
    fixture("_fixture_timeuuid") {
      // input prep (ms derivation) is shared with q_timeuuid_bounds; the
      // operators under test (MinTimeUuid/TimeUuidMillis codegen) are not.
      val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
        .filter(col("user_id") < 5)
      // epoch millis (the unit min_timeuuid takes), derived adaptively from
      // whatever physical ts type the current testdata generation carries
      val ev = ev0
        .select(col("event_id"), Tables.tsEpochMs(ev0).cast("long").as("ms"))
        .as[(Long, Long)].collect().toIndexedSeq
        .map { case (id, ms) =>
          val u = graft.functions.TimeUuid.minTimeUuid(ms)
          (id, u, graft.functions.TimeUuid.unixMillisOf(u))
        }
      ev.toDF("event_id", "u", "u_millis").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/_fixture_timeuuid")
    }
  }
}
