package graft

import graft.functions.{BlobConversions, TimeUuid}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("winnow_fps matches a brute-force reference on the corpus: leftmost " +
      "sliding-window-min md5s, every window covered") {
    import java.security.MessageDigest
    val (w, s) = (8, 4)
    def refWinnow(tokens: Array[String]): Seq[(Int, Seq[Byte])] = {
      val m = tokens.length - w + 1
      if (m <= 0) return Nil
      val md = MessageDigest.getInstance("MD5")
      val fps = Array.tabulate(m)(i =>
        md.digest(tokens.slice(i, i + w).mkString(" ").getBytes("UTF-8")).toSeq)
      implicit val ord: Ordering[Seq[Byte]] =
        Ordering.Implicits.seqOrdering(Ordering.by((b: Byte) => b & 0xff))
      val win = math.min(s, m)
      (0 to m - win).map { j =>
        val sl = fps.slice(j, j + win).toSeq
        j + sl.indexOf(sl.min) // leftmost min
      }.distinct.map(p => (p + 1, fps(p)))
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().take(50)
    val native = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .select(col("doc_id"),
        call_function("winnow_fps", split(lower(col("text")), " "), lit(w), lit(s)).as("o"))
      .as[(Long, Seq[(Int, Array[Byte])])].collect().toMap
    for ((id, text) <- docs) {
      val expect = refWinnow(text.toLowerCase.split(" ", -1))
      val act = native(id).map { case (p, fp) => (p, fp.toSeq) }
      assert(act === expect, s"doc $id")
    }
    assert(docs.exists(_._2.split(" ").length >= w), "fixture has long docs")
  }

  test("timeuuid boundary values bracket every uuid of the millisecond") {
    val lo = TimeUuid.minTimeUuid(1000L)
    val hi = TimeUuid.maxTimeUuid(1000L)
    assert(TimeUuid.unixMillisOf(lo) === 1000L)
    assert(TimeUuid.unixMillisOf(hi) === 1000L)
    assert(TimeUuid.compare(lo, hi) < 0)
    // version nibble is 1, variant byte of min is 0x80
    assert(lo.charAt(14) === '1' && hi.charAt(14) === '1')
    assert(TimeUuid.compare(TimeUuid.minTimeUuid(999L), lo) < 0)
    assert(TimeUuid.compare(TimeUuid.maxTimeUuid(1000L), TimeUuid.minTimeUuid(1001L)) < 0)
  }

  test("timeuuid ordering is by embedded time, not string order") {
    // a later-time uuid whose string sorts before an earlier-time one
    val early = TimeUuid.minTimeUuid(0xffffL) // time_low ffff... sorts late as string
    val late = TimeUuid.minTimeUuid(0x10000L)
    assert(TimeUuid.compare(early, late) < 0)
    assert(TimeUuid.unixMillisOf(early) < TimeUuid.unixMillisOf(late))
  }

  test("timeuuid SQL functions work end-to-end") {
    graft.functions.Functions.ensure(spark)
    val df = Seq(5000L, 1000L, 3000L).toDF("ms")
      .select(col("ms"), call_function("min_timeuuid", col("ms")).as("u"))
      .select(col("ms"), call_function("timeuuid_unix_millis", col("u")).as("back"))
    assert(df.as[(Long, Long)].collect().toSet === Set((5000L, 5000L), (1000L, 1000L), (3000L, 3000L)))
  }

  test("blob conversions round-trip CQL wire formats") {
    assert(BlobConversions.blobAsInt(BlobConversions.intAsBlob(-42)) === -42)
    assert(BlobConversions.blobAsBigint(BlobConversions.bigintAsBlob(1L << 40)) === (1L << 40))
    assert(BlobConversions.blobAsDouble(BlobConversions.doubleAsBlob(math.Pi)) === math.Pi)
    assert(BlobConversions.blobAsText(BlobConversions.textAsBlob("héllo")) === "héllo")
    assert(BlobConversions.intAsBlob(1).toSeq === Seq[Byte](0, 0, 0, 1)) // big-endian
    // cross-check with the token path: bigintAsBlob bytes feed the partitioner
    assert(graft.functions.CassandraMurmur3.tokenOfBytes(BlobConversions.bigintAsBlob(1L)) ===
      graft.functions.CassandraMurmur3.tokenOfLong(1L))
  }

  test("blob conversion SQL registration") {
    graft.functions.Functions.ensure(spark)
    val r = spark.sql("SELECT blob_as_int(int_as_blob(7)) AS v, blob_as_text(text_as_blob('x')) AS t").head()
    assert(r.getInt(0) === 7 && r.getString(1) === "x")
  }

  test("q_timeuuid_bounds embeds the event's epoch millis (ns→ms, no overflow)") {
    // regression: the old '(ts div 1000000) * 1000' derivation fed MICROS
    // to min_timeuuid (which takes millis) and the v1 tick math
    // overflow-wrapped into year-4821 uuids — undetected because the
    // Verify fixture shared the same wrong input derivation
    import org.apache.spark.sql.functions._
    val out = Queries.byName("q_timeuuid_bounds").impl(spark, sf)
    val ev = Tables.events(spark, sf)
    val bad = out.join(
        ev.select(col("event_id"), Tables.tsEpochMs(ev).as("ms")),
        "event_id")
      .filter(col("u_millis") =!= col("ms"))
    assert(bad.isEmpty, "u_millis must round-trip the source epoch millis")
    // and the values are in a sane modern range (not overflow-wrapped)
    val r = out.agg(min(col("u_millis")), max(col("u_millis"))).head()
    assert(r.getLong(0) > 1000000000000L && r.getLong(1) < 4102444800000L,
      s"u_millis out of 2001..2100 range: $r")
  }
}
