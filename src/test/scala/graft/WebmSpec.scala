package graft

import graft.operators.Webm

/** WebM/Matroska tier spec: EBML vint framing, encode→parse round
  * trips across both Duration float widths and codec mixes, Cluster
  * step-over, and loud rejections.
  */
class WebmSpec extends SparkSpec {
  import spark.implicits._

  private def twoTracks = Seq(
    Webm.Track(1, "video", "V_VP9", 640, 360, 0, 0),
    Webm.Track(2, "audio", "A_OPUS", 0, 0, 2, 48000))

  test("encode→parse round-trips DocType, timescale, duration (4- and " +
    "8-byte floats), apps and per-track metadata; Clusters step over") {
    for (d64 <- Seq(false, true)) {
      val p = Webm.encode("webm", 1000000L, 7345.0, "mux/1", "writ/2",
        twoTracks, duration64 = d64, clusterBytes = 999)
      val m = Webm.parse(p)
      assert(m.doc_type === "webm" && m.timescale_ns === 1000000L)
      assert(m.duration_ms === 7345L, s"d64=$d64")
      assert(m.muxing_app === "mux/1" && m.writing_app === "writ/2")
      assert(m.tracks === twoTracks)
    }
    // a non-default timescale scales the duration: 100 µs ticks
    val scaled = Webm.parse(Webm.encode("matroska", 100000L, 50000.0,
      "m", "w", twoTracks.take(1), duration64 = true, clusterBytes = 10))
    assert(scaled.doc_type === "matroska")
    assert(scaled.duration_ms === 5000L)
  }

  test("crafted payloads reject by name: unknown-size elements, foreign " +
    "DocTypes, overrunning elements, missing tracks") {
    def rej(p: Array[Byte], frag: String): Unit = {
      val m = intercept[IllegalArgumentException](Webm.parse(p)).getMessage
      assert(m.contains(frag), m)
    }
    rej("definitely not an ebml stream at all........".getBytes, "EBML header magic")
    val good = Webm.encode("webm", 1000000L, 100.0, "m", "w", twoTracks,
      duration64 = false, clusterBytes = 50)
    rej(good.take(good.length - 20), "overruns")
    rej(Webm.encode("avi???", 1000000L, 1.0, "m", "w", twoTracks,
      duration64 = false, clusterBytes = 4), "DocType")
    // no Tracks master at all
    val noTracks = Webm.element(0x1A45DFA3L,
      Webm.element(0x4282L, "webm".getBytes("UTF-8"))) ++
      Webm.element(0x18538067L, Array.empty[Byte])
    rej(noTracks, "no Tracks")
    // an unknown-size vint (all value bits set) rejects by name: poke the
    // Segment's size vint — locate it after the header element
    val headerLen = Webm.element(0x1A45DFA3L,
      Webm.element(0x4282L, "webm".getBytes("UTF-8"))).length
    val unk = good.clone()
    // Segment id is 4 bytes; its size vint follows
    unk(headerLen + 4) = 0xff.toByte
    val m = intercept[IllegalArgumentException](Webm.parse(unk)).getMessage
    assert(m.contains("unknown-size") || m.contains("overruns"), m)
  }

  test("the Spark op agrees with the plant formulas on a doc sample") {
    val docs = Tables.documents(spark, sf).limit(30)
    val rows = Webm.webmMeta(spark, Webm.webmFromDocuments(spark, docs))
      .collect().groupBy(_.getLong(0))
    var sawAudio = 0
    docs.select("doc_id", "n_chars").as[(Long, Long)].collect().foreach {
      case (id, nc) =>
        val ts = rows(id).sortBy(_.getLong(6))
        assert(ts.head.getString(1) === (if (id % 7 == 0) "matroska" else "webm"))
        assert(ts.head.getLong(3) === 5000 + math.max(nc, 0) % 9000, s"doc $id")
        assert(ts.head.getString(8) === ((id % 3) match {
          case 1 => "V_VP8"; case 2 => "V_AV1"; case _ => "V_VP9"
        }))
        if (id % 2 == 0) {
          assert(ts.length === 2 && ts(1).getString(7) === "audio")
          sawAudio += 1
        } else assert(ts.length === 1)
    }
    assert(sawAudio > 0)
  }
}
