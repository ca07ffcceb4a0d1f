package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pin the driver testdata physical layout assumptions that the engine
  * adapts around, so a silent regeneration fails HERE with a readable
  * message instead of as an analyzer error deep inside a query (round 8:
  * events.ts flipped TIMESTAMP(NANOS)→micros after the last commit and the
  * hardcoded nanos arithmetic zeroed the oracle gate).
  */
class TestdataLayoutSpec extends SparkSpec {

  test("events.ts physical type is one of the forms Tables.tsEpochUs adapts to") {
    val schema = Tables.events(spark, sf).schema
    val dt = schema("ts").dataType
    assert(
      dt == LongType || dt == TimestampType || dt == TimestampNTZType,
      s"events.ts arrived as ${dt.catalogString} — the driver regenerated " +
        s"/root/testdata with a NEW physical layout; teach Tables.tsEpochUs/" +
        s"tsEpochMs/tsAsTimestamp the new form. Full schema: ${schema.treeString}")
  }

  test("tsEpochUs/tsEpochMs/tsAsTimestamp agree with each other on events") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val r = ev.select(
        Tables.tsEpochUs(ev).as("us"),
        Tables.tsEpochMs(ev).as("ms"),
        unix_micros(Tables.tsAsTimestamp(ev)).as("ts_us"))
      .filter(col("us") =!= col("ts_us") || expr("us div 1000") =!= col("ms"))
    val bad = r.take(1)
    assert(bad.isEmpty, "epoch derivations disagree: " + bad.mkString(","))
    // and the instants are in a sane modern range (catches unit mixups:
    // nanos read as micros would land in 1970, micros as nanos in year 56k)
    val mm = ev.agg(
      min(Tables.tsEpochMs(ev)), max(Tables.tsEpochMs(ev))).head()
    assert(mm.getLong(0) > 1000000000000L && mm.getLong(1) < 4102444800000L,
      s"events.ts epoch millis outside 2001..2100: $mm — unit mixup in the " +
        "adaptive derivation or a new testdata layout")
  }
}
