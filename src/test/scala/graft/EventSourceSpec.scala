package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.EventSource

/** EventSource must normalize events.ts to epoch-second Longs for EVERY
  * physical encoding the driver's testdata has shipped with (r7 ADVICE: the
  * regeneration from TIMESTAMP(NANOS) to timestamp[us] silently broke all
  * 42 trail queries because the read path assumed one encoding). */
class EventSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeDir(): String =
    Files.createTempDirectory("graft-evsrc").toString

  test("timestamp[us] encoding (current testdata) reads as epoch seconds") {
    val ev = EventSource.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName === "long")
    val (lo, hi) = ev.agg(min("ts"), max("ts")).as[(Long, Long)].head()
    // Driver data is synthetic 2020s-era activity: epoch seconds land in
    // [2000-01-01, 2100-01-01). A nanos or micros misread would be ~1e9×
    // or ~1e6× out of this band.
    assert(lo > 946684800L && hi < 4102444800L, s"ts out of band: [$lo,$hi]")
  }

  test("nanos-Long encoding (pre-r7 testdata, read under nanosAsLong) divides to the same seconds") {
    // Reconstruct what the old generation looked like to Spark: ts as a
    // plain Long of epoch NANOS. EventSource must integer-DIV it back to
    // the identical epoch seconds the timestamp[us] path produces.
    val dir = writeDir()
    val want = EventSource.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts")
    EventSource.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts") * lit(1000000000L)) // seconds → nanos Long
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventSource.events(spark, dir).select("event_id", "ts")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("epoch seconds match the DuckDB oracle contract floor(epoch(ts)) on a known instant") {
    // 2021-06-01T12:34:56 naive == 1622550896 when interpreted as UTC —
    // the oracle treats naive timestamps as UTC; EventSource pins the
    // session zone so Spark agrees.
    val dir = writeDir()
    Seq("2021-06-01 12:34:56").toDF("s")
      .select(to_timestamp_ntz(col("s")).as("ts"), lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventSource.events(spark, dir).select("ts").as[Long].head()
    assert(got === 1622550896L)
  }
}
