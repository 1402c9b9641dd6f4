package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.agg.{Sessionize, TrailEvent, TrailSummaryAggregator}
import graft.streaming.StreamSessions

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming session_window agrees with the batch window-lag sessionizer") {
    // batch events with two sessions for one uuid (gap > 30 min)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val rows = Seq(
      ("u1", base), ("u1", base + 60), ("u1", base + 120),
      ("u1", base + 10000), ("u1", base + 10060),
      ("u2", base + 5))
    val dir = Files.createTempDirectory("graft-stream")
    val src = dir.resolve("src").toString
    rows.toDF("uuid", "epoch")
      .withColumn("ts", col("epoch").cast("timestamp")).drop("epoch")
      .write.parquet(src)

    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
    // complete mode: emit every session's current state (append would hold
    // back sessions the watermark hasn't closed yet).
    val q = StreamSessions.sessionCounts(stream, gap = "30 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("sess")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    // Compare against the batch sessionizer.
    val batch = Sessionize.sessionCounts(
      rows.toDF("uuid", "time").withColumn("seq", lit(0L)), 1800L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("num_sessions")).toMap
    assert(batch === Map("u1" -> 2L, "u2" -> 1L))

    val streamed = spark.sql("SELECT uuid, count(*) n FROM sess GROUP BY uuid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === Map("u1" -> 2L, "u2" -> 1L))
  }

  test("typed TrailSummaryAggregator folds trails with partial aggregation") {
    val events = Seq(
      TrailEvent("u1", 10L, Map("a" -> "x")),
      TrailEvent("u1", 99L, Map("a" -> "y")),
      TrailEvent("u2", 5L, Map())).toDS()
    val got = events.groupByKey(_.uuid)
      .agg(TrailSummaryAggregator.toColumn.name("summary"))
      .collect().toMap
    assert(got("u1") === graft.agg.TrailSummary(10L, 99L, 2L))
    assert(got("u2") === graft.agg.TrailSummary(5L, 5L, 1L))
  }
}
