package graft

import graft.agg.Sessionize
import graft.core.TrailDB

/** Sessionization vs the tutorial's definition (30-min gap starts a new
  * session; examples/tutorial_wikipedia_sessions.c:60-87). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val U = "0" * 32

  test("gap strictly greater than limit starts a new session") {
    // gaps: 1800 (not new), 1801 (new), 1 (not new)
    val df = Seq(
      (U, 0L, 0L), (U, 1800L, 1L), (U, 3601L, 2L), (U, 3602L, 3L)
    ).toDF("uuid", "time", "seq")
    val got = Sessionize.sessionCounts(df, 1800L).collect().head
    assert(got.getAs[Long]("num_sessions") === 2)
    assert(got.getAs[Long]("num_events") === 4)
  }

  test("single-event trails have exactly one session") {
    val df = Seq((U, 5L, 0L), ("1" * 32, 9L, 1L)).toDF("uuid", "time", "seq")
    val got = Sessionize.sessionCounts(df, 1800L).collect()
    assert(got.map(_.getAs[Long]("num_sessions")).toSeq === Seq(1L, 1L))
  }

  test("session stats: start/end/duration/count per session") {
    val df = Seq(
      (U, 0L, 0L), (U, 100L, 1L), (U, 10000L, 2L)
    ).toDF("uuid", "time", "seq")
    val got = Sessionize.sessionStats(df, 1800L).orderBy("session_id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("session_start") === 0L)
    assert(got(0).getAs[Long]("session_end") === 100L)
    assert(got(0).getAs[Long]("duration") === 100L)
    assert(got(0).getAs[Long]("n_events") === 2L)
    assert(got(1).getAs[Long]("n_events") === 1L)
  }

  test("timestamp ties break deterministically via seq") {
    val df = Seq((U, 10L, 1L), (U, 10L, 0L), (U, 4000L, 2L)).toDF("uuid", "time", "seq")
    val ids = Sessionize.withSessionIds(df, 1800L)
      .orderBy("time", "seq").select("session_id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(0L, 0L, 1L))
  }
}
