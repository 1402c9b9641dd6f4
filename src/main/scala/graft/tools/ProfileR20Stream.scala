package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** r20 probe (VERDICT r19 item 3): where do the ~1-1.5 s of per-row
  * streaming lifecycle go? For each selected stream row: one warm run
  * (fixtures/memos/JIT), then a timed run with a StreamingQueryListener
  * recording micro-batch durationMs splits (addBatch / getBatch /
  * latestOffset / queryPlanning / walCommit / commitOffsets / triggerExecution)
  * plus the start→firstProgress and lastProgress→terminated gaps — the
  * scaffolding the progress map does not itemize.
  * Usage: runMain graft.tools.ProfileR20Stream [sfDir] [query...]
  */
object ProfileR20Stream {
  def main(args: Array[String]): Unit = {
    val dir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val only: Set[String] =
      if (args.length > 1) args.drop(1).toSet
      else Set("m_stream_image_dedup", "m_stream_audio_dedup",
        "m_stream_video_dedup", "m_stream_media", "m_stream_gated",
        "t_stream_sessionize", "d_stream_dedup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var tStart = 0L
    @volatile var tFirstProgress = 0L
    @volatile var tLastProgress = 0L
    @volatile var tTerm = 0L
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        tStart = System.nanoTime()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (tFirstProgress == 0L) tFirstProgress = System.nanoTime()
        tLastProgress = System.nanoTime()
        val d = e.progress.durationMs
        events.add(f"    batch ${e.progress.batchId}: rows=${e.progress.numInputRows} " +
          s"durations=${new java.util.TreeMap[String, java.lang.Long](d)}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        tTerm = System.nanoTime()
    })

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.contains(q._1))
    qs.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      fn(spark, dir).queryExecution.toRdd.count() // warm: fixtures + JIT
      spark.catalog.clearCache()
      // drain the async listener bus before resetting: the warm run's
      // in-flight QueryProgress/QueryTerminated events would otherwise
      // land AFTER the reset and contaminate the timed run's gaps
      Thread.sleep(1000)
      events.clear(); tStart = 0; tFirstProgress = 0; tLastProgress = 0; tTerm = 0
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val tBuilt = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      // give the terminated event a moment to land
      Thread.sleep(200)
      println(f"[p20s] $name%-24s total ${(t1 - t0) / 1e9}%6.3f s " +
        f"(body-build ${(tBuilt - t0) / 1e9}%6.3f s  final-read ${(t1 - tBuilt) / 1e9}%6.3f s)")
      if (tStart > 0) {
        println(f"[p20s]   start->firstProgress ${(tFirstProgress - tStart) / 1e9}%6.3f s" +
          f"  lastProgress->terminated ${(tTerm - tLastProgress) / 1e9}%6.3f s" +
          f"  (query started ${(tStart - t0) / 1e9}%6.3f s after body entry)")
      }
      events.forEach(s => println("[p20s]" + s))
    }
    spark.stop()
  }
}
