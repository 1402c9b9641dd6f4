package graft.tools

import org.apache.spark.sql.SparkSession

/** r20 probe (VERDICT r19 item 5): split each query's CONSTRUCTION time
  * (ProfileR19f's "plan" column) into (a) body building — the eager
  * intermediate jobs a composed body runs (localCheckpoints, probes,
  * stream runs) — and (b) pure Catalyst on the FINAL returned frame
  * (QueryPlanningTracker: analysis / optimization / physical planning).
  * Rows where (b) is large are AdcTable-pattern candidates (collapse a
  * wide interpreted expression tree into a native expression); rows
  * where (a) dominates need operator work, not expression work.
  * Usage: runMain graft.tools.ProfileR20Plan [sfDir] [query...] */
object ProfileR20Plan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Set[String] = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only.contains(q._1))
    println("[p20p] query                        build   analysis  optim   plan    exec")
    qs.foreach { case (name, fn) =>
      try {
        spark.catalog.clearCache()
        fn(spark, dir).queryExecution.toRdd.count() // warm fixtures + JIT
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.executedPlan
        val ph = qe.tracker.phases.map { case (k, v) =>
          k -> (v.endTimeMs - v.startTimeMs) }
        val t2 = System.nanoTime()
        qe.toRdd.count()
        val t3 = System.nanoTime()
        println(f"[p20p] $name%-28s ${(t1 - t0) / 1e9}%6.3f  " +
          f"${ph.getOrElse("analysis", 0L) / 1e3}%7.3f  " +
          f"${ph.getOrElse("optimization", 0L) / 1e3}%6.3f  " +
          f"${ph.getOrElse("planning", 0L) / 1e3}%6.3f  ${(t3 - t2) / 1e9}%6.3f")
      } catch { case e: Throwable =>
        println(s"[p20p] $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
