package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query executes its FULL physical plan via queryExecution.toRdd —
  * a plain df.count() would let Catalyst prune projections/sorts and
  * under-measure the real work. A session warmup runs first so query #1
  * doesn't carry JVM/codegen init cost.
  *
  * ISOLATION: every query runs SPARK_GRAFT_BENCH_REPEATS times (default 2;
  * use 3+ for local adjudication runs) and reports the MIN — one shared
  * JVM is unavoidable (105 cold Spark starts would swamp the signal with
  * startup cost), but a cold first run or a transient GC / JIT spike
  * cannot then masquerade as a per-query regression, which is exactly
  * what made three round-4 rows unadjudicable (all three measured BELOW
  * their round-3 times under min-of-3). The default is 2 to keep the
  * driver-run wall time bounded: run 1 absorbs fixture build + codegen
  * JIT, run 2 is steady state. The cache is cleared between queries so no
  * query reads another's cached data; shared on-disk fixtures
  * (SparkEntry.Fixtures) are built on the first run, so the min measures
  * the operator, not fixture setup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen/shuffle/parquet warmup outside the timed region — the
    // alphabetically-first query otherwise absorbs several seconds of
    // scan-path JIT that belongs to no query.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(1000L).repartition(8).count()
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")))).collect()
    } catch { case _: Throwable => () }

    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt.max(1)
    val selected = if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    // A repeat that throws records +Inf, not its (fast) elapsed time — a
    // transiently-failing query must never masquerade as a fast pass under
    // min-of-N (r5 ADVICE). All repeats failing → the query reports +Inf,
    // which JSON-serializes as a loud "inf" and fails any numeric gate.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected.contains(q._1)).map { case (name, fn) =>
      val times = (1 to repeats).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.PositiveInfinity
      }
      name -> times.min
    }
    // Millisecond precision keeps the one-line contract readable at 80+
    // queries. The harness that collects this output keeps only an
    // end-anchored ~2000-char tail, and sbt appends its own "[success]"
    // trailer — at 90 queries the full map line no longer fits, so it is
    // printed first (complete, for whole-output consumers) and then a
    // second, size-bounded summary line goes LAST: same schema, "queries"
    // holding the slowest entries that fit a ~1300-char budget, so an
    // end-anchored capture always contains one complete parseable object.
    // +Inf (all repeats failed) renders as JSON null — "%.3f" would emit
    // the bare literal `Infinity`, which is NOT JSON and would make a
    // strict parser reject the WHOLE line, losing every query's timing.
    // The failed queries are ALSO named in a "failed" array so the gate
    // stays loud even for consumers that only read the totals.
    def f3(v: Double): String =
      if (v.isInfinite || v.isNaN) "null"
      else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val failedQs = results.filter(_._2.isInfinite).map(_._1)
    val failedJson =
      s""""failed":[${failedQs.map("\"" + _ + "\"").mkString(",")}],"""
    def line(entries: Seq[(String, Double)], extra: String): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).sum
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,$extra$failedJson"sf":"$sfDir","total_sec":${f3(total)}}"""
    }
    println(line(results, ""))
    val bySlowest = results.sortBy(-_._2)
    var k = bySlowest.length
    while (k > 1 && line(bySlowest.take(k), "").length > 1300) k -= 1
    val kept = bySlowest.take(k).sortBy(_._1)
    println(line(kept, s""""n_queries":${results.length},"repeats":$repeats,"queries_omitted_fastest":${results.length - k},"""))
    spark.stop()
    // A bench with failing queries is a FAILED bench — exit non-zero so
    // any rc-checking consumer rejects the artifact instead of recording
    // a round whose totals are null (r7: all 42 trail queries failed on a
    // schema regression while the bench still exited 0).
    if (failedQs.nonEmpty) {
      System.err.println(
        s"[bench] ${failedQs.length} queries failed: ${failedQs.mkString(", ")}")
      sys.exit(2)
    }
  }
}
