package graft.ops

import org.apache.spark.sql.SparkSession

/** r19 probe: per-query PLAN vs EXECUTE split. The AdcTable finding
  * (interpreted 512-node trees cost ~2.5 s of analyzer/optimizer walks
  * per plan) asks whether other declared queries carry planning-heavy
  * trees. For each query: run once to warm fixtures/memos, then time
  * (a) construction + executedPlan (Catalyst analyze/optimize/plan) and
  * (b) toRdd.count() execution, on the SECOND invocation.  Rows with
  * plan time > ~0.4 s or plan > exec are the interesting ones. */
object ProfileR19f {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    val out = new scala.collection.mutable.ArrayBuffer[(String, Double, Double)]
    qs.foreach { case (name, fn) =>
      try {
        spark.catalog.clearCache()
        fn(spark, dir).queryExecution.toRdd.count() // warm fixtures + JIT
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val qe = fn(spark, dir).queryExecution
        qe.executedPlan // force analysis + optimization + physical planning
        val t1 = System.nanoTime()
        qe.toRdd.count()
        val t2 = System.nanoTime()
        out += ((name, (t1 - t0) / 1e9, (t2 - t1) / 1e9))
      } catch { case e: Throwable =>
        println(f"[p19f] $name%-28s FAILED ${e.getMessage}")
      }
    }
    println("[p19f] ---- sorted by plan time ----")
    out.sortBy(-_._2).foreach { case (n, p, e) =>
      println(f"[p19f] $n%-28s plan $p%7.3f s  exec $e%7.3f s")
    }
    val totP = out.map(_._2).sum; val totE = out.map(_._3).sum
    println(f"[p19f] TOTAL plan $totP%8.3f s  exec $totE%8.3f s  n=${out.size}")
    spark.stop()
  }
}
