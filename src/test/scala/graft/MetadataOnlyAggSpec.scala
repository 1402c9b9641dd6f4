package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.TrailDBCons
import graft.plans.MetadataOnlyAggRule

/** The metadata-only aggregate rule must answer count/min/max/distinct-uuid
  * from the finalize-time sidecar (reference `info` file semantics,
  * src/tdb_encode.c:191-216 / src/tdb.c:677-700) with NO scan — and must
  * stand down for anything it cannot prove: filters, other aggregates,
  * bare parquet dirs, empty dbs. */
class MetadataOnlyAggSpec extends SparkSpec {
  import spark.implicits._

  MetadataOnlyAggRule.registerWith(spark)

  private def uuidOf(i: Int): String = f"$i%032x"

  private def mkDb(nTrails: Int, perTrail: Int): String = {
    val rows = for {
      t <- 0 until nTrails
      i <- 0 until perTrail
    } yield (uuidOf(t), (10 + t * perTrail + i).toLong, s"e$i",
             (t * perTrail + i).toLong)
    val df = rows.toDF("uuid", "time", "event_type", "seq")
    val path = Files.createTempDirectory("graft-meta").resolve("db").toString
    new TrailDBCons(spark, Seq("event_type")).add(df).finalizeTo(path, 2)
    path
  }

  test("count/min/max/distinct-uuid over a finalized db plan to a LocalRelation") {
    val path = mkDb(7, 4)
    val db = spark.read.parquet(path)
    val agg = db.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("uuid")).as("n_trails"),
      min("time").as("t_min"),
      max("time").as("t_max"))
    val plan = agg.queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), plan)
    assert(!plan.contains("parquet"), s"scan survived:\n$plan")
    val row = agg.collect().head
    assert(row.getLong(0) === 28L)
    assert(row.getLong(1) === 7L)
    assert(row.getLong(2) === 10L)
    assert(row.getLong(3) === 10L + 27L)
  }

  test("a filter below the aggregate disables the rewrite and stays correct") {
    val path = mkDb(3, 5)
    val db = spark.read.parquet(path)
    val agg = db.filter(col("time") > 12L).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation"), plan)
    assert(agg.collect().head.getLong(0) ===
      db.collect().count(_.getAs[Long]("time") > 12L))
  }

  test("count of a real (nullable) column is NOT answered from metadata") {
    val path = mkDb(2, 3)
    val agg = spark.read.parquet(path).agg(count(col("event_type")).as("n"))
    assert(!agg.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
  }

  test("bare parquet dir without a sidecar is untouched") {
    val dir = Files.createTempDirectory("graft-meta-bare").resolve("p").toString
    Seq((uuidOf(0), 1L)).toDF("uuid", "time").write.parquet(dir)
    val agg = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(agg.collect().head.getLong(0) === 1L)
  }

  test("re-finalizing the same path serves the FRESH sidecar, not a stale cache") {
    val path = Files.createTempDirectory("graft-meta-re").resolve("db").toString
    def finalizeWith(n: Int): Unit = {
      val rows = (0 until n).map(i => (uuidOf(i), (10 + i).toLong, "e", i.toLong))
      new TrailDBCons(spark, Seq("event_type"))
        .add(rows.toDF("uuid", "time", "event_type", "seq")).finalizeTo(path, 2)
    }
    finalizeWith(5)
    def counted(): Long =
      spark.read.parquet(path).agg(count(lit(1)).as("n")).collect().head.getLong(0)
    assert(counted() === 5L) // primes the cache
    Thread.sleep(1100)       // distinct sidecar modTime on coarse filesystems
    finalizeWith(9)
    assert(counted() === 9L, "stale sidecar served after re-finalize")
  }

  test("non-parquet and file-restricted reads of a db dir are NOT rewritten") {
    // a text/binaryFile read rooted at the db dir counts different things
    // entirely (lines/files, not events); a glob-filtered parquet read
    // scans a SUBSET — the full-table sidecar must answer for neither
    val path = mkDb(3, 2)
    val textCount = spark.read.format("binaryFile").load(path)
      .groupBy().agg(count(lit(1))).head().getLong(0)
    assert(textCount != 6L,
      "binaryFile count must be the FILE count, not the sidecar's events")
    val glob = spark.read.option("pathGlobFilter", "part-00000*")
      .parquet(path)
      .groupBy().agg(count(lit(1))).head().getLong(0)
    assert(glob < 6L,
      s"glob-restricted count must reflect the scanned subset, got $glob")
  }

  test("count of a NULL literal is NOT answered as num_events") {
    val path = mkDb(2, 3)
    val agg = spark.read.parquet(path).agg(count(lit(null)).as("n"))
    assert(!agg.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(agg.collect().head.getLong(0) === 0L)
  }

  test("all-null time column: min/max stay NULL (no sidecar rewrite), counts still rewrite") {
    val rows = (0 until 4).map(i => (uuidOf(i), null.asInstanceOf[java.lang.Long], "e", i.toLong))
    val df = rows.toDF("uuid", "time", "event_type", "seq")
    val path = Files.createTempDirectory("graft-meta-nt").resolve("db").toString
    new TrailDBCons(spark, Seq("event_type")).add(df).finalizeTo(path, 2)
    val minAgg = spark.read.parquet(path).agg(min("time").as("mn"))
    assert(!minAgg.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(minAgg.collect().head.isNullAt(0))
    val cntAgg = spark.read.parquet(path).agg(count(lit(1)).as("n"))
    assert(cntAgg.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(cntAgg.collect().head.getLong(0) === 4L)
  }

  test("mixed answerable + unanswerable aggregates fall back entirely") {
    val path = mkDb(2, 3)
    val agg = spark.read.parquet(path)
      .agg(count(lit(1)).as("n"), sum("seq").as("s"))
    assert(!agg.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    val row = agg.collect().head
    assert(row.getLong(0) === 6L)
  }
}
