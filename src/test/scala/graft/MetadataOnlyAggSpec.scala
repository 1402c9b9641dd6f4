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

  test("mixed answerable + unanswerable aggregates fall back entirely") {
    val path = mkDb(2, 3)
    val agg = spark.read.parquet(path)
      .agg(count(lit(1)).as("n"), sum("seq").as("s"))
    assert(!agg.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    val row = agg.collect().head
    assert(row.getLong(0) === 6L)
  }
}
