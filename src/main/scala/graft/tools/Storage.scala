package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{TrailDB, TrailDBCons}

/** Storage-footprint experiment against the reference's published
  * compression baseline (BASELINE.md: ~8.8 bytes/event on the Wikipedia
  * corpus; "comparable to compressing the data using Zip",
  * doc/docs/technical_overview.md:277-283). Measures the same event corpus
  * four ways: raw CSV dump, gzipped CSV dump (the "Zip" comparator),
  * finalized trail-sorted Parquet (zstd — the deployment layout), and the
  * identical Parquet WITHOUT trail clustering (what the uuid sort buys:
  * same-trail runs make dictionary/RLE pages compress like the reference's
  * edge-encoding). Usage: runMain graft.tools.Storage [sfDir]
  */
object Storage {
  private def dirBytes(p: java.io.File): Long =
    if (p.isFile) p.length
    else Option(p.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("ts DIV 1000000000"))
    val db = TrailDB.fromEvents(ev, uuidCol = "user_id", timeCol = "ts",
      fieldCols = Seq("event_type", "props"), seqCol = Some("event_id"))
    val n = db.df.count()
    val base = java.nio.file.Files.createTempDirectory("graft-storage").toString

    db.df.write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$base/csv")
    db.df.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("compression", "gzip").csv(s"$base/csvgz")
    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
    new TrailDBCons(spark, Seq("event_type", "props"))
      .append(db).finalizeTo(s"$base/db")
    db.df.orderBy(rand(7)).write.mode(SaveMode.Overwrite).parquet(s"$base/shuffled")

    def report(label: String, path: String): Unit = {
      val b = dirBytes(new java.io.File(path))
      println(f"| $label | ${b / 1048576.0}%.1f MiB | ${b.toDouble / n}%.1f B/event |")
    }
    println(s"events: $n  (base: $base)")
    println("| layout | size | bytes/event |")
    println("|---|---|---|")
    report("CSV dump (raw)", s"$base/csv")
    report("CSV dump (gzip)", s"$base/csvgz")
    report("trail-sorted Parquet (zstd, finalized)", s"$base/db")
    report("unsorted Parquet (zstd)", s"$base/shuffled")
    spark.stop()
  }
}
