package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{TdbFormat, TdbWriter}

/** The legacy `.tdb` read path (round 7): DataSourceV2 reader verified
  * against the reference's own in-tree fixture, plus write→read round
  * trips through the repo's v1 package writer. */
class TdbSourceSpec extends SparkSpec {
  import spark.implicits._

  private val refFixture = "/root/reference/test.tdb"

  test("reads the reference's in-tree test.tdb fixture exactly") {
    // expected content hand-derived from the published format: info
    // declares 2 trails / 2 events / timestamps 1463696903..1463696952;
    // lexicons hold (hello, it) and (world, works!)
    val df = spark.read.format("tdb").load(refFixture)
    assert(df.columns.toSeq === Seq("uuid", "time", "first_field", "second_field"))
    val rows = df.orderBy("uuid").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      ("10" + "0" * 30, 1463696903L, "hello", "world"),
      ("20" + "0" * 30, 1463696952L, "it", "works!")))
  }

  test("uuid pushdown prunes to single-trail partitions on the fixture") {
    val one = spark.read.format("tdb").load(refFixture)
      .filter(col("uuid") === "20000000000000000000000000000000")
    assert(one.rdd.getNumPartitions === 1)
    val got = one.collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got === Seq(("20000000000000000000000000000000", "it")))
    // a uuid absent from the index selects nothing, planning zero work
    val none = spark.read.format("tdb").load(refFixture)
      .filter(col("uuid") === "f" * 32)
    assert(none.count() === 0)
    assert(none.rdd.getNumPartitions === 0)
  }

  test("column pruning reaches the reader (BatchScan carries only projected fields)") {
    val plan = spark.read.format("tdb").load(refFixture)
      .select("time").queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && plan.contains("[time"), plan)
    assert(!plan.contains("first_field"), plan)
    val t = spark.read.format("tdb").load(refFixture)
      .agg(sum("time")).head().getLong(0)
    assert(t === 1463696903L + 1463696952L)
  }

  test("item codec packs/unpacks both widths and translates via the lexicon") {
    import graft.sources.TdbItems
    // property grid across both widths incl. the documented limits
    val grid = (for (f <- Seq(0L, 1L, 127L, 128L, 9999L, (1L << 14) - 2);
                     v <- Seq(0L, 1L, (1L << 24) - 1, 1L << 24, (1L << 40) - 2))
      yield (f, v)).toDF("f", "v")
    val bad = grid.select(TdbItems.itemField(
        TdbItems.makeItem(col("f"), col("v"))).as("fb"),
        TdbItems.itemVal(TdbItems.makeItem(col("f"), col("v"))).as("vb"),
        col("f"), col("v"))
      .filter(col("fb") =!= col("f") || col("vb") =!= col("v"))
    assert(bad.count() === 0, bad.collect().mkString(", "))
    // reference-pinned examples: field 1 val 1 packs to 0x101 (32-bit
    // form); the wide form sets bit 7
    assert(grid.sparkSession.range(1)
      .select(TdbItems.makeItem(lit(1), lit(1))).head().getLong(0) === 0x101L)
    assert((grid.sparkSession.range(1)
      .select(TdbItems.makeItem(lit(128), lit(1))).head().getLong(0) & 128L) === 128L)
    // value↔item on the reference fixture: first_field's lexicon is
    // (hello, it) in id order; item→string via the lexicon join
    val lex = TdbItems.lexiconDf(spark, refFixture, "first_field")
    assert(lex.orderBy("val_id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "hello"), (2L, "it")))
  }

  test("item codec registers for SQL (tdb_make_item / tdb_item_field / tdb_item_val)") {
    for (name <- Seq("tdb_make_item", "tdb_item_field", "tdb_item_val"))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, graft.GraftExtensions.builderFor(name), "built-in")
    val r = spark.sql(
      """SELECT tdb_make_item(1, 1) AS i32,
        |       tdb_item_field(tdb_make_item(9999, 16777216)) AS f64,
        |       tdb_item_val(tdb_make_item(9999, 16777216)) AS v64""".stripMargin)
      .head()
    assert(r.getLong(0) === 0x101L)
    assert(r.getLong(1) === 9999L && r.getLong(2) === 16777216L)
  }

  test("package round trip: write v1 tar, read back, byte-exact trail frame") {
    val dir = Files.createTempDirectory("graft-tdb-rt")
    val out = s"$dir/rt.tdb"
    // edge cases on purpose: shared values across trails, a null value, an
    // empty-string value (both are NULL id 0), repeated timestamps,
    // a trail whose field value REVERTS (edge encoding must re-emit it),
    // uuids whose LE order differs from hex-string order
    val df = Seq(
      ("00" * 15 + "02", 100L, "a", "x"),
      ("00" * 15 + "02", 100L, "a", "y"),
      ("00" * 15 + "02", 150L, "b", null),
      ("00" * 15 + "02", 170L, "a", "x"),
      ("01" + "00" * 15, 90L, "", "y"),
      ("01" + "00" * 15, 260L, "c", "y")
    ).toDF("uuid", "time", "kind", "tag")
    TdbWriter.writePackage(df, Seq("kind", "tag"), out)

    val back = spark.read.format("tdb").load(out)
    assert(back.columns.toSeq === Seq("uuid", "time", "kind", "tag"))
    val got = back.orderBy("uuid", "time", "kind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    val want = Seq(
      ("00" * 15 + "02", 100L, "a", "x"),
      ("00" * 15 + "02", 100L, "a", "y"),
      ("00" * 15 + "02", 150L, "b", null),
      ("00" * 15 + "02", 170L, "a", "x"),
      ("01" + "00" * 15, 90L, null, "y"), // "" stored as NULL, like the reference
      ("01" + "00" * 15, 260L, "c", "y"))
      .sortBy(t => (t._1, t._2, Option(t._3).getOrElse("")))
    assert(got.toSeq === want)

    // the trail index is LE-u128 ordered: uuid 01.. (LE value 1) sorts
    // BEFORE 00..02 (LE value 2^120), opposite of hex-string order
    val meta = TdbFormat.TdbMeta.open(out)
    assert(meta.numTrails === 2 && meta.numEvents === 6)
    assert(meta.uuidHex(0) === "01" + "00" * 15)
    assert(meta.uuidHex(1) === "00" * 15 + "02")
    // and the v1 binary-search pushdown works against that order
    val hit = back.filter(col("uuid") === ("00" * 15 + "02"))
    assert(hit.count() === 4 && hit.rdd.getNumPartitions === 1)
  }

  test("round trip preserves a larger random corpus through edge encoding") {
    val rnd = new scala.util.Random(42)
    val uuids = (0 until 37).map(i => f"$i%032x")
    val rows = (0 until 1200).map { i =>
      (uuids(rnd.nextInt(uuids.length)), 1000L + rnd.nextInt(5000),
        s"e${rnd.nextInt(5)}", if (rnd.nextInt(8) == 0) null else s"v${rnd.nextInt(3)}")
    }
    val dir = Files.createTempDirectory("graft-tdb-rt2")
    val out = s"$dir/rt2.tdb"
    val df = rows.toDF("uuid", "time", "etype", "val").repartition(7)
    TdbWriter.writePackage(df, Seq("etype", "val"), out)
    val back = spark.read.format("tdb").load(out)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), Option(r.getString(3)).getOrElse("")))
      .sorted.toSeq
    val want = rows.map(t => (t._1, t._2, t._3, Option(t._4).getOrElse("")))
      .sorted.toSeq
    assert(back === want)
    // multi-partition read: the scan honors the same partition-size knob
    // as the parquet reader; force tiny partitions and re-check the count
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    try {
      val n = spark.read.format("tdb").load(out).count()
      assert(n === 1200L)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("a directory of members opens like a tar package (tdb_open S_ISDIR path)") {
    val dir = Files.createTempDirectory("graft-tdb-dir")
    val out = s"$dir/d.tdb"
    TdbWriter.writePackage(
      Seq(("ab" * 16, 5L, "z")).toDF("uuid", "time", "k"), Seq("k"), out)
    // explode the tar into a member directory
    val mdir = Files.createDirectory(dir.resolve("members"))
    val meta = TdbFormat.TdbMeta.open(out)
    meta.archive.memberNames.foreach { m =>
      Files.write(mdir.resolve(m), meta.archive.readAll(m))
    }
    val viaDir = spark.read.format("tdb").load(mdir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(viaDir === Seq(("ab" * 16, 5L, "z")))
  }

  test("TrailDB.open and the CLI accept a legacy package directly") {
    val db = graft.core.TrailDB.open(spark, refFixture)
    assert(db.fields.toSet === Set("first_field", "second_field"))
    assert(db.df.count() === 2)
    // CLI dump over the legacy package (the reference user's first
    // command against their existing files)
    val dir = Files.createTempDirectory("graft-tdb-cli")
    graft.cli.Main.run(spark, "dump", Seq("-i", refFixture,
      "-o", s"$dir/out", "--csv-header"))
    val dumped = spark.read.option("header", "true").csv(s"$dir/out")
    assert(dumped.count() === 2)
    assert(dumped.select("first_field").collect().map(_.getString(0)).toSet
      === Set("hello", "it"))
  }

  test("make --package emits a single-file tar the CLI round-trips (S2)") {
    val dir = Files.createTempDirectory("graft-tdb-pkg")
    val csv = dir.resolve("in.csv")
    Files.writeString(csv,
      "uuid,time,etype\n" +
      (0 until 20).map(i => f"${i % 4}%032x,${100 + i},e${i % 3}").mkString("\n"))
    graft.cli.Main.run(spark, "make", Seq("-o", s"$dir/db", "-c", csv.toString,
      "-f", "etype", "--csv-header", "--package", s"$dir/db.tdb"))
    // one regular file, ustar magic at 257
    val pkg = java.nio.file.Paths.get(s"$dir/db.tdb")
    assert(Files.isRegularFile(pkg))
    val head = Files.readAllBytes(pkg).slice(257, 262)
    assert(new String(head) === "ustar")
    // dump straight from the package
    graft.cli.Main.run(spark, "dump", Seq("-i", s"$dir/db.tdb",
      "-o", s"$dir/out", "--csv-header"))
    val dumped = spark.read.option("header", "true").csv(s"$dir/out")
    assert(dumped.count() === 20)
    assert(dumped.select("uuid").distinct().count() === 4)
    // the package's trail frame matches the parquet db's
    val a = graft.core.TrailDB.open(spark, s"$dir/db").df
      .select("uuid", "time", "etype").collect().map(_.toString).sorted
    val b = graft.core.TrailDB.open(spark, s"$dir/db.tdb").df
      .select("uuid", "time", "etype").collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("v0 and malformed inputs refuse loudly") {
    val dir = Files.createTempDirectory("graft-tdb-bad")
    Files.write(dir.resolve("version"), "0".getBytes)
    Files.write(dir.resolve("info"), "0 0 0 0 0".getBytes)
    Files.write(dir.resolve("fields"), "\n".getBytes)
    val e = intercept[IllegalArgumentException] {
      TdbFormat.TdbMeta.open(dir.toString)
    }
    assert(e.getMessage.contains("version 0"), e.getMessage)
    val e2 = intercept[Exception] {
      TdbFormat.TdbMeta.open(s"$dir/nope")
    }
    assert(e2.getMessage.contains("no such file"), e2.getMessage)
  }
}
