package graft

import java.nio.file.Files

import org.scalacheck.{Gen, rng}
import graft.sources.TdbWriter

/** Property-based round trip for the legacy `.tdb` codec: RANDOM corpora
  * through writePackage → the DataSourceV2 reader must reproduce every
  * row. The generator deliberately concentrates probability mass on the
  * codec's edges — value repeats (edge-encoding elision), nulls/empties
  * (value id 0), equal timestamps (delta 0), occasional huge deltas
  * (wide items), multi-byte UTF-8 values (byte-offset lexicons), and a
  * small uuid pool (many events per trail) — and runs both the Huffman
  * and literal-only streams over each corpus. The fixed adversarial
  * cases in TdbSourceSpec pin known edges; this sweeps the combinations.
  */
class TdbPropertySpec extends SparkSpec {
  import spark.implicits._

  private val uuidPool: Seq[String] =
    (0 until 9).map(i => f"$i%032x") :+ ("ff" * 16)

  private val genValue: Gen[String] = Gen.frequency(
    3 -> Gen.const(null),
    2 -> Gen.const(""),
    8 -> Gen.oneOf("a", "b", "c", "dd", "ee"),
    2 -> Gen.oneOf("héllo", "日本", "x😀"),
    1 -> Gen.alphaNumStr.map(_.take(12)))

  private val genRow: Gen[(String, Long, String, String)] = for {
    u <- Gen.oneOf(uuidPool)
    ts <- Gen.frequency(
      8 -> Gen.choose(0L, 50L),           // dense ties + small deltas
      2 -> Gen.choose(0L, 1L << 30),      // mid-range
      1 -> Gen.choose(1L << 33, 1L << 42)) // wide timestamp items
    v1 <- genValue
    v2 <- genValue
  } yield (u, ts, v1, v2)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  test("random corpora round-trip through both stream encodings") {
    val dir = Files.createTempDirectory("graft-tdb-prop")
    for (corpus <- 0 until 6) {
      val n = 40 + corpus * 60
      val rows = (0 until n).map(i =>
        sample(genRow, corpus * 100003L + i))
      val df = rows.toDF("uuid", "time", "f1", "f2").repartition(5)
      val want = rows
        .map(t => (t._1, t._2, Option(t._3).getOrElse(""), Option(t._4).getOrElse("")))
        .sorted
      for (compress <- Seq(true, false)) {
        val out = s"$dir/c$corpus-$compress.tdb"
        TdbWriter.writePackage(df, Seq("f1", "f2"), out, compress = compress)
        val got = spark.read.format("tdb").load(out).collect()
          .map(r => (r.getString(0), r.getLong(1),
            Option(r.getString(2)).getOrElse(""),
            Option(r.getString(3)).getOrElse("")))
          .sorted.toSeq
        assert(got === want,
          s"corpus $corpus (compress=$compress, $n rows) diverged")
      }
    }
  }

  test("an EMPTY corpus writes a valid zero-trail package (r13 distributed-encode edge)") {
    val dir = Files.createTempDirectory("graft-tdb-empty")
    val df = Seq.empty[(String, Long, String, String)]
      .toDF("uuid", "time", "f1", "f2")
    val out = s"$dir/empty.tdb"
    TdbWriter.writePackage(df, Seq("f1", "f2"), out)
    assert(spark.read.format("tdb").load(out).count() === 0L)
    val db = graft.core.TrailDB.open(spark, out)
    assert(db.numTrails === 0L && db.numEvents === 0L)
  }

  test("random corpora round-trip through the FORMAT-V0 directory layout (round 9)") {
    // Same adversarial generator through writeV0Directory → the v0 read
    // paths: NUL-terminated lexicons (multi-byte UTF-8 byte offsets),
    // 12-byte codebook entries, unordered cookies index. Wide timestamp
    // items exercise the u64-packable symbol FILTER (their codes must
    // fall back to literals, losing nothing).
    val dir = Files.createTempDirectory("graft-tdb-propv0")
    for (corpus <- 0 until 4) {
      val n = 60 + corpus * 80
      val rows = (0 until n).map(i =>
        sample(genRow, corpus * 700001L + i))
      val df = rows.toDF("uuid", "time", "f1", "f2").repartition(5)
      val want = rows
        .map(t => (t._1, t._2, Option(t._3).getOrElse(""), Option(t._4).getOrElse("")))
        .sorted
      for (compress <- Seq(true, false)) {
        val out = s"$dir/v0-$corpus-$compress"
        TdbWriter.writeV0Directory(df, Seq("f1", "f2"), out,
          compress = compress)
        val got = spark.read.format("tdb").load(out).collect()
          .map(r => (r.getString(0), r.getLong(1),
            Option(r.getString(2)).getOrElse(""),
            Option(r.getString(3)).getOrElse("")))
          .sorted.toSeq
        assert(got === want,
          s"v0 corpus $corpus (compress=$compress, $n rows) diverged")
      }
    }
  }
}
