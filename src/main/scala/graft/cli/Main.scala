package graft.cli

import org.apache.spark.sql.SparkSession

import graft.core.{TrailDB, TrailDBCons, TrailOps}
import graft.filter.EventFilter

/** CLI front-end mirroring the reference's `tdb` tool
  * (reference: tdbcli/main.c:30-141 ops and flags):
  *
  *   tdb make  -o OUT (-c CSV | -j JSONL) -f f1,f2 [--csv-header]
  *             [--delimiter D] [--skip-bad-input] [--uuid-col C] [--time-col C]
  *   tdb dump  -i DB [-F FILTER] [--fields uuid,time,f1] [--uuids u1,u2,...]
  *             [--index IDX] [-o OUT] [-c | -j] [--json-no-empty]
  *             [--delimiter D] [--csv-header]
  *   tdb merge -o OUT -i DB1 -i DB2 [...]
  *   tdb index -i DB [-o IDX]   (build the inverted (field,value,page)
  *                               skipping index — see [[graft.core.TrailIndex]];
  *                               `dump --index IDX -F ...` prunes with it)
  *
  * Filters use the reference grammar: space = OR, '&' = AND, `f=v`,
  * `f!=v`, `f=` for the NULL value, `f=@file` to read the value from a
  * file (tdbcli/filter.c:18-140).
  */
object Main {
  /** Flags that take a value, per op — `-c`/`-j` take a path for `make` but
    * are boolean output-format switches for `dump` (reference: tdbcli/main.c
    * has separate long_options tables per op for exactly this reason). */
  private val valueFlags: Map[String, Set[String]] = Map(
    "make"  -> Set("-o", "-c", "-j", "-f", "--delimiter", "--uuid-col", "--time-col"),
    "dump"  -> Set("-i", "-F", "-o", "--fields", "--uuids", "--delimiter", "--index"),
    "merge" -> Set("-o", "-i"),
    "index" -> Set("-i", "-o")
  ).withDefaultValue(Set.empty)

  /** Boolean switches per op — together with [[valueFlags]] this is the
    * full flag vocabulary, so a value-taking flag can consume ANY token
    * that is not a known flag of the op (e.g. `-F '-x=1'`, `--delimiter
    * '-'`), mirroring getopt_long's behavior in the reference CLI. */
  private val boolFlags: Map[String, Set[String]] = Map(
    "make"  -> Set("--csv-header", "--skip-bad-input"),
    "dump"  -> Set("-c", "-j", "--json-no-empty", "--csv-header"),
    "merge" -> Set.empty[String],
    "index" -> Set.empty[String]
  ).withDefaultValue(Set.empty)

  private def parseFlags(op: String, args: Seq[String]): (Map[String, List[String]], List[String]) = {
    var flags = Map.empty[String, List[String]].withDefaultValue(Nil)
    var pos = List.empty[String]
    var i = 0
    val takesValue = valueFlags(op)
    val known = takesValue ++ boolFlags(op)
    while (i < args.length) {
      val a = args(i)
      // A value-taking flag consumes the next token unless it is a KNOWN
      // flag of this op — `dump -F -o OUT` must not let -F swallow -o, but
      // `dump -F '-x=1'` is a legitimate filter value starting with '-'.
      // Running out of tokens (or hitting a known flag) is a loud error:
      // an unfiltered dump from a silently-dropped -F is worse than a crash.
      if (a.startsWith("-") && takesValue(a)) {
        if (i + 1 >= args.length || known(args(i + 1)))
          sys.error(s"$op: flag $a requires a value")
        flags = flags.updated(a, flags(a) :+ args(i + 1)); i += 2
      } else if (a.startsWith("-")) {
        flags = flags.updated(a, flags(a) :+ ""); i += 1
      } else { pos = pos :+ a; i += 1 }
    }
    (flags, pos)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(1) }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graft-tdb")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.head, args.tail.toIndexedSeq)
    finally spark.stop()
  }

  def run(spark: SparkSession, op: String, rest: Seq[String]): Unit = {
    val (flags, _) = parseFlags(op, rest)
    def one(k: String): Option[String] = flags(k).headOption.filter(_.nonEmpty)

    op match {
      case "make" =>
        val out = one("-o").getOrElse(sys.error("make: -o OUT required"))
        val fields = one("-f").map(_.split(",").toSeq).getOrElse(Nil)
        val cons = new TrailDBCons(spark, fields)
        val mapping = Seq(
          one("--uuid-col").map("uuid" -> _),
          one("--time-col").map("time" -> _)).flatten.toMap
        val skipBad = flags("--skip-bad-input").nonEmpty
        one("-c").foreach(csv => cons.addCsv(csv,
          delimiter = one("--delimiter").getOrElse(","),
          header = flags("--csv-header").nonEmpty,
          mapping = mapping, skipBadInput = skipBad))
        one("-j").foreach(j => cons.addJsonl(j, mapping, skipBad))
        val db = cons.finalizeTo(out)
        println(s"[make] wrote ${db.numEvents} events / ${db.numTrails} trails to $out")

      case "dump" =>
        val in = one("-i").getOrElse(sys.error("dump: -i DB required"))
        var db = TrailDB.open(spark, in)
        // NOT one(): an explicitly-empty -F '' must still apply — the
        // reference's parse_filter("") builds a filter with one empty
        // clause that matches NOTHING (tdb_event_filter_new semantics),
        // and EventFilter.parse("") is matchNone to mirror it. Dropping
        // it would silently dump the whole db instead.
        flags("-F").headOption.foreach { f =>
          val filter = EventFilter.parse(f)
          db = db.withFilter(filter)
          // --index IDX: prune to candidate pages before the scan (the
          // reference's "Evaluating X/N trails" path, op_dump.c:239-247).
          one("--index").foreach { idx =>
            // validate the binding against THIS -i db (a db+index pair
            // moved together still validates; a stale index still refuses)
            db = graft.core.TrailIndex.prunedDb(db,
              graft.core.TrailIndex.open(spark, idx, Some(in)), filter)
          }
        }
        one("--uuids").foreach(us => db = db.whitelist(us.split(",").toSeq))
        val cols = one("--fields").map(_.split(",").toSeq).getOrElse(Nil)
        one("-o") match {
          case Some(out) if flags("-j").nonEmpty =>
            db.dumpJson(out, noEmpty = flags("--json-no-empty").nonEmpty)
            println(s"[dump] wrote JSON to $out")
          case Some(out) =>
            db.dumpCsv(out, delimiter = one("--delimiter").getOrElse(","),
              header = flags("--csv-header").nonEmpty, cols = cols)
            println(s"[dump] wrote CSV to $out")
          case None =>
            db.dumpProjection(cols).show(100, truncate = false)
        }

      case "merge" =>
        val out = one("-o").getOrElse(sys.error("merge: -o OUT required"))
        val ins = flags("-i")
        require(ins.size >= 2, "merge: at least two -i DB inputs")
        val merged = TrailOps.merge(ins.map(TrailDB.open(spark, _)))
        val db = new TrailDBCons(spark, merged.fields).add(merged.df).finalizeTo(out)
        println(s"[merge] ${ins.size} dbs -> ${db.numEvents} events / ${db.numTrails} trails at $out")

      case "index" =>
        val in = one("-i").getOrElse(sys.error("index: -i DB required"))
        val db = TrailDB.open(spark, in)
        val out = one("-o").getOrElse(s"$in.index")
        graft.core.TrailIndex.build(db, out)
        val n = spark.read.parquet(out).count()
        println(s"[index] $in: ${db.numTrails} trails, ${db.numEvents} events; " +
          s"fields=${db.fields.mkString(",")}; wrote $n (field,value,page) " +
          s"entries to $out")

      case other =>
        usage(); sys.error(s"unknown op '$other'")
    }
  }

  private def usage(): Unit =
    println("usage: tdb (make|dump|merge|index) [flags]  -- see Scaladoc of graft.cli.Main")
}
