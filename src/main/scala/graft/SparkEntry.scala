package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{TrailDB, TrailOps, TrailSchema}
import graft.filter.{Clause, EventFilter, Match, TimeRange}
import graft.agg.Sessionize

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` where the operator is
  * SQL-expressible. Every query ends in a total ORDER BY so output order is
  * deterministic on both engines.
  */
object SparkEntry {

  /** Canonical trail view over the driver's events table: uuid = 32-hex of
    * user_id, time = epoch seconds, fields = event_type/props, seq =
    * event_id (deterministic tiebreaker). See FIXTURES.md §3. */
  private def trails(s: SparkSession, dir: String): TrailDB = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 only reads as a
    // nanos Long under this legacy flag; integer DIV keeps full precision
    // (double division at 1e18 would lose the low bits).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("ts DIV 1000000000"))
    TrailDB.fromEvents(ev,
      uuidCol = "user_id", timeCol = "ts",
      fieldCols = Seq("event_type", "props"), seqCol = Some("event_id"))
  }

  /** DuckDB-side equivalent of [[trails]] (driver registers the parquet
    * tables by name). floor(epoch()) matches Spark's timestamp→long cast. */
  private val TrailsCte =
    """WITH trails AS (
      |  SELECT printf('%032x', user_id) AS uuid,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS time,
      |         event_type, props, event_id AS seq
      |  FROM events
      |)""".stripMargin

  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(TrailSchema.UuidCol, TrailSchema.TimeCol, TrailSchema.SeqCol)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("t_sessionize")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+S3+P1: full scan in trail order with projection (tdb dump).
    "t_dump" -> ((s, dir) => trails(s, dir).dumpProjection()),

    // P2+P6: CNF filter — (event_type=click OR event_type=purchase) AND
    // props != '{"k": 0}' (clauses AND'd, terms OR'd).
    "t_filter_cnf" -> ((s, dir) => {
      val f = EventFilter(Seq(
        Clause(Seq(Match("event_type", "click"), Match("event_type", "purchase"))),
        Clause(Seq(Match("props", "{\"k\": 0}", negated = true)))))
      ordered(trails(s, dir).events(f)).select("uuid", "time", "event_type", "props", "seq")
    }),

    // P5: half-open time-range term AND'd with an equality term.
    "t_filter_time_range" -> ((s, dir) => {
      val f = EventFilter(Seq(
        Clause(Seq(TimeRange(1704500000L, 1705500000L))),
        Clause(Seq(Match("event_type", "view")))))
      ordered(trails(s, dir).events(f)).select("uuid", "time", "event_type", "seq")
    }),

    // P3: negation, incl. the unknown-field edge: a negated term on a field
    // that doesn't exist matches ALL events (reference src/tdb_decode.c:47-51).
    "t_filter_neg_unknown" -> ((s, dir) => {
      val f = EventFilter(Seq(
        Clause(Seq(Match("nosuchfield", "x", negated = true))),
        Clause(Seq(Match("event_type", "error", negated = true)))))
      ordered(trails(s, dir).events(f)).select("uuid", "time", "event_type", "seq")
    }),

    // P9: trail whitelist (--uuids) as pushed-down isin / semi-join.
    "t_whitelist" -> ((s, dir) => {
      val ids = Seq(1L, 3L, 7L).map(i => f"$i%032x")
      ordered(trails(s, dir).whitelist(ids).df)
        .select("uuid", "time", "event_type", "seq")
    }),

    // J2: single-trail point lookup (uuid → trail).
    "t_point_lookup" -> ((s, dir) =>
      trails(s, dir).trail(f"${5L}%032x").select("uuid", "time", "event_type", "props", "seq")),

    // A3: per-trail event counts (tdb_get_trail_length).
    "t_trail_lengths" -> ((s, dir) =>
      trails(s, dir).trailLengths.orderBy("uuid")),

    // A4: sessionization — 30-min gap; sessions+events per trail (tutorial).
    "t_sessionize" -> ((s, dir) =>
      Sessionize.sessionCounts(trails(s, dir).df, 1800L).orderBy("uuid")),

    // P10: only-diff-items — emit only fields that changed vs previous event.
    "t_only_diff" -> ((s, dir) =>
      ordered(trails(s, dir).onlyDiffItems)
        .select("uuid", "time", "event_type", "props", "seq")),

    // J4: merge with schema union — two shards with different field sets;
    // missing values become '' (tdb merge).
    "t_merge" -> ((s, dir) => {
      val t = trails(s, dir)
      val a = TrailDB.fromTrailFrame(
        t.df.filter(col("seq") % 2 === 0).select("uuid", "time", "event_type", "props", "seq"))
      val b = TrailDB.fromTrailFrame(
        t.df.filter(col("seq") % 2 === 1).select(col("uuid"), col("time"),
          col("event_type"), col("props").as("extra"), col("seq")))
      val merged = TrailOps.merge(Seq(a, b))
      ordered(merged.df).select(
        col("uuid"), col("time"),
        coalesce(col("event_type"), lit("")).as("event_type"),
        coalesce(col("props"), lit("")).as("props"),
        coalesce(col("extra"), lit("")).as("extra"),
        col("seq"))
    }),

    // J1/J3: multi-cursor k-way merge — trails split across 2 shards,
    // merged back into one (uuid, time)-ordered stream.
    "t_multicursor" -> ((s, dir) => {
      val t = trails(s, dir)
      val shards = Seq(
        TrailDB.fromTrailFrame(t.df.filter(col("seq") % 2 === 0)),
        TrailDB.fromTrailFrame(t.df.filter(col("seq") % 2 === 1)))
      TrailOps.multiCursor(shards).select("uuid", "time", "event_type", "props", "seq")
    }),

    // A1: db metadata — num_trails/num_events/min/max timestamp (info file).
    "t_metadata" -> ((s, dir) => {
      val t = trails(s, dir)
      t.df.agg(
        countDistinct(col("uuid")).as("num_trails"),
        count(lit(1)).as("num_events"),
        min("time").as("min_time"),
        max("time").as("max_time"))
    }),

    // A2/F3: lexicon — distinct values of a field, sorted ("" excluded, it
    // is the implicit NULL val 0).
    "t_lexicon" -> ((s, dir) =>
      trails(s, dir).lexicon("event_type").orderBy("value")),
  )

  def oracleSql: Map[String, String] = Map(
    "t_dump" ->
      s"""$TrailsCte
         |SELECT uuid, time, coalesce(event_type,'') AS event_type,
         |       coalesce(props,'') AS props
         |FROM trails ORDER BY uuid, time, seq""".stripMargin,

    "t_filter_cnf" ->
      s"""$TrailsCte
         |SELECT uuid, time, event_type, props, seq FROM trails
         |WHERE (coalesce(event_type,'') = 'click' OR coalesce(event_type,'') = 'purchase')
         |  AND coalesce(props,'') != '{"k": 0}'
         |ORDER BY uuid, time, seq""".stripMargin,

    "t_filter_time_range" ->
      s"""$TrailsCte
         |SELECT uuid, time, event_type, seq FROM trails
         |WHERE (time >= 1704500000 AND time < 1705500000)
         |  AND coalesce(event_type,'') = 'view'
         |ORDER BY uuid, time, seq""".stripMargin,

    "t_filter_neg_unknown" ->
      s"""$TrailsCte
         |SELECT uuid, time, event_type, seq FROM trails
         |WHERE coalesce(event_type,'') != 'error'
         |ORDER BY uuid, time, seq""".stripMargin,

    "t_whitelist" ->
      s"""$TrailsCte
         |SELECT uuid, time, event_type, seq FROM trails
         |WHERE uuid IN (printf('%032x', 1), printf('%032x', 3), printf('%032x', 7))
         |ORDER BY uuid, time, seq""".stripMargin,

    "t_point_lookup" ->
      s"""$TrailsCte
         |SELECT uuid, time, event_type, props, seq FROM trails
         |WHERE uuid = printf('%032x', 5)
         |ORDER BY time, seq""".stripMargin,

    "t_trail_lengths" ->
      s"""$TrailsCte
         |SELECT uuid, count(*) AS trail_length FROM trails
         |GROUP BY uuid ORDER BY uuid""".stripMargin,

    "t_sessionize" ->
      s"""$TrailsCte,
         |gaps AS (
         |  SELECT uuid, time, seq,
         |    CASE WHEN time - lag(time) OVER (PARTITION BY uuid ORDER BY time, seq) > 1800
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM trails),
         |sess AS (
         |  SELECT uuid,
         |    sum(new_s) OVER (PARTITION BY uuid ORDER BY time, seq
         |                     ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM gaps)
         |SELECT uuid, CAST(max(session_id) + 1 AS BIGINT) AS num_sessions,
         |       count(*) AS num_events
         |FROM sess GROUP BY uuid ORDER BY uuid""".stripMargin,

    "t_only_diff" ->
      s"""$TrailsCte
         |SELECT uuid, time,
         |  CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
         |       THEN '' ELSE coalesce(event_type,'') END AS event_type,
         |  CASE WHEN lag(props) OVER w IS NOT DISTINCT FROM props
         |       THEN '' ELSE coalesce(props,'') END AS props,
         |  seq
         |FROM trails
         |WINDOW w AS (PARTITION BY uuid ORDER BY time, seq)
         |ORDER BY uuid, time, seq""".stripMargin,

    "t_merge" ->
      s"""$TrailsCte
         |SELECT uuid, time, coalesce(event_type,'') AS event_type,
         |       CASE WHEN seq % 2 = 0 THEN coalesce(props,'') ELSE '' END AS props,
         |       CASE WHEN seq % 2 = 1 THEN coalesce(props,'') ELSE '' END AS extra,
         |       seq
         |FROM trails ORDER BY uuid, time, seq""".stripMargin,

    "t_multicursor" ->
      s"""$TrailsCte
         |SELECT uuid, time, event_type, props, seq
         |FROM trails ORDER BY uuid, time, seq""".stripMargin,

    "t_metadata" ->
      s"""$TrailsCte
         |SELECT count(DISTINCT uuid) AS num_trails, count(*) AS num_events,
         |       min(time) AS min_time, max(time) AS max_time
         |FROM trails""".stripMargin,

    "t_lexicon" ->
      s"""$TrailsCte
         |SELECT DISTINCT coalesce(event_type,'') AS value FROM trails
         |WHERE coalesce(event_type,'') != '' ORDER BY value""".stripMargin,
  )
}
