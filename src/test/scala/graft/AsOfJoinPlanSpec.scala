package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.core.TrailOps
import graft.plans.AsOfJoin

/** The custom Catalyst AS-OF operator (AsOfJoinNode → AsOfJoinStrategy →
  * AsOfJoinExec) must agree row-for-row with the pure-DataFrame window
  * formulation (TrailOps.asOfJoin) — which itself hash-matches DuckDB's
  * native ASOF LEFT JOIN in the t_asof oracle row. Reference semantics:
  * multi-cursor walk carrying last-seen state,
  * doc/docs/technical_overview.md:219-229.
  */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def uuidOf(i: Int): String = f"$i%032x"

  private def randomSides(seed: Long, trails: Int, perTrail: Int) = {
    val rnd = new Random(seed)
    val left = for {
      t <- 0 until trails
      i <- 0 until perTrail
    } yield (uuidOf(t), rnd.nextInt(40).toLong, t.toLong * perTrail + i)
    // Right side includes trails with no left rows and vice versa, plus
    // timestamp ties both within the right side and against left rows.
    val right = for {
      t <- 1 to trails // trail `trails` has no left rows; trail 0 no right
      i <- 0 until perTrail
    } yield (uuidOf(t), rnd.nextInt(40).toLong,
             rnd.nextInt(100).toLong, s"p${rnd.nextInt(5)}")
    (left.toDF("uuid", "time", "seq"),
     right.toDF("uuid", "time", "score", "props"))
  }

  test("native exec ≡ window formulation on random data with ties and one-sided trails") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val (l, r0) = randomSides(seed, trails = 12, perTrail = 25)
      val r = r0.select(col("uuid"), col("time"),
        col("score"), col("props"))
      val cols = Seq("score", "props")
      val viaWindow = TrailOps.asOfJoin(l, r, cols)
        .orderBy("uuid", "time", "seq").collect().toSeq
      val viaNative = AsOfJoin.join(l, r, cols)
        .orderBy("uuid", "time", "seq").collect().toSeq
      assert(viaNative === viaWindow, s"seed $seed")
    }
  }

  test("tolerance: native exec ≡ window formulation on random data") {
    for (seed <- Seq(5L, 11L); tol <- Seq(1L, 5L, 100L)) {
      val (l, r) = randomSides(seed, trails = 12, perTrail = 25)
      val cols = Seq("score", "props")
      val viaWindow = TrailOps.asOfJoin(l, r, cols, tolerance = Some(tol))
        .orderBy("uuid", "time", "seq").collect().toSeq
      val viaNative = AsOfJoin.join(l, r, cols, tolerance = Some(tol))
        .orderBy("uuid", "time", "seq").collect().toSeq
      assert(viaNative === viaWindow, s"seed $seed tol $tol")
    }
  }

  test("tolerance: too-old match masks to NULL but newer rows still replace it") {
    val l = Seq((uuidOf(0), 10L, 0L), (uuidOf(0), 20L, 1L), (uuidOf(0), 21L, 2L))
      .toDF("uuid", "time", "seq")
    val r = Seq((uuidOf(0), 8L, "early"), (uuidOf(0), 20L, "late"))
      .toDF("uuid", "time", "v")
    val rows = AsOfJoin.join(l, r, Seq("v"), tolerance = Some(3L))
      .orderBy("seq").collect()
    // lt=10: rt=8 within the closed 3s bound (8 >= 10-3) → early;
    // lt=20: rt=20 → late; lt=21: rt=20 still within → late.
    assert(rows.map(_.getAs[String]("asof_v")).toSeq ===
      Seq("early", "late", "late"))
    // With a 1s bound the rt=8 match at lt=10 is masked, not mis-carried.
    val tight = AsOfJoin.join(l, r, Seq("v"), tolerance = Some(1L))
      .orderBy("seq").collect()
    assert(tight.map(_.getAs[String]("asof_v")).toSeq ===
      Seq(null, "late", "late"))
  }

  test("tolerance: null times never satisfy the bound, matching the window form") {
    val L = null.asInstanceOf[java.lang.Long]
    val l = Seq((uuidOf(0), L, 0L), (uuidOf(0), java.lang.Long.valueOf(10L), 1L))
      .toDF("uuid", "time", "seq")
    val r = Seq((uuidOf(0), L, "null-time"), (uuidOf(0), java.lang.Long.valueOf(8L), "real"))
      .toDF("uuid", "time", "v")
    val viaWindow = TrailOps.asOfJoin(l, r, Seq("v"), tolerance = Some(5L))
      .orderBy("seq").collect().toSeq
    val viaNative = AsOfJoin.join(l, r, Seq("v"), tolerance = Some(5L))
      .orderBy("seq").collect().toSeq
    assert(viaNative === viaWindow)
    assert(viaNative.map(_.getAs[String]("asof_v")) === Seq(null, "real"))
  }

  test("<= visibility: a right row at the same timestamp is matched") {
    val l = Seq((uuidOf(0), 10L, 0L)).toDF("uuid", "time", "seq")
    val r = Seq((uuidOf(0), 10L, "hit"), (uuidOf(0), 9L, "stale"))
      .toDF("uuid", "time", "v")
    val row = AsOfJoin.join(l, r, Seq("v")).collect().head
    assert(row.getAs[String]("asof_v") === "hit")
  }

  test("no prior right row → NULL, and carried state does not leak across trails") {
    val l = Seq((uuidOf(0), 5L, 0L), (uuidOf(1), 5L, 1L))
      .toDF("uuid", "time", "seq")
    val r = Seq((uuidOf(0), 1L, "only-trail-0")).toDF("uuid", "time", "v")
    val rows = AsOfJoin.join(l, r, Seq("v"))
      .orderBy("uuid").collect()
    assert(rows(0).getAs[String]("asof_v") === "only-trail-0")
    assert(rows(1).getAs[String]("asof_v") === null)
  }

  test("null uuids form one trail, matching the window formulation") {
    val l = Seq((null.asInstanceOf[String], 10L, 0L), (uuidOf(1), 10L, 1L),
        (null.asInstanceOf[String], 20L, 2L))
      .toDF("uuid", "time", "seq")
    val r = Seq((null.asInstanceOf[String], 15L, "null-trail"),
        (uuidOf(1), 5L, "real-trail"))
      .toDF("uuid", "time", "v")
    val viaWindow = TrailOps.asOfJoin(l, r, Seq("v"))
      .orderBy("seq").collect().toSeq
    val viaNative = AsOfJoin.join(l, r, Seq("v"))
      .orderBy("seq").collect().toSeq
    assert(viaNative === viaWindow)
    assert(viaNative.map(_.getAs[String]("asof_v")) ===
      Seq(null, "real-trail", "null-trail"))
  }

  test("null times match the window formulation (NULLS FIRST carry, no cursor over-advance)") {
    val L = null.asInstanceOf[java.lang.Long]
    val l = Seq((uuidOf(0), L, 0L), (uuidOf(0), java.lang.Long.valueOf(-5L), 1L),
        (uuidOf(0), java.lang.Long.valueOf(10L), 2L))
      .toDF("uuid", "time", "seq")
    val r = Seq((uuidOf(0), L, "null-time"), (uuidOf(0), java.lang.Long.valueOf(0L), "at-zero"))
      .toDF("uuid", "time", "v")
    val viaWindow = TrailOps.asOfJoin(l, r, Seq("v"))
      .orderBy("seq").collect().toSeq
    val viaNative = AsOfJoin.join(l, r, Seq("v"))
      .orderBy("seq").collect().toSeq
    assert(viaNative === viaWindow)
    // null left time sees only the null-time right row; -5 must NOT be
    // matched to the rt=0 row (the getLong-on-null bug read null as 0)
    assert(viaNative.map(_.getAs[String]("asof_v")) ===
      Seq("null-time", "null-time", "at-zero"))
  }

  test("plan shape: AsOfJoinExec node, one exchange per side, right side at its own width") {
    val (l, r) = randomSides(3L, trails = 6, perTrail = 10)
    val df = AsOfJoin.join(l, r, Seq("score", "props"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 exchanges (one per side):\n$plan")
    // The right child of the exec must carry only (uuid, time, values) —
    // not a union-padded schema.
    val inner = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val exec = inner.collectFirst {
      case e: graft.plans.AsOfJoinExec => e
    }.get
    assert(exec.right.output.map(_.name).toSet ===
      Set("uuid", "time", "score", "props"))
    assert(df.columns.toSeq ===
      Seq("uuid", "time", "seq", "asof_score", "asof_props"))
  }

  test("strategy is available through SparkSessionExtensions registration path") {
    // The builder self-registers via experimental.extraStrategies; assert
    // the idempotence contract so repeated joins don't stack strategies.
    AsOfJoin.registerWith(spark)
    AsOfJoin.registerWith(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.AsOfJoinStrategy) === 1)
  }
}
