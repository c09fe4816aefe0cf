package graft

import graft.plans.{AsOf, AsOfJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of operator must agree row-for-row with the
  * built-in-composition implementation, handle no-match keys, and actually
  * plan through AsOfJoinExec. */
class AsOfSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 1L, 100L), (2L, 1L, 5L), (3L, 2L, 25L), (4L, 3L, 7L)
  ).toDF("id", "k", "t")
  private lazy val right = Seq(
    (1L, 5L, "a"), (1L, 10L, "b"), (1L, 11L, "c"), (2L, 30L, "d")
  ).toDF("rk", "rt", "v")

  test("basic semantics: latest right with time <= left time, else null") {
    GraftFunctions.ensureRegistered(spark)
    val got = AsOf.join(left, right, ("k", "rk"), ("t", "rt"))
      .select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq === Seq(
      (1L, Some("c")),  // k=1, t=100 → latest of rt∈{5,10,11} → c
      (2L, Some("a")),  // k=1, t=5   → rt=5 inclusive → a
      (3L, None),       // k=2, t=25  → only rt=30 > 25
      (4L, None)))      // k=3        → no right rows
  }

  test("tolerance: matches older than the bound become NULL, not next-older") {
    GraftFunctions.ensureRegistered(spark)
    val got = AsOf.join(left, right, ("k", "rk"), ("t", "rt"), tolerance = Some(10L))
      .select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq === Seq(
      (1L, None),       // latest match c at rt=11, gap 89 > 10 → NULL (no fallback)
      (2L, Some("a")),  // gap 0 within bound
      (3L, None),
      (4L, None)))
  }

  test("plans through AsOfJoinExec") {
    GraftFunctions.ensureRegistered(spark)
    val df = AsOf.join(left, right, ("k", "rk"), ("t", "rt"))
    df.collect()
    // AQE wraps the physical plan; match on the rendered tree instead
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("NULL keys/times never match and never crash") {
    GraftFunctions.ensureRegistered(spark)
    val l = Seq((1L, Option(1L), Option(10L)), (2L, Option.empty[Long], Option(5L)),
      (3L, Option(1L), Option.empty[Long])).toDF("id", "k", "t")
    val r = Seq((Option(1L), Option(5L), "a"), (Option.empty[Long], Option(1L), "x"),
      (Option(1L), Option.empty[Long], "y")).toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, ("k", "rk"), ("t", "rt"))
      .select("id", "v").orderBy("id")
      .collect().map(row => (row.getLong(0), Option(row.getString(1))))
    // id=1 matches "a"; null-key and null-time left rows get no match;
    // null-key/null-time right rows are never considered
    assert(got.toSeq === Seq((1L, Some("a")), (2L, None), (3L, None)))
  }

  test("short documents produce empty shingle sets, not a crash") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq("one two", "a b c d e").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(expr(graft.text.TextOps.shingleExpr("ws")).as("s3"))
    val sizes = df.select(size(col("s3"))).collect().map(_.getInt(0))
    assert(sizes.toSeq === Seq(0, 3))
  }

  test("AsOfRangePushdown pushes a post-join time bound into both scans") {
    GraftFunctions.ensureRegistered(spark)
    val base = graft.audit.AuditQueries.log(spark, TestSession.sfDir)
    val l = base.filter(col("event_type") === "error")
      .select("audit_id", "entity_id", "ts")
    val r = base.filter(col("event_type") === "purchase")
      .select(col("entity_id").as("r_entity"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    val bound = to_timestamp(lit("2024-01-15 00:00:00"))
    val df = AsOf.join(l, r, ("entity_id", "r_entity"), ("ts", "r_ts"))
      .filter(col("ts") <= bound)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the copied right-side bound survives optimization: r_ts <= T
    assert(optimized.contains("(r_ts"), optimized)
    // semantics unchanged: matches the unfiltered join post-filtered
    val expected = AsOf.join(l, r, ("entity_id", "r_entity"), ("ts", "r_ts"))
      .collect().filter(_.getAs[java.sql.Timestamp]("ts")
        .compareTo(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")) <= 0)
      .map(row => (row.getLong(0), Option(row.get(5)))).sortBy(_._1)
    val got = df.collect()
      .map(row => (row.getLong(0), Option(row.get(5)))).sortBy(_._1)
    assert(got.toSeq === expected.toSeq)
  }

  test("custom operator and union-window composition agree on real data") {
    GraftFunctions.ensureRegistered(spark)
    val base = graft.audit.AuditQueries.log(spark, TestSession.sfDir)
    val l = base.filter(col("event_type") === "error")
      .select("audit_id", "entity_id", "ts")
    val r = base.filter(col("event_type") === "purchase")
      .select(col("entity_id").as("r_entity"), col("ts").as("r_ts"),
        col("value").as("r_value"))

    val custom = AsOf.join(l, r, ("entity_id", "r_entity"), ("ts", "r_ts"))
      .select(col("audit_id"), col("r_value"))
      .collect().map(row => (row.getLong(0), Option(row.get(1)))).toMap

    val composed = AsOf.viaUnionWindow(
        l, r.select(col("r_entity").as("entity_id"), col("r_ts").as("ts"),
          col("r_value")),
        ("entity_id", "entity_id"), ("ts", "ts"), Seq("r_value"))
      .select(col("audit_id"), col("r_value"))
      .collect().map(row => (row.getLong(0), Option(row.get(1)))).toMap

    assert(custom === composed)
  }
}
