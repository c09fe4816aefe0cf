package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FeedSources, GraftFeedFormat, GraftFeedMetrics}

/** The custom `.gfc` DataSource V2: fidelity, chunk-skipping pushdown,
  * decode pruning, and the residual-filter safety property. */
class GraftFeedSourceSpec extends AnyFunSuite {
  import TestSession._

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("gfc-spec-").toString
    // repartition so multiple part files (and chunk ranges) exist
    GraftFeedFormat.write(Tables.events(spark, sfDir).repartition(4), tmp)
    tmp
  }
  private def readBack =
    spark.read.format("graft.sources.GraftFeedSource").load(dir)

  test("round trip: every row and value survives write → chunk → decode") {
    val back = FeedSources.normalize(readBack)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val orig = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)
  }

  test("filter pushdown skips chunks by header min/max, result unchanged") {
    val total = readBack.count()
    val maxId = Tables.events(spark, sfDir).agg(max("event_id")).head.getLong(0)
    val cut = maxId - 10
    GraftFeedMetrics.chunksSkipped.set(0)
    GraftFeedMetrics.chunksPlanned.set(0)
    val got = readBack.filter(col("event_id") > lit(cut)).count()
    val want = Tables.events(spark, sfDir)
      .filter(col("event_id") > lit(cut)).count()
    assert(got === want)
    assert(got < total)
    assert(GraftFeedMetrics.chunksPlanned.get() > 0)
    assert(GraftFeedMetrics.chunksSkipped.get() > 0,
      s"a near-max id cut should prune chunks " +
        s"(planned=${GraftFeedMetrics.chunksPlanned.get()})")
  }

  test("pushed filters stay residual: stats can only skip, never filter") {
    // a predicate the header stats CANNOT express — must still be exact
    val got = readBack.filter(col("event_id") % 7 === 0).count()
    val want = Tables.events(spark, sfDir)
      .filter(col("event_id") % 7 === 0).count()
    assert(got === want)
    // and a pushable range predicate must also re-apply row-level:
    // chunk granularity is 1000 ids, the cut is mid-chunk
    val gotMid = readBack.filter(col("event_id") > lit(1500L)).count()
    val wantMid = Tables.events(spark, sfDir)
      .filter(col("event_id") > lit(1500L)).count()
    assert(gotMid === wantMid)
  }

  test("column pruning reaches the decoder (scan reads only what's selected)") {
    val df = readBack.select(col("event_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("read=[event_id]"),
      s"scan did not prune to event_id:\n$plan")
  }

  test("pushdown is visible in the plan description") {
    val df = readBack.filter(col("event_id") > lit(100L)).select("event_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("GreaterThan(event_id"),
      s"pushed filters not visible in scan description:\n$plan")
  }
}
