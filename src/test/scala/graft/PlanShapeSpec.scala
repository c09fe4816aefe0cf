package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the plan shapes SURVEY §8 documents — the
  * properties that make these the 100×-scale plans. Each assertion runs
  * the query first so AQE finalizes the plan it actually executed. */
class PlanShapeSpec extends AnyFunSuite {
  import TestSession._

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
  }

  // AQE-aware: descends into query stages (a naive collect over
  // ShuffleExchangeExec sees nothing under AQE and pins vacuously)
  private def shuffles(p: SparkPlan): Int = TestSession.shuffleCount(p)

  test("the counter itself sees exchanges (positive control)") {
    // a plain groupBy over raw parquet MUST show its aggregation shuffle;
    // if this fails, every <= N pin below is meaningless
    import org.apache.spark.sql.functions._
    val df = Tables.events(spark, sfDir).groupBy("event_type").count()
    assert(shuffles(finalPlan(df)) >= 1)
  }

  test("q5_region_volume: every join broadcasts; one agg exchange + output sort") {
    val p = finalPlan(SparkEntry.queries("q5_region_volume")(spark, sfDir))
    val s = p.toString
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"dimension join fell out of broadcast:\n$s")
    assert(s.contains("BroadcastHashJoin"))
    // one aggregation exchange + the contractual ORDER BY range exchange
    assert(shuffles(p) <= 2, s"unexpected extra exchanges:\n$s")
  }

  test("audit_snapshot: one data exchange (shared entity window) + output sort") {
    val p = finalPlan(SparkEntry.queries("audit_snapshot")(spark, sfDir))
    assert(shuffles(p) <= 2, s"snapshot gained an exchange:\n$p")
  }

  test("audit_delta_old: backward and forward windows share one entity exchange") {
    val p = finalPlan(SparkEntry.queries("audit_delta_old")(spark, sfDir))
    // THREE shuffles is the honest floor: the shared entity window
    // exchange, the live-row side's own top-1 exchange (it then rides a
    // broadcast into the join), and the contractual output sort. The pin
    // guards the sharing: both reconstruction windows on ONE exchange.
    assert(shuffles(p) <= 3, s"delta_old window partitioning no longer shared:\n$p")
    assert(p.toString.contains("BroadcastHashJoin"), p.toString)
  }

  test("audit_truncate_reset: stacked windows over a single data exchange") {
    val p = finalPlan(SparkEntry.queries("audit_truncate_reset")(spark, sfDir))
    // entity exchange + output sort; the T-set aggregation contributes a
    // tiny pre-broadcast exchange of one aggregated row
    assert(shuffles(p) <= 3, s"truncate_reset window stack split:\n$p")
  }

  test("dedup_ngram_jaccard: candidate join reuses the df-cap window's partitioning") {
    val p = finalPlan(SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir))
    val s = p.toString
    // the inverted-index join must be an equi-join (hash or sort-merge on
    // the block+shingle key), never a nested-loop/cartesian shape
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }
}
