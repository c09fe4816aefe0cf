package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bounds the HLL++ sketch error of audit_approx_entities against the
  * exact per-day distinct count it reports alongside. */
class SketchSpec extends AnyFunSuite {
  import TestSession._

  test("approx distinct entities within 10% of exact") {
    val rows = SparkEntry.queries("audit_approx_entities")(spark, sfDir)
      .select("approx_entities", "exact_entities").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"approx=$approx exact=$exact")
    }
  }

  test("the op's own within_bound invariant column holds on every row") {
    // the driver-visible semantic check: each output row asserts its own
    // sketch-error bound, so a rows>0 gate is no longer content-blind
    val df = SparkEntry.queries("audit_approx_entities")(spark, sfDir)
    assert(df.columns.contains("within_bound") && df.columns.contains("rel_err"))
    assert(df.filter(!org.apache.spark.sql.functions.col("within_bound")).count() === 0)
  }
}
