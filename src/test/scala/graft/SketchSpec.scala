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

  test("audit_value_quantiles_approx: sketch rank error within bound, exact twin rides along") {
    // the 100 TB quantile path: every sketch value's exact rank must sit
    // within 2ε + 2/n of its target fraction (the sketch's own contract),
    // and the op must carry the exact interpolated quantiles for diffing
    val df = SparkEntry.queries("audit_value_quantiles_approx")(spark, sfDir)
    assert(Seq("within_bound", "exact_p50", "p50_approx").forall(df.columns.contains))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.filter(!org.apache.spark.sql.functions.col("within_bound")).count() === 0,
      rows.mkString("\n"))
    // and the medians of the two paths agree exactly where n is large
    // (sketch holds all values below its compression threshold)
    rows.filter(_.getAs[Long]("n_values") >= 100).foreach { r =>
      assert(math.abs(r.getAs[Double]("p50_approx") - r.getAs[Double]("exact_p50")) <= 1.0, r)
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
