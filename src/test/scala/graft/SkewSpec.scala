package graft

import graft.analytics.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join must be a pure execution-strategy change: identical rows to
  * the plain equi-join, for any salt factor. */
class SkewSpec extends AnyFunSuite {
  import TestSession._

  test("salted join equals plain join on a skewed feed") {
    val probe = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val build = Tables.events(spark, sfDir)
      .groupBy(col("user_id").as("b_user"))
      .agg(count(lit(1)).as("n_events"))

    val plain = probe.join(build, col("user_id") === col("b_user"))
      .select("event_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    for (factor <- Seq(1, 4, 16)) {
      val salted = Skew.saltedJoin(probe, build, "user_id", "b_user", factor)
        .select("event_id", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(salted.toSeq === plain.toSeq, s"factor=$factor")
    }
  }
}
