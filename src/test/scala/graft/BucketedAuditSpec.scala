package graft

import graft.audit.{AuditLog, AuditQueries, AuditStorage}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** The scale claim behind AuditStorage: reconstructions over a bucketed
  * audit log run without a shuffle (the scan itself satisfies the window's
  * required distribution), and results equal the unbucketed path. */
class BucketedAuditSpec extends AnyFunSuite {
  import TestSession._

  // AQE-aware: descends into query stages (a naive collect over
  // ShuffleExchangeExec sees nothing under AQE and asserts vacuously)
  private def shuffles(p: SparkPlan): Int = TestSession.shuffleCount(p)

  private lazy val table: String = {
    // in-memory catalog forgets tables between JVM runs but the warehouse
    // files persist; clear the stale location first
    spark.sql("DROP TABLE IF EXISTS audit_log_bucketed")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "audit_log_bucketed")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    val log = AuditQueries.log(spark, sfDir)
    AuditStorage.writeBucketed(log, "audit_log_bucketed", buckets = 4)
  }

  test("snapshot over the bucketed log plans zero shuffles") {
    val alg = AuditLog("entity_id", "audit_id")
    val snap = alg.snapshot(
      AuditStorage.read(spark, table)
        .withColumn("k", org.apache.spark.sql.functions.col("field_k")),
      Seq("k"))
    snap.collect() // force execution so AQE finalizes the plan
    assert(shuffles(snap.queryExecution.executedPlan) === 0,
      snap.queryExecution.executedPlan.toString)
  }

  test("as-of join over the bucketed log plans zero shuffles (co-located)") {
    import org.apache.spark.sql.functions.col
    GraftFunctions.ensureRegistered(spark)
    val b = AuditStorage.read(spark, table)
    val l = b.filter(col("event_type") === "error")
      .select("audit_id", "entity_id", "ts")
    val r = b.filter(col("event_type") === "purchase")
      .select(col("entity_id").as("r_entity"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    val j = graft.plans.AsOf.join(l, r,
      key = ("entity_id", "r_entity"), time = ("ts", "r_ts"))
    j.collect()
    // both sides read the same bucketing on entity_id, which satisfies the
    // exec's ClusteredDistribution co-partitioned — the audit table's
    // btree-equivalent access path extends to point-in-time lookups
    assert(shuffles(j.queryExecution.executedPlan) === 0,
      j.queryExecution.executedPlan.toString)
  }

  test("bucketed and unbucketed snapshots agree") {
    val alg = AuditLog("entity_id", "audit_id")
    val directDf = alg
      .snapshot(AuditQueries.log(spark, sfDir)
        .withColumn("k", org.apache.spark.sql.functions.col("field_k")), Seq("k"))
      .select("audit_id", "state_k").orderBy("audit_id")
    val direct = directDf.collect()
    // positive control for the zero-shuffle assertions above: the SAME
    // reconstruction over the unbucketed feed MUST show its window
    // exchange — proving the counter is not vacuous under AQE
    assert(shuffles(directDf.queryExecution.executedPlan) >= 1,
      directDf.queryExecution.executedPlan.toString)
    val bucketed = alg
      .snapshot(AuditStorage.read(spark, table)
        .withColumn("k", org.apache.spark.sql.functions.col("field_k")), Seq("k"))
      .select("audit_id", "state_k").orderBy("audit_id").collect()
    assert(direct.toSeq === bucketed.toSeq)
  }
}
