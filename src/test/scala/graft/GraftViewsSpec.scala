package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL view surface must expose the same results as the operator API
  * — a switching audit_star user keeps their `SELECT ... FROM
  * <t>_audit_snapshot` queries verbatim (modulo catalog name). */
class GraftViewsSpec extends AnyFunSuite {
  import TestSession._

  test("registered views answer SQL identically to the operator API") {
    val names = GraftViews.register(spark, sfDir)
    assert(names.contains("events_audit_snapshot"))

    val viaSql = spark.sql(
      """SELECT entity_id, state_k, state_val
        |FROM events_audit_snapshot WHERE audit_id % 97 = 0
        |ORDER BY audit_id""".stripMargin).collect()
    val viaApi = audit.AuditQueries.auditSnapshot.fn(spark, sfDir)
      .filter("audit_id % 97 = 0")
      .selectExpr("entity_id", "state_k", "state_val")
      .orderBy("audit_id").collect()
    assert(viaSql.sameElements(viaApi))

    // views compose in SQL like the reference's do
    val joined = spark.sql(
      """SELECT count(*) FROM events_audit_current c
        |JOIN events_audit_history h ON h.operation = 'U'
        |WHERE c.n_changes > 0""".stripMargin).head().getLong(0)
    assert(joined > 0)
  }

  test("registration exposes the full reference view surface in the catalog") {
    val names = GraftViews.register(spark, sfDir, table = "feed2")
    val cat = spark.catalog.listTables().collect().map(_.name).toSet
    assert(names.toSet.subsetOf(cat))
    assert(names.toSet === Set("feed2_audit", "feed2_audit_delta",
      "feed2_audit_delta_old", "feed2_audit_snapshot", "feed2_audit_compare",
      "feed2_audit_current", "feed2_audit_history"))
  }
}
