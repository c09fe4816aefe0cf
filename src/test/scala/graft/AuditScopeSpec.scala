package graft

import graft.audit.AuditScope
import org.apache.spark.sql.functions.{col, length, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Reference scoping semantics (audit.go:300-395): include-list wins
  * first, then table/schema exclusions; plus trigger truncation bounds. */
class AuditScopeSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("admits: empty include list admits everything not excluded") {
    val s = AuditScope(excludedTables = Seq("public.secrets"),
      excludedSchemas = Seq("tmp"))
    assert(s.admits("public.orders"))
    assert(!s.admits("public.secrets"))
    assert(!s.admits("tmp.scratch"))
    // reference-faithful quirk (audit.go:326-334, raw HasPrefix): a bare
    // schema name also catches schemas it prefixes; the dot form doesn't
    assert(!s.admits("tmp2.scratch"))
    assert(AuditScope(excludedSchemas = Seq("tmp.")).admits("tmp2.scratch"))
  }

  test("admits: include list restricts, exclusions still apply") {
    val s = AuditScope(
      includedTables = Seq("public.orders", "public.lineitem"),
      excludedTables = Seq("public.lineitem"))
    assert(s.admits("public.orders"))
    assert(!s.admits("public.lineitem")) // excluded wins over included
    assert(!s.admits("public.customer")) // not in include list
  }

  test("DataFrame filter matches admits() row-for-row") {
    val s = AuditScope(excludedSchemas = Seq("tmp"),
      excludedTables = Seq("public.secrets"))
    val tables = Seq("public.orders", "public.secrets", "tmp.x", "app.events")
    val df = tables.toDF("tbl")
    val kept = s.apply(df, "tbl").collect().map(_.getString(0)).toSet
    assert(kept === tables.filter(s.admits).toSet)
  }

  test("payload truncation mirrors the trigger bounds") {
    val df = Seq("x" * 600).toDF("v")
      .select(length(AuditScope.truncateValue(col("v"))).as("lv"),
        length(AuditScope.truncateQuery(lit("q" * 1500))).as("lq"))
    val r = df.head()
    assert(r.getInt(0) === 500 && r.getInt(1) === 1000)
  }
}
