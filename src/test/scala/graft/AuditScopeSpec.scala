package graft

import graft.audit.{AuditConfig, AuditScope}
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

  // A config file with the exact field inventory of the reference's
  // audit.yml.example (db scalars + scoping lists + capture toggles).
  private val referenceShapedYml =
    """# this is an example audit.yml file
      |
      |# database config information
      |host: localhost
      |port: 5432
      |db_name: audit_star
      |username: postgres
      |password:
      |ssl_mode: disable
      |
      |# audit star config information
      |excluded_tables:
      |  - teststar.table_skipme
      |excluded_schemas:
      |  - schema_to_exclude
      |included_tables:
      |  - teststar.table_keepme  # trailing comment
      |security: definer
      |log_client_query: false
      |owner: test__owner
      |""".stripMargin

  test("config file round-trips the reference audit.yml field set") {
    val cfg = AuditConfig.parse(referenceShapedYml)
    assert(cfg.scope === AuditScope(
      includedTables = Seq("teststar.table_keepme"),
      excludedTables = Seq("teststar.table_skipme"),
      excludedSchemas = Seq("schema_to_exclude")))
    assert(!cfg.logClientQuery)
    assert(cfg.security === "definer")
    assert(cfg.owner === Some("test__owner"))
    assert(!cfg.viewsOnly)
    // db scalars preserved verbatim; empty `password:` is not a scalar
    assert(cfg.settings("host") === "localhost")
    assert(cfg.settings("port") === "5432")
    assert(cfg.settings("db_name") === "audit_star")
    assert(cfg.settings("ssl_mode") === "disable")
    // the parsed scope drives the same admits() semantics
    assert(cfg.admits("teststar.table_keepme"))
    assert(!cfg.admits("teststar.table_skipme"))
    assert(!cfg.admits("public.orders")) // include list restricts
  }

  test("config file loads from disk") {
    val p = java.nio.file.Files.createTempFile("audit", ".yml")
    try {
      java.nio.file.Files.writeString(p, referenceShapedYml)
      assert(AuditConfig.load(p) === AuditConfig.parse(referenceShapedYml))
    } finally java.nio.file.Files.delete(p)
  }

  test("defaults: no file settings → audit everything, definer, no query log") {
    val cfg = AuditConfig.parse("")
    assert(cfg === AuditConfig.default)
    assert(cfg.admits("any.table"))
  }

  test("required capture settings: missing changed_by hard-fails at setup") {
    // reference ensureSettingExists (audit.go:559-581): setup refuses to
    // install capture when audit_star.changed_by is unset
    val cfg = AuditConfig.parse("views_only: true")
    val e = intercept[IllegalStateException](AuditConfig.validateCapture(cfg))
    assert(e.getMessage.contains("changed_by"))
  }

  test("required capture settings: present changed_by validates unchanged") {
    val cfg = AuditConfig.parse("changed_by: app.changed_by\nhost: localhost")
    assert(AuditConfig.validateCapture(cfg) === cfg)
    // extra required keys are also enforced
    val e = intercept[IllegalStateException](
      AuditConfig.validateCapture(cfg, required = Seq("changed_by", "db_name")))
    assert(e.getMessage.contains("db_name") && !e.getMessage.contains("changed_by,"))
  }

  test("views-only rebuild refuses a config without the views_only flag") {
    val cfg = AuditConfig.parse("changed_by: app.changed_by")
    intercept[IllegalArgumentException](
      graft.audit.AuditViews.rebuild(TestSession.spark, cfg, "no_such_table"))
  }

  test("security: unknown mode is rejected at parse, not silently defaulted") {
    val ex = intercept[IllegalArgumentException] {
      AuditConfig.parse("security: elevated")
    }
    assert(ex.getMessage.contains("definer"))
    // the two reference-generated modes both parse (audit.go:854, :908)
    assert(AuditConfig.parse("security: definer").security === "definer")
    assert(AuditConfig.parse("security: invoker").security === "invoker")
  }

  test("security/owner resolve the execution principal like DEFINER/INVOKER") {
    // definer = run as the owning role (audit.go:201-215), falling back to
    // the session user; invoker = always the calling session user
    val definerOwned = AuditConfig.parse("security: definer\nowner: audit_admin")
    assert(definerOwned.executionPrincipal("alice") === "audit_admin")
    val definerUnowned = AuditConfig.parse("security: definer")
    assert(definerUnowned.executionPrincipal("alice") === "alice")
    val invokerOwned = AuditConfig.parse("security: invoker\nowner: audit_admin")
    assert(invokerOwned.executionPrincipal("alice") === "alice")
  }

  test("applyOwnership stamps the resolved principal on a written sink") {
    import graft.audit.AuditStorage
    val df = Seq((1L, 10L, "I", 5)).toDF("audit_id", "entity_id", "operation", "k")
    AuditStorage.rewriteBucketed(spark, df, "graft_owned_sink", buckets = 1)
    val cfg = AuditConfig.parse(
      """security: definer
        |owner: audit_admin
        |changed_by: app.changed_by""".stripMargin)
    val principal = AuditStorage.applyOwnership(spark, "graft_owned_sink", cfg)
    assert(principal === "audit_admin")
    val props = spark.sql("SHOW TBLPROPERTIES graft_owned_sink")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.owner") === Some("audit_admin"))
    assert(props.get("graft.security") === Some("definer"))
  }

  test("audit_grants manifest: scoped universe, full grant set, config principals") {
    val out = graft.audit.AuditQueries.auditGrants
      .fn(spark, "/root/testdata/sf0.001").collect()
    // universe is {click,error,purchase,signup,view}: app.click falls to
    // the table exclusion, tmp.view to the schema-prefix exclusion →
    // 3 admitted tables × 4 SELECT grants + 1 USAGE row
    assert(out.length === 13)
    val byKind = out.groupBy(_.getAs[String]("grant_kind")).view.mapValues(_.length).toMap
    assert(byKind === Map("select_raw" -> 3, "select_delta" -> 3,
      "select_snapshot" -> 3, "select_compare" -> 3, "usage_schema" -> 1))
    val objects = out.map(_.getAs[String]("object_name")).toSet
    assert(!objects.exists(_.contains("click")), "excluded table leaked into grants")
    assert(!objects.exists(_.startsWith("tmp")), "excluded schema leaked into grants")
    assert(objects.contains("app_audit_raw.purchase_audit"))
    assert(objects.contains("app_audit.signup_audit_compare"))
    assert(objects.contains("app_audit_raw"))
    // every row carries the config principals (set_role / grantee /
    // trigger security mode — audit.go:201, :720-747, :926)
    assert(out.forall(r => r.getAs[String]("grantee") == "analytics_ro"
      && r.getAs[String]("owner_role") == "audit_owner"
      && r.getAs[String]("security_mode") == "definer"))
  }

  test("payload truncation mirrors the trigger bounds") {
    val df = Seq("x" * 600).toDF("v")
      .select(length(AuditScope.truncateValue(col("v"))).as("lv"),
        length(AuditScope.truncateQuery(lit("q" * 1500))).as("lq"))
    val r = df.head()
    assert(r.getInt(0) === 500 && r.getInt(1) === 1000)
  }
}
