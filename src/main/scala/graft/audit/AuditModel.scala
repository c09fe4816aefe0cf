package graft.audit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical feed→audit mappings shared by the batch (AuditQueries.log)
  * and streaming (EventStream.readFeed) paths — one definition so the two
  * paths cannot desynchronize. The oracle twins are emitted from the same
  * object so the SQL cannot drift either.
  */
object AuditModel {

  /** Operation class of a change event — the reference's
    * `substring(TG_OP,1,1)` (audit.go:892) over the full I/U/D/T domain.
    * TRUNCATE is statement-level in the reference (its own trigger,
    * audit.go:854-951); here a deterministic slice of the delete-class
    * feed stands in for truncate statements. */
  val operation: Column =
    when(col("event_type") === "signup", "I")
      .when(col("event_type") === "error",
        when(col("event_id") % 50 === 0, "T").otherwise("D"))
      .otherwise("U")

  /** DuckDB/ANSI twin of [[operation]] (raw feed column names). */
  val operationSql: String =
    """CASE event_type WHEN 'signup' THEN 'I'
      |      WHEN 'error' THEN (CASE WHEN event_id % 50 = 0 THEN 'T' ELSE 'D' END)
      |      ELSE 'U' END""".stripMargin

  /** Operations after which the row no longer exists: delete and truncate.
    * The reference's compare view NULLs new_* for both (audit.go:1362). */
  val terminalOps: Seq[String] = Seq("D", "T")

  /** The capture metadata the reference's trigger records alongside every
    * change (audit.go:773-816): who changed it, as which db role, from
    * where, running what statement. The driver feed carries none of these,
    * so they are synthesized deterministically from feed columns — the
    * same arithmetic on both engines — which keeps the metadata analytics
    * oracle-checkable. client_query is bounded by the reference's
    * 1000-char truncation (audit.go:930). */
  val changedBy: Column  = concat(lit("agent_"), (col("user_id") % 7).cast("string"))
  val dbUser: Column     = concat(lit("db_"), (col("event_id") % 5).cast("string"))
  val clientAddr: Column = concat(lit("10."), (col("event_id") % 4).cast("string"),
    lit("."), (col("user_id") % 200).cast("string"),
    lit("."), (lit(1) + col("event_id") % 250).cast("string"))
  val clientPort: Column = (lit(49152) + col("event_id") % 16384).cast("long")
  val clientQuery: Column = AuditScope.truncateQuery(
    concat(lit("UPDATE app.entity SET props = '"), col("props"),
      lit("' WHERE id = "), col("user_id").cast("string")))

  /** The reference's `audit_star.change_reason` runtime parameter
    * (docs/deployment.md:17: `ALTER DATABASE … SET audit_star.change_reason`
    * alongside `changed_by`) — a session-scoped free-text "why" stamped on
    * every capture while set, NULL for sessions that never SET the GUC.
    * Synthesized deterministically: one third of sessions run with a
    * reason (event_id % 3), drawn from a small operational vocabulary
    * keyed by the acting principal (user_id). */
  val changeReason: Column =
    when(col("event_id") % 3 === 0,
      element_at(
        array(lit("backfill"), lit("migration"), lit("manual_fix"),
          lit("ticket_sync")),
        (col("user_id") % 4 + 1).cast("int")))

  /** DuckDB twins of the metadata synthesis (raw feed column names). */
  val changedBySql: String  = "'agent_' || (user_id % 7)"
  val dbUserSql: String     = "'db_' || (event_id % 5)"
  val clientAddrSql: String =
    "'10.' || (event_id % 4) || '.' || (user_id % 200) || '.' || (1 + event_id % 250)"
  val clientPortSql: String = "49152 + event_id % 16384"
  val clientQuerySql: String =
    s"substr('UPDATE app.entity SET props = ''' || props || ''' WHERE id = ' || user_id, 1, ${AuditScope.QueryLimit})"
  val changeReasonSql: String =
    """CASE WHEN event_id % 3 = 0 THEN
      |      (CASE user_id % 4 WHEN 0 THEN 'backfill' WHEN 1 THEN 'migration'
      |            WHEN 2 THEN 'manual_fix' ELSE 'ticket_sync' END)
      |      END""".stripMargin
}
