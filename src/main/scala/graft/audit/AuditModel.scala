package graft.audit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical feed→audit mappings shared by the batch (AuditQueries.log)
  * and streaming (EventStream.readFeed) paths — one definition so the two
  * paths cannot desynchronize. */
object AuditModel {

  /** Operation class of a change event — the reference's
    * `substring(TG_OP,1,1)` (audit.go:892): I(nsert) / U(pdate) /
    * D(elete). */
  val operation: Column =
    when(col("event_type") === "signup", "I")
      .when(col("event_type") === "error", "D")
      .otherwise("U")
}
