package graft.audit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's views-only mode (`auditViewsOnly`, audit/audit.go:516;
  * config flag `views_only`, audit.go:34): regenerate every analytical
  * view over an audit table that ALREADY EXISTS, without touching capture.
  * The reference uses it to upgrade view definitions in place against the
  * accumulated audit history.
  *
  * Spark-native form: the "existing audit table" is a bucketed,
  * sort-ordered parquet sink (AuditStorage — the btree-equivalent access
  * path), and the rebuild derives delta + snapshot + compare columns by
  * reading ONLY that sink. Because the scan's bucketing already satisfies
  * the window's required distribution, the whole rebuild plans with zero
  * data shuffles — the only exchange in the oracled op is the contractual
  * output ORDER BY. At 100 TB that means re-deriving every view over the
  * full history costs one pass over the sink, no redistribution.
  */
object AuditViews {

  /** Rebuilds the reconstruction views over the written sink `table`.
    * Reads nothing but the sink; capture is untouched (the views_only
    * contract). The config must opt in via `views_only: true` and passes
    * required-capture-settings validation first (audit.go:559-581). */
  def rebuild(spark: SparkSession, cfg: AuditConfig, table: String,
      pkCol: String = "entity_id", seqCol: String = "audit_id"): DataFrame = {
    require(cfg.viewsOnly,
      "AuditViews.rebuild requires views_only: true (audit.go:516 contract)")
    AuditConfig.validateCapture(cfg)
    val alg = AuditLog(pkCol, seqCol)
    val sink = AuditStorage.read(spark, table)
    // compare() derives state_* (snapshot) and old_/new_state_* (compare)
    // in one stacked window pass; delta old/new of the raw payload rides
    // the same partitioning.
    alg.delta(alg.compare(sink, Seq("k", "val")), Seq("k", "val"))
  }
}
