package graft.audit

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical layout of the audit log at scale.
  *
  * The reference keeps one Postgres audit table per source table with a
  * btree on primary_key (audit.go:836). The Spark-native equivalent of
  * that access path is a *bucketed, sort-ordered* parquet table: bucketing
  * by entity pk gives every downstream reconstruction (delta / snapshot /
  * compare / current — all windows over `PARTITION BY pk ORDER BY seq`)
  * its required hash distribution straight from the scan, so the
  * per-query Exchange disappears; the in-bucket sort order turns the
  * window sort into a near-no-op merge.
  *
  * At 100 TB: bucket count is chosen once for the table (≈ total size /
  * target partition size); every audit query then runs shuffle-free, and
  * entity-keyed joins between two bucketed audit tables co-locate.
  */
object AuditStorage {

  /** Writes the audit log bucketed+sorted by entity; returns table name. */
  def writeBucketed(
      log: DataFrame, table: String, buckets: Int,
      pkCol: String = "entity_id", seqCol: String = "audit_id"): String = {
    log.write
      .mode("overwrite")
      .bucketBy(buckets, pkCol)
      .sortBy(pkCol, seqCol)
      .format("parquet")
      .saveAsTable(table)
    table
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Applies the config's ownership/security posture to a written sink —
    * the reference's `ALTER FUNCTION … OWNER TO` + SECURITY clause
    * application (audit.go:201-215, :854, :908), re-expressed as catalog
    * table properties: `graft.owner` = the execution principal the
    * config resolves (owner role under `definer`, session user under
    * `invoker`), `graft.security` = the mode itself. Returns the
    * principal so callers can log or assert it. */
  def applyOwnership(spark: SparkSession, table: String,
      cfg: AuditConfig): String = {
    val principal = cfg.executionPrincipal(spark.sparkContext.sparkUser)
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
      s"'graft.owner' = '$principal', 'graft.security' = '${cfg.security}')")
    principal
  }

  /** Idempotent (re)write of a bucketed audit sink. The in-memory catalog
    * forgets tables between JVM runs while warehouse files persist, so a
    * bare overwrite can fail on a stale non-empty location — drop both
    * first. */
  def rewriteBucketed(
      spark: SparkSession, log: DataFrame, table: String, buckets: Int,
      pkCol: String = "entity_id", seqCol: String = "audit_id"): String = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    writeBucketed(log, table, buckets, pkCol, seqCol)
  }
}
