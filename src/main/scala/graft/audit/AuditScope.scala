package graft.audit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven audit scoping + payload normalization — the reference's
  * audit.yml surface (audit/audit.go:20-39) re-expressed over DataFrames.
  *
  * The reference filters which schema.table gets a trigger
  * (`included_tables` / `excluded_tables` / `excluded_schemas`,
  * audit.go:300-395); here the same rules scope which feeds/entities of a
  * multi-tenant change stream are audited. Normalization mirrors the
  * trigger's payload bounds: changed-field values truncated to 500 chars
  * (audit.go:889) and the client query to 1000 (audit.go:930).
  */
final case class AuditScope(
    includedTables: Seq[String] = Nil,
    excludedTables: Seq[String] = Nil,
    excludedSchemas: Seq[String] = Nil) {

  /** Reference isIncludedTable/isExcludedTable/isExcludedSchema combined:
    * include-list (if present) wins first, then exclusions.
    *
    * NOTE deliberately reference-faithful quirk: schema exclusion is a raw
    * prefix match on "schema.table" (the reference's
    * `strings.HasPrefix(table, schema)`, audit.go:326-334), so excluding
    * schema "tmp" also excludes "tmp2.x". Pass "tmp." to exclude exactly
    * the schema. */
  def admits(schemaTable: String): Boolean = {
    val included = includedTables.isEmpty || includedTables.contains(schemaTable)
    val excluded = excludedTables.contains(schemaTable) ||
      excludedSchemas.exists(s => schemaTable.startsWith(s))
    included && !excluded
  }

  /** Filters a change feed carrying a `tableCol` qualifier column. */
  def apply(feed: DataFrame, tableCol: String): DataFrame = {
    val c = col(tableCol)
    val inc =
      if (includedTables.isEmpty) lit(true) else c.isin(includedTables: _*)
    val exc = (if (excludedTables.isEmpty) lit(false)
               else c.isin(excludedTables: _*)) ||
      excludedSchemas.map(s => c.startsWith(s)).foldLeft(lit(false))(_ || _)
    feed.filter(inc && !exc)
  }
}

object AuditScope {
  /** Reference value-truncation bound (audit.go:889). */
  val ValueLimit = 500
  /** Reference client-query truncation bound (audit.go:930). */
  val QueryLimit = 1000

  def truncateValue(c: Column): Column = substring(c, 1, ValueLimit)
  def truncateQuery(c: Column): Column = substring(c, 1, QueryLimit)
}
