package graft.audit

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** audit.yml-equivalent configuration (reference audit/audit.go:19-39 and
  * audit.yml.example): scoping lists plus the capture toggles. Parsed from
  * the same file shape the reference reads, so a user migrating an
  * audit.yml points this loader at it unchanged.
  *
  * The parser is a deliberate YAML *subset* — scalars (`key: value`),
  * string lists (`key:` + `- item` lines), comments and blank lines —
  * which covers the reference's entire config surface without a yaml
  * dependency (build has zero egress; no new libraryDependencies).
  */
final case class AuditConfig(
    scope: AuditScope,
    logClientQuery: Boolean,
    security: String,
    owner: Option[String],
    viewsOnly: Boolean,
    /** Remaining scalar settings (host, port, db_name, …) verbatim. */
    settings: Map[String, String]) {

  /** The scoping predicate, delegated (audit.go:300-395). */
  def admits(schemaTable: String): Boolean = scope.admits(schemaTable)

  /** Execution principal under the configured security mode — the analog
    * of SECURITY DEFINER/INVOKER on the reference's trigger functions
    * (audit.go:854, :908) combined with the audit objects' owner role
    * (audit.go:201-215): `definer` runs capture as the owning role
    * (`owner:`, falling back to the session user when none is set);
    * `invoker` always runs as the calling session user. A single-principal
    * Spark deployment collapses both to the session user unless `owner:`
    * is set — but the settings are validated and surfaced
    * (AuditStorage.applyOwnership stamps them on every sink), never
    * silently swallowed. */
  def executionPrincipal(sessionUser: String): String =
    if (security == "definer") owner.getOrElse(sessionUser) else sessionUser
}

object AuditConfig {

  val default: AuditConfig =
    AuditConfig(AuditScope(), logClientQuery = false, security = "definer",
      owner = None, viewsOnly = false, settings = Map.empty)

  /** Settings capture cannot run without — the analog of the reference's
    * `audit_star.changed_by` database setting, whose absence hard-fails
    * setup (`ensureSettingExists`, audit.go:559-581). */
  val RequiredCaptureSettings: Seq[String] = Seq("changed_by")

  /** Validates that every required capture setting is present; returns the
    * config unchanged or throws, mirroring the reference's fail-at-setup
    * posture (a capture path that silently records NULL changed_by would
    * poison the whole audit history). */
  def validateCapture(cfg: AuditConfig,
      required: Seq[String] = RequiredCaptureSettings): AuditConfig = {
    val missing = required.filterNot(cfg.settings.contains)
    if (missing.nonEmpty) throw new IllegalStateException(
      s"missing required capture setting(s): ${missing.mkString(", ")} " +
        "(reference ensureSettingExists, audit.go:559-581)")
    cfg
  }

  def load(path: Path): AuditConfig = parse(
    Files.readAllLines(path).asScala.toSeq)

  def parse(text: String): AuditConfig = parse(text.linesIterator.toSeq)

  /** Line-based YAML-subset parse; unknown keys land in `settings` so a
    * richer reference config still round-trips. */
  def parse(lines: Seq[String]): AuditConfig = {
    def strip(l: String): String = {
      // drop comments, but not a '#' inside a quoted value
      val i = l.indexOf('#')
      val cut = if (i >= 0 && l.take(i).count(_ == '"') % 2 == 0) l.take(i) else l
      cut.replaceAll("\\s+$", "")
    }
    def unquote(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
      else t
    }
    val lists = scala.collection.mutable.Map.empty[String, Vector[String]]
    val scalars = scala.collection.mutable.Map.empty[String, String]
    var curList: Option[String] = None
    lines.map(strip).filter(_.nonEmpty).foreach { line =>
      val item = line.trim
      if (item.startsWith("- ") || item == "-") {
        curList match {
          case Some(k) =>
            val v = unquote(item.drop(1))
            if (v.nonEmpty) lists(k) = lists.getOrElse(k, Vector.empty) :+ v
          case None =>
            throw new IllegalArgumentException(s"list item outside a list: $line")
        }
      } else {
        val colon = line.indexOf(':')
        if (colon < 0)
          throw new IllegalArgumentException(s"unparseable config line: $line")
        val k = line.take(colon).trim
        val v = unquote(line.drop(colon + 1))
        if (v.isEmpty) { curList = Some(k); lists.getOrElseUpdate(k, Vector.empty) }
        else { curList = None; scalars(k) = v }
      }
    }
    def list(k: String): Seq[String] = lists.getOrElse(k, Vector.empty)
    def bool(k: String, dflt: Boolean): Boolean =
      scalars.get(k).map(_.equalsIgnoreCase("true")).getOrElse(dflt)
    val scopeKeys = Set("included_tables", "excluded_tables", "excluded_schemas")
    val captureKeys = Set("log_client_query", "security", "owner", "views_only")
    // fail at parse, not at first use: an unknown security mode silently
    // defaulting would be the exact trap the reference avoids by only
    // generating DEFINER or INVOKER function bodies (audit.go:854, :908)
    val security = scalars.getOrElse("security", "definer")
    if (!Set("definer", "invoker")(security))
      throw new IllegalArgumentException(
        s"security: must be 'definer' or 'invoker' (audit.go:854/:908), got '$security'")
    AuditConfig(
      scope = AuditScope(
        includedTables = list("included_tables"),
        excludedTables = list("excluded_tables"),
        excludedSchemas = list("excluded_schemas")),
      logClientQuery = bool("log_client_query", dflt = false),
      security = security,
      owner = scalars.get("owner"),
      viewsOnly = bool("views_only", dflt = false),
      settings = scalars.toMap.removedAll(captureKeys) ++
        lists.collect { case (k, v) if !scopeKeys(k) => k -> v.mkString(",") })
  }
}
