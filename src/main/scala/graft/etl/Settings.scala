package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Raised for config-plane user errors (missing setting, unknown
  * template, duplicate settings file) — the analog of the reference's
  * InvalidArgumentError / MissingValueTemplateError. */
final class SettingsError(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** The settings subsystem — the reference's config plane
  * (config/__init__.py:156-177 flatten, :222-228 deep-merge,
  * :303-308 date injection; config/settings.py show_value/show_vars):
  * YAML/JSON settings files from `--config` directories deep-merged
  * in filename order onto the packaged defaults, then FLATTENED to
  * dotted names (`graft_settings.load.max_concurrency`) for lookup,
  * display, and `${name}` template substitution.
  *
  * Driver-side metadata only — nothing here touches a DataFrame, so
  * the config plane adds zero work to any query plan at any scale. */
final class Settings private (val configMap: ListMap[String, String]) {

  /** Value of one flattened setting; the default (when given) is
    * returned for an unset name, a missing name without a default is
    * a user error (settings.py:9-20 show_value contract). */
  def value(name: String, default: Option[String] = None): String =
    configMap.get(name).orElse(default).getOrElse(
      throw new SettingsError(s"setting '$name' has no value"))

  def isSet(name: String): Boolean = configMap.contains(name)

  def intValue(name: String, default: Option[Int] = None): Int =
    value(name, default.map(_.toString)).toInt

  /** `show_vars` (settings.py:23-45): all settings, or those matching
    * any of the fnmatch-style glob `patterns`; a pattern matching
    * nothing is a user error. */
  def showVars(patterns: Seq[String] = Seq.empty): String = {
    val keys =
      if (patterns.isEmpty) configMap.keys.toSeq.sorted
      else {
        val selected = patterns.flatMap { p =>
          val rx = Settings.globToRegex(p)
          val hits = configMap.keys.filter(rx.matches(_)).toSeq
          if (hits.isEmpty)
            throw new SettingsError(s"no matching setting for '$p'")
          hits
        }
        selected.distinct.sorted
      }
    Settings.formatLines(keys.map(k => (k, configMap(k))), ("Name", "Value"))
  }
}

object Settings {

  private val yaml = new ObjectMapper(new YAMLFactory())

  /** Load settings: packaged defaults
    * (resources/graft/default_settings.yaml), then every settings
    * file (.yaml, .yml, or .json) in each `configDir` merged in
    * sorted filename order. A filename appearing in two directories
    * is an error (config/__init__.py:335-360 gather_setting_files). */
  def load(configDirs: Seq[String] = Seq.empty): Settings = {
    val merged = defaultsNode()
    val seen = scala.collection.mutable.Map[String, String]()
    configDirs.foreach { dir =>
      val d = Paths.get(dir)
      if (!Files.isDirectory(d))
        throw new SettingsError(s"config directory not found: '$dir'")
      settingsFilesIn(d).foreach { f =>
        val base = f.getFileName.toString
        seen.put(base, f.toString).foreach { prior =>
          throw new SettingsError(
            s"found configuration file in multiple locations: '$base' " +
              s"('$prior' and '$f')")
        }
        val text = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        val node = try yaml.readTree(text) catch {
          case e: Exception =>
            throw new SettingsError(s"cannot parse settings file '$f'", e)
        }
        if (node != null && node.isObject) deepMerge(merged, node)
      }
    }
    injectDates(merged)
    new Settings(flatten(merged))
  }

  private[etl] def settingsFilesIn(d: Path): Seq[Path] =
    Files.list(d).iterator.asScala
      .filter(p => {
        val n = p.getFileName.toString
        n.endsWith(".yaml") || n.endsWith(".yml") || n.endsWith(".json")
      })
      .toSeq.sortBy(_.getFileName.toString)

  private def defaultsNode(): com.fasterxml.jackson.databind.node.ObjectNode = {
    val in = getClass.getResourceAsStream("/graft/default_settings.yaml")
    require(in != null, "packaged default_settings.yaml missing")
    try yaml.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    finally in.close()
  }

  private def deepMerge(into: com.fasterxml.jackson.databind.node.ObjectNode,
                        from: JsonNode): Unit =
    from.fields.asScala.foreach { e =>
      (into.get(e.getKey), e.getValue) match {
        case (dst: com.fasterxml.jackson.databind.node.ObjectNode, src)
            if src.isObject => deepMerge(dst, src)
        case _ => into.set[JsonNode](e.getKey, e.getValue); ()
      }
    }

  /** `date.today` / `date.yesterday` in UTC, path-shaped
    * (`2017/05/16`), unless a settings file pinned them
    * (config/__init__.py:303-308). */
  private def injectDates(root: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy/MM/dd")
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val date = root.get("date") match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o
      case _ => root.putObject("date")
    }
    if (!date.has("today")) date.put("today", today.format(fmt)): Unit
    if (!date.has("yesterday")) date.put("yesterday", today.minusDays(1).format(fmt)): Unit
  }

  /** Flatten nested sections to sorted dotted names; scalar leaves
    * keep their text form, array leaves their compact JSON form
    * (config/__init__.py:156-164). */
  private def flatten(root: JsonNode): ListMap[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    def walk(prefix: String, n: JsonNode): Unit =
      n.fields.asScala.toSeq.sortBy(_.getKey).foreach { e =>
        val key = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        e.getValue match {
          case o if o.isObject => walk(key, o)
          case v if v.isTextual => out(key) = v.asText
          case v => out(key) = v.toString
        }
      }
    walk("", root)
    ListMap.from(out)
  }

  /** fnmatch-style glob (`*`, `?`, `[seq]`) → anchored regex. */
  private[etl] def globToRegex(glob: String): scala.util.matching.Regex = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c @ ('[' | ']') => sb.append(c)
      case c if "\\.^$+{}()|".contains(c) => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    val pattern = sb.append('$').toString
    // '[' / ']' pass through as regex character classes; an UNBALANCED
    // bracket is a PatternSyntaxException, which must surface as the
    // centralized user-error exit path, not a stack trace.
    try pattern.r
    catch {
      case _: java.util.regex.PatternSyntaxException =>
        throw new SettingsError(s"invalid pattern '$glob'")
    }
  }

  /** Two-column table with header + underline — the shape of the
    * reference's etl.text.format_lines output. */
  private[graft] def formatLines(rows: Seq[(String, String)],
                                 header: (String, String)): String = {
    val all = header +: rows
    val w1 = all.map(_._1.length).max
    val w2 = all.map(_._2.length).max
    val sep = ("-" * w1, "-" * w2)
    (header +: sep +: rows)
      .map { case (a, b) => a.padTo(w1, ' ') + "  " + b }
      .mkString("\n")
  }

  /** `list_tags` (commands.py:1869-1885): every tag declared across
    * the given relation designs, sorted. The reference collects tags
    * from its schema configs; designs are this engine's config plane
    * for relations, so tags live there (table_design.schema:88). */
  def listTags(relations: Seq[Relation]): Seq[String] =
    relations.flatMap(_.design.tags).distinct.sorted
}

/** Template rendering (templates/__init__.py): `${dotted.name}`
  * placeholders substituted from the flattened settings. Two
  * families: "text" (config files) and "sql" (admin queries, run
  * through run_sql). Built-in templates ship as resources; a user
  * directory with `text/` + `sql/` subdirs overrides/extends them. */
object Templates {

  /** Packaged template names per family (a jar cannot list its own
    * resources, so the index is explicit). */
  private val builtin: Map[String, Seq[String]] = Map(
    "text" -> Seq("run_banner.txt", "runtime_env.json"),
    "sql" -> Seq("compile_time.sql", "table_attributes.sql"))

  /** `${name}` with dotted/hyphenated identifiers
    * (DottedNameTemplate, templates/__init__.py:31-38); `$$` is a
    * literal dollar. A placeholder with no setting value is an
    * error naming the template. */
  private[etl] def substitute(template: String, s: Settings,
                              context: String): String = {
    val rx = ("\\$\\$|\\$\\{([_a-zA-Z][-._a-zA-Z0-9]*)\\}" +
      "|\\$([_a-zA-Z][-._a-zA-Z0-9]*)").r
    rx.replaceAllIn(template, m =>
      if (m.matched == "$$") java.util.regex.Matcher.quoteReplacement("$")
      else {
        val name = Option(m.group(1)).getOrElse(m.group(2))
        val v = s.configMap.getOrElse(name,
          throw new SettingsError(
            s"failed to render template in $context: no value for '$name'"))
        java.util.regex.Matcher.quoteReplacement(v)
      })
  }

  /** (short name, location) of every available template of a family,
    * sorted by name; user-dir templates shadow same-named built-ins
    * (templates/__init__.py:41-50). */
  def listTemplates(templateType: String,
                    userDir: Option[String] = None): Seq[(String, String)] = {
    require(templateType == "text" || templateType == "sql",
      s"template type must be text or sql, got '$templateType'")
    val fromResources = builtin(templateType).map { f =>
      stripExt(f) -> s"resource:graft/templates/$templateType/$f"
    }.toMap
    val fromUser = userDir.toSeq.flatMap { d =>
      val sub = Paths.get(d, templateType)
      if (!Files.isDirectory(sub)) Seq.empty
      else Files.list(sub).iterator.asScala
        .filter(p => !p.getFileName.toString.startsWith("README"))
        .map(p => stripExt(p.getFileName.toString) -> p.toString)
        .toSeq
    }.toMap
    (fromResources ++ fromUser).toSeq.sortBy(_._1)
  }

  private def stripExt(f: String): String = {
    val i = f.lastIndexOf('.')
    if (i < 0) f else f.substring(0, i)
  }

  private def readTemplate(templateType: String, name: String,
                           userDir: Option[String]): (String, String) = {
    val userPath = userDir.map(d => Paths.get(d, templateType))
      .filter(Files.isDirectory(_))
      .flatMap(sub => Files.list(sub).iterator.asScala
        .find(p => stripExt(p.getFileName.toString) == name))
    userPath match {
      case Some(p) =>
        (new String(Files.readAllBytes(p), StandardCharsets.UTF_8), p.toString)
      case None =>
        val file = builtin(templateType).find(f => stripExt(f) == name)
          .getOrElse(throw new SettingsError(s"template name not found: '$name'"))
        val res = s"/graft/templates/$templateType/$file"
        val in = getClass.getResourceAsStream(res)
        require(in != null, s"packaged template missing: $res")
        try (new String(in.readAllBytes(), StandardCharsets.UTF_8), res)
        finally in.close()
    }
  }

  /** Render a text template. JSON/YAML templates are re-emitted as
    * sorted JSON — pretty by default, one line with `compact`
    * (templates/__init__.py:86-108 render_string). */
  def render(s: Settings, name: String, compact: Boolean = false,
             userDir: Option[String] = None): String = {
    val (raw, location) = readTemplate("text", name, userDir)
    val rendered = substitute(raw, s, s"'$location'")
    if (!location.endsWith(".json") && !location.endsWith(".yaml") &&
        !location.endsWith(".yml")) rendered
    else {
      val node = new ObjectMapper(new YAMLFactory()).readTree(rendered)
      val m = new ObjectMapper()
        .enable(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS)
      if (compact) m.writeValueAsString(node) + "\n"
      else m.writerWithDefaultPrettyPrinter().writeValueAsString(node) + "\n"
    }
  }

  /** Render a SQL template: whitespace-cleaned, trailing `;` stripped
    * so the result composes into scripts (templates/__init__.py:
    * 111-119 render_sql). */
  def renderSql(s: Settings, name: String,
                userDir: Option[String] = None): String = {
    val (raw, location) = readTemplate("sql", name, userDir)
    substitute(raw, s, s"'$location'")
      .linesIterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
      .stripSuffix(";")
  }
}

/** `tail_logs` (logs/cloudwatch.py:45-72): print the run's log
  * records since a start time, optionally only warnings-and-above.
  * The reference tails CloudWatch streams of JSON log records; this
  * engine's durable run record is the monitor's JSON-lines event log,
  * so the tail renders those events as log lines — fail events are
  * ERROR, everything else INFO — with the same
  * `<source> <gmtime> <LEVEL> <message>` line shape (and the
  * `(metrics)` continuation line when load metrics are attached). */
object LogTail {

  def tailLogs(eventsPath: String, startMs: Long = 0L,
               warningsOnly: Boolean = false): Seq[String] =
    Monitor.readLog(eventsPath)
      .filter(_.ts.forall(_ >= startMs))
      .filter(e => !warningsOnly || e.event == "fail")
      .flatMap(renderLines(Paths.get(eventsPath).getFileName.toString, _))

  /** `--follow`: keep polling the event log, rendering each NEW event
    * as log lines, quitting after the idle timeout — the same loop
    * contract as `query_events --follow` (Monitor.followLog). */
  def followLogs(eventsPath: String, startMs: Long, warningsOnly: Boolean,
                 skip: Int, pollMs: Long, idleTimeoutMs: Long)
                (emit: String => Unit): Int = {
    val name = Paths.get(eventsPath).getFileName.toString
    Monitor.followLog(eventsPath, target = None, step = None,
      since = if (startMs > 0) Some(startMs) else None,
      skip = skip, pollMs = pollMs, idleTimeoutMs = idleTimeoutMs) { e =>
      if (!warningsOnly || e.event == "fail")
        renderLines(name, e).foreach(emit)
    }
  }

  private def renderLines(name: String, e: MonitorEvent): Seq[String] = {
    val level = if (e.event == "fail") "ERROR" else "INFO"
    val when = e.ts.map(t => java.time.Instant.ofEpochMilli(t).toString)
      .getOrElse("-")
    val what = e.event match {
      case "start" => s"${e.step} of ${e.target} started"
      case "finish" =>
        val rows = e.rowcount.map(r => s" ($r rows)").getOrElse("")
        f"${e.step} of ${e.target} finished in ${e.elapsedSeconds}%.1fs$rows"
      case "fail" =>
        s"${e.step} of ${e.target} FAILED after " +
          f"${e.elapsedSeconds}%.1fs: ${e.message.getOrElse("?")}"
      case other => s"${e.step} of ${e.target}: $other"
    }
    val main = s"$name $when $level $what"
    e.metrics match {
      case Some(m) =>
        Seq(main, s"$name $when (metrics) rows_written=${m.rowsWritten} " +
          s"bytes_read=${m.bytesRead} bytes_written=${m.bytesWritten}")
      case None => Seq(main)
    }
  }
}
