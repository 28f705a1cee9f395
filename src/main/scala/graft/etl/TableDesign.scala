package graft.etl

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.types._

/** The table-design model: the reference's YAML design files
  * (/root/reference/python/etl/config/table_design.schema:1-242,
  * design/load.py:41-280) as case classes, with the same validation
  * rules, mapped onto Spark's `StructType`.
  *
  * `sourceName` distinguishes the three relation kinds
  * (relation.py:4-8): "CTAS" | "VIEW" | anything else = an upstream
  * source schema name.
  */
final case class ColumnDef(
    name: String,
    tpe: String = "string",              // generic type (table_design.schema:38-52)
    sqlType: String = "",                // physical type, e.g. numeric(12,2)
    sourceSqlType: String = "",
    expression: String = "",             // extract-time cast/transform (P2)
    notNull: Boolean = false,
    identity: Boolean = false,           // surrogate-key autoincrement (T2)
    skipped: Boolean = false,            // excluded everywhere (P1)
    references: Option[(String, String)] = None) { // FK: (table, column)

  /** Generic type → Spark type (SURVEY.md §1.3 mapping table). */
  def dataType: DataType = TableDesign.genericToSpark(tpe, sqlType)
}

/** One declared constraint (table_design.schema:141-190). Declarative
  * only — enforced post-load by the duplicate check (C1). */
final case class Constraint(kind: String, columns: Seq[String]) {
  require(Constraint.Kinds.contains(kind), s"unknown constraint kind '$kind'")
}
object Constraint {
  val Kinds = Set("primary_key", "natural_key", "surrogate_key", "unique")
}

/** JDBC extract tuning (table_design.schema:213-231 → S1-S6). */
final case class ExtractSettings(
    condition: String = "",
    splitBy: Option[String] = None,
    numPartitions: Option[Int] = None,
    boundaryQuery: Option[String] = None)

final case class TableDesign(
    name: TableName,
    sourceName: String,                  // "CTAS" | "VIEW" | source schema
    columns: Seq[ColumnDef],
    constraints: Seq[Constraint] = Seq.empty,
    dependsOn: Seq[TableName] = Seq.empty,
    extractSettings: Option[ExtractSettings] = None,
    query: String = "",                  // transform SELECT (CTAS/VIEW)
    distribution: Option[Seq[String]] = None,  // distkey → repartition cols
    sortKeys: Seq[String] = Seq.empty,   // sortkey → sortWithinPartitions
    tags: Seq[String] = Seq.empty,       // free-form labels (table_design.schema:88)
    partitionBy: Seq[String] = Seq.empty, // hive-style partition dirs (beyond-reference; Redshift has no partitions)
    interleavedSort: Seq[String] = Seq.empty, // INTERLEAVED SORTKEY → Z-order clustered write (table_design.schema:206)
    distStyle: Option[String] = None) { // DISTSTYLE all|auto|even (table_design.schema:194-198's enum arm)

  def isView: Boolean = sourceName == "VIEW"
  def isCtas: Boolean = sourceName == "CTAS"
  def isTransformation: Boolean = isView || isCtas
  def isSourceTable: Boolean = !isTransformation

  /** Columns that survive into the warehouse (skipped dropped — P1,
    * relation.py:333-340). */
  def activeColumns: Seq[ColumnDef] = columns.filterNot(_.skipped)

  def identityColumn: Option[ColumnDef] = activeColumns.find(_.identity)

  def toStructType: StructType =
    StructType(activeColumns.map(c =>
      StructField(c.name, c.dataType, nullable = !c.notNull)))

  /** NA default per column for the missing-dimension row (T3,
    * load.py:506-526): identity → 0, nullable → NULL, timestamp-ish →
    * epoch-zero stand-in, boolean → false, string → 'N/A', else 0. */
  def naValueSql(c: ColumnDef): String =
    if (c.identity) "0"
    else if (!c.notNull) s"CAST(NULL AS ${c.dataType.sql})"
    else c.dataType match {
      case TimestampType | TimestampNTZType => "TIMESTAMP '1970-01-01 00:00:00'"
      case DateType => "DATE '1970-01-01'"
      case BooleanType => "false"
      case StringType => "'N/A'"
      case _ => s"CAST(0 AS ${c.dataType.sql})"
    }

  /** Validate design semantics (design/load.py:116-280). Throws
    * [[TableDesignError]] on the first violation, same rule set:
    * identity ⇔ surrogate key, constraint/attribute column refs,
    * VIEW minimalism, source-table restrictions, split-by typing. */
  def validate(): Unit = {
    if (isView) {
      val tooMuch = columns.filter(c =>
        c.sqlType.nonEmpty || c.expression.nonEmpty || c.notNull ||
          c.identity || c.skipped || c.references.nonEmpty)
      if (tooMuch.nonEmpty)
        fail(s"too much information for column of a VIEW: ${tooMuch.map(_.name).mkString(", ")}")
      if (constraints.nonEmpty) fail("constraints not supported for a VIEW")
      if (extractSettings.nonEmpty) fail("extract_settings not supported for a VIEW")
      return
    }
    // identity ⇔ surrogate key (design/load.py:116-132)
    val identityCols = columns.filter(_.identity)
    identityCols.foreach { c =>
      if (!c.notNull) fail("identity column must be set to not null")
    }
    if (identityCols.size > 1) fail("only one column should have identity")
    val surrogate = constraints.filter(_.kind == "surrogate_key").flatMap(_.columns)
    if (surrogate.nonEmpty && surrogate != identityCols.map(_.name))
      fail("surrogate key must be identity column")
    // constraint column references (design/load.py:135-157)
    val valid = activeColumns.map(_.name).toSet
    for (ct <- constraints; col <- ct.columns if !valid.contains(col))
      fail(s"unknown ${ct.kind} column(s) in table constraints: $col")
    for (d <- distribution.toSeq.flatten ++ sortKeys ++ partitionBy ++
         interleavedSort if !valid.contains(d))
      fail(s"unknown attributes column(s): $d")
    // DISTSTYLE enum arm (table_design.schema:194-198): the schema's
    // oneOf makes style and distkey-list mutually exclusive by
    // construction (one YAML node is either scalar or array), so only
    // the value needs validating here.
    distStyle.foreach { s =>
      if (!Seq("all", "auto", "even").contains(s))
        fail(s"invalid distribution style '$s' (all/auto/even or a one-column list)")
    }
    // compound_sort and interleaved_sort are the two mutually
    // exclusive flavors of the sortkey attribute (table_design
    // .schema:200-210 models them as oneOf)
    if (interleavedSort.nonEmpty && sortKeys.nonEmpty)
      fail("compound_sort and interleaved_sort cannot be combined")
    // engine deviation (documented in STATUS.md): Redshift allows
    // DISTKEY + INTERLEAVED SORTKEY, but our distkey maps to Spark
    // bucketing whose sortBy requires physical columns — a derived
    // z-key column would leak into the table schema. Likewise the
    // dynamic-partition writer re-sorts rows by partition value and
    // would destroy the z-clustering. Pick one layout per table.
    if (interleavedSort.nonEmpty && distribution.exists(_.nonEmpty))
      fail("interleaved_sort and distribution cannot be combined")
    if (interleavedSort.nonEmpty && partitionBy.nonEmpty)
      fail("interleaved_sort and partition_by cannot be combined")
    // z-ordering needs a min/max-normalizable axis per column
    for (c <- activeColumns if interleavedSort.contains(c.name)) {
      val t = c.dataType.sql.toLowerCase
      val ok = Seq("int", "bigint", "smallint", "tinyint", "long",
        "float", "double", "real", "decimal", "numeric", "date",
        "timestamp").exists(t.startsWith)
      if (!ok)
        fail(s"interleaved_sort column ${c.name} has non-orderable-" +
          s"numeric type ${c.dataType.sql} (numeric/date/timestamp only)")
    }
    // partition dirs and bucket files are different physical layouts
    // of the SAME rows — combining them multiplies small files
    // (buckets × partitions) and Spark's bucketed-scan co-location
    // guarantee still requires reading every partition, so the combo
    // buys nothing at 100 TB. Pick one per table.
    if (partitionBy.nonEmpty && distribution.exists(_.nonEmpty))
      fail("partition_by and distribution cannot be combined")
    // only unique may repeat (design/load.py:188-196)
    val kinds = constraints.map(_.kind).filterNot(_ == "unique")
    if (kinds.distinct.size != kinds.size)
      fail(s"multiple constraints of type ${kinds.diff(kinds.distinct).head}")
    if (isCtas) {
      if (extractSettings.nonEmpty)
        fail("extract settings not supported for transformations")
      if (query.trim.isEmpty) fail("CTAS relation is missing its query")
    } else {
      // upstream source table (design/load.py:205-240)
      if (dependsOn.nonEmpty)
        fail(s"upstream table '${name.identifier}' has dependencies listed")
      for (ct <- constraints if ct.kind == "natural_key" || ct.kind == "surrogate_key")
        fail(s"upstream table '${name.identifier}' has unexpected ${ct.kind} constraint")
      for (es <- extractSettings; sb <- es.splitBy) {
        val col = columns.find(_.name == sb).getOrElse(
          fail(s"split-by column '$sb' does not exist"))
        if (col.skipped) fail("split-by column must not be skipped")
        if (!col.notNull) fail("split-by column must have not-null constraint")
        if (!Set("int", "long", "date", "timestamp").contains(col.tpe))
          fail(s"type of split-by column must be int, long, date or timestamp, not '${col.tpe}'")
      }
    }
  }

  private def fail(msg: String): Nothing = throw new TableDesignError(msg)
}

final class TableDesignError(msg: String) extends RuntimeException(msg)

object TableDesign {

  /** Generic type (table_design.schema:38-52) → Spark `DataType`.
    * Nested source types arrive flattened to strings by the type map
    * (default_settings.yaml:97-118) — parity with the reference. */
  def genericToSpark(tpe: String, sqlType: String = ""): DataType = tpe match {
    case "boolean"   => BooleanType
    case "date"      => DateType
    case "double"    => DoubleType
    case "float"     => FloatType
    case "int"       => IntegerType
    case "long"      => LongType
    case "string"    => StringType
    case "timestamp" => TimestampType  // UTC session ⇒ naive parity
    case "uuid"      => StringType     // varchar(36) cast (default_settings.yaml:115)
    case "decimal" =>
      val Prec = raw".*\((\d+)\s*,\s*(\d+)\).*".r
      sqlType match {
        case Prec(p, s) => DecimalType(p.toInt, s.toInt)
        case _ => DecimalType(18, 0)
      }
    case other => throw new TableDesignError(s"unknown generic type '$other'")
  }

  /** Spark type → (generic type, sql_type) — used by bootstrap (B3). */
  def sparkToGeneric(dt: DataType): (String, String) = dt match {
    case BooleanType      => ("boolean", "boolean")
    case DateType         => ("date", "date")
    case DoubleType       => ("double", "double precision")
    case FloatType        => ("float", "real")
    case IntegerType      => ("int", "integer")
    case LongType         => ("long", "bigint")
    case StringType       => ("string", "character varying(65535)")
    case TimestampType | TimestampNTZType => ("timestamp", "timestamp without time zone")
    case d: DecimalType   => ("decimal", s"numeric(${d.precision},${d.scale})")
    case other            => ("string", s"character varying(65535) /* was ${other.sql} */")
  }

  // ---------------------------------------------------------- YAML load
  private lazy val yaml = new ObjectMapper(new YAMLFactory())

  /** Parse one design document (YAML or JSON — the reference's format,
    * design/load.py:41-113). Unknown top-level/column keys are
    * rejected like the reference's JSON-schema pass. */
  def fromYaml(text: String): TableDesign = {
    val root = yaml.readTree(text)
    val knownTop = Set("name", "source_name", "columns", "constraints",
      "depends_on", "extract_settings", "query", "attributes", "description",
      "tags")
    root.fieldNames.asScala.foreach { f =>
      if (!knownTop.contains(f)) throw new TableDesignError(s"unknown design key '$f'")
    }
    def reqText(field: String): String = {
      val n = root.get(field)
      if (n == null) throw new TableDesignError(s"design is missing '$field'")
      n.asText
    }
    val name = TableName.parse(reqText("name"))
    val sourceName = reqText("source_name")
    val colsNode = root.get("columns")
    if (colsNode == null || !colsNode.isArray || colsNode.isEmpty)
      throw new TableDesignError("design needs at least one column")
    val knownColKeys = Set("name", "type", "sql_type", "source_sql_type",
      "expression", "not_null", "identity", "skipped", "references", "description")
    val columns = colsNode.elements.asScala.map { c =>
      c.fieldNames.asScala.foreach { f =>
        if (!knownColKeys.contains(f)) throw new TableDesignError(s"unknown column key '$f'")
      }
      def txt(f: String, dflt: String = "") =
        Option(c.get(f)).map(_.asText).getOrElse(dflt)
      def bool(f: String) = Option(c.get(f)).exists(_.asBoolean)
      val refs = Option(c.get("references")).map { r =>
        (r.get(0).asText, r.get(1).get(0).asText)
      }
      ColumnDef(txt("name"), txt("type", "string"), txt("sql_type"),
        txt("source_sql_type"), txt("expression"), bool("not_null"),
        bool("identity"), bool("skipped"), refs)
    }.toSeq
    val constraints = Option(root.get("constraints")).toSeq
      .flatMap(_.elements.asScala)
      .flatMap { c =>
        c.fields.asScala.map { e =>
          Constraint(e.getKey, e.getValue.elements.asScala.map(_.asText).toSeq)
        }
      }
    val dependsOn = Option(root.get("depends_on")).toSeq
      .flatMap(_.elements.asScala).map(n => TableName.parse(n.asText))
    val extract = Option(root.get("extract_settings")).map { e =>
      ExtractSettings(
        Option(e.get("condition")).map(_.asText).getOrElse(""),
        Option(e.get("split_by")).map(n =>
          if (n.isArray) n.get(0).asText else n.asText),
        Option(e.get("num_partitions")).map(_.asInt),
        Option(e.get("boundary_query")).map(_.asText))
    }
    val attrs = Option(root.get("attributes"))
    // distribution is EITHER a one-column list (distkey) or the
    // all/auto/even enum (table_design.schema:194-198's oneOf)
    val distNode = attrs.flatMap(a => Option(a.get("distribution")))
    val dist = distNode.filter(_.isArray)
      .map(_.elements.asScala.map(_.asText).toSeq)
    val distStyle = distNode.filterNot(_.isArray).map(_.asText.toLowerCase)
    // compound_sort is EITHER a column list or the auto enum
    // (table_design.schema:200-205's oneOf). SORTKEY AUTO means "the
    // engine decides" — in Spark that is the default already (parquet
    // min/max stats exist regardless of explicit sorting), so auto
    // parses to no explicit sort keys; any OTHER scalar is a typo'd
    // design and must fail loudly, not load silently unsorted.
    val sortNode = attrs.flatMap(a => Option(a.get("compound_sort")))
    sortNode.filterNot(_.isArray).map(_.asText.toLowerCase).foreach { s =>
      if (s != "auto")
        throw new TableDesignError(s"invalid compound_sort '$s' (auto or a column list)")
    }
    val sort = sortNode.toSeq
      .flatMap(s => if (s.isArray) s.elements.asScala.map(_.asText).toSeq else Seq.empty)
    val partBy = attrs.flatMap(a => Option(a.get("partition_by"))).toSeq
      .flatMap(p => if (p.isArray) p.elements.asScala.map(_.asText).toSeq else Seq.empty)
    val interleaved = attrs.flatMap(a => Option(a.get("interleaved_sort"))).toSeq
      .flatMap(s => if (s.isArray) s.elements.asScala.map(_.asText).toSeq else Seq.empty)
    val query = Option(root.get("query")).map(_.asText).getOrElse("")
    val tags = Option(root.get("tags")).toSeq
      .flatMap(t => if (t.isArray) t.elements.asScala.map(_.asText).toSeq else Seq.empty)
    TableDesign(name, sourceName, columns, constraints, dependsOn,
      extract, query, dist, sort, tags, partBy, interleaved, distStyle)
  }

  /** Load + validate, the `load_table_design` path
    * (design/load.py:41-113). */
  def load(text: String): TableDesign = {
    val d = fromYaml(text)
    d.validate()
    d
  }

  // ---------------------------------------------------------- YAML emit
  /** Serialize a design back to YAML — `save_table_design`'s format
    * (/root/reference/python/etl/design/bootstrap.py:643-676):
    * human-friendly key order (name and source first), defaults
    * omitted, VIEW columns reduced to names (bootstrap.py:608-613).
    * The transform query is NOT embedded — it belongs in the sibling
    * `.sql` file per the path convention ([[FileSets]]).
    * Round-trip contract: `fromYaml(toYaml(d)) == d.copy(query = "")`. */
  def toYaml(d: TableDesign): String = {
    val root = yaml.createObjectNode()
    root.put("name", d.name.identifier)
    root.put("source_name", d.sourceName)
    val cols = root.putArray("columns")
    d.columns.foreach { c =>
      val n = cols.addObject()
      n.put("name", c.name)
      if (!d.isView) {
        if (c.sqlType.nonEmpty) n.put("sql_type", c.sqlType)
        n.put("type", c.tpe)
        if (c.sourceSqlType.nonEmpty) n.put("source_sql_type", c.sourceSqlType)
        if (c.expression.nonEmpty) n.put("expression", c.expression)
        if (c.notNull) n.put("not_null", true)
        if (c.identity) n.put("identity", true)
        if (c.skipped) n.put("skipped", true)
        c.references.foreach { case (table, col) =>
          val r = n.putArray("references")
          r.add(table)
          r.addArray().add(col)
        }
      }
    }
    if (d.constraints.nonEmpty) {
      val cs = root.putArray("constraints")
      d.constraints.foreach(ct => ct.columns
        .foldLeft(cs.addObject().putArray(ct.kind))(_ add _))
    }
    if (d.dependsOn.nonEmpty)
      d.dependsOn.foldLeft(root.putArray("depends_on"))(
        (a, t) => a.add(t.identifier))
    if (d.distribution.nonEmpty || d.sortKeys.nonEmpty ||
        d.partitionBy.nonEmpty || d.interleavedSort.nonEmpty ||
        d.distStyle.nonEmpty) {
      val attrs = root.putObject("attributes")
      d.distribution.foreach(dist =>
        dist.foldLeft(attrs.putArray("distribution"))(_ add _))
      d.distStyle.foreach(s => { attrs.put("distribution", s); () })
      if (d.sortKeys.nonEmpty)
        d.sortKeys.foldLeft(attrs.putArray("compound_sort"))(_ add _)
      if (d.interleavedSort.nonEmpty)
        d.interleavedSort.foldLeft(attrs.putArray("interleaved_sort"))(_ add _)
      if (d.partitionBy.nonEmpty)
        d.partitionBy.foldLeft(attrs.putArray("partition_by"))(_ add _)
    }
    d.extractSettings.foreach { es =>
      val e = root.putObject("extract_settings")
      if (es.condition.nonEmpty) e.put("condition", es.condition)
      es.splitBy.foreach(sb => e.putArray("split_by").add(sb))
      es.numPartitions.foreach(n => e.put("num_partitions", n))
      es.boundaryQuery.foreach(b => e.put("boundary_query", b))
    }
    yaml.writeValueAsString(root)
  }
}
