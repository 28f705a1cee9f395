package graft.etl

/** Table naming and selection, re-expressed for the Spark catalog
  * (reference: /root/reference/python/etl/names.py).
  *
  * A relation is identified as `schema.table` (case-insensitive,
  * stored lowercase, names.py:31-211). Schemas occupy one of three
  * *positions* in the warehouse lifecycle (names.py:21-28):
  * standard, staging (`etl_staging\$schema`), backup
  * (`etl_backup\$schema`). The staging/backup prefix convention is
  * preserved verbatim; in Spark these are catalog databases.
  */
object SchemaPosition extends Enumeration {
  val Standard, Staging, Backup = Value
}

/** `schema.table`; a single-part name (schema = "") is a session-level
  * relation such as a temp view — legal as a dependency, not as a
  * managed relation. */
final case class TableName(schema: String, table: String) {
  def identifier: String = if (schema.isEmpty) table else s"$schema.$table"

  /** The schema name at a lifecycle position (names.py:89-94). The
    * reference separator is `$` (`etl_staging$schema`); Spark's
    * catalog only allows `[A-Za-z0-9_]` in database names, so the
    * engine encodes the same convention as `etl_staging__schema`. */
  def inPosition(pos: SchemaPosition.Value): TableName = pos match {
    case SchemaPosition.Standard => this
    case SchemaPosition.Staging  => TableName(s"etl_staging__$schema", table)
    case SchemaPosition.Backup   => TableName(s"etl_backup__$schema", table)
  }

  /** Spark-SQL-quoted form. */
  def quoted: String = if (schema.isEmpty) s"`$table`" else s"`$schema`.`$table`"

  def isPgCatalog: Boolean = schema == "pg_catalog"

  /** Unmanaged = a schema outside the warehouse's managed set; the
    * DAG keeps such dependencies but never waits on them
    * (relation.py:527-547). */
  def isManaged(managedSchemas: Set[String]): Boolean =
    managedSchemas.contains(schema)

  override def toString: String = identifier
}

object TableName {
  def parse(s: String): TableName = s.split('.') match {
    case Array(sc, t) => TableName(sc.toLowerCase, t.toLowerCase)
    case Array(t)     => TableName("", t.toLowerCase)
    case _ => throw new IllegalArgumentException(
      s"expected [schema.]table, got '$s'")
  }
}

/** Glob-based relation selection (names.py:360-553). A pattern is
  * `schema.table`, `schema` (all tables in it), or `*`; both parts
  * accept `*` and `?` wildcards. An empty selector matches everything.
  */
final case class TableSelector(patterns: Seq[String]) {
  private val compiled: Seq[(String, String)] = patterns.map { p =>
    p.split('.') match {
      case Array(sc, t) => (sc.toLowerCase, t.toLowerCase)
      case Array(sc)    => (sc.toLowerCase, "*")
      case _ => throw new IllegalArgumentException(s"bad pattern '$p'")
    }
  }

  private def globToRegex(g: String): String =
    "(?s)" + g.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  def matches(name: TableName): Boolean =
    compiled.isEmpty || compiled.exists { case (sp, tp) =>
      name.schema.matches(globToRegex(sp)) && name.table.matches(globToRegex(tp))
    }
}

object TableSelector {
  val all: TableSelector = TableSelector(Seq.empty)
}
