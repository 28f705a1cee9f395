package graft.etl

/** DDL generation (T8, Q3): design → executable Spark `CREATE TABLE`
  * plus the declarative metadata Spark has no clause for
  * (/root/reference/python/etl/dialect/redshift.py:28-201). The
  * reference emits Redshift DDL with encodings, NOT NULL, FK
  * references, PK/UNIQUE constraints, DISTSTYLE/SORTKEY; the Spark
  * mapping:
  *
  *  - column encodings (T9) → parquet does this automatically: no-op,
  *    recorded as comments
  *  - constraints → table properties (enforced post-load by C1)
  *  - distribution (distkey) → a bucketing/repartition hint property
  *  - sort keys → sortWithinPartitions hint property
  */
object Ddl {

  def createTableSql(design: TableDesign, ifNotExists: Boolean = false): String = {
    val cols = design.activeColumns.map { c =>
      val nn = if (c.notNull) " NOT NULL" else ""
      s"  ${c.name} ${c.dataType.sql}$nn"
    }.mkString(",\n")
    val props = Seq(
      design.constraints.map(ct =>
        s"'graft.constraint.${ct.kind}' = '${ct.columns.mkString(",")}'"),
      design.distribution.map(d => s"'graft.distkey' = '${d.mkString(",")}'").toSeq,
      design.distStyle.map(s => s"'graft.diststyle' = '$s'").toSeq,
      if (design.sortKeys.nonEmpty)
        Seq(s"'graft.sortkey' = '${design.sortKeys.mkString(",")}'")
      else Seq.empty,
      if (design.interleavedSort.nonEmpty)
        Seq(s"'graft.interleaved_sortkey' = '${design.interleavedSort.mkString(",")}'")
      else Seq.empty).flatten
    val tblProps =
      if (props.nonEmpty) s"\nTBLPROPERTIES (${props.mkString(", ")})" else ""
    val partitioned =
      if (design.partitionBy.nonEmpty)
        s"\nPARTITIONED BY (${design.partitionBy.mkString(", ")})"
      else ""
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine${design.name.quoted} (\n$cols\n) USING parquet$partitioned$tblProps"
  }

  def createViewSql(design: TableDesign): String =
    s"CREATE OR REPLACE VIEW ${design.name.quoted} AS ${design.query.trim}"

  /** The `show_ddl` command (commands.py:1603-1623). */
  def showDdl(design: TableDesign): String =
    if (design.isView) createViewSql(design) else createTableSql(design)
}
