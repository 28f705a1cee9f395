package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation

/** Design bootstrap (B1-B8): the reference infers table designs from
  * upstream catalogs (`pg_class`/`pg_attribute`/`pg_index`/`pg_depend`,
  * /root/reference/python/etl/design/bootstrap.py:27-640). In Spark
  * the same information comes from the catalog + the analyzer, and
  * the reference's EXPLAIN-text scraping (B6) collapses into plan
  * introspection. */
object Bootstrap {

  // ------------------------------------------------------------- B5
  /** Dependencies of a transform query from its PARSED plan: every
    * relation reference, without executing or even analyzing against
    * live tables (bootstrap.py:182-205's pg_depend lookup; the
    * EXPLAIN fallback B6 at bootstrap.py:208-278 is unnecessary —
    * the parser sees every reference, however nested). */
  def dependenciesOf(spark: SparkSession, query: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
    val ctes = scala.collection.mutable.Set[String]()
    val rels = scala.collection.mutable.Set[String]()
    // Explicit recursion: plan.collect alone misses CTE definitions
    // (innerChildren of UnresolvedWith) and subquery-expression plans
    // (EXISTS/IN/scalar subqueries live inside expressions).
    def walk(plan: LogicalPlan): Unit = plan.foreach { node =>
      node match {
        case w: UnresolvedWith =>
          w.cteRelations.foreach { case (name, _, _) => ctes += name.toLowerCase }
          w.cteRelations.foreach { case (_, sub, _) => walk(sub) }
        case r: UnresolvedRelation =>
          rels += r.multipartIdentifier.map(_.toLowerCase).mkString(".")
        case _ => ()
      }
      node.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => walk(sq.plan)
        case _ => ()
      })
    }
    walk(spark.sessionState.sqlParser.parsePlan(query))
    (rels -- ctes).toSeq.sorted
  }

  /** Rewrite relation references in a query's TEXT using the PARSED
    * plan (T5's staging rewrite; SURVEY §7.3). The reference
    * regex-rewrites `schema.table` tokens, which can corrupt string
    * literals containing a dependency name (load.py:221-245's known
    * flaw). Here every `UnresolvedRelation`'s parser `Origin` gives
    * the exact [start, stop] character span of the reference in the
    * original text, and the mapped names are spliced in back-to-front
    * — a string literal is structurally unreachable, and the output
    * is still SQL text (required for `CREATE VIEW ... AS`, where a
    * LogicalPlan cannot be stored). CTE names shadow dependencies,
    * exactly as in [[dependenciesOf]]. */
  def rewriteReferences(spark: SparkSession, query: String,
                        mapping: Map[String, TableName]): String = {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
    val ctes = scala.collection.mutable.Set[String]()
    val spans = scala.collection.mutable.Buffer[(Int, Int, String)]()
    def walk(plan: LogicalPlan): Unit = plan.foreach { node =>
      node match {
        case w: UnresolvedWith =>
          // register every sibling name BEFORE walking any body: a CTE
          // may reference one defined after it in the same WITH list
          w.cteRelations.foreach { case (name, _, _) => ctes += name.toLowerCase }
          w.cteRelations.foreach { case (_, sub, _) => walk(sub) }
        case r: UnresolvedRelation =>
          val id = r.multipartIdentifier.map(_.toLowerCase).mkString(".")
          if (!ctes.contains(id))
            for {
              target <- mapping.get(id)
              s <- r.origin.startIndex
              e <- r.origin.stopIndex
            } spans += ((s, e, target.quoted))
        case _ => ()
      }
      node.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => walk(sq.plan)
        case _ => ()
      })
    }
    walk(spark.sessionState.sqlParser.parsePlan(query))
    spans.sortBy(-_._1).foldLeft(query) { case (q, (s, e, rep)) =>
      q.substring(0, s) + rep + q.substring(e + 1)
    }
  }

  // ------------------------------------------------------------- B1
  /** Table discovery (bootstrap.py:27-82): list a database's tables,
    * filtered by allow/deny glob selectors. */
  def discoverTables(spark: SparkSession, database: String,
                     allow: TableSelector = TableSelector.all,
                     deny: TableSelector = TableSelector(Seq.empty)): Seq[TableName] = {
    import scala.jdk.CollectionConverters._
    spark.catalog.listTables(database).collectAsList().asScala.toSeq
      .filter(_.tableType != "VIEW")
      .map(t => TableName(database, t.name))
      .filter(allow.matches)
      .filterNot(t => deny.patterns.nonEmpty && deny.matches(t))
  }

  // ------------------------------------------------------- B2+B3+B8
  /** Design generation for a source table from its live schema
    * (B2 attribute fetch + B3 type mapping; bootstrap.py:281-316). */
  def designForSource(spark: SparkSession, table: TableName): TableDesign = {
    val schema = spark.table(table.quoted).schema
    TableDesign(
      name = table,
      sourceName = table.schema,
      columns = schema.fields.toSeq.map { f =>
        val (generic, sqlType) = TableDesign.sparkToGeneric(f.dataType)
        ColumnDef(f.name, generic, sqlType, sourceSqlType = sqlType,
          notNull = !f.nullable)
      })
  }

  /** CTAS/VIEW design from a query (B8, bootstrap.py:572-640): the
    * reference creates a temp view and reads the catalog back; here
    * the analyzer gives the schema without touching the catalog. */
  def designFromQuery(spark: SparkSession, name: TableName, query: String,
                      asView: Boolean = false): TableDesign = {
    val schema = spark.sql(query).schema  // analysis only, not executed
    val deps = dependenciesOf(spark, query).map(TableName.parse)
    if (asView)
      TableDesign(name, "VIEW",
        schema.fields.toSeq.map(f => ColumnDef(f.name)),
        dependsOn = deps, query = query)
    else
      TableDesign(name, "CTAS",
        schema.fields.toSeq.map { f =>
          val (generic, sqlType) = TableDesign.sparkToGeneric(f.dataType)
          ColumnDef(f.name, generic, sqlType, notNull = !f.nullable)
        },
        dependsOn = deps, query = query)
  }

  // ------------------------------------------------------------- B7
  /** Merge a freshly bootstrapped design with an existing one
    * (bootstrap.py:319-399): keep the human-authored parts (identity
    * flags, expressions, constraints), adopt upstream type changes,
    * widen int → long without complaint, and report every change. */
  def mergeDesigns(existing: TableDesign, bootstrapped: TableDesign)
      : (TableDesign, Seq[String]) = {
    val warnings = scala.collection.mutable.Buffer[String]()
    val bootCols = bootstrapped.columns.map(c => c.name -> c).toMap
    val merged = existing.columns.map { old =>
      bootCols.get(old.name) match {
        case None =>
          warnings += s"column '${old.name}' no longer exists upstream"
          old
        case Some(fresh) =>
          val widened = old.tpe == "int" && fresh.tpe == "long"
          if (fresh.tpe != old.tpe && !widened)
            warnings += s"column '${old.name}' type changed: ${old.tpe} -> ${fresh.tpe}"
          old.copy(
            tpe = fresh.tpe, sqlType = fresh.sqlType,
            sourceSqlType = fresh.sourceSqlType,
            notNull = fresh.notNull)
      }
    }
    val newCols = bootstrapped.columns.filterNot(c =>
      existing.columns.exists(_.name == c.name))
    newCols.foreach(c => warnings += s"new upstream column '${c.name}' added")
    (existing.copy(columns = merged ++ newCols), warnings.toSeq)
  }

  // ------------------------------------------------------------- B4
  /** Constraint fetch (bootstrap.py:123-179): the reference reads
    * `pg_index` for PK/unique; the JDBC-standard equivalent is
    * `DatabaseMetaData.getPrimaryKeys`, ordered by KEY_SEQ. */
  def fetchPrimaryKeys(url: String, table: String,
                       props: java.util.Properties = new java.util.Properties)
      : Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getPrimaryKeys(null, null, table)
      val cols = scala.collection.mutable.Buffer[(Short, String)]()
      while (rs.next())
        cols += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME").toLowerCase))
      cols.sortBy(_._1).map(_._2).toSeq
    } finally conn.close()
  }

  def constraintsFromJdbcMetadata(pks: Seq[String]): Seq[Constraint] =
    if (pks.nonEmpty) Seq(Constraint("primary_key", pks)) else Seq.empty
}
