package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage: which LEAF table columns feed each output
  * column of a query. The reference stops at table-level dependency
  * introspection (`show_dependents` / `show_upstream_dependencies`,
  * commands.py:1833-1868 over the design graph); at warehouse scale
  * the question an auditor actually asks is per COLUMN — "where does
  * `revenue` come from?" — and Spark's analyzed plan already carries
  * the answer in its attribute graph, no execution needed.
  *
  * Scope (documented, test-pinned): DIRECT lineage — the transitive
  * closure of projection/aggregation/window/generator expressions.
  * Columns consulted only by filters, join conditions, or sort keys
  * influence WHICH rows appear, not a column's values, and are
  * deliberately excluded (the standard direct-vs-indirect lineage
  * split). Resolution is pure plan analysis: O(plan) driver work,
  * zero jobs, any data size. */
object Lineage {

  /** Per output column (in output order): the sorted leaf columns
    * (`table.column`) it derives from. */
  def columnLineage(df: DataFrame): Seq[(String, Seq[String])] = {
    val plan = df.queryExecution.analyzed
    val acc = collect(plan, Map.empty)
    plan.output.map(a => a.name -> acc.getOrElse(a.exprId, Set.empty).toSeq.sorted)
  }

  /** INDIRECT lineage: the leaf columns consulted by filter and join
    * conditions anywhere in the plan — they decide which ROWS flow,
    * not any column's values, so they complement [[columnLineage]]
    * rather than appearing inside it. */
  def indirectSources(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    val m = collect(plan, Map.empty)
    plan.collect {
      case f: Filter => f.condition.references.toSeq
      case j: Join => j.condition.toSeq.flatMap(_.references.toSeq)
    }.flatten
      .flatMap(a => m.getOrElse(a.exprId, Set.empty[String]))
      .distinct.sorted
  }

  /** One line per output column: `name <- t.c1, t.c2`, plus a
    * trailing row-selection line when filters/joins consult columns
    * (the CLI rendering). */
  def report(df: DataFrame): String = {
    val direct = columnLineage(df).map { case (name, srcs) =>
      val rhs = if (srcs.isEmpty) "<literal/generated>" else srcs.mkString(", ")
      s"$name <- $rhs"
    }
    val indirect = indirectSources(df)
    val tail = if (indirect.isEmpty) Seq.empty
      else Seq(s"[rows selected by] ${indirect.mkString(", ")}")
    (direct ++ tail).mkString("\n")
  }

  /** Bottom-up attribute→leaf-columns map. CTE definitions resolve
    * through `ctes` (id → the def's OWN resolved outputs + map), so
    * a `CTERelationRef`'s fresh exprIds land on the def's lineage
    * positionally. */
  private def collect(plan: LogicalPlan,
                      ctes: Map[Long, (Seq[Attribute], Map[ExprId, Set[String]])])
      : Map[ExprId, Set[String]] = plan match {
    // An alias is the NAMING boundary: columns whose sources are
    // still anonymous placeholders (`<Relation>...`, `<LocalRelation>
    // ...` — i.e. this alias is the nearest name the user knows them
    // by) rebind to `alias.column`; columns already traced to a named
    // table pass through unchanged, which is what makes lineage look
    // THROUGH views and named subqueries down to base tables. Columns
    // with NO sources (literals) stay empty — an alias doesn't turn a
    // constant into data.
    case s: SubqueryAlias =>
      val table = (s.identifier.qualifier :+ s.identifier.name)
        // drop the catalog prefix — designs name tables schema.table
        .dropWhile(_ == "spark_catalog").mkString(".")
      val childMap = collect(s.child, ctes)
      s.output.foldLeft(childMap) { (m, a) =>
        val srcs = m.getOrElse(a.exprId, Set.empty[String])
        if (srcs.nonEmpty && srcs.forall(_.startsWith("<")))
          m.updated(a.exprId, Set(s"$table.${a.name}"))
        else m
      }
    // A View's output attrs can be re-minted by the analyzer: map
    // them positionally onto the view body's outputs.
    case v: View =>
      val m = collect(v.child, ctes)
      m ++ v.output.zip(v.child.output).collect {
        case (o, i) if o.exprId != i.exprId =>
          o.exprId -> m.getOrElse(i.exprId, Set.empty[String])
      }
    case w: WithCTE =>
      val defs = w.cteDefs.foldLeft(ctes) { (m, d) =>
        m + (d.id -> (d.child.output, collect(d.child, m)))
      }
      // def-internal bindings ride along so plan-wide passes (e.g.
      // indirect sources) can resolve attrs inside CTE bodies too
      defs.values.map(_._2).foldLeft(collect(w.plan, defs))(_ ++ _)
    case r: CTERelationRef =>
      ctes.get(r.cteId).map { case (defOut, defMap) =>
        r.output.zip(defOut).map { case (out, in) =>
          out.exprId -> defMap.getOrElse(in.exprId, Set.empty[String])
        }.toMap
      }.getOrElse(Map.empty)
    // Set operations merge lineage POSITIONALLY across children.
    case u: Union =>
      val childMaps = u.children.map(c => (c.output, collect(c, ctes)))
      val merged = u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> childMaps.flatMap { case (out, m) =>
          m.getOrElse(out(i).exprId, Set.empty[String])
        }.toSet
      }.toMap
      // union output REUSES the first child's exprIds — merged
      // entries must win over that child's own map
      childMaps.map(_._2).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _) ++ merged
    // A leaf with no alias (inline LocalRelation, range(), ...) has
    // no stable table name: label by node.
    case l: LeafNode =>
      l.output.map(a => a.exprId -> Set(s"<${l.nodeName}>.${a.name}")).toMap
    case other =>
      val fromChildren = other.children
        .map(collect(_, ctes)).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
      def derive(nes: Seq[NamedExpression]): Map[ExprId, Set[String]] =
        nes.map { ne =>
          ne.exprId -> ne.references.toSeq
            .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty[String])).toSet
        }.toMap
      val own = other match {
        case p: Project => derive(p.projectList)
        case a: Aggregate => derive(a.aggregateExpressions)
        case w: Window => derive(w.windowExpressions)
        case e: Expand => // GROUPING SETS / ROLLUP / CUBE projections
          e.projections.foldLeft(Map.empty[ExprId, Set[String]]) { (m, proj) =>
            e.output.zip(proj).foldLeft(m) { case (m2, (out, ex)) =>
              val srcs = ex.references.toSeq
                .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty[String])).toSet
              m2.updated(out.exprId, m2.getOrElse(out.exprId, Set.empty) ++ srcs)
            }
          }
        case g: Generate =>
          val srcs = g.generator.references.toSeq
            .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty[String])).toSet
          g.generatorOutput.map(a => a.exprId -> srcs).toMap
        // Filter/Join/Sort/Limit/Distinct/RepartitionByExpression/...:
        // attributes pass through unchanged (their exprIds survive).
        case _ => Map.empty[ExprId, Set[String]]
      }
      fromChildren ++ own
  }
}
