package graft.etl

import scala.collection.mutable

final class CyclicDependencyError(msg: String) extends RuntimeException(msg)
final class InvalidSelectionError(msg: String) extends RuntimeException(msg)

/** One relation as the scheduler sees it: its design plus computed
  * order/level/required flags (reference `RelationDescription` +
  * `SortableRelationDescription`, relation.py:501-646). */
final case class Relation(
    design: TableDesign,
    executionOrder: Int = 0,
    executionLevel: Int = 0,
    isRequired: Boolean = false) {
  def name: TableName = design.name
  def identifier: String = design.name.identifier
  def dependencies: Seq[TableName] = design.dependsOn
  def isView: Boolean = design.isView
  def isTransformation: Boolean = design.isTransformation
}

/** The dependency scheduler: topological order with parallelism
  * levels, unknown/pg_catalog handling, required propagation, glob
  * selection and continue-from — the reference's
  * relation.py:501-814 re-expressed over the design model. Pure
  * Scala, no Spark. */
object Dag {

  /** Pass 1 (relation.py:518-566): drop unknown managed dependencies
    * with a warning; relations depending on pg_catalog become
    * dependent on ALL relations that have no pg_catalog dependency
    * themselves (they must build last). Returns sanitized dependency
    * sets keyed by identifier plus the warnings. */
  def sanitizeDependencies(relations: Seq[Relation])
      : (Map[String, Set[TableName]], Seq[String]) = {
    val known = relations.map(_.name).toSet
    val managedSchemas = known.map(_.schema)
    val warnings = mutable.Buffer[String]()
    val hasPgCatalog = relations.filter(_.dependencies.exists(_.isPgCatalog))
      .map(_.name).toSet
    var knownUnknowns = Set.empty[TableName]
    val sanitized0 = relations.map { r =>
      val unmanaged = r.dependencies.filterNot(_.isManaged(managedSchemas))
        .filterNot(_.isPgCatalog).toSet
      val unknowns = r.dependencies.toSet -- known -- unmanaged --
        r.dependencies.filter(_.isPgCatalog)
      if (unknowns.nonEmpty) {
        knownUnknowns ++= unknowns
        warnings += s"relation '${r.identifier}' has unknown dependencies: ${unknowns.toSeq.map(_.identifier).sorted.mkString(", ")}"
      }
      if (unmanaged.nonEmpty)
        warnings += s"relation '${r.identifier}' has unmanaged dependencies: ${unmanaged.toSeq.map(_.identifier).sorted.mkString(", ")}"
      // Keep only known managed deps; unmanaged/pg_catalog/unknown never block.
      r.identifier -> (r.dependencies.toSet & known)
    }.toMap
    // pg_catalog dependents build after everything without such deps
    // (relation.py:560-565).
    val noInternal = known -- knownUnknowns -- hasPgCatalog
    val sanitized = relations.map { r =>
      val base = sanitized0(r.identifier)
      r.identifier ->
        (if (hasPgCatalog.contains(r.name)) base ++ (noInternal - r.name) else base)
    }.toMap
    (sanitized, warnings.toSeq)
  }

  /** Pass 2 (relation.py:569-610): priority-queue topological sort
    * assigning a total `execution_order` (ties broken by input
    * position) and an `execution_level` (1 + max level of
    * dependencies; same-level relations can build in parallel).
    * Throws [[CyclicDependencyError]] when no progress is possible. */
  def orderByDependencies(relations: Seq[Relation]): Seq[Relation] = {
    val (deps, _) = sanitizeDependencies(relations)
    val n = relations.size
    val order = mutable.Map[String, Int]()
    val level = mutable.Map[String, Int]()
    // (minimumOrder, tieBreaker) priority queue — smallest first.
    implicit val ord: Ordering[(Int, Int, Relation)] =
      Ordering.by[(Int, Int, Relation), (Int, Int)](t => (t._1, t._2)).reverse
    val queue = mutable.PriorityQueue[(Int, Int, Relation)]()
    relations.zipWithIndex.foreach { case (r, i) => queue.enqueue((1, i + 1, r)) }
    var latest = 0
    while (queue.nonEmpty) {
      val (minimumOrder, tieBreaker, r) = queue.dequeue()
      if (minimumOrder > n)
        throw new CyclicDependencyError(
          "Cannot determine order, suspect cycle in DAG of dependencies")
      val rdeps = deps(r.identifier).map(_.identifier)
      if (rdeps.forall(order.contains)) {
        latest += 1
        order(r.identifier) = latest
        level(r.identifier) =
          (rdeps.map(level).maxOption.getOrElse(0)) + 1
      } else {
        queue.enqueue((math.max(latest, minimumOrder) + 1, tieBreaker, r))
      }
    }
    relations.map(r => r.copy(
      executionOrder = order(r.identifier),
      executionLevel = level(r.identifier)))
      .sortBy(_.executionOrder)
  }

  /** Mark relations feeding (transitively) into relations matched by
    * the required selector (relation.py:649-686): walk in reverse
    * execution order, expanding over dependency edges. */
  def setRequired(ordered: Seq[Relation], requiredSelector: TableSelector): Seq[Relation] = {
    val required = mutable.Set[String]()
    ordered.reverse.foreach { r =>
      if (requiredSelector.matches(r.name)) required += r.identifier
      // A relation feeding any required relation is required too.
    }
    // Reverse pass over dependency fan-in.
    var changed = true
    while (changed) {
      changed = false
      ordered.reverse.foreach { r =>
        if (!required.contains(r.identifier)) {
          val feedsRequired = ordered.exists(d =>
            required.contains(d.identifier) &&
              d.dependencies.exists(_.identifier == r.identifier))
          if (feedsRequired) { required += r.identifier; changed = true }
        }
      }
    }
    ordered.map(r => r.copy(isRequired = required.contains(r.identifier)))
  }

  /** Relations depending (directly or transitively) on the seeds;
    * input must be in execution order (relation.py:693-707). */
  def findDependents(ordered: Seq[Relation], seeds: Seq[Relation]): Seq[Relation] = {
    val inPath = mutable.Set[String](seeds.map(_.identifier): _*)
    ordered.foreach { r =>
      if (r.dependencies.exists(d => inPath.contains(d.identifier)))
        inPath += r.identifier
    }
    val seedSet = seeds.map(_.identifier).toSet
    ordered.filter(r => inPath.contains(r.identifier) && !seedSet.contains(r.identifier))
  }

  /** VIEW relations chained directly off the selected relations —
    * what a DROP TABLE .. CASCADE would take down
    * (relation.py:710-730). */
  def findImmediateViews(ordered: Seq[Relation], selector: TableSelector): Seq[Relation] = {
    val selected = ordered.filter(r => selector.matches(r.name)).map(_.identifier).toSet
    val immediate = mutable.Set[String](selected.toSeq: _*)
    ordered.foreach { r =>
      if (r.isView && r.dependencies.exists(d => immediate.contains(d.identifier)))
        immediate += r.identifier
    }
    ordered.filter(r => immediate.contains(r.identifier) && !selected.contains(r.identifier))
  }

  /** Selection in execution order with optional dependents expansion
    * and continue-from fast-forward (relation.py:733-814):
    *   - `continueFrom = "*"` or None → selected as-is
    *   - `":transformations"` → only transformations of the selection
    *   - a relation identifier → drop everything before it
    *   - a schema name → that schema's relations + all selected
    *     transformations. */
  def selectInExecutionOrder(
      relations: Seq[Relation],
      selector: TableSelector,
      includeDependents: Boolean = false,
      includeImmediateViews: Boolean = false,
      continueFrom: Option[String] = None): Seq[Relation] = {
    val ordered = orderByDependencies(relations)
    var selected = ordered.filter(r => selector.matches(r.name))
    if (selected.isEmpty) return Seq.empty
    if (includeDependents) {
      val combined = (selected ++ findDependents(ordered, selected))
        .map(_.identifier).toSet
      selected = ordered.filter(r => combined.contains(r.identifier))
    } else if (includeImmediateViews) {
      val combined = (selected ++ findImmediateViews(ordered, selector))
        .map(_.identifier).toSet
      selected = ordered.filter(r => combined.contains(r.identifier))
    }
    continueFrom match {
      case None | Some("*") => selected
      case Some(":transformations") | Some(":transformation") =>
        val ts = selected.filter(_.isTransformation)
        if (ts.isEmpty) throw new InvalidSelectionError(
          "found no transformations to continue from")
        ts
      case Some(point) =>
        val after = selected.dropWhile(_.identifier != point)
        if (after.nonEmpty) after
        else {
          val schemaRels = selected.filter(_.name.schema == point)
          if (schemaRels.exists(_.isTransformation))
            throw new InvalidSelectionError(s"schema '$point' contains transformations")
          if (schemaRels.nonEmpty) {
            val combined = (schemaRels ++ selected.filter(_.isTransformation))
              .map(_.identifier).toSet
            selected.filter(r => combined.contains(r.identifier))
          } else throw new InvalidSelectionError(
            "found no matching relations to continue from")
        }
    }
  }
}
