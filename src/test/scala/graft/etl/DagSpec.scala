package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class DagSpec extends AnyFunSuite {

  private def rel(name: String, deps: String*): Relation = {
    val tn = TableName.parse(name)
    val isTransform = deps.nonEmpty
    Relation(TableDesign(
      name = tn,
      sourceName = if (isTransform) "CTAS" else "src",
      columns = Seq(ColumnDef("c1", "int")),
      dependsOn = deps.map(TableName.parse),
      query = if (isTransform) "SELECT 1 AS c1" else ""))
  }

  test("topological order respects dependencies with ties by input position") {
    // relation.py:569-610: ties resolved by initial order.
    val ordered = Dag.orderByDependencies(Seq(
      rel("s.b"), rel("s.a"),
      rel("t.ab", "s.a", "s.b"), rel("t.z", "s.b")))
    assert(ordered.map(_.identifier) == Seq("s.b", "s.a", "t.ab", "t.z"))
    assert(ordered.map(_.executionOrder) == Seq(1, 2, 3, 4))
    assert(ordered.map(_.executionLevel) == Seq(1, 1, 2, 2))
  }

  test("levels allow parallelism: chain vs fan-out") {
    val ordered = Dag.orderByDependencies(Seq(
      rel("s.a"),
      rel("t.b", "s.a"), rel("t.c", "s.a"),
      rel("t.d", "t.b", "t.c")))
    val byId = ordered.map(r => r.identifier -> r.executionLevel).toMap
    assert(byId("s.a") == 1)
    assert(byId("t.b") == 2 && byId("t.c") == 2)
    assert(byId("t.d") == 3)
  }

  test("cycle raises CyclicDependencyError") {
    intercept[CyclicDependencyError] {
      Dag.orderByDependencies(Seq(
        rel("t.a", "t.b"), rel("t.b", "t.a")))
    }
  }

  test("unknown managed dependencies are dropped with a warning") {
    // relation.py:518-547.
    val rels = Seq(rel("s.a"), rel("t.b", "s.a", "s.never_loaded"))
    val (deps, warnings) = Dag.sanitizeDependencies(rels)
    assert(deps("t.b") == Set(TableName.parse("s.a")))
    assert(warnings.exists(_.contains("unknown")))
    val ordered = Dag.orderByDependencies(rels)  // must not hang or raise
    assert(ordered.map(_.identifier) == Seq("s.a", "t.b"))
  }

  test("unmanaged dependencies never block, pg_catalog forces last") {
    // relation.py:527-565: external.x is unmanaged (schema not in the
    // input set); t.cat depends on pg_catalog so it must build after
    // every relation without pg_catalog dependencies.
    val rels = Seq(
      rel("t.cat", "pg_catalog.pg_class"),
      rel("s.a"),
      rel("t.b", "s.a", "external.x"))
    val ordered = Dag.orderByDependencies(rels)
    assert(ordered.last.identifier == "t.cat")
    assert(ordered.map(_.identifier).take(2) == Seq("s.a", "t.b"))
  }

  test("required propagation walks dependency fan-in transitively") {
    // relation.py:649-686: marking t.d required must mark its whole
    // upstream closure.
    val rels = Seq(rel("s.a"), rel("s.x"),
      rel("t.b", "s.a"), rel("t.d", "t.b"))
    val ordered = Dag.orderByDependencies(rels)
    val marked = Dag.setRequired(ordered, TableSelector(Seq("t.d")))
    val req = marked.filter(_.isRequired).map(_.identifier).toSet
    assert(req == Set("s.a", "t.b", "t.d"))
  }

  test("findDependents is transitive and excludes seeds") {
    val rels = Seq(rel("s.a"), rel("t.b", "s.a"), rel("t.c", "t.b"), rel("s.z"))
    val ordered = Dag.orderByDependencies(rels)
    val deps = Dag.findDependents(ordered, ordered.filter(_.identifier == "s.a"))
    assert(deps.map(_.identifier) == Seq("t.b", "t.c"))
  }

  test("selectInExecutionOrder: selector, dependents, continue-from") {
    val rels = Seq(rel("s.a"), rel("s.b"),
      rel("t.c", "s.a"), rel("t.d", "t.c"))
    // plain selection
    assert(Dag.selectInExecutionOrder(rels, TableSelector(Seq("s")))
      .map(_.identifier) == Seq("s.a", "s.b"))
    // with dependents (relation.py:769-772)
    assert(Dag.selectInExecutionOrder(rels, TableSelector(Seq("s.a")),
      includeDependents = true).map(_.identifier) == Seq("s.a", "t.c", "t.d"))
    // continue-from a relation (relation.py:788-797)
    assert(Dag.selectInExecutionOrder(rels, TableSelector.all,
      continueFrom = Some("t.c")).map(_.identifier) == Seq("t.c", "t.d"))
    // :transformations (relation.py:781-786)
    assert(Dag.selectInExecutionOrder(rels, TableSelector.all,
      continueFrom = Some(":transformations")).map(_.identifier) == Seq("t.c", "t.d"))
    // continue-from a schema: schema relations + all transformations
    assert(Dag.selectInExecutionOrder(rels, TableSelector.all,
      continueFrom = Some("s")).map(_.identifier) == Seq("s.a", "s.b", "t.c", "t.d"))
    intercept[InvalidSelectionError] {
      Dag.selectInExecutionOrder(rels, TableSelector.all,
        continueFrom = Some("no.such"))
    }
  }

  test("selector glob semantics") {
    // names.py:390-426 doctest shapes.
    val n = TableName.parse("www.orders")
    assert(TableSelector(Seq("www")).matches(n))
    assert(TableSelector(Seq("www.*")).matches(n))
    assert(TableSelector(Seq("w??.orders")).matches(n))
    assert(TableSelector(Seq("*.orders")).matches(n))
    assert(!TableSelector(Seq("finance")).matches(n))
    assert(TableSelector.all.matches(n))
  }
}
