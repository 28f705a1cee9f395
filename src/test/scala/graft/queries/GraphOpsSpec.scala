package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank invariants on hand-built graphs: symmetry,
  * centrality ordering, bounded mass loss from integer truncation,
  * and bit-identical re-runs (the determinism the fixed-point
  * arithmetic exists to provide). */
class GraphOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ranksOf(undirected: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val half = undirected.toDF("src", "dst")
    val edges = half.union(half.select($"dst".as("src"), $"src".as("dst")))
    val deg = edges.groupBy($"src".as("node"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("outdeg"))
    GraphOps.pagerank(edges, deg)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cycle: perfect symmetry gives identical ranks") {
    val ranks = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(ranks.values.toSet.size == 1, ranks.toString)
  }

  test("star: the hub outranks every leaf, leaves tie") {
    val ranks = ranksOf(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    val leaves = (1L to 4L).map(ranks)
    assert(leaves.toSet.size == 1)
    assert(ranks(0L) > leaves.head,
      s"hub ${ranks(0L)} must outrank leaf ${leaves.head}")
  }

  test("mass is conserved up to integer truncation") {
    val ranks = ranksOf(Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 5L), (5L, 1L)))
    val total = ranks.values.sum
    val scale = 1000000000000L
    // each of the 4 iterations can only LOSE mass to truncation, and
    // at most (#nodes * 100) per round — far below this slack
    assert(total <= scale && total > scale - 1000000L, s"total=$total")
  }

  test("convergence mode: 20+ rounds, bounded plan depth, monotone deltas") {
    val s = spark
    import s.implicits._
    // a path graph converges slowly — good for forcing many rounds
    val half = (1L to 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val edges = half.union(half.select($"dst".as("src"), $"src".as("dst")))
    val deg = edges.groupBy($"src".as("node"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("outdeg"))
    // deltas shrink ~0.85×/round from init ≈ 4.8e10 — 5e7 lands
    // around round 30, comfortably past the 20-round bar
    val (ranks, rounds, delta) =
      GraphOps.pagerankConverged(edges, deg,
        tolScaled = 50000000L, maxIters = 60)
    assert(rounds >= 20, s"path graph should need many rounds, took $rounds")
    assert(rounds < 60, s"must converge before the cap, took $rounds")
    assert(delta <= 50000000L, s"must stop converged, last delta $delta")
    // BOUNDED PLAN DEPTH: the returned frame sits on a checkpointed
    // lineage — its logical plan must NOT contain `rounds` nested
    // joins (the lazy 4-round oracle plan would). A handful of nodes
    // on top of the LogicalRDD is the contract.
    val planSize = ranks.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planSize <= 5,
      s"plan must stay O(1) deep under checkpoint cadence, got $planSize nodes")
    // the fixed-round form agrees with convergence mode's trajectory:
    // ranks are a probability mass (sum ≈ Scale), symmetric ends tie
    val m = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(21L), "path ends are symmetric")
    val mass = m.values.sum
    assert(math.abs(mass - 1000000000000L) < m.size * 100L,
      s"mass conserved up to truncation, got $mass")
    // monotone convergence (coarse): re-running with a tighter tol
    // takes at least as many rounds
    val (_, rounds2, delta2) =
      GraphOps.pagerankConverged(edges, deg,
        tolScaled = 5000000L, maxIters = 80)
    assert(rounds2 > rounds && delta2 <= 5000000L)
  }

  test("re-running yields bit-identical ranks") {
    val g = (1L to 40L).flatMap(i => Seq((i, (i * 7) % 41 + 1)))
    assert(ranksOf(g) == ranksOf(g))
  }
}
