package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded edit-distance similarity join — the record-linkage /
  * entity-resolution primitive (matching customer or vendor names
  * across sources) the reference's SQL surface would hand to
  * `editdist3`-style UDFs on a single node.
  *
  * The distributed design is the FastSS / SymSpell deletion
  * neighborhood: for edit distance ≤ 1, every string expands to its
  * L+1 delete-one variants, and any pair within distance 1 is
  * GUARANTEED to share a variant (substitution → delete the differing
  * position from both; insert/delete → the shorter string IS a variant
  * of the longer; equality → the string itself). The variant equi-join
  * therefore produces a complete candidate set — no all-pairs stage,
  * no cartesian — and one exact `levenshtein` pass over candidates
  * removes the false positives the neighborhood admits (sharing a
  * variant only bounds the distance by 2).
  *
  * Scale shape: the variant index is (L+1)·n rows keyed by a 60-bit
  * md5 prefix (8 bytes on the wire, never the variant string); the
  * self-join fans out per variant bucket — bucket sizes are bounded by
  * how many corpus strings collapse onto one deletion form, the same
  * df-bounded shape as the shingle inverted index. The oracle computes
  * the same answer the O(n²) way (DuckDB at sf0.01), so the blocking
  * scheme's completeness is hash-verified, not assumed.
  */
object FuzzyJoin {

  /** All delete-one variants of a string, the string itself included —
    * hashed to 60-bit longs before any shuffle. */
  private def variantHashes(name: Column): Column = {
    val deletes = expr(
      "transform(sequence(1, length(name)), " +
        "i -> concat(substring(name, 1, i - 1), substring(name, i + 1, length(name))))")
    array_distinct(concat(array(name), deletes))
  }

  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Edit-distance ≤ 1 pairs over any (id, name) frame. */
  private[graft] def pairsWithin1(names: DataFrame): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._
    val variants = names
      .select($"id", $"name", explode(variantHashes($"name")).as("v"))
      .select($"id", $"name", hash60($"v").as("vh"))
    val l = variants.select($"vh", $"id".as("id1"), $"name".as("name1"))
    val r = variants.select($"vh", $"id".as("id2"), $"name".as("name2"))
    l.join(r.hint("shuffle_hash"), Seq("vh"))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2", $"name1", $"name2")
      .distinct()
      // bounded form: abandons a row the moment the running distance
      // exceeds 1 (returns -1), so a distance-2 false candidate costs
      // O(len) instead of O(len²) — the exact filter stays exact for
      // every surviving pair
      .withColumn("dist", levenshtein($"name1", $"name2", 1).cast("long"))
      .filter($"dist" >= 0)
      .select($"id1", $"id2", $"dist")
  }

  /** Oracle entry: distance-≤1 customer-name pairs via the deletion
    * neighborhood, checked against DuckDB's naive pairwise scan. */
  def fuzzyJoinNames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.load(spark, sfDir, "customer")
      .select($"c_custkey".as("id"), $"c_name".as("name"))
    pairsWithin1(names).orderBy($"id1", $"id2")
  }

  val fuzzyJoinNamesSql: String =
    """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id1, id2""".stripMargin

  // --------------------------------------------- entity resolution
  /** END-TO-END entity resolution — the golden-record pipeline every
    * MDM/identity system runs: fuzzy candidate edges (the deletion
    * neighborhood, no all-pairs) → connected components (the dedup
    * pack's co-partitioned label propagation + pointer jumping) →
    * one canonical record per entity (the component-min member) with
    * the member count. Rows in no fuzzy pair stay their own entity
    * (left join + coalesce). The oracle recomputes the same fixpoint
    * from first principles: naive O(n²) pairs, recursive-CTE
    * reachability closure, min per node. */
  private[graft] def goldenRecordsOf(names: DataFrame): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._
    val edges = pairsWithin1(names).select($"id1".as("d1"), $"id2".as("d2"))
    val comps = DedupOps.connectedComponents(spark, edges)
    val assigned = names
      .join(comps.hint("shuffle_hash"), names("id") === comps("doc_id"), "left")
      .select($"id", coalesce($"cluster", $"id").as("entity_id"))
    val sizes = assigned.groupBy($"entity_id").agg(count(lit(1)).as("n_members"))
    val canon = names.select($"id".as("cid"), $"name".as("canonical_name"))
    assigned
      .join(canon.hint("shuffle_hash"), $"entity_id" === $"cid")
      .join(sizes.hint("shuffle_hash"), Seq("entity_id"))
      .select($"id", $"entity_id", $"canonical_name", $"n_members")
      .orderBy($"id")
  }

  def erGoldenRecords(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    goldenRecordsOf(Tables.load(spark, sfDir, "customer")
      .select($"c_custkey".as("id"), $"c_name".as("name")))
  }

  val erGoldenRecordsSql: String =
    """WITH RECURSIVE pairs AS (
      |  SELECT a.c_custkey AS d1, b.c_custkey AS d2
      |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |  WHERE levenshtein(a.c_name, b.c_name) <= 1
      |), edges AS (
      |  SELECT d1, d2 FROM pairs UNION SELECT d2 AS d1, d1 AS d2 FROM pairs
      |), reach(node, r) AS (
      |  SELECT d1 AS node, d1 AS r FROM edges
      |  UNION
      |  SELECT e.d1 AS node, r.r AS r FROM edges e JOIN reach r ON e.d2 = r.node
      |), comp AS (
      |  SELECT c.c_custkey AS id, COALESCE(m.cluster, c.c_custkey) AS entity_id
      |  FROM customer c LEFT JOIN (
      |    SELECT node, MIN(r) AS cluster FROM reach GROUP BY node
      |  ) m ON c.c_custkey = m.node
      |)
      |SELECT comp.id, comp.entity_id, g.c_name AS canonical_name,
      |  CAST(s.n AS BIGINT) AS n_members
      |FROM comp
      |JOIN customer g ON g.c_custkey = comp.entity_id
      |JOIN (SELECT entity_id, COUNT(*) AS n FROM comp GROUP BY entity_id) s
      |  ON s.entity_id = comp.entity_id
      |ORDER BY comp.id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_join_names" -> (fuzzyJoinNames _),
    "er_golden_records" -> (erGoldenRecords _))

  val oracles: Map[String, String] = Map(
    "fuzzy_join_names" -> fuzzyJoinNamesSql,
    "er_golden_records" -> erGoldenRecordsSql)
}
