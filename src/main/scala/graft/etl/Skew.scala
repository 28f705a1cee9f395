package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) is the
  * FIRST answer for skewed sort-merge joins — it splits oversized
  * partitions at runtime. Salting is the explicit fallback for the
  * cases AQE cannot touch: skewed AGGREGATIONS (one hot group lands
  * on one reducer regardless of AQE) and joins where the engine knows
  * the hot keys up front. Both helpers are deterministic-output:
  * results equal the unsalted operation exactly.
  */
object Skew {

  /** Per-row salt in [0, factor): spreads one hot key across
    * `factor` reducers. Derived from the physical row position —
    * evenly distributed, no RNG. */
  private def saltCol(factor: Int): Column =
    pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int")

  /** Two-phase salted aggregation: COUNT + optional SUM over a hot
    * key. Phase 1 aggregates on (keys, salt) — map-side partial agg
    * then `factor`-way spread of each hot key; phase 2 merges the
    * salt shards. The second shuffle carries ≤ factor rows per key. */
  def saltedCountSum(df: DataFrame, keys: Seq[String],
                     sumCol: Option[String], factor: Int): DataFrame = {
    val keyCols = keys.map(col)
    val phase1Aggs = count(lit(1)).as("__n") +:
      sumCol.map(c => sum(col(c)).as("__s")).toSeq
    val phase1 = df.withColumn("__salt", saltCol(factor))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs = sum(col("__n")).as("n") +:
      sumCol.map(_ => sum(col("__s")).as("sum")).toSeq
    phase1.groupBy(keyCols: _*).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted equi-join of a skew-heavy fact against a smaller relation
    * that is too big to broadcast: the fact side gets a salt, the
    * other side is replicated across all `factor` salt values, and
    * the join key becomes (key, salt) — a hot key's rows now hash to
    * `factor` different reducers. Cost: `factor`× replication of the
    * smaller side, the classic trade. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt", saltCol(factor))
    val replicated = other.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
