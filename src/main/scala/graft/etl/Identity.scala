package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed IDENTITY(1,1) surrogate-key assignment
  * (/root/reference/python/etl/load.py:529-551,
  * dialect/redshift.py:44-76). Redshift hands out arbitrary ids; for a
  * deterministic engine we number 1..N over a declared total order —
  * but WITHOUT a global single-partition window (Spark's
  * `Window.orderBy` with no partition spec moves all rows to one
  * partition; its own WindowExec warns about it).
  *
  * Two-phase plan that scales to 100 TB:
  *   1. range-repartition on the key order (so partition p holds keys
  *      strictly below partition p+1) and sort within partitions;
  *   2. count rows per partition — a metadata-sized driver collect
  *      (one long per partition, same order of magnitude as AQE
  *      statistics);
  *   3. per-row index from `monotonically_increasing_id()` (its low
  *      33 bits are the row's position within its partition, assigned
  *      downstream of the sort) plus the partition's cumulative
  *      offset via a broadcast join — NO second shuffle: a window
  *      partitioned by pid would re-hash and re-sort the whole table.
  *
  * The result is bit-identical to `row_number() OVER (ORDER BY keys)`.
  */
object Identity {

  def withSurrogateKey(df: DataFrame, name: String, order: Seq[Column],
                       numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val pid = col("__pid")
    val parted = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // mono = (pid << 33) + rowIndexInPartition, in sorted row order
      .withColumn("__mono", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = parted.groupBy(pid).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).init
    // Offsets ride back in via a broadcast join (a when-chain would
    // stop codegen at high partition counts).
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = counts.map(_._1).zip(offsets).toSeq
      .toDF("__pid2", "__offset")
    val rowIdxInPartition = col("__mono").bitwiseAND(lit((1L << 33) - 1))
    parted
      .join(broadcast(offsetDf), pid === col("__pid2"))
      .withColumn(name, rowIdxInPartition + col("__offset") + 1L)
      .drop("__pid", "__pid2", "__offset", "__mono")
  }
}
