package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Graft-internal shim (lives in Spark's package to reach
  * `private[sql]` members — only `Dataset.ofRows` is used; no Spark
  * behavior is modified).
  *
  * Why it exists: `Dataset.checkpoint`/`localCheckpoint` truncate the
  * LINEAGE but keep the origin plan's `Statistics` on the resulting
  * [[LogicalRDD]]. In an iterative algorithm (label propagation,
  * power iteration) whose round plan joins the previous round's
  * checkpoint against itself, the size-only estimator MULTIPLIES the
  * children's `sizeInBytes` — so each round's estimate is a product
  * over the previous round's, and the BigInt's bit length DOUBLES
  * per round. Around 30 rounds, join planning is multiplying
  * million-bit integers and the driver hard-hangs inside
  * `BigInteger.multiply` (observed from a 40-round PageRank).
  *
  * [[clearOriginStats]] rebuilds the checkpointed frame's
  * [[LogicalRDD]] with `originStats = None` — estimates reset to the
  * bounded default — while KEEPING `outputPartitioning` and
  * `outputOrdering`, which is the whole point of checkpoint-based
  * truncation for co-partitioned loops (a plain
  * `createDataFrame(rdd, schema)` would also clear stats, but loses
  * the partitioning and re-introduces one exchange per round). */
object GraftLineage {

  def clearOriginStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(session,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(
            session, None, None))
      case _ => df
    }
}
