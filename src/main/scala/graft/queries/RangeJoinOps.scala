package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join: points `p.t` matched to intervals
  * `[lo, hi)` sharing equi keys.
  *
  * The naive expression `p JOIN i ON p.k = i.k AND p.t >= i.lo AND
  * p.t < i.hi` gives Catalyst only a non-equi residual after the key
  * equi-join; with low key cardinality (or no keys) it degrades to a
  * broadcast-nested-loop or per-key quadratic probe — the classic
  * scale-killer ExplainSpec gates against. This operator rewrites the
  * range predicate into an EQUI join the engine shuffles and hashes
  * like any other:
  *
  *  1. pick a bucket width `w` (seconds);
  *  2. each interval explodes to the buckets it overlaps
  *     (`sequence(floor(lo/w), floor(hi/w))` — fan-out is
  *     `len/w + 1`, bounded when `w` tracks the typical interval
  *     length);
  *  3. each point maps to its single bucket;
  *  4. equi-join on `(keys…, bucket)`, then the exact `[lo, hi)`
  *     residual filter.
  *
  * A (point, interval) pair can only meet in the POINT's bucket, so
  * the join emits no duplicates — no DISTINCT pass. Both sides are
  * corpus-scale and shuffle-hinted (never broadcast); a hot bucket is
  * an AQE-splittable shuffled hash join, and width is the skew lever.
  * At 100 TB this is one shuffle of each side on `(keys, bucket)` —
  * the same exchange profile as any large equi-join.
  *
  * `keys` are column names shared by both frames; `t`/`lo`/`hi` must
  * be distinct timestamp columns. Bucket arithmetic is exact for
  * |unix micros| < 2^53 (years ±~2250).
  */
object RangeJoinOps {

  private def bucketOf(c: Column, widthMicros: Long): Column = {
    val m = unix_micros(c)
    ((m - pmod(m, lit(widthMicros))) / lit(widthMicros)).cast("long")
  }

  def bucketed(points: DataFrame, intervals: DataFrame,
               keys: Seq[String], t: String, lo: String, hi: String,
               widthSec: Long): DataFrame = {
    require(widthSec > 0, s"bucket width must be positive, got $widthSec")
    val w = widthSec * 1000000L
    val p = points.withColumn("__bucket", bucketOf(col(t), w))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(lo), w), bucketOf(col(hi), w))))
    iv.hint("shuffle_hash")
      .join(p.hint("shuffle_hash"), keys :+ "__bucket")
      .filter(col(t) >= col(lo) && col(t) < col(hi))
      .drop("__bucket")
  }

  /** Registered demo: click/view events joined to the two-hour
    * window after every error event of the same user — overlapping
    * windows, multiple matches per point, the shape campaign / outage
    * attribution queries take. */
  def rangeJoinEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
    val points = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"event_id", $"ts")
    val intervals = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id".as("error_id"), $"ts".as("lo"),
        ($"ts" + expr("INTERVAL 2 HOURS")).as("hi"))
    bucketed(points, intervals, Seq("user_id"), "ts", "lo", "hi",
      widthSec = 7200)
      .select($"user_id", $"error_id", $"event_id")
      .orderBy($"error_id", $"event_id")
  }

  val rangeJoinEventsSql: String =
    """WITH intervals AS (
      |  SELECT user_id, event_id AS error_id, ts AS lo,
      |         ts + INTERVAL 2 HOUR AS hi
      |  FROM events WHERE event_type = 'error'
      |), points AS (
      |  SELECT user_id, event_id, ts FROM events
      |  WHERE event_type IN ('click', 'view')
      |)
      |SELECT i.user_id, i.error_id, p.event_id
      |FROM intervals i JOIN points p
      |  ON p.user_id = i.user_id AND p.ts >= i.lo AND p.ts < i.hi
      |ORDER BY i.error_id, p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("range_join_events" -> (rangeJoinEvents _))

  val oracles: Map[String, String] =
    Map("range_join_events" -> rangeJoinEventsSql)
}
