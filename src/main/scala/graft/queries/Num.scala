package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric conventions shared by every query + its DuckDB oracle.
  *
  * Floating-point SUMs are order-dependent, and Spark and DuckDB
  * aggregate in different orders — a raw `sum(double)` would differ in
  * the low bits and fail a hash compare. Both engines, however,
  * perform IEEE-754 double arithmetic identically per row, and decimal
  * sums are exact. So the convention is:
  *
  *   per-row arithmetic in double (bit-identical both engines)
  *     → cast row value to DECIMAL(18,6)  (same rounding both engines)
  *     → SUM the decimals                 (exact, order-independent)
  *     → cast the total back to DOUBLE    (same value both engines)
  *
  * The oracle SQL mirrors this:
  *   CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)
  */
object Num {
  /** Order-independent double sum: exact decimal accumulation. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Order-independent double avg: exact decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 6))).cast(DoubleType) /
      count(c).cast(DoubleType))

  /** Oracle-side SQL for dsum. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"

  /** Oracle-side SQL for davg. */
  def davgSql(expr: String): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE))"
}
