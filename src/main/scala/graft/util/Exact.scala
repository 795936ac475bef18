package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic aggregation helpers for oracle parity.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order differs from a single-node engine's — `ROUND(SUM(double), 2)` can
  * flip at the .005 boundary. House rule: compute the per-row measure in
  * double (IEEE multiply is bit-deterministic for identical inputs), cast to
  * DECIMAL(18,4), sum exactly in decimal, round, and cast back to double.
  * The same shape is used in every oracle SQL string.
  *
  * This is also the right call at 100 TB: decimal partial aggregation is
  * still map-side combinable and codegen'd, and the result no longer depends
  * on partitioning or AQE decisions — reruns are byte-identical.
  */
object Exact {
  /** Exact decimal sum of a double-valued measure, rounded to 2 dp. */
  def sum2(measure: Column): Column =
    round(sum(measure.cast(DecimalType(18, 4))), 2).cast("double")

  /** Matching DuckDB SQL fragment. */
  def sum2Sql(measureSql: String): String =
    s"CAST(ROUND(SUM(CAST($measureSql AS DECIMAL(18,4))), 2) AS DOUBLE)"

  /** The standard revenue measure: extendedprice * (1 - discount). */
  def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  val revenueSql = "l_extendedprice * (1 - l_discount)"
}
