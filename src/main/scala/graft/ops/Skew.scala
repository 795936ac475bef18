package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot aggregation keys (builder-prompt scale
  * requirement; complements AQE's skew-join splitting, which only covers
  * joins).
  *
  * At 100 TB a daily sales rollup keyed on business_date has ~365 hot keys
  * for ~10¹¹ rows — a plain groupBy puts entire days on single reducers.
  * [[saltedAgg]] runs the classic two-phase form: phase 1 aggregates on
  * (key, salt) spreading each hot key over `salts` reducers; phase 2
  * combines the partials. Works for any algebraic aggregate (sum, count,
  * min, max — anything with a partial form); distinct-counts need the
  * sketch route instead ([[Relational.kyakusuApprox]]).
  */
object Skew {

  /** Two-phase salted aggregation. `partials` maps each output column name
    * to (phase1 aggregate of input, phase2 combiner of the phase-1 column).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[(String, (Column, Column => Column))]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head._2._1.as(partials.head._1),
           partials.tail.map { case (n, (agg1, _)) => agg1.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._2._2(col(partials.head._1)).as(partials.head._1),
           partials.tail.map { case (n, (_, agg2)) => agg2(col(n)).as(n) }: _*)
  }

  /** Salted sum/count building blocks. */
  def sumOf(c: Column): (Column, Column => Column) = (sum(c), sum(_))
  def countOf: (Column, Column => Column) = (count(lit(1)), x => sum(x))
  def maxOf(c: Column): (Column, Column => Column) = (max(c), max(_))
  def minOf(c: Column): (Column, Column => Column) = (min(c), min(_))
}
