package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Scale-technique specs: salted two-phase aggregation equals the plain
  * rollup, and bucketed tables join without a shuffle (co-located join) —
  * the two levers the 100 TB design leans on beyond AQE.
  */
class ScaleSpec extends SparkSpec {

  test("salted two-phase aggregation equals plain groupBy (skewed hot keys)") {
    val l = Tables.lineitem(spark, sf0001)
    val plain = l.groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"), max("l_partkey").as("m"))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedAgg(
        l.withColumn("d", to_date(col("l_shipdate"))), Seq("d"), salts = 8,
        Seq("q" -> Skew.sumOf(col("l_quantity")),
            "n" -> Skew.countOf,
            "m" -> Skew.maxOf(col("l_partkey"))))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
  }

  test("bucketed tables co-locate: bucket join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // remove orphaned managed-table locations from any earlier aborted run
    for (t <- Seq("li_b", "ord_b")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.hadoop.fs.FileUtil.fullyDelete(loc)
    }
    Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, sf0001).select("o_orderkey", "o_orderdate")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")
    // force the shuffle-join path (tiny fixtures would broadcast) to show
    // bucketing removes the exchange that a shuffle join would need
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
             s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
