package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the post-execution (AQE-final) plan of one named query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.count()
    println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ==")
    // formatted mode (same dump PLANS.md sections use): numbered operator
    // tree + per-operator detail incl. PushedFilters / ReadSchema
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(12000))
    spark.stop()
  }
}
