package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a targeted subset of queries under Bench-identical conditions
  * (same session config, same untimed warmup + inter-query cleanup) —
  * the dev loop for single-query optimization without paying a full
  * suite run. Usage: BenchSome <sfDir> <query>... (repeat a name to
  * measure warm-vs-cold within one JVM).
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ==")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
