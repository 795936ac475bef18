package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the shared shingle-build cost the staged doc_shingles artifact
  * would reclaim (r11 verdict item 5): times docShingles materialization
  * and the three conversion-candidate queries at the given fixture.
  * Usage: ShingleCost <sfDir>
  */
object ShingleCost {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); System.gc()
    }
    (1 to 2).foreach { i =>
      println(s"== rep $i ==")
      t("docShingles-count")(graft.ops.Dedup.docShingles(spark, dir).count())
      t("docShingles-write") {
        graft.ops.Dedup.docShingles(spark, dir)
          .write.mode("overwrite").parquet("target/tmp/shingle_cost_probe")
      }
      t("q_dedup_jaccard_prefix")(graft.ops.Dedup.ngramJaccardPrefix(spark, dir).count())
      t("q_dedup_resolution")(graft.ops.Dedup.dedupResolution(spark, dir).count())
      t("q_dedup_canonical")(graft.ops.Dedup.dedupCanonical(spark, dir).count())
    }
    spark.stop()
  }
}
