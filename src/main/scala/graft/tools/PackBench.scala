package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc A/B timing for the pack variants (window vs scalable) at a given
  * SF dir — the measurement harness behind the BASELINE.md pack numbers.
  */
object PackBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.etl.FixedWidth._
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache(); System.gc()
    }
    val recs = graft.ops.Ingestion.lineitemRecords(spark, sfDir)
    // warmup
    recs.count()
    for (_ <- 1 to 2) {
      time("packWindow  ")(packWindow(recs, "record",
        Seq("f_returnflag"), Seq("f_orderkey", "f_linenumber")).count())
      time("packScalable")(packScalable(recs, "record",
        Seq("f_returnflag"), Seq("f_orderkey", "f_linenumber")).count())
    }
    // end-to-end roundtrip (cleanly isolated: clearCache+GC between runs)
    for (_ <- 1 to 2)
      time("roundtrip   ")(graft.ops.Ingestion.packExplodeRoundtrip(spark, sfDir).count())
    spark.stop()
  }
}
