package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the MinHash+LSH pipeline at a given SF dir. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache(); System.gc()
    }
    time("shingles    ")(Dedup.docShingles(spark, sfDir)
      .agg(sum(size(col("shingles")))).head().getLong(0))
    val sh = Dedup.docShingles(spark, sfDir).filter(size(col("shingles")) > 0)
    time("signatures  ")(sh.select(col("doc_id"),
      Dedup.minhashSignature(col("shingles")).as("sig")).count())
    for (_ <- 1 to 2)
      time("full lsh    ")(Dedup.minhashLsh(spark, sfDir).count())
    spark.stop()
  }
}
