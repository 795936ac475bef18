package graft.tools

import org.apache.spark.sql.SparkSession

/** Recall sweep for the training-free RP ANN path: prints recall@k over a
  * (planes, shortlist) grid so the [[graft.ops.Similarity.KnnRpDim]] /
  * [[graft.ops.Similarity.RpShortlist]] operating point is a measured
  * choice, not a guess. Usage: runMain graft.tools.RpSweep [sfDir] [p:s ...]
  */
object RpSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val grid =
      if (args.length > 1) args.drop(1).toSeq.map { a =>
        val Array(p, s) = a.split(":"); (p.toInt, s.toInt)
      }
      else Seq((32, 100), (32, 200), (48, 100), (48, 150), (48, 200), (64, 100))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    grid.foreach { case (p, s) =>
      val t0 = System.nanoTime()
      val r = graft.ops.Similarity.knnRpRecall(spark, dir, p, s)
        .collect().head.getAs[Double]("recall_at_k")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"RPSWEEP planes=$p%3d shortlist=$s%4d recall=$r%.4f  (${dt}%.1f s)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
