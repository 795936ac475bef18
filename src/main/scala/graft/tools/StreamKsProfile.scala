package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** Phase-level profile of q_stream_ks (r11 verdict item 1): splits the
  * query into schema fetch / streaming drain / batch readout and times
  * each, repeated, to locate where the driver window loses seconds.
  * Usage: StreamKsProfile <sfDir> [reps]
  */
object StreamKsProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"== rep $i ==")
      val name = "stream_ks_prof"
      spark.streams.active.foreach(_.stop())
      val rawSchema = t("schema") {
        spark.read.parquet(s"$dir/lineitem.parquet").schema
      }
      t("drain") {
        val counts = graft.ops.Stats.twoSampleCountsOf(
          spark.readStream.schema(rawSchema).parquet(s"$dir/lineitem.parque*"))
        val q = counts.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      t("table-stats") {
        val tbl = spark.table(name)
        println(s"    memory table: ${tbl.rdd.getNumPartitions} partitions, ${tbl.count()} rows")
      }
      t("readout") {
        graft.ops.Stats.ksOfCounts(spark.table(name)).count()
      }
      t("readout-repart") {
        graft.ops.Stats.ksOfCounts(
          spark.table(name).repartition(col("v"))).count()
      }
      t("cleanup") { spark.catalog.clearCache(); System.gc() }
    }
    spark.stop()
  }
}
