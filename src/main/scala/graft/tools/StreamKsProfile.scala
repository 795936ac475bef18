package graft.tools

import org.apache.spark.sql.streaming.Trigger

/** Phase-level profile of q_stream_ks (r11 verdict item 1): splits the
  * query into schema fetch / streaming drain / batch readout and times
  * each (Bench-identical session via [[ToolSession]]), repeated, to locate
  * where a driver window loses seconds.
  * Usage: StreamKsProfile <sfDir> [reps]
  */
object StreamKsProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = ToolSession.start()
    def t[A](label: String)(body: => A): A = ToolSession.timed(spark, label)(body)
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
      t("readout") {
        graft.ops.Stats.ksOfCounts(spark.table(name)).count()
      }
    }
    spark.stop()
  }
}
