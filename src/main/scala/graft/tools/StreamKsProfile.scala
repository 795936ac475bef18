package graft.tools

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
      spark.streams.active.foreach(_.stop())
      val rawSchema = t("schema") {
        spark.read.parquet(s"$dir/lineitem.parquet").schema
      }
      var drained: org.apache.spark.sql.DataFrame = null
      t("drain") {
        val counts = graft.ops.Stats.twoSampleCountsOf(
          spark.readStream.schema(rawSchema).parquet(s"$dir/lineitem.parque*"))
        drained = graft.streaming.StreamingQueries.drain(
          counts, "stream_ks_prof", "complete")
      }
      t("readout") {
        graft.ops.Stats.ksOfCounts(drained).count()
      }
    }
    spark.stop()
  }
}
