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
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = ToolSession.start()
    def t[A](label: String)(body: => A): A = ToolSession.timed(spark, label)(body)
    // width sweep harness: reps cycle the session shuffle width so the
    // drain's STATE width can be swept in one JVM (the r14 measurement
    // behind StreamingQueries.BoundedStateWidth: drain 2.3-2.4 s at 32 vs
    // ~2.0 s at 8 warm, equal at 4 — with the cold-rep contrast in rep 1).
    // This tool calls drain DIRECTLY with stateWidth unset, so the sweep
    // genuinely varies the drain width (the production streamKs pins its
    // own width since r14 and is not what runs here). Run the full 5-rep
    // cycle: it repeats widths 8 and 32 warm precisely so rep 1's
    // fresh-JVM cold start can't be read as a width-32 property.
    val widths = Seq(32, 8, 4, 8, 32)
    (1 to reps).foreach { i =>
      val w = widths((i - 1) % widths.length)
      spark.conf.set("spark.sql.shuffle.partitions", w)
      println(s"== rep $i (session shuffle width $w) ==")
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
      // readout sub-phases (same relation, fresh cache): where inside
      // ksOfCounts the seconds go — cache fill, the PrefixSum probe, the
      // offsets collect, and the main ranked pass
      import org.apache.spark.sql.functions._
      val pts = drained.withColumn("_g", lit(0)).persist()
      t("  ro: cache fill (count)")(pts.count())
      t("  ro: probe (percentile_approx)") {
        pts.agg(percentile_approx(col("v").cast("double"),
          array((1 until 32).map(i => lit(i / 32.0)): _*), lit(1000)).as("b")).head()
      }
      t("  ro: offsets (groupBy+collect)") {
        pts.select(concat_ws("", col("_g").cast("string")).as("_key"),
            lit(0).as("_b"), (col("c1") + col("c2")).as("_v"))
          .groupBy("_b", "_key").agg(sum("_v").as("_s")).limit(100).collect()
      }
      t("  ro: full ksOfCounts (cached input)") {
        graft.ops.Stats.ksOfCounts(pts.drop("_g")).count()
      }
      pts.unpersist()
    }
    spark.stop()
  }
}
