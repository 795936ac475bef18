package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object LateDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = graft.streaming.StreamingQueries.lateEventsInput(spark, dir)
    new java.io.File(in).listFiles().foreach(f =>
      println(s"FILE ${f.getName} mod=${f.lastModified()}"))
    val schema = spark.read.parquet(s"$in/b0_ontime_tick.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*.parquet")
    val agg = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("n_events"))
    val useAvailableNow = args.length < 2 || args(1) == "availablenow"
    val sink = graft.streaming.StreamingQueries.sinkPath("late_dbg")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(sink))
    val w0 = agg.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     _: Long) => b.write.mode("append").parquet(sink))
      .queryName("late_dbg").outputMode("append")
    val q = (if (useAvailableNow) w0.trigger(Trigger.AvailableNow()) else w0).start()
    if (useAvailableNow) q.awaitTermination()
    else { // default micro-batch trigger: give it time to drain both files
      Thread.sleep(20000); q.stop(); q.awaitTermination()
    }
    q.recentProgress.foreach { p =>
      println(s"BATCH ${p.batchId} rowsIn=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} " +
        s"dropped=${p.stateOperators.toSeq.map(_.numRowsDroppedByWatermark).sum}")
    }
    val drained = spark.read.parquet(sink)
    println("OUT rows=" + drained.count())
    val onTime = graft.Tables.events(spark, dir)
      .filter(col("event_id") % graft.streaming.StreamingQueries.LateMod =!= 0)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val extra = drained.exceptAll(onTime).count()
    val missing = onTime.exceptAll(drained).count()
    println(s"DIFF extra=$extra missing=$missing")
    spark.stop()
  }
}
