package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.util.Exact

/** Batch-parity streaming queries — the oracle-gated face of the streaming
  * layer (C1/S4 streaming surfaces live in [[StreamingIngest]]; this runs an
  * aggregation THROUGH the streaming engine and returns its final table, so
  * the DuckDB hash-compare gate covers Structured Streaming execution too).
  */
object StreamingQueries {

  /** q_stream_hourly: the [[graft.ops.Temporal.eventsHourly]] hourly rollup
    * executed as a Structured Streaming query — file stream source →
    * event-time window aggregation → complete-mode memory sink, drained
    * with `Trigger.AvailableNow` and returned as the final result table.
    *
    * Complete output mode makes the result batch-equivalent by
    * construction, independent of how the engine splits the input into
    * micro-batches (no watermark, so no arrival-order-dependent late-row
    * drops — THE nondeterminism that keeps watermarked pipelines off a
    * hash-compare gate). The cost is full-state retention, which is the
    * documented trade: this query's role is parity audit; the production
    * streaming path (append mode + watermark + file sink, at-least-once →
    * exactly-once via checkpoint) is exercised in StreamingSpec.
    */
  def streamEventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val name = "stream_events_hourly"
    // idempotent re-entry: a prior run's active query would collide on the
    // memory sink's temp-view name
    spark.streams.active.filter(q => Option(q.name).contains(name)).foreach(_.stop())
    // same nanos handling as Tables.events (parquet TIMESTAMP(NANOS) →
    // micros), but the schema must be declared up front for a stream source
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the fixture is a single FILE; FileStreamSource requires its basePath
    // to be a directory, so address the file through a glob — the source
    // then roots itself at the parent dir and matches only this file
    val src = spark.readStream.schema(rawSchema).parquet(s"$dir/events.parque*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.sum2(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
              col("n_events"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).orderBy("hour_start", "event_type")
  }
}
