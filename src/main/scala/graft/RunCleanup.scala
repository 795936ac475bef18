package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the daily retention cleanup — the
  * operational twin of the reference's second timer trigger
  * (function_app.py:52-61, cron `30 0 * * *`): an external scheduler
  * invokes this once per day after the ingest run.
  *
  * Usage:
  *   spark-submit --class graft.RunCleanup <jar> <tableDir> [dateCol] [yyyy-MM-dd] [days]
  *
  * `asOf` defaults to max(dateCol) in the table (data-derived, not the
  * server clock — SURVEY.md §4.4-g fix); `dateCol` defaults to the daily
  * ingest final table's `f_shipdate`; retention defaults to the reference's
  * 4 days (daily_cleanup.py:23).
  */
object RunCleanup {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.RunCleanup <tableDir> [dateCol] [yyyy-MM-dd] [days]")
    val tableDir = args(0)
    val dateCol = args.lift(1).getOrElse("f_shipdate")
    val asOf = args.lift(2).map(s => java.sql.Date.valueOf(java.time.LocalDate.parse(s)))
    val days = args.lift(3).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .appName("graft-daily-cleanup")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val r = etl.Cleanup.run(spark, tableDir, dateCol, asOf, days)
      println(s"""{"deleted_rows":${r.deletedRows},"dropped_partitions":${r.droppedPartitions},"seconds":${r.seconds},"partition_drop":${r.partitionDrop}}""")
    } finally spark.stop()
  }
}
