package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** [[BenchSome]] plus a per-stage metrics line (wall, summed task run time,
  * GC, shuffle bytes written, records in) for each timed query — the dev
  * loop for finding WHERE a query's time goes, not just how much. Shuffle
  * write size is the fastest tell: an exchange shipping 36 MB where a
  * sibling query ships 5 MB means a wide column is crossing it (this is how
  * the pack roundtrip's early-format regression was found).
  * Usage: StageBench <sfDir> <query>...
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // listener events arrive asynchronously on the listener-bus thread;
    // guard the buffer and drain the bus before reading/clearing so late
    // stage-completed events are neither lost nor billed to the next query
    val lines = new StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall =
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        lines.synchronized {
          lines.append(
            f"   stage ${si.stageId}%4d tasks=${si.numTasks}%3d wall=$wall%6.2fs " +
            f"run=${m.executorRunTime / 1e3}%7.1fs gc=${m.jvmGCTime / 1e3}%5.1fs " +
            f"shufWr=${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%8.1fMB " +
            f"recsIn=${m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead}%9d\n")
        }
      }
    })

    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      spark.catalog.clearCache()
      System.gc()
      org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark.sparkContext)
      lines.synchronized(lines.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ==")
      org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark.sparkContext)
      print(lines.synchronized(lines.toString))
    }
    spark.stop()
  }
}
