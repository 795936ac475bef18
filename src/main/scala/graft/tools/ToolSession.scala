package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared scaffold for the dev measurement tools (BenchSome, ShingleCost,
  * StreamKsProfile): ONE place for the Bench-identical session config
  * (master/shuffle width/UI/UTC), the swallowed entry warmup, and the
  * label timer — so a session-config rule change cannot silently leave a
  * tool measuring under different conditions than the suite it explains
  * (r12 review item).
  */
object ToolSession {

  /** Bench-identical local session: local[SPARK_GRAFT_CPUS], shuffle
    * partitions = cpus, UTC, no UI; WARN logs; the untimed entry() warmup
    * already absorbed.
    */
  def start(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // generated-class cache size — read ONCE at the JVM's first codegen,
      // so it must be set before the session's first query. Default MUST
      // match Bench.main's (4096, the workload-sized value — see the
      // sizing note there): a tool measuring under a different cache would
      // explain a suite it isn't running.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark
  }

  /** Time `body`, print `label: N.NN s`, then run the Bench-identical
    * untimed inter-measurement cleanup (cache clear + GC).
    */
  def timed[A](spark: SparkSession, label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.catalog.clearCache()
    System.gc()
    r
  }
}
