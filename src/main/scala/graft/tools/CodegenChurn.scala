package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics

/** Mechanism proof for the ADJACENT JIT-warm rework (r14, Bench.preWarm):
  * the claim is that a top-of-run sf0.001 warm pass decays before its
  * consumer runs ~170 queries later, because the janino generated-class
  * cache is bounded (spark.sql.codegen.cache.maxEntries, default 100) and
  * the suite compiles far more distinct classes than that in between — so
  * the timed query RECOMPILES everything the warm pass already compiled.
  *
  * This tool measures it with Spark's own codegen metrics
  * ([[CodegenMetrics]].METRIC_COMPILATION_TIME — one histogram entry per
  * actual janino compile; cache hits add nothing):
  *
  *  1. run the target query at sf0.001 (the warm pass) and count compiles;
  *  2. ADJACENT case: rerun it immediately — expected ~0 new compiles;
  *  3. churn: run every other suite query once at sf0.001 (alphabetical,
  *     the Bench order) counting the suite's total distinct compiles;
  *  4. DECAYED case: rerun the target — every compile here is a class the
  *     warm pass had already compiled and the churn evicted.
  *
  * Usage: CodegenChurn [query] [churnDir] — defaults q_stream_ks,
  * /root/testdata/sf0.001. NOTE: since r14 the ToolSession/Bench default
  * cache is the workload-sized 4096, under which the DECAYED rerun shows
  * ~no recompiles BY DESIGN (that is the fix working, not the mechanism
  * refuted) — to reproduce the thrash numbers cited in Bench.main's
  * sizing note, run with `SPARK_GRAFT_CODEGEN_CACHE=100`. The probe
  * prints the active capacity so the two configurations can't be
  * confused.
  */
object CodegenChurn {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("q_stream_ks")
    val churnDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = ToolSession.start()
    def compiles(): Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def measure(label: String)(body: => Unit): Long = {
      val c0 = compiles()
      val t0 = System.nanoTime()
      body
      val dc = compiles() - c0
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"$dc janino compiles")
      spark.catalog.clearCache()
      dc
    }
    println(s"== codegen churn probe: target=$target, churn=$churnDir ==")
    println(s"  codegen cache capacity: " +
      spark.conf.get("spark.sql.codegen.cache.maxEntries", "100"))
    measure(s"warm   $target")(
      graft.SparkEntry.queries(target)(spark, churnDir).count())
    val adjacent = measure(s"rerun  $target (ADJACENT)")(
      graft.SparkEntry.queries(target)(spark, churnDir).count())
    var churned = 0L
    val others = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1 != target)
    others.foreach { case (_, fn) =>
      try { val c0 = compiles(); fn(spark, churnDir).count()
            churned += compiles() - c0 }
      catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }
    println(s"  churn: ${others.length} queries compiled $churned classes " +
      "(vs the cache capacity above)")
    val decayed = measure(s"rerun  $target (DECAYED)")(
      graft.SparkEntry.queries(target)(spark, churnDir).count())
    println(s"== adjacency saves ${decayed - adjacent} recompiles on " +
      s"$target ==")
    spark.stop()
  }
}
