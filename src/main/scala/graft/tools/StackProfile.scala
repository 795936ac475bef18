package graft.tools

/** In-JVM sampling profiler for a single query's executor-side work —
  * the diagnostic that answers "WHERE does the task CPU go" when
  * StageBench shows a stage whose summed task run time is far beyond its
  * row count (r16 verdict item 2: q_stream_join's stateful stage burned
  * 132 CPU-s over 32 tasks on 40k input rows). External attach (jstack)
  * races the forked runner JVM's lifetime; this samples from INSIDE via
  * `Thread.getAllStackTraces` while the query runs, then prints the
  * top-N hottest executor frames and the hottest full stack.
  *
  * Usage: StackProfile <sfDir> <query> [reps=3] — reps > 1 separates
  * first-run compile cost from steady-state (only the LAST rep is
  * sampled).
  */
object StackProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = ToolSession.start()

    for (i <- 1 until reps) {
      ToolSession.timed(spark, s"== $name warm $i ==") {
        graft.SparkEntry.queries(name)(spark, sfDir).count()
      }
    }

    val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val stacks = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch worker") &&
              t.getState == Thread.State.RUNNABLE && st.nonEmpty) {
            // top 5 frames individually (hot-frame histogram) + the top-8
            // condensed stack (hot-path histogram)
            st.take(5).foreach { f =>
              frames.merge(s"${f.getClassName}.${f.getMethodName}", 1, _ + _)
            }
            val key = st.take(8)
              .map(f => s"${f.getClassName}.${f.getMethodName}").mkString(" <- ")
            stacks.merge(key, 1, _ + _)
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    ToolSession.timed(spark, s"== $name sampled ==") {
      graft.SparkEntry.queries(name)(spark, sfDir).count()
    }
    sampling = false
    sampler.join()

    import scala.jdk.CollectionConverters._
    println("-- hottest executor frames (top-5-of-stack histogram) --")
    frames.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, n) =>
      println(f"  $n%6d  $f")
    }
    println("-- hottest condensed stacks --")
    stacks.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (s, n) =>
      println(f"  $n%6d  $s")
    }
    spark.stop()
  }
}
