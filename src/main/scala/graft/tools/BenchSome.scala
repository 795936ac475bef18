package graft.tools

/** Time a targeted subset of queries under Bench-identical conditions
  * (same session config, same untimed warmup + inter-query cleanup via
  * [[ToolSession]]) — the dev loop for single-query optimization without
  * paying a full suite run. Usage: BenchSome <sfDir> <query>... (repeat a
  * name to measure warm-vs-cold within one JVM; suffix a name with
  * `@/other/sf` to run that one against a different fixture — the
  * warmup-transfer experiment: `q_x@/root/testdata/sf0.001 q_x` measures
  * q_x at the default dir after an sf0.001 pass compiled its pipeline).
  * The pseudo-spec `!evict` drops warehouse+testdata pages from the OS
  * page cache (tools/evict_pages.py, fadvise DONTNEED) untimed — so
  * `q_x q_x !evict q_x` isolates the PURE disk-cold cost on a fully
  * JIT-warm pipeline (r16 driver-session experiments).
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = ToolSession.start()
    names.foreach { spec =>
      if (spec == "!evict") {
        val rc = new ProcessBuilder("python3", "tools/evict_pages.py")
          .inheritIO().start().waitFor()
        println(s"  == !evict == rc=$rc")
      } else {
        val (name, dir) = spec.split("@", 2) match {
          case Array(n, d) => (n, d)
          case _           => (spec, sfDir)
        }
        ToolSession.timed(spark, s"== $spec ==") {
          graft.SparkEntry.queries(name)(spark, dir).count()
        }
      }
    }
    spark.stop()
  }
}
