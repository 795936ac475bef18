package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the Bench harness's failure contract (r11 verdict item 6): a
  * query that throws is recorded in the failed list — loudly, to stderr —
  * never silently timed as a near-zero success that flatters the total.
  * A JVM-fatal error additionally aborts the run (r12 advice): timings
  * taken after an OOM are unreliable, so none are taken.
  */
class BenchSpec extends AnyFunSuite {

  test("timeQueries records a throwing query in the failed list and keeps timing the rest") {
    var cleanups = 0
    val (results, failed, fatal) = Bench.timeQueries(
      Seq(
        "q_ok_first" -> (() => ()),
        "q_boom" -> (() => sys.error("forced bench failure")),
        "q_ok_last" -> (() => ())),
      cleanup = () => cleanups += 1)
    assert(failed == Seq("q_boom"), failed.mkString(","))
    assert(fatal.isEmpty)
    // the suite keeps going: every query reports a timing, failed or not
    assert(results.map(_._1) == Seq("q_ok_first", "q_boom", "q_ok_last"))
    assert(results.forall(_._2 >= 0.0))
    // cleanup stays untimed but still runs after a failed query
    assert(cleanups == 3)
  }

  test("timeQueries with no failures returns an empty failed list (no spurious \"failed\" key)") {
    val (results, failed, fatal) = Bench.timeQueries(Seq("q_ok" -> (() => ())))
    assert(failed.isEmpty && fatal.isEmpty && results.length == 1)
  }

  test("preWarm runs untimed before each query, and a throwing warm pass never fails the timed query") {
    // the adjacent JIT-warm contract (r14): the hook fires per query BEFORE
    // the clock starts; a broken warm pass is swallowed so the failure
    // surfaces (or not) in the timed run itself, never masked by warmup
    val order = scala.collection.mutable.ListBuffer.empty[String]
    val (results, failed, _) = Bench.timeQueries(
      Seq(
        "q_warmed" -> (() => { order += "run:q_warmed"; () }),
        "q_cold" -> (() => { order += "run:q_cold"; () })),
      preWarm = name => {
        order += s"warm:$name"
        if (name == "q_cold") sys.error("forced warm failure")
      })
    assert(failed.isEmpty, "a throwing preWarm must not fail the timed query")
    assert(order.toList == List(
      "warm:q_warmed", "run:q_warmed", "warm:q_cold", "run:q_cold"),
      order.mkString(","))
    assert(results.map(_._1) == Seq("q_warmed", "q_cold"))
  }

  test("a JVM-fatal error in preWarm aborts like the timed path: timings kept, query never timed") {
    // an OOM in the warm pass must not propagate uncaught (which would
    // discard every completed timing with no tainted record) NOR be
    // silently swallowed (the JVM is wedged) — it gets the timed path's
    // flush-and-abort treatment
    var ranTimed = false
    val (results, failed, fatal) = Bench.timeQueries(
      Seq(
        "q_ok_first" -> (() => ()),
        "q_warm_oom" -> (() => { ranTimed = true })),
      preWarm = name =>
        if (name == "q_warm_oom") throw new OutOfMemoryError("forced warm fatal"))
    assert(fatal.contains("OutOfMemoryError at q_warm_oom (preWarm)"), fatal.toString)
    assert(failed == Seq("q_warm_oom"))
    assert(!ranTimed, "the timed query ran in a wedged JVM")
    // completed timings flush; the aborted query reports none
    assert(results.map(_._1) == Seq("q_ok_first"))
  }

  test("timeQueries aborts on a JVM-fatal error: completed timings kept, later queries never run") {
    var ranLast = false
    var cleanups = 0
    val (results, failed, fatal) = Bench.timeQueries(
      Seq(
        "q_ok_first" -> (() => ()),
        // synthetic, never allocation-driven: constructing and throwing an
        // OOM object is safe; timeQueries must still treat it as fatal
        "q_oom" -> (() => throw new OutOfMemoryError("forced fatal")),
        "q_never" -> (() => { ranLast = true })),
      cleanup = () => cleanups += 1)
    assert(fatal.contains("OutOfMemoryError at q_oom"), fatal.toString)
    assert(failed == Seq("q_oom"))
    // partial timings beat total loss: the completed + fatal entries flush
    assert(results.map(_._1) == Seq("q_ok_first", "q_oom"))
    assert(!ranLast, "a query after the fatal error was still run")
    // no best-effort cleanup pass in a possibly-wedged JVM
    assert(cleanups == 1)
  }
}
