package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the Bench harness's failure contract (r11 verdict item 6): a
  * query that throws is recorded in the failed list — loudly, to stderr —
  * never silently timed as a near-zero success that flatters the total.
  */
class BenchSpec extends AnyFunSuite {

  test("timeQueries records a throwing query in the failed list and keeps timing the rest") {
    var cleanups = 0
    val (results, failed) = Bench.timeQueries(
      Seq(
        "q_ok_first" -> (() => ()),
        "q_boom" -> (() => sys.error("forced bench failure")),
        "q_ok_last" -> (() => ())),
      cleanup = () => cleanups += 1)
    assert(failed == Seq("q_boom"), failed.mkString(","))
    // the suite keeps going: every query reports a timing, failed or not
    assert(results.map(_._1) == Seq("q_ok_first", "q_boom", "q_ok_last"))
    assert(results.forall(_._2 >= 0.0))
    // cleanup stays untimed but still runs after a failed query
    assert(cleanups == 3)
  }

  test("timeQueries with no failures returns an empty failed list (no spurious \"failed\" key)") {
    val (results, failed) = Bench.timeQueries(Seq("q_ok" -> (() => ())))
    assert(failed.isEmpty && results.length == 1)
  }
}
