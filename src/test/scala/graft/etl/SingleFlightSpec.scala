package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.util.SingleFlight

/** C2 single-flight lock semantics (the distributed upgrade of the
  * reference's in-process etl_lock, main.py:17-18, 433) and the G3 SLA
  * marker in notifications (functionTimeout parity, host.json:15).
  */
class SingleFlightSpec extends SparkSpec {

  private def tmpLock(): String =
    Files.createTempDirectory("lock").toFile.getAbsolutePath + "/run.lock"

  test("lock acquires, runs, and releases — reacquirable afterwards") {
    val lock = tmpLock()
    var ran = 0
    assert(SingleFlight.tryLocked(spark, lock) { ran += 1; "ok" } == Some("ok"))
    assert(!new java.io.File(lock).exists(), "lock must be released")
    assert(SingleFlight.tryLocked(spark, lock) { ran += 1; "again" } == Some("again"))
    assert(ran == 2)
  }

  test("held lock refuses a second flight (returns None, body never runs)") {
    val lock = tmpLock()
    var inner = 0
    val outer = SingleFlight.tryLocked(spark, lock) {
      val nested = SingleFlight.tryLocked(spark, lock) { inner += 1; "nested" }
      assert(nested.isEmpty, "nested acquisition must be refused")
      "outer"
    }
    assert(outer == Some("outer") && inner == 0)
  }

  test("stale lock from a crashed run is taken over") {
    val lock = tmpLock()
    Files.writeString(java.nio.file.Paths.get(lock), "stale")
    // age the lock past the stale bound
    new java.io.File(lock).setLastModified(System.currentTimeMillis() - 10000)
    val r = SingleFlight.tryLocked(spark, lock, staleAfterMs = 5000) { "recovered" }
    assert(r == Some("recovered"))
    assert(!new java.io.File(lock).exists())
  }

  test("lock releases when the body throws (exception propagates)") {
    val lock = tmpLock()
    intercept[RuntimeException] {
      SingleFlight.tryLocked(spark, lock) { throw new RuntimeException("boom") }
    }
    assert(!new java.io.File(lock).exists(), "lock must release on failure")
  }

  test("SLA breach marks subject and body; within-SLA runs carry no marker") {
    val over = Notify.RunMetrics("R520.x.zip", isFileFailed = false, "",
      100, 1048576, totalTimeSeconds = 10000, slaSeconds = 9000)
    val pOver = Notify.payload(over, "a@x", "b@x")
    assert(pOver("Subject").contains("[SLA EXCEEDED]"))
    assert(pOver("Body").contains("SLA: EXCEEDED"))
    // the breach line reports the OVERAGE (1000 s = 16.67 min over the
    // 150-min bound), not the total run duration
    assert(pOver("Body").contains("16.67 min over a 150.0 min bound"),
           pOver("Body"))
    val in = over.copy(totalTimeSeconds = 100)
    val pIn = Notify.payload(in, "a@x", "b@x")
    assert(!pIn("Subject").contains("SLA"))
    assert(!pIn("Body").contains("SLA"))
    // default metrics (no SLA configured) never flag
    val noSla = Notify.RunMetrics("f", isFileFailed = false, "", 1, 1, 1e9)
    assert(!Notify.payload(noSla, "a@x", "b@x")("Subject").contains("SLA"))
  }
}
