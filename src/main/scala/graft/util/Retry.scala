package graft.util

/** Driver-level retry with exponential backoff — the reference's insert
  * retry loop (C4, /root/reference/main.py:213-262: ≤3 retries, 2ⁿ-second
  * backoff, re-raise after exhaustion). Executor-side failures are already
  * covered by `spark.task.maxFailures`; this wraps whole driver actions
  * (a JDBC commit, an archive move) the way the reference wraps
  * `executemany`.
  */
object Retry {

  /** Run `f`, retrying up to `maxRetries` times on non-fatal failure with
    * `baseDelayMs * 2ⁿ` backoff. Throws the last failure when exhausted.
    * `sleep` is injectable for tests.
    */
  def withBackoff[A](maxRetries: Int = 3, baseDelayMs: Long = 1000L,
                     sleep: Long => Unit = Thread.sleep)(f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries) throw e
          sleep(baseDelayMs * (1L << attempt)) // 2^n backoff (main.py:250)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
