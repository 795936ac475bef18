package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** C2: single-flight execution lock (SURVEY.md §2.5).
  *
  * The reference serializes runs with an in-process `threading.Lock`
  * (/root/reference/main.py:17-18, 433) — which only guards one worker
  * process. This is the distributed equivalent: an atomic
  * create-no-overwrite of a lock file on the shared filesystem
  * (HDFS/posix `create(overwrite=false)` is atomic), so at most one run per
  * `lockPath` across ALL drivers/schedulers sharing the storage. A lock
  * older than `staleAfterMs` is presumed abandoned by a crashed run and
  * taken over (the create-race after a stale delete has exactly one winner,
  * because the re-acquire goes through the same atomic create).
  */
object SingleFlight {

  /** Default stale bound: 2× the reference's run SLA (functionTimeout
    * 02:30:00, host.json:15). Over-SLA runs are legitimate (they notify
    * `[SLA EXCEEDED]` rather than being killed), so the lease must outlive
    * the worst tolerated run, not the nominal one. This is a LEASE without
    * heartbeats: a run still alive past the stale bound can have its lock
    * presumed dead — callers with longer runs must pass a larger bound.
    */
  val DefaultStaleAfterMs: Long = 2L * 150 * 60 * 1000

  /** Run `body` holding the lock; None if another run holds it. The lock is
    * released on completion or failure (body exceptions propagate after
    * release); release deletes the lock only while it still holds OUR
    * token, so a contender that stole a presumed-stale lease does not get
    * its own lock deleted by the original holder's cleanup.
    */
  def tryLocked[A](spark: SparkSession, lockPath: String,
                   staleAfterMs: Long = DefaultStaleAfterMs)(body: => A): Option[A] = {
    val p = new Path(lockPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = java.util.UUID.randomUUID().toString

    def holdsOurToken: Boolean =
      try {
        val in = fs.open(p)
        // read LOOP: a single read() may legally short-read on some Hadoop
        // FS implementations, and a holder that misreads its own token
        // would skip release and wedge the lock until the stale bound
        val buf = new Array[Byte](64)
        var n = 0
        var r = 0
        while (n < buf.length && r >= 0) {
          r = in.read(buf, n, buf.length - n)
          if (r > 0) n += r
        }
        in.close()
        n > 0 && new String(buf, 0, n, "UTF-8").startsWith(token)
      } catch { case _: java.io.IOException => false }

    def acquire(attempts: Int): Boolean =
      if (attempts <= 0) false
      else
        try {
          if (p.getParent != null) fs.mkdirs(p.getParent)
          val out = fs.create(p, /*overwrite=*/ false) // atomic claim
          out.write(s"$token\n${System.currentTimeMillis()}\n".getBytes("UTF-8"))
          out.close()
          true
        } catch {
          case _: java.io.IOException =>
            // held — or stale from a crashed run
            val stale =
              try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > staleAfterMs
              catch { case _: java.io.FileNotFoundException => true } // released just now
            if (stale) {
              // CAS-style takeover: rename the stale lock aside first —
              // atomic with exactly one winner — so two contenders cannot
              // both delete-and-create (a bare delete would let contender B
              // remove contender C's FRESH lock created a moment earlier)
              val aside = new Path(p.getParent,
                s".${p.getName}.stale.${java.util.UUID.randomUUID()}")
              val won = try fs.rename(p, aside) catch { case _: java.io.IOException => false }
              if (won) {
                // TOCTOU re-check: between OUR staleness probe and the
                // rename, a rival can complete its own takeover and
                // re-create a FRESH lock at p — the rename-aside only
                // serializes two stale-deleters, not stale-check vs fresh
                // re-create. Rename preserves mtime, so inspect the aside
                // file: if it is not actually stale, we just moved a LIVE
                // lock — put it back and refuse, instead of deleting a
                // rival's lease and re-racing into a double-hold.
                val asideStale =
                  try System.currentTimeMillis() - fs.getFileStatus(aside).getModificationTime > staleAfterMs
                  catch { case _: java.io.IOException => true }
                if (asideStale) {
                  try fs.delete(aside, false) catch { case _: java.io.IOException => () }
                  acquire(attempts - 1)
                } else {
                  try fs.rename(aside, p) catch { case _: java.io.IOException => () }
                  false
                }
              } else
                // lost the rename race — re-race through the atomic create
                acquire(attempts - 1)
            } else false
        }

    if (!acquire(attempts = 3)) None
    else
      try Some(body)
      finally if (holdsOurToken) fs.delete(p, false)
  }
}
