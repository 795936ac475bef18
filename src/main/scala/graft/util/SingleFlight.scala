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

  /** Default stale bound: the reference's own run SLA (functionTimeout
    * 02:30:00, host.json:15) — a lock older than the longest legitimate run
    * belongs to a crashed one.
    */
  val DefaultStaleAfterMs: Long = 150L * 60 * 1000

  /** Run `body` holding the lock; None if another run holds it. The lock is
    * released on completion or failure (body exceptions propagate after
    * release).
    */
  def tryLocked[A](spark: SparkSession, lockPath: String,
                   staleAfterMs: Long = DefaultStaleAfterMs)(body: => A): Option[A] = {
    val p = new Path(lockPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def acquire(attempts: Int): Boolean =
      if (attempts <= 0) false
      else
        try {
          if (p.getParent != null) fs.mkdirs(p.getParent)
          val out = fs.create(p, /*overwrite=*/ false) // atomic claim
          out.write(s"${System.currentTimeMillis()}\n".getBytes("UTF-8"))
          out.close()
          true
        } catch {
          case _: java.io.IOException =>
            // held — or stale from a crashed run
            val stale =
              try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > staleAfterMs
              catch { case _: java.io.FileNotFoundException => true } // released just now
            if (stale) {
              try fs.delete(p, false) catch { case _: java.io.IOException => () }
              acquire(attempts - 1) // re-race through the atomic create
            } else false
        }

    if (!acquire(attempts = 3)) None
    else
      try Some(body)
      finally fs.delete(p, false)
  }
}
