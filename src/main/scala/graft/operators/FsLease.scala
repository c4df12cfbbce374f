package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem lease for fencing index writers: an exclusive marker file
  * created with `overwrite = false`, which HDFS-like filesystems make an
  * atomic create-if-absent. Holding the lease = the file exists and you
  * created it; release = delete it.
  *
  * Stale-holder recovery: a holder that crashes leaves the file behind,
  * so acquisition treats a lease file older than `staleTtlMs` as
  * abandoned and breaks it (deletes + retries). The TTL must therefore
  * exceed the longest legitimate hold — callers that hold across a
  * Spark write job size it to the job, not the default.
  *
  * Scope of the guarantee: create-if-absent is atomic on HDFS and on
  * object stores with conditional-put semantics; Hadoop's local
  * filesystem approximates it with exists-then-create, which is fine
  * for same-host processes (this engine's test/demo surface) but not a
  * distributed lock manager. True multi-writer transactional isolation
  * needs a table format — the same boundary
  * [[graft.streaming.VectorsStreaming.appendVectorBatch]] documents.
  * What the lease buys within that boundary: ingest appends and an
  * async [[Ivf.maintain]] compact cannot interleave destructively —
  * the failure mode becomes "wait briefly" or a NAMED
  * [[LeaseHeldException]], never a silent drop.
  */
object FsLease {

  /** A lease acquisition that found the lease held (and fresh) past its
    * wait budget. Typed so callers can distinguish "another writer is
    * active — defer" from genuine failures.
    */
  final class LeaseHeldException(msg: String)
    extends IllegalStateException(msg)

  /** Default stale-holder TTL: generous enough for an append write job
    * at test/demo scale; production holders sizing multi-minute jobs
    * pass their own.
    */
  val DefaultStaleTtlMs: Long = 10L * 60 * 1000

  /** Default acquisition wait: long enough to wait out a competing
    * append or a maintenance swap (both sub-minute critical sections).
    */
  val DefaultTimeoutMs: Long = 10L * 60 * 1000

  /** Acquire the lease at `path`, waiting up to `timeoutMs` for a
    * fresh competing holder and breaking holders staler than
    * `staleTtlMs`. `timeoutMs = 0` = fail fast if held.
    */
  def acquire(fs: FileSystem, path: Path, owner: String,
      staleTtlMs: Long = DefaultStaleTtlMs,
      timeoutMs: Long = DefaultTimeoutMs): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var acquired = false
    while (!acquired) {
      val created =
        try {
          val out = fs.create(path, false)
          out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (created) acquired = true
      else {
        val st =
          try Option(fs.getFileStatus(path))
          catch { case _: java.io.FileNotFoundException => None }
        st match {
          case Some(s)
            if System.currentTimeMillis() - s.getModificationTime > staleTtlMs =>
            // abandoned by a crashed holder — break it and retry
            fs.delete(path, false)
          case Some(_) if System.nanoTime() >= deadline =>
            throw new LeaseHeldException(
              s"lease $path is held by another writer (fresh within " +
                s"$staleTtlMs ms) and did not release within $timeoutMs ms " +
                "— a competing append/maintenance is active; defer or retry")
          case Some(_) => Thread.sleep(25)
          case None => () // vanished between create and stat — retry now
        }
      }
    }
  }

  /** Release the lease IF still owned. The owner check matters for the
    * stale-break path: a holder that STALLS (GC pause, not death) past
    * the TTL can have its lease broken and re-acquired by another
    * writer — an unconditional delete in the stalled holder's `finally`
    * would then destroy the NEW holder's lease and let a third writer
    * in. Reading the owner tag first turns that into a no-op (the
    * check-then-delete is not atomic, but it shrinks the vulnerable
    * window from "every stale-broken release" to the instant between
    * read and delete — and a stalled holder's work is already
    * fingerprint-guarded downstream). Returns true iff this call
    * deleted the lease.
    */
  def release(fs: FileSystem, path: Path, owner: String): Boolean = {
    val current =
      try {
        val in = fs.open(path)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: java.io.IOException => return false } // already gone
    if (current == owner) { fs.delete(path, false); true }
    else false // broken while we stalled; the new holder owns it now
  }

  /** True iff the lease file exists and its holder is presumed alive
    * (mtime within `staleTtlMs`). Observers use this to distinguish "a
    * maintainer is mid-operation — wait" from "a crashed holder left
    * state behind — recover".
    */
  def isHeldFresh(fs: FileSystem, path: Path,
      staleTtlMs: Long = DefaultStaleTtlMs): Boolean =
    try {
      System.currentTimeMillis() -
        fs.getFileStatus(path).getModificationTime <= staleTtlMs
    } catch { case _: java.io.FileNotFoundException => false }

  /** Run `body` holding the lease; always released (owner-verified),
    * including on throw.
    */
  def withLease[T](fs: FileSystem, path: Path, owner: String,
      staleTtlMs: Long = DefaultStaleTtlMs,
      timeoutMs: Long = DefaultTimeoutMs)(body: => T): T = {
    acquire(fs, path, owner, staleTtlMs, timeoutMs)
    try body finally release(fs, path, owner)
  }
}
