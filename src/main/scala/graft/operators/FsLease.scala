package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem lease for fencing index writers: an exclusive marker file
  * created with `overwrite = false`, which HDFS-like filesystems make an
  * atomic create-if-absent. Holding the lease = the file exists and you
  * created it; release = delete it.
  *
  * Stale-holder recovery: a holder that crashes leaves the file behind,
  * so acquisition treats a lease file older than `staleTtlMs` as
  * abandoned and breaks it (verified rename-away + retry). Holds taken
  * through [[withLease]] heartbeat the mtime while they run, so the TTL
  * bounds how long a CRASHED holder blocks contenders — not how long a
  * legitimate hold may last; raw [[acquire]]/[[release]] callers (no
  * heartbeat) must still size the TTL past their longest hold.
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

  /** Default stale-holder TTL. With [[withLease]]'s heartbeat this is
    * purely the crash-detection horizon (a dead holder blocks writers
    * for at most this long); it no longer needs to exceed the longest
    * write job.
    */
  val DefaultStaleTtlMs: Long = 10L * 60 * 1000

  /** Default acquisition wait: long enough to wait out a competing
    * append or a maintenance swap (both sub-minute critical sections).
    */
  val DefaultTimeoutMs: Long = 10L * 60 * 1000

  /** Same-JVM contenders must serialize the create-if-absent attempt:
    * on HDFS/object stores `create(overwrite = false)` is atomic, but
    * Hadoop's LOCAL filesystem approximates it with exists-then-create,
    * and two threads of one process (an ingest loop and the maintenance
    * poller — exactly the production pairing) can both pass the check,
    * interleave their tag writes through separate streams, and each
    * proceed as "holder". Observed live (r15 interleaving work): the
    * lease file held `append@<uuid>` plus the TAIL of the longer
    * `maintain-swap@<uuid>` tag, so NEITHER owner-verified release
    * matched and the leaked file blocked every writer for a full stale
    * TTL. A per-path JVM monitor closes the same-process window — the
    * only surface where the local fs is used; cross-process atomicity
    * stays the filesystem's contract (the documented boundary above).
    * Striped rather than per-path: a map keyed by path string would
    * grow one interned monitor per lease path for the life of the JVM
    * (a long-lived driver touches unboundedly many index dirs); hash
    * collisions merely serialize two unrelated paths' create ATTEMPTS —
    * a sub-millisecond critical section — never their holds.
    */
  private val jvmCreateLocks = Array.fill(64)(new Object)
  private def createLockFor(path: Path): Object =
    jvmCreateLocks(math.floorMod(path.toString.hashCode, jvmCreateLocks.length))

  /** Acquire the lease at `path`, waiting up to `timeoutMs` for a
    * fresh competing holder and breaking holders staler than
    * `staleTtlMs`. `timeoutMs = 0` = fail fast if held.
    *
    * `owner` MUST be unique per acquisition attempt (e.g. carry a
    * UUID): the verify step concludes "acquired" from seeing its own
    * tag in the file, so two processes acquiring with the SAME stable
    * tag could both conclude they hold the lease. [[withLease]]
    * enforces this internally; direct callers of acquire/release own
    * the obligation.
    */
  def acquire(fs: FileSystem, path: Path, owner: String,
      staleTtlMs: Long = DefaultStaleTtlMs,
      timeoutMs: Long = DefaultTimeoutMs): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    val monitor = createLockFor(path)
    var acquired = false
    while (!acquired) {
      monitor.synchronized {
        try {
          val out = fs.create(path, false)
          out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
        } catch { case _: java.io.IOException => () }
      }
      // verify OUR tag survived the write: a cross-process local-fs
      // racer can still truncate-and-interleave concurrently (the JVM
      // monitor only serializes this process). Losing the verify means
      // losing the acquisition — loop and contend again; never delete
      // (the file may be the rightful winner's fresh lease). The check
      // deliberately ignores WHICH iteration created the file: owner
      // tags are per-acquisition UUIDs, so a file carrying our tag can
      // only be our own successful create whose verify read failed
      // transiently on an earlier pass — without this, that pass would
      // contend against its own lease until timeout and leave a
      // heartbeat-less file blocking every writer for the stale TTL.
      if (currentOwner(fs, path).contains(owner)) acquired = true
      else {
        val st =
          try Option(fs.getFileStatus(path))
          catch { case _: java.io.FileNotFoundException => None }
        st match {
          case Some(s)
            if System.currentTimeMillis() - s.getModificationTime > staleTtlMs =>
            // abandoned by a crashed holder — break it and retry.
            // Break = re-verify + rename-to-tombstone, NOT a blind
            // delete (ADVICE r13): two contenders observing the same
            // stale file could otherwise interleave as break → fresh
            // re-create → second delete destroys the FRESH lease and
            // lets a third writer in. The re-stat skips the break when
            // the file changed since observation (someone broke it and
            // re-created first), and the rename serializes simultaneous
            // breakers — exactly one rename succeeds, the loser loops
            // and sees the winner's fresh lease. The leftover window is
            // the stat→rename instant, the same class release() accepts.
            val still =
              try Option(fs.getFileStatus(path))
              catch { case _: java.io.FileNotFoundException => None }
            if (still.exists(_.getModificationTime == s.getModificationTime)) {
              val tomb = new Path(path.getParent,
                s".${path.getName}.broken-${java.util.UUID.randomUUID()}")
              if (fs.rename(path, tomb)) fs.delete(tomb, false)
            }
          case Some(_) if System.nanoTime() >= deadline =>
            // last look before giving up: with timeoutMs = 0 (the
            // maintainer fail-fast) this is the ONLY second read — if
            // the earlier verify failed transiently on our own
            // just-created file, throwing here would orphan it (no
            // heartbeat, no release) and block every writer for the
            // stale TTL
            if (currentOwner(fs, path).contains(owner)) acquired = true
            else throw new LeaseHeldException(
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
  def release(fs: FileSystem, path: Path, owner: String): Boolean =
    currentOwner(fs, path) match {
      case Some(current) if current == owner =>
        fs.delete(path, false); true
      case _ => false // gone, or broken while we stalled — not ours
    }

  /** Owner tag currently written in the lease file, if readable.
    *
    * Transient read failures (an object-store throttle, a
    * read-after-write hiccup) RETRY briefly before concluding None:
    * every caller treats None as "not mine", and for the acquire verify
    * that conclusion is load-bearing — a false None right after a
    * successful create would send the fail-fast (`timeoutMs = 0`) path
    * into LeaseHeldException with its own heartbeat-less lease file
    * left blocking every writer for the stale TTL (the multi-pass
    * self-heal in [[acquire]] has no second pass there). A missing
    * file is a definitive state, not a transient, and returns
    * immediately.
    */
  private def currentOwner(fs: FileSystem, path: Path): Option[String] = {
    var attempt = 0
    while (true) {
      try {
        val in = fs.open(path)
        try return Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      } catch {
        case _: java.io.FileNotFoundException => return None
        case _: java.io.IOException if attempt < 3 =>
          attempt += 1; Thread.sleep(10)
        case _: java.io.IOException => return None
      }
    }
    None // unreachable
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
    * including on throw. `owner` is a display prefix only: the actual
    * tag written is `owner#<UUID>`, so callers may pass stable strings
    * without violating [[acquire]]'s per-acquisition-uniqueness
    * contract (ADVICE r15).
    *
    * The hold is HEARTBEAT-protected (VERDICT r13 #4 / ADVICE r13): a
    * daemon thread refreshes the lease mtime every
    * min(staleTtlMs, DefaultStaleTtlMs)/3 while `body` runs, so a
    * legitimate hold longer than the TTL — an append write job at
    * 100 TB, a maintain rewrite over a big index — is never mistaken
    * for a crashed holder and broken mid-write. The min() keeps a
    * long-TTL holder fresh in the eyes of observers using the DEFAULT
    * TTL (recoverFromCrashedCompact's isHeldFresh checks), so the TTL
    * bounds CRASH-DETECTION latency, not hold length. Each beat
    * re-reads the owner tag and stops if the lease was broken anyway
    * (a full-process stall can still outlast a beat) — a zombie's beat
    * must never refresh the NEW holder's lease; the downstream
    * snapshot/fingerprint guards own that residual window.
    */
  def withLease[T](fs: FileSystem, path: Path, owner: String,
      staleTtlMs: Long = DefaultStaleTtlMs,
      timeoutMs: Long = DefaultTimeoutMs)(body: => T): T = {
    // per-acquisition unique tag regardless of what the caller passed:
    // acquire's verify is only sound under unique tags (its scaladoc),
    // and withLease controls both ends of the hold, so it can enforce
    // the contract instead of exporting it (ADVICE r15)
    val tag = s"$owner#${java.util.UUID.randomUUID()}"
    acquire(fs, path, tag, staleTtlMs, timeoutMs)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beatMs = math.max(50L, math.min(staleTtlMs, DefaultStaleTtlMs) / 3)
    val beater = new Thread(() => {
      while (!stop.get()) {
        try Thread.sleep(beatMs)
        catch { case _: InterruptedException => () }
        if (!stop.get()) {
          try {
            if (currentOwner(fs, path).contains(tag))
              fs.setTimes(path, System.currentTimeMillis(), -1)
            else stop.set(true) // broken during a stall — ours no more
          } catch {
            // a filesystem without setTimes degrades to the pre-
            // heartbeat behavior (TTL must exceed the hold) — never
            // fail the holder's work over a refresh
            case _: Throwable => stop.set(true)
          }
        }
      }
    }, s"graft-lease-heartbeat-${path.getName}")
    beater.setDaemon(true)
    beater.start()
    try body finally {
      stop.set(true)
      beater.interrupt()
      release(fs, path, tag)
    }
  }
}
