package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import graft.operators.ArtifactBuild

/** Chaos contracts for the r15 breaker-race closure (VERDICT r14 #8):
  * forces the two interleavings the old protocol left open and pins
  * the new behavior —
  *
  *  1. a breaker CAPTURES a live holder's lock while re-evaluating
  *     freshness → the holder's heartbeat re-installs the lock, the
  *     breaker's rename-back fails, and the capture is discarded;
  *  2. a breaker restores a lock whose holder released INTO the
  *     capture window (nothing left to delete) → the restored orphan's
  *     mtime stays frozen, and the SAME breaker fast-reaps it after
  *     ~2.5 heartbeat intervals (staleLockMs/2 wait + one full
  *     interval of frozen-mtime confirmation) instead of stalling a
  *     full staleLockMs.
  *
  * The interleavings are forced through the onStaleObserved /
  * onOrphanReap test seams — no sleeps standing in for causality.
  */
class ArtifactChaosSpec extends AnyFunSuite with SparkTestSession {

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readToken(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def withStaleMs[T](ms: Long)(body: => T): T = {
    val prev = sys.props.get("graft.artifact.lock.staleMs")
    sys.props("graft.artifact.lock.staleMs") = ms.toString
    try body finally prev match {
      case Some(v) => sys.props("graft.artifact.lock.staleMs") = v
      case None => sys.props.remove("graft.artifact.lock.staleMs")
    }
  }

  test("heartbeat re-installs a captured lock; the capture is void") {
    withStaleMs(3000) {
      val root = Files.createTempDirectory("graft-chaos-hb").toString
      val lock = new Path(s"$root/art.lock")
      val fs = fsFor(lock)
      val token = ArtifactBuild.acquireCrossJvmLock(fs, lock)
      val hb = new ArtifactBuild.LockHeartbeat(fs, lock, token).start()
      try {
        // the breaker's capture: lock renamed aside mid-evaluation
        val broken = new Path(s"$root/art.lock.broken-chaos")
        assert(fs.rename(lock, broken))
        // the live holder's heartbeat must re-install within a few
        // intervals (staleLockMs/3 = 1 s; generous under suite load).
        // Poll for the TOKEN, not bare existence: create-then-write is
        // two syscalls, and reading in between sees an empty file (the
        // same ms-wide window the acquire path documents for the local
        // FS — holdsToken is false for everyone during it, so it is
        // benign for the protocol, but a bare-exists poll here races it)
        val deadline = System.currentTimeMillis() + 10000
        def tokenSeen() =
          try fs.exists(lock) && readToken(fs, lock) == token
          catch { case _: java.io.IOException => false }
        while (!tokenSeen() && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(tokenSeen(),
          "heartbeat never re-installed the captured lock with its token")
        // the breaker's rename-back is void EITHER way: on a strict FS
        // it fails (destination exists) and the breaker discards its
        // capture; the local FS's non-atomic exists-then-rename can
        // instead OVERWRITE — but the overwriting file is the holder's
        // own captured lock (same token), so the lock still carries
        // the holder's token and its live heartbeat keeps refreshing
        // it. No interleaving yields a foreign or orphaned lock — the
        // semantic contract, asserted below in place of a brittle
        // rename-return-code check.
        if (!fs.rename(broken, lock)) fs.delete(broken, false)
        assert(fs.exists(lock) && readToken(fs, lock) == token,
          "after the rename-back attempt the lock must still be the " +
            "holder's")
        val litter = fs.globStatus(new Path(s"$root/art.lock.broken-*"))
        assert(litter == null || litter.isEmpty,
          "no capture may be left behind")
      } finally {
        hb.stop()
        ArtifactBuild.releaseCrossJvmLock(fs, lock, token)
      }
      assert(!fs.exists(lock), "release must remove the holder's lock")
      // stop() joined the heartbeat: nothing can resurrect post-release
      Thread.sleep(2500)
      assert(!fs.exists(lock), "a straggler heartbeat resurrected the lock")
    }
  }

  test("a restored orphan (holder released into the capture) is fast-reaped") {
    // staleMs=9000 keeps the fast-reap (~7.5 s: staleMs/2 frozen wait
    // + staleMs/3 confirmation) well clear of BOTH the assert bound
    // and the ordinary full-stale fallback (9 s from the restore,
    // which reset the mtime near t0) — at 6000 the two paths landed
    // ~600 ms apart and the assert couldn't tell them apart (ADVICE
    // r16)
    withStaleMs(9000) {
      val root = Files.createTempDirectory("graft-chaos-reap").toString
      val lock = new Path(s"$root/art.lock")
      val fs = fsFor(lock)
      // a DEPARTED holder's lock: stale mtime, no heartbeat, and its
      // release already ran (found nothing during the capture window)
      val out = fs.create(lock, false)
      try out.write("departed-holder-token".getBytes("UTF-8")) finally out.close()
      fs.setTimes(lock, System.currentTimeMillis() - 100000, -1)

      val reaps = new java.util.concurrent.atomic.AtomicInteger(0)
      val reapAt = new java.util.concurrent.atomic.AtomicLong(0L)
      val refreshed = new java.util.concurrent.atomic.AtomicBoolean(false)
      ArtifactBuild.onStaleObserved = p =>
        // force the freshAfterAll give-back exactly once: the holder's
        // last heartbeat lands between the breaker's staleness read
        // and its rename — afterwards the holder is gone for good
        if (refreshed.compareAndSet(false, true))
          fs.setTimes(p, System.currentTimeMillis(), -1)
      ArtifactBuild.onOrphanReap = _ => {
        reaps.incrementAndGet()
        reapAt.set(System.currentTimeMillis())
      }
      try {
        val t0 = System.currentTimeMillis()
        val token = ArtifactBuild.acquireCrossJvmLock(fs, lock)
        assert(reaps.get() == 1,
          "acquire must go through the own-orphan fast-reap exactly once")
        // assert on the reap SEAM's own timestamp, not acquire's total
        // wall-clock: the fast-reap fires after staleLockMs/2 (first
        // frozen-mtime observation, 4.5 s) plus ONE full heartbeat
        // interval of confirmation (staleLockMs/3, 3 s — a
        // merely-delayed live heartbeat gets a second chance to
        // advance the mtime), i.e. ~7.5 s + poll granularity. The
        // ordinary full-stale fallback can't fire before 9 s from the
        // RESTORE (which reset the clock near t0), so the window
        // [7000, 8700] pins the FAST path specifically.
        val reapElapsed = reapAt.get() - t0
        assert(reapElapsed >= 7000,
          s"reap at ${reapElapsed}ms — before both frozen-mtime observations")
        assert(reapElapsed < 8700,
          s"reap at ${reapElapsed}ms — that is the full-stale fallback, not the fast path")
        assert(readToken(fs, lock) == token)
        val litter = fs.globStatus(new Path(s"$root/art.lock.broken-*"))
        assert(litter == null || litter.isEmpty,
          "no .broken-* capture may be left behind")
        ArtifactBuild.releaseCrossJvmLock(fs, lock, token)
        assert(!fs.exists(lock))
      } finally {
        ArtifactBuild.onStaleObserved = _ => ()
        ArtifactBuild.onOrphanReap = _ => ()
      }
    }
  }
}
