package graft

import java.nio.file.Files

import graft.meta.MaintenanceLock

/** The append-vs-compaction mutex: atomic acquisition, loud timeout,
  * stale-holder takeover, and release-on-failure. */
class MaintenanceLockSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("mlock-spec").toString

  test("second acquisition fails while held; succeeds after release") {
    val dir = freshDir()
    assert(MaintenanceLock.tryAcquire(spark, dir))
    assert(!MaintenanceLock.tryAcquire(spark, dir))
    assert(MaintenanceLock.isHeld(spark, dir))
    MaintenanceLock.release(spark, dir)
    assert(!MaintenanceLock.isHeld(spark, dir))
    assert(MaintenanceLock.tryAcquire(spark, dir))
    MaintenanceLock.release(spark, dir)
  }

  test("acquisition is ATOMIC under a thread stampede: exactly one " +
      "winner per round, every round") {
    // the bug this pins: Hadoop's LOCAL create(overwrite=false) is
    // exists-then-create — under contention two callers both passed
    // the check and both 'held' the lock (caught as a PersistedPqSpec
    // race flake: the compactor swapped codes/ under a live appender)
    val dir = freshDir()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      (1 to 50).foreach { round =>
        val barrier = new java.util.concurrent.CyclicBarrier(16)
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val fs = (1 to 16).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit = {
              barrier.await()
              if (MaintenanceLock.tryAcquire(spark, dir))
                wins.incrementAndGet()
            }
          })
        }
        fs.foreach(_.get())
        assert(wins.get() == 1,
          s"round $round: ${wins.get()} threads won the same lock")
        MaintenanceLock.release(spark, dir)
      }
    } finally pool.shutdown()
  }

  test("withLock times out LOUDLY against a live holder and leaves " +
      "the holder's lock in place") {
    val dir = freshDir()
    assert(MaintenanceLock.tryAcquire(spark, dir))
    val e = intercept[IllegalStateException] {
      MaintenanceLock.withLock(spark, dir, waitMs = 400, pollMs = 50) {
        fail("body must not run unserialized")
      }
    }
    assert(e.getMessage.contains("not acquired"))
    assert(MaintenanceLock.isHeld(spark, dir),
      "a timed-out waiter must not break a live holder's lock")
    MaintenanceLock.release(spark, dir)
  }

  test("a STALE holder (crashed compactor) is broken and taken over") {
    val dir = freshDir()
    assert(MaintenanceLock.tryAcquire(spark, dir))
    // age the marker past the stale threshold
    val f = new java.io.File(dir, MaintenanceLock.LockName)
    assert(f.setLastModified(System.currentTimeMillis - 3600 * 1000L))
    var ran = false
    MaintenanceLock.withLock(spark, dir, waitMs = 2000, pollMs = 50,
      staleMs = 1000L) { ran = true }
    assert(ran, "stale lock not taken over")
    assert(!MaintenanceLock.isHeld(spark, dir))
  }

  test("a waiter blocks while held and proceeds on release") {
    val dir = freshDir()
    assert(MaintenanceLock.tryAcquire(spark, dir))
    @volatile var done = false
    val t = new Thread(() => {
      MaintenanceLock.withLock(spark, dir, waitMs = 10000,
        pollMs = 50) { done = true }
    })
    t.start()
    Thread.sleep(500)
    assert(!done, "waiter ran while the lock was held")
    MaintenanceLock.release(spark, dir)
    t.join(10000)
    assert(done, "waiter did not proceed after release")
  }

  test("withLock releases on body failure") {
    val dir = freshDir()
    intercept[RuntimeException] {
      MaintenanceLock.withLock(spark, dir) {
        throw new RuntimeException("boom")
      }
    }
    assert(!MaintenanceLock.isHeld(spark, dir))
  }
}
