package graft.queries

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Fixtures.ensure must be atomic per path: the round-13 implementation was
  * check-then-act (contains → write → add), which double-writes under a
  * concurrent harness. Also pins exception safety: a failed write leaves the
  * path unmarked so a retry re-runs it.
  */
class FixturesSpec extends AnyFunSuite {

  test("concurrent ensure on one path runs the write exactly once") {
    Fixtures.reset()
    val prev = Fixtures.reuseEnabled
    Fixtures.reuseEnabled = true
    try {
      val writes = new AtomicInteger(0)
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(8)
      val tasks = (1 to 8).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            Fixtures.ensure("/tmp/fixtures-spec-race") {
              writes.incrementAndGet()
              Thread.sleep(20) // widen the race window
            }
          }
        })
      }
      start.countDown()
      tasks.foreach(_.get(10, TimeUnit.SECONDS))
      pool.shutdown()
      assert(writes.get() == 1, s"write ran ${writes.get()} times")
    } finally {
      Fixtures.reuseEnabled = prev
      Fixtures.reset()
    }
  }

  test("a throwing write leaves the path unmarked (retry re-runs)") {
    Fixtures.reset()
    val prev = Fixtures.reuseEnabled
    Fixtures.reuseEnabled = true
    try {
      val writes = new AtomicInteger(0)
      intercept[RuntimeException] {
        Fixtures.ensure("/tmp/fixtures-spec-throw") {
          writes.incrementAndGet(); throw new RuntimeException("boom")
        }
      }
      Fixtures.ensure("/tmp/fixtures-spec-throw")(writes.incrementAndGet())
      Fixtures.ensure("/tmp/fixtures-spec-throw")(writes.incrementAndGet())
      assert(writes.get() == 2) // failed attempt + one successful retry
    } finally {
      Fixtures.reuseEnabled = prev
      Fixtures.reset()
    }
  }

  test("nested ensure (a fixture whose write builds another fixture) completes") {
    // the round-14 computeIfAbsent form ran the write INSIDE the map
    // operation: a same-thread nested ensure violated the compute contract
    // (IllegalStateException / livelock on bin collision). The future-memo
    // form runs writes outside the map, so nesting is plain recursion.
    Fixtures.reset()
    val prev = Fixtures.reuseEnabled
    Fixtures.reuseEnabled = true
    try {
      val writes = new AtomicInteger(0)
      Fixtures.ensure("/tmp/fixtures-spec-outer") {
        writes.incrementAndGet()
        Fixtures.ensure("/tmp/fixtures-spec-inner")(writes.incrementAndGet())
      }
      Fixtures.ensure("/tmp/fixtures-spec-inner")(writes.incrementAndGet())
      assert(writes.get() == 2)
    } finally {
      Fixtures.reuseEnabled = prev
      Fixtures.reset()
    }
  }

  test("reuse disabled: every call writes") {
    Fixtures.reset()
    val prev = Fixtures.reuseEnabled
    Fixtures.reuseEnabled = false
    try {
      val writes = new AtomicInteger(0)
      Fixtures.ensure("/tmp/fixtures-spec-off")(writes.incrementAndGet())
      Fixtures.ensure("/tmp/fixtures-spec-off")(writes.incrementAndGet())
      assert(writes.get() == 2)
    } finally {
      Fixtures.reuseEnabled = prev
      Fixtures.reset()
    }
  }
}
