package graft.sources

import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The bounded planning pool: order preservation, original-exception
  * propagation, and prompt abort — a failure must cancel the queued
  * planFile tasks instead of letting a 100k-file plan run to completion
  * after it is already doomed.
  */
class PlanFilesSpec extends AnyFunSuite {

  test("preserves lexicographic file order") {
    val files = (0 until 40).map(i => new Path(f"/in/f$i%03d"))
    val out = HadoopIO.planFiles(files)(f => Seq(f.getName, f.getName + "#2"))
    assert(out == files.flatMap(f => Seq(f.getName, f.getName + "#2")))
  }

  test("throws the original exception, not the ExecutionException wrapper") {
    val files = (0 until 8).map(i => new Path(s"/in/f$i"))
    val boom = intercept[IllegalStateException] {
      HadoopIO.planFiles(files) { f =>
        if (f.getName == "f3") throw new IllegalStateException("bad header")
        Seq(f.getName)
      }
    }
    assert(boom.getMessage == "bad header")
  }

  test("a planning failure cancels queued tasks instead of draining them") {
    val files = (0 until 256).map(i => new Path(f"/in/f$i%03d"))
    val ran = new AtomicInteger(0)
    intercept[IllegalStateException] {
      HadoopIO.planFiles(files) { f =>
        if (f.getName == "f000") throw new IllegalStateException("first file bad")
        ran.incrementAndGet()
        Thread.sleep(20) // slow enough that the queue is deep at failure time
        Seq(f.getName)
      }
    }
    // pool width is ≤16; shutdownNow() after the first failure means at most
    // a couple of rounds of in-flight tasks complete — nowhere near all 255.
    // (Pre-fix, shutdown() drained the entire queue: ran would be 255.)
    assert(ran.get() < 128, s"queued planning tasks kept running after failure: ${ran.get()}")
  }
}
