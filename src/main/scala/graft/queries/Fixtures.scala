package graft.queries

/** In-process scaffold-fixture memo for the bench loop.
  *
  * 51% of the round-12 bench wall was fixture CONSTRUCTION — every run of a
  * round-trip query re-wrote the same deterministic cohort VCF / BAM before
  * re-reading it. Within one bench JVM the fixture derivation is the same
  * code over the same input, so run 1's write can be reused by runs 2..N
  * with zero staleness risk (no cross-process content-addressing needed:
  * the memo dies with the JVM).
  *
  * OFF by default: Verify and the specs must keep write→read round-trip
  * coverage on every invocation. Bench turns it on (unless
  * SPARK_GRAFT_FIXTURE_REUSE=0) — run 1 still pays and measures the cold
  * write per query; later runs skip it, so per-query medians track the
  * OPERATOR, not repeated scaffolding. Only scaffold writes go through
  * [[ensure]]; queries whose write IS the operator (round-trips, sorts,
  * transcodes, merges) call `.save` directly and pay every run.
  */
object Fixtures {
  @volatile var reuseEnabled: Boolean = false
  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[Unit]]()

  def ensure(path: String)(write: => Unit): Unit = {
    if (!reuseEnabled) { write; return }
    // The map operation only MEMOIZES a future (cheap, contract-safe for
    // computeIfAbsent); the multi-second Spark write runs OUTSIDE the map
    // bin lock, so a fixture whose write builds another fixture nests
    // fine and unrelated keys hashing to the same bin never block behind
    // it. First caller runs the write; concurrent callers for the same
    // path await it; a failure removes the entry (write-before-mark
    // exception safety) and rethrows to every waiter.
    val fresh = new java.util.concurrent.CompletableFuture[Unit]()
    val prior = written.putIfAbsent(path, fresh)
    if (prior == null) {
      try fresh.complete(write)
      catch { case t: Throwable => written.remove(path, fresh); fresh.completeExceptionally(t); throw t }
    } else {
      try prior.join()
      catch { case e: java.util.concurrent.CompletionException => throw e.getCause }
    }
  }

  /** Test hook: drop the memo so a suite can exercise both branches. */
  def reset(): Unit = written.clear()

  /** `.saveFixture(path)` — drop-in for DataFrameWriter.save on SCAFFOLD
    * writes only (the fixture a query builds just to re-read).
    */
  implicit class FixtureWriterOps(private val w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) {
    def saveFixture(path: String): Unit = ensure(path)(w.save(path))
  }
}
