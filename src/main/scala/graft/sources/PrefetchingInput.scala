package graft.sources

import graft.bgzf.SeekableInput

/** Background-readahead wrapper over a [[SeekableInput]] — the role of the
  * reference's `SeekableByteChannelPrefetcher` (impl/file/
  * SeekableByteChannelPrefetcher.java:34-494: fixed-size blocks fetched by
  * a background thread one block ahead of the consumer), re-expressed for
  * the pread interface every graft reader speaks. High-latency stores
  * (object stores without a tuned Hadoop connector) stall a sequential
  * decode on every block fault; with readahead the next blocks are already
  * in flight while the current one is consumed.
  *
  * Design: the file is tiled into `blockSize` blocks; a small LRU holds
  * the most recent `cacheBlocks`; a process-shared daemon pool fetches
  * ahead (per-open executors would pay a thread create/destroy on every
  * short-lived index-probe open).
  * After a block is served, the `ahead` following blocks are scheduled if
  * absent — so a sequential scan (the BGZF/container decode pattern) stays
  * ahead of the consumer, while random preads (index probes) fall through
  * to demand fetches that populate the same cache. Memory is bounded by
  * (cacheBlocks + 2×ahead) × blockSize per open file: completed readahead
  * futures are drained into the LRU on every schedule pass, and at most
  * 2×ahead futures are ever outstanding.
  *
  * Off by default. [[HadoopIO.open]] consults the Hadoop conf key
  * `graft.io.prefetch.blocksize` (bytes; 0 = disabled), so a cluster opts
  * in with `spark.hadoop.graft.io.prefetch.blocksize=4194304` and every
  * source gains readahead with no per-source plumbing — the same "wrap at
  * the channel layer" shape as the reference, without a second code path.
  */
final class PrefetchingInput(underlying: SeekableInput, blockSize: Int,
                             cacheBlocks: Int = 8, ahead: Int = 2)
    extends SeekableInput {
  require(blockSize > 0 && cacheBlocks > 0 && ahead >= 0)

  override val size: Long = underlying.size

  // block index -> bytes (completed) — LRU by access order
  private val cache = new java.util.LinkedHashMap[Long, Array[Byte]](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Long, Array[Byte]]): Boolean =
      size() > cacheBlocks
  }
  // block index -> in-flight fetch
  private val inflight = new java.util.HashMap[Long, java.util.concurrent.Future[Array[Byte]]]()
  @volatile private var closed = false

  private def nBlocks: Long = (size + blockSize - 1) / blockSize

  /** Fetch a whole block from the underlying input (runs on either thread). */
  private def fetchBlock(idx: Long): Array[Byte] = {
    val start = idx * blockSize
    val len = math.min(blockSize.toLong, size - start).toInt
    val buf = new Array[Byte](len)
    val got = underlying.preadFully(start, buf, 0, len)
    if (got == len) buf else java.util.Arrays.copyOf(buf, got)
  }

  /** The block's bytes: cached, joined from an in-flight fetch, or fetched
    * on demand; schedules readahead for the following blocks either way.
    */
  private def block(idx: Long): Array[Byte] = {
    val ready = synchronized {
      val c = cache.get(idx)
      if (c != null) Right(c)
      else {
        val f = inflight.get(idx)
        if (f != null) Left(f) else null
      }
    }
    val bytes = ready match {
      case Right(c) => c
      case Left(f) =>
        val b = f.get()
        synchronized { inflight.remove(idx); cache.put(idx, b) }
        b
      case null =>
        val b = fetchBlock(idx)
        synchronized { cache.put(idx, b) }
        b
    }
    scheduleAhead(idx)
    bytes
  }

  /** Move completed readahead results into the LRU. Without this drain a
    * seek-heavy access pattern strands completed futures in `inflight`
    * forever (they are only consumed when their exact block is later
    * requested), growing memory unboundedly — the LRU bound must apply to
    * every fetched block, prefetched or not. Caller holds the lock.
    */
  private def drainCompleted(): Unit = {
    val it = inflight.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isDone) {
        try cache.put(e.getKey, e.getValue.get())
        catch { case _: Exception => } // failed prefetch: retried on demand
        it.remove()
      }
    }
  }

  private def scheduleAhead(idx: Long): Unit = synchronized {
    if (closed) return
    drainCompleted()
    var j = idx + 1
    val last = math.min(idx + ahead, nBlocks - 1)
    // hard bound: never more than 2×ahead outstanding futures, so random
    // seeks can't queue an unbounded backlog on the single fetch thread
    while (j <= last && inflight.size < 2 * ahead) {
      if (!cache.containsKey(j) && !inflight.containsKey(j)) {
        val target = j
        inflight.put(target, PrefetchingInput.sharedPool.submit(() => fetchBlock(target)))
      }
      j += 1
    }
  }

  /** Test hook: outstanding (undrained) readahead futures. */
  private[sources] def inflightCount: Int = synchronized { inflight.size }

  override def pread(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= size) return -1
    val idx = pos / blockSize
    val b = block(idx)
    val inBlock = (pos - idx * blockSize).toInt
    if (inBlock >= b.length) return -1 // short block at a truncated tail
    val n = math.min(len, b.length - inBlock)
    System.arraycopy(b, inBlock, buf, off, n)
    n
  }

  override def close(): Unit = {
    synchronized {
      closed = true
      inflight.values.forEach(f => f.cancel(true))
      inflight.clear()
      cache.clear()
    }
    underlying.close()
  }
}

object PrefetchingInput {
  /** One small daemon pool shared by every instance in the process:
    * index-probe-heavy access patterns open (and close) many files briefly,
    * and a dedicated executor per open would pay a thread create/destroy
    * each time. Never shut down — threads are daemons and idle at ~0 cost.
    */
  private lazy val sharedPool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(2, math.min(4, Runtime.getRuntime.availableProcessors())),
    (r: Runnable) => {
      val t = new Thread(r, "graft-prefetch")
      t.setDaemon(true)
      t
    })
}
