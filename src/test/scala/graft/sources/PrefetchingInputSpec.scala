package graft.sources

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.bgzf.SeekableInput
import graft.SparkFixture

/** [[PrefetchingInput]] (the reference SeekableByteChannelPrefetcher's role):
  * byte-exact under random and sequential access, readahead actually runs
  * ahead of a sequential consumer, memory stays bounded, and the
  * conf-keyed wiring serves a real BAM read unchanged.
  */
class PrefetchingInputSpec extends AnyFunSuite with SparkFixture {

  /** Instrumented source: counts block-granular fetches and records the
    * highest position ever read from the underlying store.
    */
  private final class Counting(bytes: Array[Byte]) extends SeekableInput {
    val fetches = new AtomicInteger(0)
    @volatile var maxPos: Long = -1L
    private val perPos = new java.util.concurrent.ConcurrentHashMap[Long, AtomicInteger]()
    private val inner = SeekableInput.ofBytes(bytes)
    def fetchesAt(pos: Long): Int = {
      val c = perPos.get(pos); if (c == null) 0 else c.get()
    }
    def pread(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
      fetches.incrementAndGet()
      perPos.computeIfAbsent(pos, _ => new AtomicInteger(0)).incrementAndGet()
      if (pos > maxPos) maxPos = pos
      inner.pread(pos, buf, off, len)
    }
    def size: Long = bytes.length.toLong
    def close(): Unit = inner.close()
  }

  private def data(n: Int): Array[Byte] = Array.tabulate[Byte](n)(i => (i * 131 + 7).toByte)

  test("byte-exact under random preads at every block-boundary alignment") {
    val bytes = data(10000)
    val under = new Counting(bytes)
    val pf = new PrefetchingInput(under, blockSize = 256, cacheBlocks = 4, ahead = 2)
    try {
      val rnd = new java.util.Random(99)
      for (_ <- 0 until 500) {
        val pos = rnd.nextInt(bytes.length + 10)
        val len = 1 + rnd.nextInt(700) // spans up to 3 blocks
        val buf = new Array[Byte](len)
        val got = pf.preadFully(pos, buf, 0, len)
        val want = math.max(0, math.min(len, bytes.length - pos))
        assert(got == want, s"pos=$pos len=$len")
        assert(buf.take(got).sameElements(bytes.slice(pos, pos + got)), s"pos=$pos len=$len")
      }
      // EOF contract
      assert(pf.pread(bytes.length.toLong, new Array[Byte](1), 0, 1) == -1)
    } finally pf.close()
  }

  test("sequential consumption triggers readahead beyond the consumed range") {
    val bytes = data(64 * 1024)
    val under = new Counting(bytes)
    val pf = new PrefetchingInput(under, blockSize = 4096, cacheBlocks = 8, ahead = 3)
    try {
      val buf = new Array[Byte](4096)
      pf.preadFully(0, buf, 0, 4096) // consume block 0
      // the background thread should be fetching blocks 1..3 — wait for it
      val deadline = System.nanoTime() + 2_000_000_000L
      while (under.maxPos < 3 * 4096 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(under.maxPos >= 3 * 4096,
        s"readahead never reached block 3 (maxPos=${under.maxPos})")
      // a subsequent sequential read is served from cache: block 1's own
      // position must never be fetched again (per-position count — total
      // counts would race with concurrent readahead of LATER blocks)
      val before = under.fetchesAt(4096L)
      assert(before >= 1, "block 1 was never prefetched")
      pf.preadFully(4096, buf, 0, 4096)
      assert(under.fetchesAt(4096L) == before, "cached block re-fetched")
    } finally pf.close()
  }

  test("cache stays bounded across a full sequential pass") {
    val bytes = data(256 * 1024)
    val under = new Counting(bytes)
    // 4 cached blocks of 1 KiB over a 256 KiB file: a full pass must not
    // accumulate blocks (LRU evicts), and every byte must still be exact
    val pf = new PrefetchingInput(under, blockSize = 1024, cacheBlocks = 4, ahead = 2)
    try {
      val buf = new Array[Byte](1024)
      var pos = 0
      while (pos < bytes.length) {
        pf.preadFully(pos.toLong, buf, 0, 1024)
        assert(buf.sameElements(bytes.slice(pos, pos + 1024)), s"pos=$pos")
        pos += 1024
      }
    } finally pf.close()
  }

  test("seek-heavy access never strands readahead futures (bounded inflight)") {
    val bytes = data(512 * 1024)
    val under = new Counting(bytes)
    val pf = new PrefetchingInput(under, blockSize = 1024, cacheBlocks = 4, ahead = 3)
    try {
      // the indexed-interval pattern: hundreds of seeks to scattered
      // chunks, each stranding that run's scheduled readahead pre-fix
      val rnd = new java.util.Random(5)
      val buf = new Array[Byte](64)
      for (_ <- 0 until 300) {
        val pos = rnd.nextInt(bytes.length - 64)
        pf.preadFully(pos.toLong, buf, 0, 64)
        assert(buf.sameElements(bytes.slice(pos, pos + 64)))
      }
      assert(pf.inflightCount <= 6, // 2 × ahead
        s"inflight futures leaked: ${pf.inflightCount}")
    } finally pf.close()
  }

  test("conf-keyed wiring: a BAM reads identically with prefetch enabled") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pf")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("t.bam")
    val recs = graft.bam.TestReads.mixed(400)
    spark.createDataset(recs).toDF()
      .write.format("bam").mode("overwrite")
      .option("refs", "chr20:1000000,chr21:2000135").save(out.toString)
    val plain = spark.read.format("bam").load(out.toString).collect().map(_.toSeq)
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setInt("graft.io.prefetch.blocksize", 8192)
    try {
      val pf = spark.read.format("bam").option("splitSize", 64 * 1024)
        .load(out.toString).collect().map(_.toSeq)
      assert(pf.toSeq == plain.toSeq, "prefetch-enabled read diverged")
    } finally conf.unset("graft.io.prefetch.blocksize")
  }
}
