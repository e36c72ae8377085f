package graft.sources

import java.io.ByteArrayOutputStream
import graft.bgzf.{Bgzf, BgzfBlockGuesser, BgzfInputStream, SeekableInput}

/** Splittable line reading over plain or BGZF-compressed text, with *exact*
  * ownership semantics: a line belongs to the split that contains its start
  * position key — the raw byte offset for plain text, the BGZF block start
  * for compressed text. Splits tile the file, every position key lands in
  * exactly one split, so no line is lost or duplicated at any split size.
  *
  * This replaces the Hadoop TextInputFormat + BGZF codec machinery the
  * reference wires for SAM/VCF (SamSource.java:35-87, VcfSource.java:88-129,
  * BGZFSplitCompressionInputStream.java:14-106) — same distribution shape,
  * but ownership is determined by direct inspection (pread of the byte
  * before the split / decompress of the predecessor block) instead of
  * discard-first-line conventions.
  */
object SplitTextReader {

  /** True if `path`-like data is BGZF (sniff the first bytes). */
  def isBgzf(in: SeekableInput): Boolean = {
    val hdr = new Array[Byte](Bgzf.HeaderLength)
    val got = in.preadFully(0, hdr, 0, hdr.length)
    got >= 12 && Bgzf.parseBlockLength(hdr, 0, got) > 0
  }

  /** True if plain gzip (non-BGZF): readable but single-split only
    * (reference BGZFEnhancedGzipCodec.java:44-68 behavior).
    */
  def isPlainGzip(in: SeekableInput): Boolean = {
    val hdr = new Array[Byte](Bgzf.HeaderLength)
    val got = in.preadFully(0, hdr, 0, hdr.length)
    got >= 2 && (hdr(0) & 0xff) == 0x1f && (hdr(1) & 0xff) == 0x8b && !isBgzf(in)
  }

  /** Iterator over the lines owned by split [splitStart, splitEnd). */
  def lines(in: SeekableInput, splitStart: Long, splitEnd: Long, bgzf: Boolean): Iterator[String] =
    if (bgzf) bgzfLines(in, splitStart, splitEnd)
    else plainLines(in, splitStart, splitEnd)

  /** Lines paired with their OWNERSHIP KEY — the raw byte offset of the
    * line start for plain text, the BGZF block start for compressed text.
    * The key is what split tiling assigns: a line belongs to the split
    * whose [start, end) contains its key. Multi-line record formats
    * (FASTQ) pass splitEnd = file size and cut on the key themselves, so a
    * record's trailing lines can be consumed past the split boundary by
    * the split that owns the record's FIRST line.
    */
  def linesWithKeys(in: SeekableInput, splitStart: Long, splitEnd: Long,
                    bgzf: Boolean): Iterator[(Long, String)] =
    if (bgzf) bgzfLinesWithVoff(in, splitStart, splitEnd)
      .map { case (l, beg, _) => (Bgzf.blockStart(beg), l) }
    else plainLinesWithPos(in, splitStart, splitEnd)

  // ---- plain text -------------------------------------------------------

  private def plainLines(in: SeekableInput, splitStart: Long, splitEnd: Long): Iterator[String] =
    plainLinesWithPos(in, splitStart, splitEnd).map(_._2)

  private def plainLinesWithPos(in: SeekableInput, splitStart: Long,
                                splitEnd: Long): Iterator[(Long, String)] = {
    // NB: named fileSize, not `size` — inside the anonymous Iterator below a
    // bare `size` would resolve to Iterator.size and consume the iterator.
    val fileSize = in.size
    if (splitStart >= fileSize) return Iterator.empty
    // first line start at/after splitStart: splitStart itself iff it begins
    // a line (file start or preceded by '\n'); else after the next '\n'
    var pos = splitStart
    if (splitStart > 0) {
      val b = new Array[Byte](1)
      in.preadFully(splitStart - 1, b, 0, 1)
      if (b(0) != '\n') {
        pos = scanForNewline(in, splitStart, fileSize)
        if (pos < 0) return Iterator.empty
      }
    }
    val firstLineStart = pos
    if (firstLineStart >= splitEnd || firstLineStart >= fileSize) return Iterator.empty
    new Iterator[(Long, String)] {
      private var cur = firstLineStart
      private val buf = new Array[Byte](64 * 1024)
      private var bufPos = 0L
      private var bufLen = 0
      private var nextLine: (Long, String) = advance()

      private def fill(at: Long): Boolean = {
        bufLen = in.preadFully(at, buf, 0, buf.length)
        bufPos = at
        bufLen > 0
      }

      private def advance(): (Long, String) = {
        if (cur >= splitEnd || cur >= fileSize) return null
        val lineStart = cur
        val out = new ByteArrayOutputStream(160)
        var p = cur
        var done = false
        while (!done) {
          if (p < bufPos || p >= bufPos + bufLen) { if (!fill(p)) done = true }
          if (!done) {
            val i = (p - bufPos).toInt
            val b = buf(i)
            p += 1
            if (b == '\n') done = true else out.write(b)
          }
        }
        cur = p
        (lineStart, stripCr(out.toString("UTF-8")))
      }

      def hasNext: Boolean = nextLine != null
      def next(): (Long, String) = { val l = nextLine; nextLine = advance(); l }
    }
  }

  private def scanForNewline(in: SeekableInput, from: Long, size: Long): Long = {
    val buf = new Array[Byte](64 * 1024)
    var pos = from
    while (pos < size) {
      val n = in.preadFully(pos, buf, 0, buf.length)
      if (n <= 0) return -1
      var i = 0
      while (i < n) {
        if (buf(i) == '\n') return pos + i + 1
        i += 1
      }
      pos += n
    }
    -1
  }

  private def stripCr(s: String): String =
    if (s.nonEmpty && s.charAt(s.length - 1) == '\r') s.substring(0, s.length - 1) else s

  // ---- BGZF text --------------------------------------------------------

  // one iterator implementation: the plain-line scan is the voff-tracking
  // walk minus the offsets, so the ownership/EOF rules can never drift
  // between the scan and the index derivation
  private def bgzfLines(in: SeekableInput, splitStart: Long, splitEnd: Long): Iterator[String] =
    bgzfLinesWithVoff(in, splitStart, splitEnd).map(_._1)

  /** BGZF lines with each line's [begin, end) VIRTUAL offsets — the feed
    * for deriving tabix-style indexes from an existing file. Ownership
    * rule identical to [[lines]].
    */
  def bgzfLinesWithVoff(in: SeekableInput, splitStart: Long,
                        splitEnd: Long): Iterator[(String, Long, Long)] = {
    val stream = bgzfStreamAt(in, splitStart, splitEnd)
    if (stream == null) return Iterator.empty
    new Iterator[(String, Long, Long)] {
      private var nextLine: (String, Long, Long) = advance()

      private def advance(): (String, Long, Long) = {
        if (stream.atEof || stream.blockStartOffset >= splitEnd) return null
        val beg = stream.virtualOffset
        val out = new ByteArrayOutputStream(160)
        var c = stream.read()
        if (c < 0) return null
        while (c >= 0 && c != '\n') { out.write(c); c = stream.read() }
        (stripCr(out.toString("UTF-8")), beg, stream.virtualOffset)
      }

      def hasNext: Boolean = nextLine != null
      def next(): (String, Long, Long) = { val l = nextLine; nextLine = advance(); l }
    }
  }

  /** Stream positioned at the first line the split [splitStart, splitEnd)
    * OWNS (partial head line skipped), or null when the split owns none.
    */
  private def bgzfStreamAt(in: SeekableInput, splitStart: Long, splitEnd: Long): BgzfInputStream = {
    // first block starting at/after splitStart
    val firstBlock = if (splitStart == 0) 0L else BgzfBlockGuesser.nextBlockOffset(in, splitStart)
    if (firstBlock < 0 || firstBlock >= splitEnd) return null
    val stream = new BgzfInputStream(in)
    stream.seekBlock(firstBlock)
    if (stream.atEof) return null

    // does a line start at the very beginning of firstBlock? yes iff file
    // start, or the last *data* byte before firstBlock is '\n'. The
    // predecessor block is inflated directly — NOT probed via
    // BgzfInputStream.read(), whose cursor eagerly advances into the next
    // block after a block's final byte, which made a read()-loop probe
    // return the second-to-last byte and silently drop one line per
    // newline-aligned block seam (exactly what the single-file sink's
    // part merge produces).
    var startsAtBlockBegin = firstBlock == 0
    if (firstBlock > 0) {
      var window = 2L * Bgzf.MaxBlockSize
      var decided = false
      while (!decided) {
        val scanFrom = math.max(0L, firstBlock - window)
        val chainStart =
          if (scanFrom == 0) 0L else BgzfBlockGuesser.nextBlockOffset(in, scanFrom)
        // predecessor block offsets in [chainStart, firstBlock), newest first
        var prevs = List.empty[Long]
        var b = chainStart
        while (b >= 0 && b < firstBlock) { prevs = b :: prevs; b = nextBlockAfter(in, b) }
        // last byte of the most recent non-empty predecessor (empty blocks —
        // e.g. EOF terminators concatenated mid-file — carry no line bytes)
        prevs.iterator.map(off => lastByteOfBlock(in, off)).find(_ >= 0) match {
          case Some(last) => startsAtBlockBegin = last == '\n'; decided = true
          case None if scanFrom == 0 => startsAtBlockBegin = true; decided = true
          case None => window *= 2 // only empty predecessors in window: look further back
        }
      }
    }
    if (!startsAtBlockBegin) {
      // discard the partial line that crosses into this block
      var c = stream.read()
      while (c >= 0 && c != '\n') c = stream.read()
      if (c < 0) return null
    }
    stream
  }

  /** Final uncompressed byte of the block at `blockOff`, or -1 if the block
    * is empty / unreadable. One header pread + one block inflate.
    */
  private def lastByteOfBlock(in: SeekableInput, blockOff: Long): Int = {
    val hdr = new Array[Byte](Bgzf.HeaderLength)
    val got = in.preadFully(blockOff, hdr, 0, Bgzf.HeaderLength)
    if (got < Bgzf.HeaderLength) return -1
    val blockLen = Bgzf.parseBlockLength(hdr, 0, got)
    if (blockLen < 0) return -1
    val comp = new Array[Byte](blockLen)
    if (in.preadFully(blockOff, comp, 0, blockLen) < blockLen) return -1
    val out = new Array[Byte](Bgzf.MaxBlockSize)
    val n = Bgzf.inflateBlock(comp, 0, blockLen, out)
    if (n == 0) -1 else out(n - 1) & 0xff
  }

  private def nextBlockAfter(in: SeekableInput, blockOff: Long): Long = {
    val hdr = new Array[Byte](Bgzf.HeaderLength)
    val got = in.preadFully(blockOff, hdr, 0, hdr.length)
    if (got < hdr.length) return -1
    val len = Bgzf.parseBlockLength(hdr, 0, got)
    if (len < 0) -1 else blockOff + len
  }

  /** Whole-stream sequential lines (plain, bgzf, or plain-gzip fallback). */
  def allLines(in: SeekableInput): Iterator[String] = {
    if (isBgzf(in)) return bgzfLines(in, 0L, Long.MaxValue)
    if (isPlainGzip(in)) {
      val raw = new java.io.InputStream {
        private var pos = 0L
        def read(): Int = {
          val b = new Array[Byte](1)
          val n = in.pread(pos, b, 0, 1)
          if (n <= 0) -1 else { pos += 1; b(0) & 0xff }
        }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          val n = in.pread(pos, b, off, len)
          if (n > 0) pos += n
          n
        }
      }
      val gz = new java.util.zip.GZIPInputStream(raw, 64 * 1024)
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(gz, "UTF-8"))
      return Iterator.continually(br.readLine()).takeWhile(_ != null)
    }
    plainLines(in, 0L, Long.MaxValue)
  }
}
