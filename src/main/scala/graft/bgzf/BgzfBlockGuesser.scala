package graft.bgzf

/** Finds the first BGZF block boundary at or after an arbitrary byte offset —
  * the primitive that makes BGZF files splittable without an index.
  *
  * Strategy (same as reference BgzfBlockGuesser.java:76-149): scan forward
  * for the gzip magic + FEXTRA, then validate the complete extra-subfield
  * chain and BSIZE. We additionally require the *following* block header to
  * parse (when its bytes are in reach), which squeezes the false-positive
  * rate further — compressed data can contain the 4 magic bytes by chance,
  * but two chained valid headers essentially never.
  */
object BgzfBlockGuesser {

  /** How far past the candidate offset we are willing to scan. A block is
    * ≤ 64 KiB, so a true boundary must occur within one block length.
    */
  private val MaxScan = 2 * Bgzf.MaxBlockSize

  /** Return the compressed offset of the first BGZF block starting at or
    * after `pos`, or -1 if none found within one block length (e.g. `pos`
    * is inside the trailing EOF block or past the last block).
    */
  def nextBlockOffset(in: SeekableInput, pos: Long): Long = {
    val window = new Array[Byte](MaxScan + Bgzf.HeaderLength)
    val avail = in.preadFully(pos, window, 0, window.length)
    var i = 0
    while (i < math.min(avail, MaxScan)) {
      val len = Bgzf.parseBlockLength(window, i, avail - i)
      if (len > 0 && chainsToNextBlock(in, window, i, len, avail, pos)) return pos + i
      i += 1
    }
    -1L
  }

  /** True if the block of length `len` at window offset `i` is followed by
    * either EOF or another valid block header (checked in-window when
    * possible, else via a small pread).
    */
  private def chainsToNextBlock(in: SeekableInput, window: Array[Byte], i: Int, len: Int,
                                avail: Int, base: Long): Boolean = {
    val next = i + len
    if (next + Bgzf.HeaderLength <= avail)
      return Bgzf.parseBlockLength(window, next, avail - next) > 0
    // next header is out of window: check against the file directly
    val hdr = new Array[Byte](Bgzf.HeaderLength)
    val got = in.preadFully(base + next, hdr, 0, Bgzf.HeaderLength)
    if (got == 0) return true // block ends exactly at EOF
    got >= 12 && Bgzf.parseBlockLength(hdr, 0, got) > 0
  }
}
