package graft.fastq

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.fastq.RowToFastq

/** Direct InternalRow → FASTQ wire bytes ('@name[ comment]\nseq\n+\nqual\n'),
  * bypassing the FastqRecord/String materialization. The rendering is pure
  * byte concatenation, so it is identical to the object path for every
  * valid-UTF-8 input by construction (FastqRowEncoderSpec proves it); null
  * mandatory columns route through the spec path so its NPE surface is
  * preserved.
  */
final class FastqRowEncoder(idx: RowToFastq.Idx) {
  var buf: Array[Byte] = new Array[Byte](1 << 12)
  private var pos = 0

  private def ensure(n: Int): Unit =
    if (pos + n > buf.length) {
      var cap = buf.length
      while (cap < pos + n) cap <<= 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  private def putByte(b: Int): Unit = { ensure(1); buf(pos) = b.toByte; pos += 1 }
  private def putUtf8(s: UTF8String): Unit = {
    val n = s.numBytes()
    ensure(n)
    s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
    pos += n
  }

  def encode(row: InternalRow): Int = {
    pos = 0
    if (row.isNullAt(idx.readName) || row.isNullAt(idx.seq) || row.isNullAt(idx.qual))
      return fallback(row) // spec path NPEs on null mandatory fields
    putByte('@')
    putUtf8(row.getUTF8String(idx.readName))
    if (idx.comment >= 0 && !row.isNullAt(idx.comment)) {
      val c = row.getUTF8String(idx.comment)
      if (c.numBytes() > 0) { putByte(' '); putUtf8(c) }
    }
    putByte('\n')
    putUtf8(row.getUTF8String(idx.seq))
    putByte('\n'); putByte('+'); putByte('\n')
    putUtf8(row.getUTF8String(idx.qual))
    putByte('\n')
    pos
  }

  private def fallback(row: InternalRow): Int = {
    pos = 0
    val sb = new StringBuilder(256)
    FastqCodec.toLines(RowToFastq.convert(row, idx), sb)
    val bytes = sb.toString.getBytes("UTF-8")
    ensure(bytes.length)
    System.arraycopy(bytes, 0, buf, 0, bytes.length)
    pos = bytes.length
    pos
  }
}
