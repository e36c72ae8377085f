package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.bgzf.SeekableInput

/** Java-serializable Hadoop Configuration wrapper for DSv2 factories
  * (replaces the reference's SerializableHadoopConfiguration,
  * impl/formats/SerializableHadoopConfiguration.java:10-29).
  */
final class SerializableConf(@transient var conf: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = { out.defaultWriteObject(); conf.write(out) }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

object HadoopIO {

  /** pread-based SeekableInput over any Hadoop FileSystem (local, HDFS,
    * object stores). FSDataInputStream#read(pos,…) is positional and
    * thread-safe, which is what the BGZF reader + guesser share.
    */
  def open(path: Path, conf: Configuration): SeekableInput = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    new SeekableInput {
      def pread(pos: Long, buf: Array[Byte], off: Int, len0: Int): Int =
        if (pos >= len) -1 else in.read(pos, buf, off, len0)
      def size: Long = len
      def close(): Unit = in.close()
    }
  }

  /** Input files of a path that may be a single file or a flat directory:
    * non-hidden entries, lexicographic name order (reference semantics,
    * HadoopFileSystemWrapper.listDirectory:76-83 + README.md:81-91).
    */
  def listInputFiles(pathStr: String, conf: Configuration): Seq[Path] = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val st = fs.getFileStatus(path)
    if (!st.isDirectory) Seq(path)
    else
      fs.listStatus(path).toSeq
        .filter(s => !s.isDirectory)
        .map(_.getPath)
        .filter(p => !p.getName.startsWith(".") && !p.getName.startsWith("_"))
        .sortBy(_.getName)
  }

  /** Order-preserving merge of a temp dir's parts into one file: sorted
    * listing, skip hidden, sequential copy (FileSystem.concat where the FS
    * supports it would be a pure win; local FS does not — reference fallback
    * HadoopFileSystemWrapper.concat:86-121, Merger.java:17-29).
    */
  def mergeParts(tempDir: Path, target: Path, conf: Configuration): Unit = {
    val fs = tempDir.getFileSystem(conf)
    val parts = fs.listStatus(tempDir).toSeq
      .filter(s => !s.isDirectory)
      .map(_.getPath)
      .filter(p => !p.getName.startsWith(".") && !p.getName.startsWith("_"))
      .sortBy(_.getName)
    val out = fs.create(target, true)
    try {
      val buf = new Array[Byte](1 << 20)
      parts.foreach { p =>
        val in = fs.open(p)
        try {
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
    } finally out.close()
    fs.delete(tempDir, true)
  }
}

/** Genomic interval predicates shared by BAM/SAM/VCF readers — the
  * HtsjdkReadsTraversalParameters equivalent (reference
  * HtsjdkReadsTraversalParameters.java:13-30, option-string form).
  */
final case class GenomicInterval(contig: String, start: Int, end: Int) {
  def overlaps(c: String, s: Int, e: Int): Boolean =
    c != null && c == contig && s <= end && e >= start
}

object GenomicInterval {
  /** Parse "chr21:5000-9999,chr20:1-100" (1-based inclusive). */
  def parseList(s: String): Seq[GenomicInterval] =
    s.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { part =>
      val ci = part.lastIndexOf(':')
      require(ci > 0, s"bad interval '$part' (want contig:start-end)")
      val range = part.substring(ci + 1)
      val di = range.indexOf('-')
      require(di > 0, s"bad interval range '$range'")
      GenomicInterval(part.substring(0, ci), range.substring(0, di).toInt, range.substring(di + 1).toInt)
    }.toSeq

  /** Sort + merge overlapping/adjacent intervals (reference
    * BoundedTraversalUtil.prepareQueryIntervals, BoundedTraversalUtil.java:10-27).
    */
  def optimize(intervals: Seq[GenomicInterval]): Seq[GenomicInterval] =
    intervals.groupBy(_.contig).toSeq.sortBy(_._1).flatMap { case (c, is) =>
      val sorted = is.sortBy(_.start)
      val acc = scala.collection.mutable.ArrayBuffer[GenomicInterval]()
      sorted.foreach { iv =>
        if (acc.nonEmpty && iv.start <= acc.last.end + 1)
          acc(acc.length - 1) = acc.last.copy(end = math.max(acc.last.end, iv.end))
        else acc += iv
      }
      acc.toSeq.map(iv => GenomicInterval(c, iv.start, iv.end))
    }
}
