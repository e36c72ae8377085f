package graft.sam

import graft.bam.{AlignmentRecord, BamCodec, SamHeader}

/** SAM text codec: AlignmentRecord ↔ tab-separated SAM line (spec §1.4/§1.5).
  * The reference delegates to htsjdk's SAMLineParser (SamSource.java:61-67)
  * and SAMRecord.getSAMString (SamSink.java:37-45).
  */
object SamCodec {

  def toLine(r: AlignmentRecord): String = {
    val sb = new StringBuilder(128)
    sb.append(if (r.readName == null) "*" else r.readName).append('\t')
    sb.append(r.flags).append('\t')
    sb.append(if (r.contig == null) "*" else r.contig).append('\t')
    sb.append(r.start).append('\t')
    sb.append(r.mapq).append('\t')
    sb.append(if (r.cigar == null) "*" else r.cigar).append('\t')
    val mate =
      if (r.mateContig == null) "*"
      else if (r.contig != null && r.mateContig == r.contig) "="
      else r.mateContig
    sb.append(mate).append('\t')
    sb.append(r.mateStart).append('\t')
    sb.append(r.tlen).append('\t')
    sb.append(if (r.seq == null) "*" else r.seq).append('\t')
    sb.append(if (r.qual == null) "*" else r.qual)
    if (r.attributes != null) r.attributes.toSeq.sortBy(_._1).foreach { case (tag, typed) =>
      // "XO" -> "i:5"  ⇒  XO:i:5
      sb.append('\t').append(tag).append(':').append(typed)
    }
    sb.toString
  }

  def fromLine(line: String, header: SamHeader): AlignmentRecord = {
    val f = line.split('\t')
    require(f.length >= 11, s"bad SAM line (${f.length} fields)")
    val flags = f(1).toInt
    val contig = if (f(2) == "*") null else f(2)
    val start = f(3).toInt
    val cigar = f(5)
    val mateContig = f(6) match {
      case "*" => null
      case "=" => contig
      case c => c
    }
    val refLen = if (cigar == "*") 0 else BamCodec.cigarRefLength(BamCodec.parseCigar(cigar))
    val attrs = f.iterator.drop(11).map { t =>
      // XO:i:5 → "XO" -> "i:5"
      val tag = t.substring(0, 2)
      tag -> t.substring(3)
    }.toMap
    AlignmentRecord(
      readName = if (f(0) == "*") null else f(0),
      flags = flags,
      contig = contig,
      start = start,
      end = if (start > 0 && refLen > 0) start + refLen - 1 else 0,
      mapq = f(4).toInt,
      cigar = cigar,
      mateContig = mateContig,
      mateStart = f(7).toInt,
      tlen = f(8).toInt,
      seq = f(9),
      qual = f(10),
      attributes = attrs)
  }
}
