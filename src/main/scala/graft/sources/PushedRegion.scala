package graft.sources

import org.apache.spark.sql.sources._

/** Conservative filter→interval translation, used when no explicit
  * `intervals` option is given: a conjunction of `contig = c` with bounds on
  * `start` becomes the interval c:[lo,hi]. The overlap test the readers
  * apply (`r.start <= hi && r.end >= lo`) is a superset of the original
  * predicate, and every filter stays residual, so this only *prunes* rows
  * early — Catalyst re-applies the exact predicate above the scan
  * (the reference's coarse-index + residual-filter split,
  * AbstractBinarySamSource.java:86-113). Shared by the BAM, SAM, and VCF
  * scans; on indexed paths the derived interval also drives split pruning
  * (.gci/.bai for BAM, .tbi/.idx for VCF).
  */
object PushedRegion {
  def toIntervals(pushed: Array[Filter]): Option[Seq[GenomicInterval]] = {
    val contig = pushed.collectFirst { case EqualTo("contig", v: String) => v }
    contig.map { c =>
      var lo = 1
      var hi = Int.MaxValue
      pushed.foreach {
        case GreaterThan("start", v: Number) => lo = math.max(lo, v.intValue() + 1)
        case GreaterThanOrEqual("start", v: Number) => lo = math.max(lo, v.intValue())
        case LessThan("start", v: Number) => hi = math.min(hi, v.intValue() - 1)
        case LessThanOrEqual("start", v: Number) => hi = math.min(hi, v.intValue())
        case _ =>
      }
      Seq(GenomicInterval(c, lo, hi))
    }
  }

  /** The filters worth recording at the scan: interval-translatable bounds. */
  def accepts(f: Filter): Boolean = f match {
    case EqualTo("contig", _) => true
    case GreaterThan("start", _) | GreaterThanOrEqual("start", _) => true
    case LessThan("start", _) | LessThanOrEqual("start", _) => true
    case GreaterThan("end", _) | GreaterThanOrEqual("end", _) => true
    case LessThan("end", _) | LessThanOrEqual("end", _) => true
    case _ => false
  }
}
