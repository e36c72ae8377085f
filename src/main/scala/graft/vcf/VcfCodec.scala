package graft.vcf

/** VCF text codec: Variant ↔ tab-separated data line (VCF spec 4.2 §1.6). */
object VcfCodec {

  def fromLine(line: String, samples: Seq[String]): Variant = {
    val f = line.split('\t')
    require(f.length >= 8, s"bad VCF line (${f.length} fields)")
    val pos = f(1).toInt
    val ref = f(3)
    val info: Map[String, String] =
      if (f(7) == ".") Map.empty
      else f(7).split(';').iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> "" else kv.substring(0, i) -> kv.substring(i + 1)
      }.toMap
    val end = info.get("END").map(_.toInt).getOrElse(pos + ref.length - 1)
    val genotypes: Seq[Genotype] =
      if (f.length > 9 && samples.nonEmpty) {
        val fmtKeys = f(8).split(':')
        samples.indices.map { si =>
          val vals = if (9 + si < f.length) f(9 + si).split(':') else Array.empty[String]
          val fields = fmtKeys.zipWithIndex.collect {
            case (k, i) if i < vals.length => k -> vals(i)
          }.toMap
          // gt = null when FORMAT has no GT (site-only annotations like
          // DP-only) — fabricating "./." would invent genotype calls
          Genotype(samples(si), fields.getOrElse("GT", null), fields - "GT")
        }
      } else Nil
    Variant(
      contig = f(0),
      start = pos,
      end = end,
      id = if (f(2) == ".") null else f(2),
      ref = ref,
      alt = if (f(4) == ".") Nil else f(4).split(',').toSeq,
      qual = if (f(5) == ".") null else java.lang.Double.valueOf(f(5).toDouble),
      filters = if (f(6) == ".") Nil else f(6).split(';').toSeq,
      info = info,
      genotypes = genotypes)
  }

  def toLine(v: Variant): String = {
    val sb = new StringBuilder(128)
    sb.append(v.contig).append('\t').append(v.start).append('\t')
    sb.append(if (v.id == null) "." else v.id).append('\t')
    sb.append(v.ref).append('\t')
    sb.append(if (v.alt.isEmpty) "." else v.alt.mkString(",")).append('\t')
    sb.append(formatQual(v.qual)).append('\t')
    sb.append(if (v.filters.isEmpty) "." else v.filters.mkString(";")).append('\t')
    sb.append(formatInfo(v))
    if (v.genotypes.nonEmpty) {
      // FORMAT keys: GT first IF any genotype carries one (VCF spec: GT must
      // be first when present; omit entirely when absent — site-only lines
      // must not grow fabricated ./. calls), then the union of field keys
      // in sorted order
      val hasGt = v.genotypes.exists(_.gt != null)
      // encode is the write path's dominant CPU (VcfWriteCostSpec: 2.6× the
      // deflate at level 6) — the GT-only cohort line is the hot shape, so
      // it appends directly with zero per-genotype Seq/String churn
      val noFields = v.genotypes.forall(_.fields.isEmpty)
      if (noFields) {
        sb.append('\t')
        if (hasGt) sb.append("GT")
        v.genotypes.foreach { g =>
          sb.append('\t')
          if (hasGt) sb.append(if (g.gt == null) "./." else g.gt)
        }
      } else {
        val keys = v.genotypes.flatMap(_.fields.keys).distinct.sorted
        val fmtKeys = if (hasGt) "GT" +: keys else keys
        sb.append('\t').append(fmtKeys.mkString(":"))
        v.genotypes.foreach { g =>
          sb.append('\t')
          var started = false
          if (hasGt) { sb.append(if (g.gt == null) "./." else g.gt); started = true }
          keys.foreach { k =>
            if (started) sb.append(':')
            sb.append(g.fields.getOrElse(k, "."))
            started = true
          }
        }
      }
    }
    sb.toString
  }

  private def formatInfo(v: Variant): String = {
    // synthesize END when it was derived? No: END only round-trips if it was
    // present in info; info holds the original payload verbatim.
    if (v.info.isEmpty) "."
    else v.info.toSeq.sortBy(_._1).map { case (k, vl) => if (vl.isEmpty) k else s"$k=$vl" }.mkString(";")
  }

  private def formatQual(q: java.lang.Double): String = {
    if (q == null) "."
    else {
      val d = q.doubleValue()
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
    }
  }
}
