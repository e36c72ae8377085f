package graft.vcf

import org.apache.spark.sql.types._

/** VCF record model — every column a plain Catalyst type (reference record:
  * htsjdk VariantContext, HtsjdkVariantsRdd.java:19; field semantics VCF
  * spec §1.6, decoded by VCFCodec at VcfSource.java:104-116).
  */
case class Variant(
    contig: String,
    start: Int,            // POS, 1-based
    end: Int,              // POS + len(REF) - 1, or INFO END
    id: String,            // null for "."
    ref: String,
    alt: Seq[String],      // empty for "."
    qual: java.lang.Double, // null for "."
    filters: Seq[String],  // empty for "."; ["PASS"] when passing
    info: Map[String, String],     // flag keys map to ""
    genotypes: Seq[Genotype])

case class Genotype(sample: String, gt: String, fields: Map[String, String])

/** Which parts of the genotype columns a VCF scan actually needs — the
  * FORMAT-side analog of the BAM read path's BamFieldMask. Driven by two
  * signals: Catalyst's nested-column pruning (a query reading only
  * `genotypes[i].gt` hands the scan a genotype struct without `fields`, so
  * per-sample FORMAT maps are never built) and the explicit
  * `.option("formatFields", "GT,DP")` (Catalyst cannot prune MAP keys, so
  * restricting which FORMAT keys the text codec materializes is opt-in).
  * `fieldKeys = None` means the full map; `Some(keys)` restricts it.
  * Reference analog: the lazy-decode posture of VcfSource.java:104-116.
  */
final case class VcfFormatMask(genotypes: Boolean, sample: Boolean, gt: Boolean,
    fields: Boolean, fieldKeys: Option[IndexedSeq[String]],
    info: Boolean = true, end: Boolean = true,
    infoKeys: Option[IndexedSeq[String]] = None) extends Serializable

object VcfFormatMask {
  val All: VcfFormatMask =
    VcfFormatMask(genotypes = true, sample = true, gt = true, fields = true, fieldKeys = None)

  /** Derive from the pruned schema Catalyst hands the scan + the options.
    * `end` matters because the END key of a pruned-away INFO column still
    * decides the record's span — the reader forces it back on whenever an
    * interval predicate is present.
    */
  def from(required: StructType, formatFields: Option[Seq[String]],
           infoFields: Option[Seq[String]] = None): VcfFormatMask = {
    val keys = formatFields.map(_.toVector)
    val top = required.fieldNames.toSet
    val base = required.fields.find(_.name == "genotypes") match {
      case None => VcfFormatMask(genotypes = false, sample = false, gt = false,
        fields = false, fieldKeys = keys)
      case Some(gf) => gf.dataType match {
        case ArrayType(st: StructType, _) =>
          val names = st.fieldNames.toSet
          VcfFormatMask(genotypes = true, sample = names.contains("sample"),
            gt = names.contains("gt"), fields = names.contains("fields"), fieldKeys = keys)
        case _ => All.copy(fieldKeys = keys)
      }
    }
    base.copy(info = top.contains("info"), end = top.contains("end"),
      infoKeys = infoFields.map(_.toVector))
  }

  /** Parse + validate the `formatFields` option value ("GT,DP,GQ"). */
  def parseOption(opt: Option[String]): Option[IndexedSeq[String]] = opt.map { s =>
    val ks = s.split(',').map(_.trim).filter(_.nonEmpty).toVector
    require(ks.nonEmpty, s"formatFields: no FORMAT keys in '$s'")
    ks.foreach(k => require(k.forall(c => c.isLetterOrDigit),
      s"formatFields: bad FORMAT key '$k' (want alphanumeric, e.g. GT, DP, GQ)"))
    ks
  }

  /** Parse + validate the `infoFields` option value ("DP,AF,CSQ"). INFO
    * keys allow '_' and '.' per the VCF spec's key grammar.
    */
  def parseInfoOption(opt: Option[String]): Option[IndexedSeq[String]] = opt.map { s =>
    val ks = s.split(',').map(_.trim).filter(_.nonEmpty).toVector
    require(ks.nonEmpty, s"infoFields: no INFO keys in '$s'")
    ks.foreach(k => require(k.forall(c => c.isLetterOrDigit || c == '_' || c == '.'),
      s"infoFields: bad INFO key '$k'"))
    ks
  }
}

object Variant {
  // Container nullability is declared PERMISSIVE (containsNull /
  // valueContainsNull = true) on purpose: a stricter declaration makes
  // Spark's TableOutputResolver wrap every write whose input containers are
  // nullable-typed (any map()/array() built from computed columns) in an
  // INTERPRETED per-row rebuild — transform + named_struct + map_from_arrays
  // + assertnotnull over every genotype of every row — measured as the top
  // CPU frame of the cohort-fixture write stages. Readers never emit null
  // elements/values either way, so nothing downstream loses a guarantee it
  // could actually rely on.
  val genotypeType: StructType = StructType(Seq(
    StructField("sample", StringType, nullable = true),
    StructField("gt", StringType, nullable = true),
    StructField("fields", MapType(StringType, StringType, valueContainsNull = true), nullable = true)))

  val schema: StructType = StructType(Seq(
    StructField("contig", StringType, nullable = true),
    StructField("start", IntegerType, nullable = true),
    StructField("end", IntegerType, nullable = true),
    StructField("id", StringType, nullable = true),
    StructField("ref", StringType, nullable = true),
    StructField("alt", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("qual", DoubleType, nullable = true),
    StructField("filters", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("info", MapType(StringType, StringType, valueContainsNull = true), nullable = true),
    StructField("genotypes", ArrayType(genotypeType, containsNull = true), nullable = true)))
}

/** VCF header: the ## meta lines + sample names from the #CHROM line. */
case class VcfHeader(metaLines: Seq[String], samples: Seq[String]) {
  def headerText: String = {
    val cols = Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO") ++
      (if (samples.nonEmpty) "FORMAT" +: samples else Nil)
    (metaLines :+ cols.mkString("\t")).mkString("", "\n", "\n")
  }
}

object VcfHeader {
  val Minimal = VcfHeader(Seq("##fileformat=VCFv4.2"), Nil)

  def parse(lines: Iterator[String]): VcfHeader = {
    val metas = Seq.newBuilder[String]
    var samples: Seq[String] = Nil
    var done = false
    while (!done && lines.hasNext) {
      val l = lines.next()
      if (l.startsWith("##")) metas += l
      else if (l.startsWith("#CHROM")) {
        val f = l.split('\t')
        samples = if (f.length > 9) f.drop(9).toSeq else Nil
        done = true
      } else done = true
    }
    VcfHeader(metas.result(), samples)
  }
}
