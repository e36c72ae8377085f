package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Convenience facade mirroring the reference's storage entry points
  * (`HtsjdkReadsRddStorage` / `HtsjdkVariantsRddStorage`,
  * HtsjdkReadsRddStorage.java:76-245): format dispatch by extension of the
  * path (or of the first file in a directory), fluent-ish options.
  *
  * A reference user's
  *   `HtsjdkReadsRddStorage.makeDefault(jsc).splitSize(n).read(path, traversal)`
  * becomes
  *   `Reads.read(spark, path, splitSize = Some(n), intervals = Some("chr21:1-100"))`.
  */
object Reads {

  /** Read BAM or SAM by extension (reference SamFormat.fromPath dispatch,
    * impl/formats/sam/SamFormat.java:49-56).
    */
  def read(spark: SparkSession, path: String,
           splitSize: Option[Long] = None,
           intervals: Option[String] = None,
           unplacedUnmapped: Boolean = false): DataFrame = {
    var r = spark.read.format(formatOf(spark, path))
    splitSize.foreach(s => r = r.option("splitSize", s))
    intervals.foreach(iv => r = r.option("intervals", iv))
    if (unplacedUnmapped) r = r.option("unplacedUnmapped", "true")
    r.load(path)
  }

  /** Write BAM or SAM; single file iff the extension is recognized, else a
    * sharded directory (write-option inference,
    * HtsjdkReadsRddStorage.java:217-257). `refs` = "name:length,…".
    */
  def write(df: DataFrame, path: String, refs: String,
            format: Option[String] = None, writeSbi: Boolean = false): Unit = {
    val fmt = format.getOrElse(if (path.endsWith(".sam")) "sam" else "bam")
    var w = df.write.format(fmt).mode("overwrite").option("refs", refs)
    if (writeSbi) w = w.option("writeSbi", "true")
    w.save(path)
  }

  private def formatOf(spark: SparkSession, path: String): String = {
    val name = firstFileName(spark, path)
    if (name.endsWith(".sam")) "sam"
    else if (name.endsWith(".bam")) "bam"
    else throw new IllegalArgumentException(
      s"cannot infer reads format from '$name' (want .bam/.sam); use spark.read.format(...) directly")
  }

  /** Extension source: the path itself, or the first file of a directory
    * (reference FileSystemWrapper.firstFileInDirectory, impl/file/
    * FileSystemWrapper.java:36-49).
    */
  private def firstFileName(spark: SparkSession, path: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val files = graft.sources.HadoopIO.listInputFiles(path, conf)
      .filterNot(_.getName.endsWith(".sbi"))
    if (files.isEmpty) new org.apache.hadoop.fs.Path(path).getName else files.head.getName
  }
}

object Variants {

  /** Read VCF (plain, BGZF, or gzip — sniffed per file). */
  def read(spark: SparkSession, path: String,
           splitSize: Option[Long] = None,
           intervals: Option[String] = None): DataFrame = {
    var r = spark.read.format("vcf")
    splitSize.foreach(s => r = r.option("splitSize", s))
    intervals.foreach(iv => r = r.option("intervals", iv))
    r.load(path)
  }

  /** Write VCF; `.vcf`/`.vcf.bgz`/`.vcf.gz` → single file (BGZF when the
    * extension says compressed), else sharded directory.
    */
  def write(df: DataFrame, path: String, headerText: Option[String] = None): Unit = {
    var w = df.write.format("vcf").mode("overwrite")
    headerText.foreach(h => w = w.option("vcfHeader", h))
    w.save(path)
  }
}
