package graft
import org.apache.spark.sql.SparkSession

/** Scratch: bench-like timing for format-layer round-trip queries. */
object DebugFmt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fmt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy().count().collect()
    for (name <- Seq("q_vcf_roundtrip", "q_sam_roundtrip", "q_bam_roundtrip_single",
        "q_bam_roundtrip_sharded", "q_bam_unmapped_traversal", "q_bam_coverage")) {
      for (i <- 1 to 2) {
        t(s"$name run$i") { SparkEntry.queries(name)(spark, sfDir).count() }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
