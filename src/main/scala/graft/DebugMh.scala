package graft
import org.apache.spark.sql.SparkSession

/** Scratch: bench-like timing (clearCache between runs) for dedup queries. */
object DebugMh {
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
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // session warmup: shuffle + parquet + codegen machinery
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").groupBy("lang").count().collect()
    for (name <- Seq("q_dedup_minhash_pairs", "q_dedup_ngram_jaccard", "q_dedup_embedding",
        "q_dedup_minhash_sig", "q_ann_lsh")) {
      for (i <- 1 to 3) {
        t(s"$name run$i") { SparkEntry.queries(name)(spark, sfDir).count() }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
