package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: bisect the NEW signedDocs pipeline cost layer by layer. */
object DebugMh2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mh2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val MinhashP = 2147483647L
    val MinhashK = 16
    def hash60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val wsCol = filter(split(col("text"), " "), w => length(w) > 0)
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warmup parquet") { docs.count() }
    t("scan+wsfilter") {
      docs.filter(size(wsCol) >= 3).count()
    }
    def shingled = docs
      .withColumn("ws", wsCol)
      .withColumn("shingles",
        when(size(col("ws")) >= 3,
          transform(sequence(lit(1), size(col("ws")) - 2),
            i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
              element_at(col("ws"), i + 2))))
          .otherwise(array()))
      .filter(size(wsCol) >= 3)
    t("shingles proj") { shingled.select($"doc_id", size($"shingles")).agg(sum("size(shingles)")).collect() }
    def hashed = shingled.withColumn("shash", transform(col("shingles"), sh => hash60(sh) % MinhashP))
    t("shash (md5 pass)") { hashed.select($"doc_id", aggregate($"shash", lit(0L), (a, v) => a + v)).agg(count(lit(1))).collect() }
    def sigFold = hashed.withColumn("sig",
      aggregate(col("shash"),
        transform(sequence(lit(0), lit(MinhashK - 1)), _ => lit(MinhashP)),
        (acc, h) => zip_with(acc, sequence(lit(0), lit(MinhashK - 1)),
          (m, k) => least(m, ((k * 2 + 1) * h + k * lit(1000003L)) % MinhashP))))
    t("sig fold") { sigFold.select($"doc_id", element_at($"sig", 1)).agg(count(lit(1))).collect() }
    val sigs = sigFold.select($"doc_id", $"sig")
    t("sigs persist+count") { sigs.persist(); sigs.count() }
    println("---- sig fold plan ----")
    println(sigFold.select($"doc_id", $"sig").queryExecution.executedPlan.toString.take(1500))
  }
}
