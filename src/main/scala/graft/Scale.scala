package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: replicate an sf directory `factor`× into a new
  * directory so the bench can be run one scale factor past the largest
  * driver-provided one (`runMain graft.Scale <srcDir> <outDir> <factor>`).
  * Keys are shifted per replica by a stride ≥ the source key range so
  * joins stay consistent and cardinalities scale linearly; `documents`
  * text gets a per-replica suffix token (near-duplicates, not exact
  * copies — replicated exact text would inflate every dedup bucket by
  * `factor` and distort the scaling exponent) and `embeddings` vectors a
  * per-replica first-component nudge for the same reason. `region` and
  * `nation` are fixed dimensions and are copied as-is.
  *
  * This writes SCRATCH data for scale smoke tests — the driver-provided
  * testdata stays read-only.
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] $name -> $outDir/$name.parquet")
    }

    /** stride = next power of ten above the max key, so shifted ids stay
      * readable and replica ranges can never collide.
      */
    def strideOf(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key))).head.getLong(0)
      var s = 1L
      while (s <= mx) s *= 10
      s
    }

    /** Union of `factor` copies with the given per-replica transform. */
    def replicate(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => tx(df, r)).reduce(_ union _)

    // fixed dimensions
    write("region", src("region"))
    write("nation", src("nation"))

    val customer = src("customer")
    val orders = src("orders")
    val supplier = src("supplier")
    val part = src("part")
    val lineitem = src("lineitem")
    val sc = strideOf(customer, "c_custkey")
    val so = strideOf(orders, "o_orderkey")
    val ss = strideOf(supplier, "s_suppkey")
    val sp = strideOf(part, "p_partkey")

    write("customer", replicate(customer)((d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * sc))))
    write("supplier", replicate(supplier)((d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * ss))))
    write("part", replicate(part)((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * sp))))
    write("orders", replicate(orders)((d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * so))
        .withColumn("o_custkey", col("o_custkey") + lit(r * sc))))
    write("lineitem", replicate(lineitem)((d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * so))
        .withColumn("l_partkey", col("l_partkey") + lit(r * sp))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * ss))))

    val events = src("events")
    val se = strideOf(events, "event_id")
    val su = strideOf(events, "user_id")
    // replicated users keep their per-user event history: per-key state and
    // session shapes stay constant while key cardinality scales
    write("events", replicate(events)((d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * se))
        .withColumn("user_id", col("user_id") + lit(r * su))))

    val documents = src("documents")
    val sd = strideOf(documents, "doc_id")
    write("documents", replicate(documents)((d, r) => {
      // PREFIX the replica token: exact-dedup keys hash the FIRST words, so
      // a suffix would leave every replica group exactly-duplicated (the
      // replica-spam distortion this tool exists to avoid) while a prefix
      // perturbs the key and shifts one shingle — near-duplicate shape
      val txt = if (r == 0) col("text") else concat(lit(s"rep$r "), col("text"))
      d.withColumn("doc_id", col("doc_id") + lit(r * sd))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    }))

    val embeddings = src("embeddings")
    val sv = strideOf(embeddings, "vec_id")
    write("embeddings", replicate(embeddings)((d, r) =>
      d.withColumn("vec_id", col("vec_id") + lit(r * sv))
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + lit(r * 0.003f)).otherwise(x)))))

    spark.stop()
  }
}
