package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted executed plan of the named
  * queries (all of them by default) against a scale-factor directory.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 q1_pricing_summary q3_shipping_priority"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n===== $name =====")
          try {
            val df = fn(spark, sfDir)
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          } catch { case e: Throwable => println(s"[explain failed] ${e.getMessage}") }
        case None => println(s"unknown query: $name")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
