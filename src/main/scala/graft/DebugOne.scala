package graft
import org.apache.spark.sql.SparkSession

/** Scratch runner: `runMain graft.DebugOne <sfDir> <outDir> <query...>` —
  * runs the named SparkEntry queries only, writes each result to parquet,
  * prints collected rows. Debug aid, not part of the driver contract.
  */
object DebugOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // matching oracle subset, so the local DuckDB compare can run on just
    // these queries without a full Verify pass
    val sel = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      sel.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"=== $name ===")
      spark.read.parquet(s"$outDir/$name").orderBy(spark.read.parquet(s"$outDir/$name").columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*).show(100, truncate = false)
    }
    spark.stop()
  }
}
