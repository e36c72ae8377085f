package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class CompactSpec extends AnyFunSuite with SparkFixture {

  private def scratch() = Files.createTempDirectory("compact").toString

  test("coalesce compaction collapses small files, keeps every row") {
    import spark.implicits._
    val base = scratch()
    val in = s"$base/in"
    val out = s"$base/out"
    val df = (0 until 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(50).write.parquet(in)
    val (nIn, nOut, rows) = Compact.parquet(spark, in, out, targetBytes = 512L << 20)
    assert(nIn == 50, s"expected 50 small input files, got $nIn")
    assert(nOut == 1, s"expected 1 compacted file, got $nOut")
    assert(rows == 10000L)
    val got = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(got == (0 until 10000).map(i => (i.toLong, s"row$i")).toSet)
  }

  test("hive-partitioned input sizes from its subdirectory files") {
    import spark.implicits._
    val base = scratch()
    val in = s"$base/in"
    val df = (0 until 8000).map(i => (i.toLong, i % 4, "y" * 32)).toDF("id", "k", "s")
    df.repartition(10).write.partitionBy("k").parquet(in)
    val (nIn, nOut, rows) = Compact.parquet(spark, in, s"$base/out")
    assert(nIn > 1, s"expected partitioned small files, got $nIn")
    assert(nOut == 1 && rows == 8000L, s"nOut=$nOut rows=$rows")
    // partition column survives as a plain column
    assert(spark.read.parquet(s"$base/out").columns.toSet == Set("id", "k", "s"))
  }

  test("target size splits output; shuffle mode rebalances") {
    import spark.implicits._
    val base = scratch()
    val in = s"$base/in"
    val df = (0 until 20000).map(i => (i.toLong, "x" * 64)).toDF("id", "s")
    df.repartition(40).write.parquet(in)
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // pick a target that forces >1 output file from the measured input
    val (_, nOut, rows) = Compact.parquet(spark, in, s"$base/out", targetBytes = inBytes / 3, shuffle = true)
    assert(nOut >= 3, s"expected >=3 output files, got $nOut")
    assert(rows == 20000L)
  }
}
