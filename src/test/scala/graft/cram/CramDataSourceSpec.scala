package graft.cram

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `format("cram")` scan/sink behavior: single-file geometry (file
  * definition + containers + EOF terminator + rebased `.crai`), sharded
  * complete shards with per-shard `.crai`, and unindexed interval scans
  * pruning on container-header coordinates.
  */
class CramDataSourceSpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(): java.nio.file.Path = {
    val d = Files.createTempDirectory("cramspec")
    d.toFile.deleteOnExit()
    d
  }

  private def containers(n: Int) = {
    val s = spark
    import s.implicits._
    spark.range(n.toLong).select(
      (col("id") % 3).cast("int").as("ref_seq_id"),
      (col("id") * 100 + 1).cast("int").as("start_pos"),
      lit(90).as("span"),
      (col("id") % 10 + 1).cast("int").as("n_records"),
      ((col("id") % 5) * 8).cast("int").as("data_length"))
  }

  test("single-file sink: definition + EOF geometry, scan round-trips") {
    val dir = tmpDir()
    val out = dir.resolve("t.cram")
    containers(200).repartition(4).write.format("cram").mode("overwrite")
      .option("writeCrai", "true").save(out.toString)
    val bytes = Files.readAllBytes(out)
    assert(bytes.take(4).map(_.toChar).mkString == "CRAM")
    // trailing EOF container: refSeqId -1, 0 records
    val in = graft.bgzf.SeekableInput.ofFile(out)
    val cs = try CramContainers.containers(in) finally in.close()
    assert(cs.last.isEof && cs.count(!_.isEof) == 200)
    assert(Files.exists(dir.resolve("t.cram.crai")))
    val back = spark.read.format("cram").load(out.toString)
    assert(back.count() == 200)
    assert(back.agg(sum("n_records")).head.getLong(0) ==
      (0 until 200).map(i => i % 10 + 1).sum)
  }

  test("sharded sink: complete standalone shards with per-shard crai, dir scan") {
    val dir = tmpDir()
    val out = dir.resolve("shards")
    containers(300).repartition(5).write.format("cram").mode("overwrite")
      .option("writeCrai", "true").save(out.toString)
    val shards = Files.list(out).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(shards).asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(names.count(_.endsWith(".cram")) == 5, names)
    assert(names.count(_.endsWith(".crai")) == 5, names)
    // every shard is a standalone CRAM: magic + EOF terminator
    names.filter(_.endsWith(".cram")).foreach { n =>
      val in = graft.bgzf.SeekableInput.ofFile(out.resolve(n))
      val cs = try CramContainers.containers(in) finally in.close()
      assert(cs.last.isEof, n)
    }
    val back = spark.read.format("cram").load(out.toString)
    assert(back.count() == 300)
  }

  test("catalyst filter pushdown prunes containers without the intervals option") {
    val dir = tmpDir()
    val out = dir.resolve("pf.cram")
    containers(2000).coalesce(1).sortWithinPartitions(col("ref_seq_id"), col("start_pos"))
      .write.format("cram").mode("overwrite").option("writeCrai", "true").save(out.toString)
    val all = spark.read.format("cram").option("splitSize", 8192).load(out.toString)
    val filtered = all.filter(col("ref_seq_id") === 1 && col("start_pos") <= 60000)
    val (nAll, nF) = (all.rdd.getNumPartitions, filtered.rdd.getNumPartitions)
    assert(nAll > 4, s"want many unfiltered partitions, got $nAll")
    assert(nF < nAll, s"filter pushdown did not prune: $nF vs $nAll")
    // Catalyst re-applies the exact predicate: rows match the plain filter
    val want = (0 until 2000).count(i => i % 3 == 1 && i * 100 + 1 <= 60000)
    assert(filtered.count() == want)
  }

  test("unindexed interval scan prunes on container-header coordinates") {
    val dir = tmpDir()
    val out = dir.resolve("noidx.cram")
    containers(2000).coalesce(1).sortWithinPartitions(col("ref_seq_id"), col("start_pos"))
      .write.format("cram").mode("overwrite").save(out.toString) // no .crai
    assert(!Files.exists(dir.resolve("noidx.cram.crai")))
    val iv = spark.read.format("cram").option("splitSize", 8192)
      .option("intervals", "1:50001-60000").load(out.toString)
    val want = (0 until 2000).count { i =>
      i % 3 == 1 && i * 100 + 1 <= 60000 && i * 100 + 1 + 89 >= 50001
    }
    assert(iv.count() == want)
  }
}
