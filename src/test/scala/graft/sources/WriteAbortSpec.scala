package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.bam.TestReads

/** Failure-injection for the sink commit protocol: a write job that dies
  * mid-flight must leave NO partial output — no half-written target, no
  * orphaned temp parts. On a 1000-executor cluster task and job failures
  * are routine; a sink whose abort path leaks partial single-file output
  * would poison every downstream lexicographic directory scan (which
  * would pick up temp parts as inputs).
  */
class WriteAbortSpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(): Path = {
    val d = Files.createTempDirectory("abort")
    d.toFile.deleteOnExit()
    d
  }

  private val refsOpt = "chr20:1000000,chr21:2000135"

  /** Poison one record so exactly one task throws mid-write. */
  private def poisoned(n: Int) = {
    val s = spark
    import s.implicits._
    spark.createDataset(TestReads.mixed(n)).toDF()
      .withColumn("start",
        when($"readName" === f"test-read-${n / 2}%03d",
          raise_error(lit("injected task failure")).cast("int"))
          .otherwise($"start"))
  }

  test("failed single-file BAM write leaves neither target nor temp parts") {
    val dir = tmpDir()
    val out = dir.resolve("dead.bam")
    intercept[Exception] {
      poisoned(600).write.format("bam").mode("overwrite")
        .option("refs", refsOpt).save(out.toString)
    }
    val leftovers = Files.list(dir).toArray.map(_.toString)
    assert(leftovers.isEmpty, s"abort leaked: ${leftovers.mkString(", ")}")
  }

  test("failed sharded BAM write leaves no committed shards behind") {
    val dir = tmpDir()
    val out = dir.resolve("shards")
    intercept[Exception] {
      poisoned(600).repartition(8).write.format("bam").mode("overwrite")
        .option("refs", refsOpt).save(out.toString)
    }
    // the shard directory may exist, but no complete .bam shard may have
    // survived the job abort
    val survivors =
      if (Files.exists(out)) Files.list(out).toArray.map(_.toString).filter(_.endsWith(".bam"))
      else Array.empty[String]
    assert(survivors.isEmpty, s"job abort left shards: ${survivors.mkString(", ")}")
  }

  test("a failed overwrite does not destroy readable prior output") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    val out = dir.resolve("keep.bam")
    val good = spark.createDataset(TestReads.mixed(200)).toDF()
    good.write.format("bam").mode("overwrite").option("refs", refsOpt).save(out.toString)
    val before = spark.read.format("bam").load(out.toString).count()
    intercept[Exception] {
      poisoned(600).write.format("bam").mode("overwrite")
        .option("refs", refsOpt).save(out.toString)
    }
    // overwrite deletes the target before writing (documented semantics),
    // so the strong claim is only "no corrupt replacement appeared":
    // either the old file is intact or the target is absent — a partial
    // new file must never be readable in its place
    if (Files.exists(out)) {
      val after = spark.read.format("bam").load(out.toString).count()
      assert(after == before, s"overwrite left a partial replacement: $after vs $before")
    }
  }
}
