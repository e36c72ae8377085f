package graft.queries

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The trained-codebook memo must key on CONTENT identity, not file names:
  * an in-place rewrite that reproduces identical part-file names (custom
  * committer; or a 32-bit name-hash collision) must retrain, never serve a
  * stale codebook — a silent q_ann_ivf/q_ann_ivfpq answer change otherwise.
  */
class CodebookMemoSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def partFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir).iterator()
    val out = Seq.newBuilder[Path]
    while (s.hasNext) {
      val p = s.next()
      if (p.getFileName.toString.startsWith("part-")) out += p
    }
    out.result().sortBy(_.getFileName.toString)
  }

  test("in-place rewrite under identical file names retrains the codebook") {
    val root = Files.createTempDirectory("codebookmemo")
    root.toFile.deleteOnExit()
    val table = root.resolve("embeddings.parquet")

    // baseline dataset: a single-part copy of the sf0.001 embeddings
    Tables.embeddings(spark, sf).coalesce(1)
      .write.mode("overwrite").parquet(table.toString)
    val baseNames = partFiles(table).map(_.getFileName.toString)
    assert(baseNames.size == 1)

    val c1 = Pipeline.trainedCentroids(spark, root.toString)
      .orderBy(col("cid")).collect().map(_.toSeq).toSeq

    // rewrite IN PLACE under the exact same part-file name, different
    // content (embeddings reversed → different centroids)
    val altDir = root.resolve("alt.parquet")
    Tables.embeddings(spark, sf).withColumn("embedding", reverse(col("embedding")))
      .coalesce(1).write.mode("overwrite").parquet(altDir.toString)
    val altPart = partFiles(altDir).head
    Files.copy(altPart, table.resolve(baseNames.head),
      StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar, now stale for the swapped bytes
    Files.deleteIfExists(table.resolve("." + baseNames.head + ".crc"))

    val c2 = Pipeline.trainedCentroids(spark, root.toString)
      .orderBy(col("cid")).collect().map(_.toSeq).toSeq
    assert(c1 != c2,
      "stale codebook served after an in-place rewrite with identical file names")

    // unchanged files memo-hit: the same call returns the same artifact
    val c3 = Pipeline.trainedCentroids(spark, root.toString)
      .orderBy(col("cid")).collect().map(_.toSeq).toSeq
    assert(c2 == c3)
  }
}
