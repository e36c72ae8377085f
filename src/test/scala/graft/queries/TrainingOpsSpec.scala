package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Semantics of the round-8 training-pipeline operators on corpora built to
  * exercise them directly (the DuckDB oracle pins exact results on the real
  * tables; these pin the CLAIMS — a planted shared paragraph is found, an
  * unrelated doc never is, and the epoch manifest is a real permutation).
  */
class TrainingOpsSpec extends AnyFunSuite with SparkFixture {

  /** Deterministic word salad: seed-addressed pseudo-random words. */
  private def salad(seed: String, n: Int): String =
    (0 until n).map(i => s"w${math.abs((seed + i).hashCode) % 5000}").mkString(" ")

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-substr").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_dedup_substr finds a planted shared paragraph and only that") {
    // docs 1 and 2 share a 64-word paragraph inside distinct surroundings;
    // doc 3 is unrelated. 57 overlapping 8-grams sampled at 1/7 — the
    // deterministic winnowing keeps the same grams in both docs, so the
    // registry must attribute every duplicate fingerprint to exactly {1, 2}.
    val para = salad("shared-paragraph", 64)
    val dir = writeDocs(Seq(
      1L -> s"${salad("intro-one", 30)} $para ${salad("outro-one", 30)}",
      2L -> s"${salad("intro-two", 25)} $para ${salad("outro-two", 40)}",
      3L -> salad("unrelated", 150)))
    val rows = Pipeline.queries("q_dedup_substr")(spark, dir).collect()
    assert(rows.nonEmpty, "planted 64-word shared paragraph produced no duplicate fingerprints")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("first_doc") == 1L &&
        r.getAs[Long]("last_doc") == 2L,
        s"duplicate fingerprint attributed outside the planted pair: $r")
    }
  }

  test("q_dedup_substr: disjoint corpora share no fingerprints") {
    val dir = writeDocs(Seq(1L -> salad("alpha", 120), 2L -> salad("beta", 120)))
    assert(Pipeline.queries("q_dedup_substr")(spark, dir).collect().isEmpty)
  }

  test("q_train_order: manifest is a full partition of the corpus per epoch") {
    val dir = writeDocs((1L to 200L).map(i => i -> salad(s"d$i", 12)))
    val m = Pipeline.queries("q_train_order")(spark, dir).collect()
    val byEpoch = m.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L))
    // every doc lands in exactly one shard per epoch
    for ((_, rows) <- byEpoch) {
      assert(rows.map(_.getAs[Long]("n_docs")).sum == 200L)
      assert(rows.map(_.getAs[Long]("sum_doc_ids")).sum == (1L to 200L).sum)
    }
    // the epoch salt really permutes: shard contents (hence per-shard
    // id sums) must differ between epochs somewhere
    val sums = byEpoch.view.mapValues(
      _.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("sum_doc_ids")).toMap).toMap
    assert(sums(0L) != sums(1L), "epoch 0 and 1 produced identical shard assignments")
  }
}
