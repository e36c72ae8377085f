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

  test("q_text_chunk: windows tile every doc — no gap, no overrun") {
    // lengths straddle every boundary of the 32/24 window formula:
    // 1 (one short chunk), 32 (exactly one full), 33 (first ragged split),
    // 56 (last window exactly flush), 57 (stride rolls over), 100
    val lens = Seq(1, 20, 32, 33, 56, 57, 100)
    val dir = writeDocs(lens.zipWithIndex.map { case (n, i) => (i + 1).toLong -> salad(s"c$i", n) })
    val rows = Pipeline.queries("q_text_chunk")(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == lens.indices.map(i => (i + 1).toLong).toSet)
    for ((doc, rs) <- byDoc) {
      val n = lens(doc.toInt - 1)
      val sorted = rs.sortBy(_.getAs[Long]("chunk_idx"))
      assert(sorted.head.getAs[Long]("chunk_start") == 0L)
      // consecutive starts step by exactly the stride
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("chunk_start") - a.getAs[Long]("chunk_start") == 24L)
        case _ =>
      }
      // last window reaches the end of the doc exactly; none overruns
      assert(sorted.map(r => r.getAs[Long]("chunk_start") + r.getAs[Long]("chunk_len")).max == n.toLong)
      sorted.foreach(r => assert(r.getAs[Long]("chunk_len") <= 32L && r.getAs[Long]("chunk_len") >= 1L))
      // stride < window means consecutive windows overlap — no word skipped
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("chunk_start") < a.getAs[Long]("chunk_start") + a.getAs[Long]("chunk_len"))
        case _ =>
      }
    }
  }

  test("q_boilerplate: a block-aligned shared segment is stripped, unique text kept") {
    val shared = salad("boiler-seg", 8) // one full 8-word block
    val dir = writeDocs(Seq(
      1L -> s"$shared ${salad("tail-one", 24)}",
      2L -> s"$shared ${salad("tail-two", 16)}",
      3L -> s"$shared ${salad("tail-three", 32)}",
      4L -> salad("unique", 40),
      5L -> salad("tiny", 5))) // < 8 words: zero segments, still reported
    val rows = Pipeline.queries("q_boilerplate")(spark, dir).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L, 5L))
    for (d <- Seq(1L, 2L, 3L)) {
      assert(byDoc(d).getAs[Long]("n_boiler") == 1L,
        s"doc $d: planted shared block not flagged exactly once: ${byDoc(d)}")
      assert(byDoc(d).getAs[Long]("kept_words") ==
        byDoc(d).getAs[Long]("n_words") - 8L)
    }
    assert(byDoc(4L).getAs[Long]("n_boiler") == 0L)
    assert(byDoc(5L).getAs[Long]("n_segs") == 0L &&
      byDoc(5L).getAs[Long]("kept_words") == 5L)
  }

  test("q_dedup_semantic: in-cell duplicates collapse to the lowest id") {
    import spark.implicits._
    // 16 mutually-orthogonal centroids (dims 4j..4j+3 = 0.5), plus an
    // exact-duplicate pair (20, 21) pointing along centroid 0 — both land
    // in cell 0 and must collapse onto the cell's lowest id
    val rows = (0 until 16).map { j =>
      (j.toLong, Array.tabulate(64)(i => if (i / 4 == j) 0.5f else 0.0f), j)
    } ++ Seq(
      (20L, Array.tabulate(64)(i => if (i < 4) 0.45f else 0.0f), 0),
      (21L, Array.tabulate(64)(i => if (i < 4) 0.45f else 0.0f), 0))
    val dir = java.nio.file.Files.createTempDirectory("graft-sem").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Pipeline.queries("q_dedup_semantic")(spark, dir).collect()
    // centroid 0 (id 0) is the cell's lowest id and similar to both dups
    // (dot 0.5*0.45*4 = 900k >= 350k), so 20 and 21 are removed, keeper 0;
    // nothing else pairs (distinct centroids are orthogonal)
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(20L, 21L))
    out.foreach { r =>
      assert(r.getAs[Long]("keeper") == 0L && r.getAs[Long]("cid") == 0L, r.toString)
    }
  }

  test("semCellsFor: pinned to 16 at oracle scale, grows with the corpus") {
    assert(Pipeline.semCellsFor(500) == 16)   // sf0.01 — the correctness gate
    assert(Pipeline.semCellsFor(2000) == 16)  // sf0.1
    assert(Pipeline.semCellsFor(2048) == 16)  // the edge of the pinned regime
    assert(Pipeline.semCellsFor(20000) == 256)  // the sf1 smoke corpus
    assert(Pipeline.semCellsFor(1L << 40) == 65536) // bounded: broadcastable codebook
  }

  /** Local union-find: the oracle for the distributed contraction. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def resolve(edges: Seq[(Long, Long)], forceContraction: Boolean): Map[Long, Long] = {
    import spark.implicits._
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val df = Pipeline.resolveClusters(sym.toDF("src", "dst"), forceContraction)
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("resolveClusters: a long chain collapses to its minimum in O(log) rounds") {
    // ids ASCENDING along the path — the adversarial order where fixed-edge
    // min-propagation needs O(diameter) rounds; star contraction must stay
    // within resolveClusters' 48-round bound (needs ~log2(500) ≈ 9) and
    // still label every node with the chain minimum. Both code paths must
    // agree: the adaptive entry (union-find fast path at this size) and
    // the forced distributed contraction.
    val n = 500
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    for (forced <- Seq(false, true)) {
      val got = resolve(chain, forced)
      assert(got.size == n && got.values.toSet == Set(0L),
        s"chain mislabeled (forceContraction=$forced): ${got.filter(_._2 != 0L).take(5)}")
    }
  }

  test("resolveClusters: random graphs match a local union-find exactly on BOTH paths") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3; forced <- Seq(false, true)) {
      val n = 300
      val edges = (0 until 400).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(n, edges)
      val got = resolve(edges, forced)
      // resolveClusters only labels nodes that appear in an edge
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched, s"trial $trial forced=$forced: node set mismatch")
      got.foreach { case (id, lbl) =>
        assert(lbl == want(id), s"trial $trial forced=$forced: node $id got $lbl want ${want(id)}")
      }
    }
  }

  test("resolveClusters: string-keyed graphs label with the lexicographic minimum") {
    import spark.implicits._
    // the fuzzy-linkage shape: ids are names, labels their component min
    val edges = Seq(("b", "c"), ("c", "d"), ("x", "y"), ("a", "b"))
    for (forced <- Seq(false, true)) {
      val df = Pipeline.resolveClusters(
        edges.flatMap { case (p, q) => Seq((p, q), (q, p)) }.toDF("src", "dst"), forced)
      val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
        "x" -> "x", "y" -> "x"), s"forced=$forced: $got")
    }
  }
}
