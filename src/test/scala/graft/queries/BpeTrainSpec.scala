package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** q_bpe_train contract: (1) the DuckDB oracle's list_reduce fold applies a
  * merge with EXACTLY the canonical greedy left-to-right scan semantics —
  * pinned exhaustively over adversarial symbol sequences; (2) the full
  * training loop reproduces an independent reference implementation on a
  * corpus with known merge dynamics (ties, overlapping runs, multi-round
  * chains); (3) the per-round plan shuffles PAIR keys only and takes the
  * argmax via TakeOrderedAndProject — never a corpus-wide sort or window.
  */
class BpeTrainSpec extends AnyFunSuite with SparkFixture {

  /** The oracle's fold, transliterated from the generated SQL: seed '',
    * then per symbol either extend the tail (merge) or append with ','.
    */
  private def foldApply(syms: Array[String], lhs: String, rhs: String): Array[String] = {
    val s = syms.foldLeft("") { (acc, x) =>
      if (x == rhs && acc.endsWith("," + lhs)) acc + x else acc + "," + x
    }
    s.drop(1).split(",", -1)
  }

  test("oracle fold == greedy scan, exhaustively over adversarial sequences") {
    // alphabet includes symbols that prefix/suffix each other (a, aa, ab, b)
    // so false boundary matches would surface; every (lhs, rhs) pair tried
    val alphabet = Array("a", "b", "aa", "ab", "ba")
    val pairs = for (l <- alphabet; r <- alphabet) yield (l, r)
    def seqs(len: Int): Iterator[Array[String]] =
      if (len == 0) Iterator(Array.empty[String])
      else seqs(len - 1).flatMap(s => alphabet.iterator.map(a => s :+ a))
    var checked = 0
    for (len <- 1 to 4; s <- seqs(len); (l, r) <- pairs) {
      val scan = Pipeline.bpeApplyMerge(s, l, r)
      val fold = foldApply(s, l, r)
      assert(scan.toSeq == fold.toSeq,
        s"seq=${s.mkString("|")} merge=($l,$r) scan=${scan.mkString("|")} fold=${fold.mkString("|")}")
      checked += 1
    }
    assert(checked > 15000) // 5+25+125+625 sequences x 25 pairs
    // the classic overlap case explicitly
    assert(Pipeline.bpeApplyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Pipeline.bpeApplyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
  }

  test("training loop matches an independent reference on a known corpus") {
    import spark.implicits._
    // frequencies chosen so merges chain (l+o, lo+w) and tie-break fires:
    // "lower" x4, "low" x3, "newest" x5, "widest" x2 — classic BPE fixture
    val text = (Seq.fill(4)("lower") ++ Seq.fill(3)("low") ++
      Seq.fill(5)("newest") ++ Seq.fill(2)("widest") ++ Seq("Xn 42")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("bpetrain").toString
    Seq((1L, text)).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    // independent reference: same algorithm, simple driver-side maps
    var vocab: Map[List[String], Long] =
      text.split(" ").filter(w => w.length >= 2 && w.forall(c => c >= 'a' && c <= 'z'))
        .groupBy(identity).map { case (w, ws) => (w.map(_.toString).toList, ws.length.toLong) }
    val expect = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var round = 1
    while (round <= Pipeline.BpeMerges &&
      vocab.keys.exists(_.length >= 2)) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val ((bl, br), bn) = counts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.head
      expect += ((round.toLong, bl, br, bl + br, bn))
      vocab = vocab.groupMapReduce {
        case (syms, _) => Pipeline.bpeApplyMerge(syms.toArray, bl, br).toList
      }(_._2)(_ + _)
      round += 1
    }

    val got = Registry.queries("q_bpe_train")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.length == expect.length)
    assert(got.toSeq == expect.toSeq,
      s"got=${got.take(6).mkString(",")} expect=${expect.take(6).mkString(",")}")
    // the chained merges actually happened (multi-char lhs in later rounds)
    assert(got.exists(_._2.length >= 2), "no chained merge — loop not iterating on merged symbols")
  }

  test("per-round plan: pair-keyed shuffle, TakeOrderedAndProject argmax, no window") {
    import spark.implicits._
    val vocab = Seq((Array("l", "o", "w"), 3L), (Array("n", "e", "w"), 5L))
      .toDF("syms", "freq")
    val plan = Pipeline.bpePairArgmax(vocab).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"argmax must be a parallel partial top-1, got:\n$plan")
    assert(!plan.contains("Window"), "no window in the training round")
    assert(!plan.contains("CartesianProduct"))
    // the only exchange carries pair keys (exactly two grouping exprs),
    // never syms arrays or the corpus — the AQE wrapper hides the exchange
    // node from collect(), so parse the partitioning args from the plan
    // string (the struct-field grouping keys print anonymized)
    val parts = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(parts.nonEmpty, s"no shuffle found in:\n$plan")
    parts.foreach { args =>
      val keys = args.split(",").map(_.trim).dropRight(1) // last arg = numPartitions
      assert(keys.length == 2 && keys.forall(!_.contains("syms")),
        s"shuffle must carry exactly the (lhs, rhs) pair, got: $args")
    }
  }
}
