package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** In-JVM brute-force twins for the round-10 genomics-QC additions: the
  * DuckDB oracle pins the same arithmetic out-of-process, but these run in
  * `sbt test` with no harness, and the subtract check is a genuinely
  * different algorithm (per-position set difference) from the query's
  * window-lag gap emission — an off-by-one at any piece boundary diverges.
  */
class GenomicsQcSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("q_interval_subtract equals a per-position set-difference brute force") {
    val a = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey").collect()
      .map { r =>
        val ck = r.getLong(0); val ok = r.getLong(1)
        (s"chr${ck % 3}", (ok * 97) % 100000, (ok * 97) % 100000 + (ok % 400) + 50)
      }.distinct
    val b = Tables.part(spark, sf)
      .select("p_partkey").collect()
      .map { r =>
        val pk = r.getLong(0)
        (s"chr${pk % 3}", (pk * 53) % 100000, (pk * 53) % 100000 + (pk % 37) + 10)
      }.distinct
    val bByC = b.groupBy(_._1)
    // brute force: for each A, walk its positions, drop any covered by a B
    // of the same contig, then count maximal runs of surviving positions
    val pieces = a.flatMap { case (c, as, ae) =>
      val bs = bByC.getOrElse(c, Array.empty)
      val kept = (as to ae).filterNot(p => bs.exists(x => x._2 <= p && p <= x._3))
      // split kept positions into maximal consecutive runs
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (p <- kept) {
        if (runs.nonEmpty && runs.last._2 == p - 1)
          runs(runs.length - 1) = (runs.last._1, p)
        else runs += ((p, p))
      }
      runs.map { case (gs, ge) => (c, gs, ge) }
    }
    val want = pieces.groupBy(_._1).map { case (c, ps) =>
      (c, ps.length.toLong, ps.map(p => p._3 - p._2 + 1).sum,
        ps.map(_._2).sum, ps.map(p => p._3 - p._2 + 1).max)
    }.toSet
    val got = Relational.queries("q_interval_subtract")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_interval_subtract plans equi-joins only — no cartesian/nested loop") {
    val p = finalPlan(Relational.queries("q_interval_subtract")(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian appeared\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop appeared\n$p")
  }

  test("unclipped-5' markdup groups soft-clip-shifted duplicates that the plain key splits") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two physical copies of one fragment; the aligner clipped 5 bases off
    // copy two's 5' end and shifted POS by +5 — plain-start keys disagree,
    // unclipped-5' keys agree
    val reads = Seq(
      ("d1", 0, "chr0", 100L, 250L, "151M"),
      ("d2", 0, "chr0", 105L, 250L, "5S146M")).toDF(
      "readName", "strand", "contig", "start", "end", "cigar")
    val leadS = expr(
      "coalesce(try_cast(regexp_extract(cigar, '^([0-9]+)S', 1) as bigint), 0L)")
    val u5 = when($"strand" === 0, $"start" - leadS).otherwise($"end")
    val keys = reads.select(u5.as("u5"), $"start").collect()
    assert(keys.map(_.getLong(0)).distinct.length == 1, "unclipped keys must agree")
    assert(keys.map(_.getLong(1)).distinct.length == 2, "plain starts differ by design")
    // and the full query's totals line up with lineitem-derived brute force
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber").collect()
      .map { r =>
        val ok = r.getLong(0); val pk = r.getLong(1)
        val sk = r.getLong(2); val ln = r.getInt(3)
        val strand = if (ln % 2 == 1) 0 else 1
        val start = (pk * 13) % 5000 + 8
        val clip = sk % 8
        val u5v = if (strand == 0) start - clip else start + 150
        (s"chr${pk % 3}", u5v, strand, (ok * 7 + ln) % 61, s"r$ok-$ln")
      }
    val want = li.groupBy(t => (t._1, t._2, t._3)).toSeq
      .flatMap { case ((c, _, _), g) =>
        val sorted = g.sortBy(t => (-t._4, t._5))
        sorted.zipWithIndex.map { case (t, i) => (c, i > 0, t._4) }
      }
      .groupBy(_._1).map { case (c, xs) =>
        (c, xs.size.toLong, xs.count(_._2).toLong,
          xs.filterNot(_._2).map(_._3).sum)
      }.toSet
    val got = FormatQueries.queries("q_bam_markdup_unclipped")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("q_bam_baseq_cycle: the phred ladder round-trips byte-exactly") {
    val rows = FormatQueries.queries("q_bam_baseq_cycle")(spark, sf).collect()
    assert(rows.length == 36)
    val n = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) == n), "every cycle sees every read")
    // ladder qualities span [0, 39] at every cycle once n >> 40
    assert(rows.forall(r => r.getLong(3) >= 0L && r.getLong(4) <= 39L))
    // mean is scale-invariant under the (o + i - 1) mod 40 ladder: each
    // cycle's mean sits mid-range
    assert(rows.forall(r => r.getLong(5) >= 15000L && r.getLong(5) <= 25000L))
  }
}
