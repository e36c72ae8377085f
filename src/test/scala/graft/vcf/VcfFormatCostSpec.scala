package graft.vcf

import org.scalatest.funsuite.AnyFunSuite

/** Cost attribution for the FORMAT-projection decode paths (the
  * VcfWriteCostSpec pattern): measures codec-only throughput of the full
  * decode vs the selective paths on (a) the GT-only cohort shape the popgen
  * family reads and (b) a wide 5-key FORMAT. Prints the table the read_s
  * adjudication cites; asserts only the structural expectation that the
  * selective decode of a WIDE format is not slower than the full decode —
  * with generous slack, this is a cost probe, not a flaky perf gate.
  */
class VcfFormatCostSpec extends AnyFunSuite {

  private val samples12 = (1 to 12).map(j => f"s$j%02d")

  private def gtOnlyLine(i: Int): String = {
    val sb = new StringBuilder(128)
    sb.append("chr").append(i % 3).append('\t').append(i % 999000 + 1)
      .append("\t.\tA\tG\t30\tPASS\t.\tGT")
    var j = 0
    while (j < 12) {
      sb.append('\t').append((i * 31 + j * 7) % 3 match {
        case 0 => "0/0"; case 1 => "0/1"; case _ => "1/1"
      })
      j += 1
    }
    sb.toString
  }

  private def wideLine(i: Int): String = {
    val sb = new StringBuilder(256)
    sb.append("chr").append(i % 3).append('\t').append(i % 999000 + 1)
      .append("\t.\tA\tG\t30\tPASS\t.\tGT:DP:GQ:AD:PL")
    var j = 0
    while (j < 12) {
      val d = (i * 31 + j * 7) % 97
      sb.append('\t').append((i + j) % 3 match {
        case 0 => "0/0"; case 1 => "0/1"; case _ => "1/1"
      }).append(':').append(d).append(':').append(99 - d % 60)
        .append(':').append(d).append(',').append(d / 2)
        .append(':').append(d * 3).append(",0,").append(d * 7)
      j += 1
    }
    sb.toString
  }

  private def time(reps: Int, lines: Array[String], mask: VcfFormatMask): Double = {
    var sink = 0L
    val t0 = System.nanoTime()
    var r = 0
    while (r < reps) {
      var i = 0
      while (i < lines.length) {
        val v = VcfCodec.fromLine(lines(i), samples12, mask, null)
        sink += v.genotypes.length
        i += 1
      }
      r += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sink > 0)
    sec
  }

  test("cost table: full vs gt-only vs formatFields on GT-only and wide FORMAT") {
    val n = 20000
    val gtLines = Array.tabulate(n)(gtOnlyLine)
    val wide = Array.tabulate(n)(wideLine)
    val full = VcfFormatMask.All
    val gtOnly = VcfFormatMask(genotypes = true, sample = true, gt = true,
      fields = false, fieldKeys = None)
    val selGtDp = VcfFormatMask(genotypes = true, sample = true, gt = true,
      fields = true, fieldKeys = Some(Vector("GT", "DP")))
    // warmup
    time(2, gtLines, full); time(2, gtLines, gtOnly)
    time(2, wide, full); time(2, wide, gtOnly); time(2, wide, selGtDp)
    val reps = 8
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    def bench(lines: Array[String], m: VcfFormatMask) =
      med((1 to 3).map(_ => time(reps, lines, m)))
    val gtFull = bench(gtLines, full)
    val gtSel = bench(gtLines, gtOnly)
    val wFull = bench(wide, full)
    val wSel = bench(wide, gtOnly)
    val wSelDp = bench(wide, selGtDp)
    val perLine = reps.toDouble * n
    info(f"GT-only cohort line (12 samples): full ${gtFull}%.3f s, gt-only ${gtSel}%.3f s -> ${gtFull / gtSel}%.2fx")
    info(f"wide 5-key FORMAT (12 samples):   full ${wFull}%.3f s, gt-only ${wSel}%.3f s -> ${wFull / wSel}%.2fx")
    info(f"wide 5-key FORMAT, GT+DP:         full ${wFull}%.3f s, sel    ${wSelDp}%.3f s -> ${wFull / wSelDp}%.2fx")
    info(f"(decode rate, full/wide: ${perLine / wFull / 1e6}%.2f M lines/s per core)")
    // structural expectation only: on a wide FORMAT, decoding one field
    // must not cost more than decoding all five (1.3x slack for noise)
    assert(wSel < wFull * 1.3,
      f"gt-only selective decode slower than full on wide FORMAT: ${wSel}%.3f vs ${wFull}%.3f")
  }
}
