package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the population-genetics integer math behind
  * q_vcf_hwe and q_vcf_mendel — the formulas live inline in the queries
  * (Spark Column expressions + DuckDB SQL), so this spec re-states them in
  * plain Scala and pins them against first-principles definitions: the
  * fixed-point chi-square against the textbook floating-point HWE test,
  * and the transmissible-dosage range against brute-force enumeration of
  * parental allele transmissions.
  */
class PopGenMathSpec extends AnyFunSuite {

  /** The queries' fixed-point chi2 (×1000, integer div, exact order). */
  private def chi2Milli(a: Long, b: Long, c: Long): Long = {
    val n = a + b + c
    val pr = 2 * a + b
    val pq = 2 * c + b
    if (pr == 0 || pq == 0) 0L
    else
      ((4 * n * a - pr * pr) * (4 * n * a - pr * pr) * 1000) / (4 * n * pr * pr) +
        ((2 * n * b - pr * pq) * (2 * n * b - pr * pq) * 1000) / (2 * n * pr * pq) +
        ((4 * n * c - pq * pq) * (4 * n * c - pq * pq) * 1000) / (4 * n * pq * pq)
  }

  /** Textbook HWE chi-square: sum over the three genotype classes of
    * (obs - exp)^2 / exp with exp from allele frequencies.
    */
  private def chi2Ref(a: Long, b: Long, c: Long): Double = {
    val n = (a + b + c).toDouble
    val p = (2 * a + b) / (2 * n)
    val q = 1 - p
    val e = Seq(n * p * p, n * 2 * p * q, n * q * q)
    val o = Seq(a.toDouble, b.toDouble, c.toDouble)
    e.zip(o).map { case (ei, oi) => if (ei == 0) 0.0 else (oi - ei) * (oi - ei) / ei }.sum
  }

  test("fixed-point chi2 matches the textbook statistic over every 12-sample split") {
    for (a <- 0L to 12L; b <- 0L to 12L - a) {
      val c = 12L - a - b
      val pr = 2 * a + b
      val pq = 2 * c + b
      if (pr != 0 && pq != 0) {
        val got = chi2Milli(a, b, c) / 1000.0
        val want = chi2Ref(a, b, c)
        // three integer-div floors, each in [0,1) milli-units
        assert(math.abs(got - want) < 0.004, s"(a=$a b=$b c=$c) got=$got want=$want")
      } else assert(chi2Milli(a, b, c) == 0L, s"monomorphic (a=$a b=$b c=$c)")
    }
  }

  /** The queries' transmissible range. */
  private def inRange(df: Int, dm: Int, dc: Int): Boolean = {
    val lo = (if (df == 2) 1 else 0) + (if (dm == 2) 1 else 0)
    val hi = (if (df == 0) 0 else 1) + (if (dm == 0) 0 else 1)
    dc >= lo && dc <= hi
  }

  /** Brute force: every way each parent can transmit one allele. */
  private def possible(df: Int, dm: Int): Set[Int] = {
    def alleles(d: Int): Seq[Int] = d match {
      case 0 => Seq(0); case 1 => Seq(0, 1); case _ => Seq(1)
    }
    (for (fa <- alleles(df); ma <- alleles(dm)) yield fa + ma).toSet
  }

  test("dosage-range rule equals brute-force transmission enumeration") {
    for (df <- 0 to 2; dm <- 0 to 2; dc <- 0 to 2)
      assert(inRange(df, dm, dc) == possible(df, dm).contains(dc),
        s"df=$df dm=$dm dc=$dc")
  }
}
