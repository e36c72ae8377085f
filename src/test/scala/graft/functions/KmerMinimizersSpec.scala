package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** The native winnowed-minimizer expression must match the composed SQL
  * form it replaced in q_kmer_minimizers — explode(sequence(1,21)) + two
  * least(substring…) chains + the run-dedup filter — row-multiset-exactly,
  * on the production 32-length alphabet slices AND on adversarial shapes
  * (short sequences where the 8-mer windows clip, empty strings, ties).
  */
class KmerMinimizersSpec extends AnyFunSuite with SparkFixture {

  /** The previous production formulation, kept verbatim as the executable
    * spec of the semantics (it was DuckDB-oracle-gated for 14 rounds).
    */
  private def composed(df: org.apache.spark.sql.DataFrame) = {
    import df.sparkSession.implicits._
    df.select($"seq", explode(sequence(lit(1), lit(21))).as("p"))
      .withColumn("m", expr("least(substring(seq, p, 8), substring(seq, p + 1, 8), " +
        "substring(seq, p + 2, 8), substring(seq, p + 3, 8), substring(seq, p + 4, 8))"))
      .withColumn("mp", expr("CASE WHEN p = 1 THEN NULL ELSE " +
        "least(substring(seq, p - 1, 8), substring(seq, p, 8), substring(seq, p + 1, 8), " +
        "substring(seq, p + 2, 8), substring(seq, p + 3, 8)) END"))
      .filter($"mp".isNull || $"m" =!= $"mp")
      .select($"seq", $"m".as("minimizer"))
  }

  private def native(df: org.apache.spark.sql.DataFrame) = {
    import df.sparkSession.implicits._
    KmerMinimizersExpr.register(df.sparkSession)
    df.select($"seq", explode(expr("graft_kmer_minimizers(seq)")).as("minimizer"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

  test("native equals the composed least/explode form on production-shaped reads") {
    import spark.implicits._
    val alpha = "ACGTACGGTTACGATCAGGATCCATTGCAAGTCCGGAATTACGGATCATTACGGCCAATTGACG"
    val seqs = (0 until 200).map(i => alpha.substring(i % 33, i % 33 + 32)).toDF("seq")
    assert(rows(native(seqs)) == rows(composed(seqs)))
  }

  test("native equals the composed form on clipped / tied / degenerate shapes") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val cases = Seq("", "A", "ACGTACG", "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
      "ACGT", "ACGTACGTACGTACGTACGTACGTACGT") ++
      (0 until 150).map { _ =>
        val n = rng.nextInt(40)
        (0 until n).map(_ => "ACGT".charAt(rng.nextInt(4))).mkString
      }
    val df = cases.toDF("seq")
    assert(rows(native(df)) == rows(composed(df)))
  }

  test("interpreted eval path matches codegen") {
    import spark.implicits._
    val df = Seq("ACGTACGGTTACGATCAGGATCCATTGCAAGT").toDF("seq")
    KmerMinimizersExpr.register(spark)
    // force interpreted evaluation via an eval() call on the expression
    val expr0 = KmerMinimizersExpr(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("ACGTACGGTTACGATCAGGATCCATTGCAAGT")))
    val interp = expr0.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    val codegen = df.select(expr("graft_kmer_minimizers(seq)")).collect()(0)
      .getSeq[String](0)
    assert(interp == codegen)
  }

  test("non-string argument is a clean analysis error, not a runtime failure") {
    val e = intercept[Exception] {
      spark.range(1).selectExpr("graft_kmer_minimizers(id)").collect()
    }
    assert(e.getMessage.contains("STRING"), s"unexpected: ${e.getMessage}")
  }
}
