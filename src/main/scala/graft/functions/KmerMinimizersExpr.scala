package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the winnowed minimizer list of a
  * read sequence in one pass: for window p = 1..21 the minimizer is the
  * lexicographic minimum of the five 8-mers starting at p..p+4 (1-based,
  * Spark `substring` clipping semantics), and a window EMITS its minimizer
  * only when it differs from the previous window's (run-dedup — minimap2's
  * winnowing rule).
  *
  * Value-equivalent by construction to the composed SQL form
  * (`explode(sequence(1,21))` + two `least(substring…)` chains + run filter
  * — kept as the executable spec in KmerMinimizersSpec): same 1-based
  * clipped substrings, same binary string order (unsigned bytes, then
  * length — UTF8String's UTF8_BINARY comparison), same first-window-always
  * emission. Why an Expression: the composed form evaluates TEN substring
  * allocations and two 5-way `least` chains per exploded window row — 21
  * rows per read — where one pass over the sequence bytes suffices; this
  * collapses the 21-row explode-then-filter pipeline into a per-read array
  * build inside whole-stage codegen, and only the EMITTED minimizers
  * materialize as strings.
  */
case class KmerMinimizersExpr(child: Expression) extends UnaryExpression {
  // analysis-time input validation: a non-string argument is rejected at
  // analysis instead of failing later as a janino compile error /
  // ClassCastException inside the query
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmer_minimizers requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_kmer_minimizers"

  override protected def nullSafeEval(input: Any): Any =
    KmerMinimizersExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.KmerMinimizersExpr.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): KmerMinimizersExpr =
    copy(child = newChild)
}

object KmerMinimizersExpr {
  private val Windows = 21 // 25 k-mers (k=8, L=32) -> 21 windows of 5
  private val K = 8
  private val Span = 5

  /** One sequence -> its winnowed minimizer array. Called from generated
    * code — static-shaped, allocation-light: candidate comparison runs on
    * (offset, len) pairs over the sequence bytes; only emitted minimizers
    * become strings.
    */
  def compute(seq: UTF8String): ArrayData = {
    val b = seq.getBytes
    val n = b.length
    // substring(seq, pos, K) for 1-based pos = bytes [pos-1, min(pos-1+K, n));
    // start past the end is the empty string — Spark substring clipping
    def len(start: Int): Int = if (start >= n) 0 else math.min(K, n - start)
    // UTF8_BINARY order: unsigned byte compare, then length
    def cmp(aS: Int, aL: Int, bS: Int, bL: Int): Int = {
      val m = math.min(aL, bL)
      var i = 0
      while (i < m) {
        val d = (b(aS + i) & 0xff) - (b(bS + i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      aL - bL
    }
    val out = new java.util.ArrayList[AnyRef](Windows)
    var prevS = -1
    var prevL = -1
    var p = 0 // 0-based window start (SQL's p - 1)
    while (p < Windows) {
      var bs = p
      var bl = len(p)
      var k = p + 1
      while (k < p + Span) {
        val kl = len(k)
        if (cmp(k, kl, bs, bl) < 0) { bs = k; bl = kl }
        k += 1
      }
      val changed = prevL != bl || cmp(bs, bl, prevS, prevL) != 0
      if (p == 0 || changed) out.add(UTF8String.fromBytes(b, bs, bl))
      prevS = bs; prevL = bl
      p += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  private val info = new ExpressionInfo(classOf[KmerMinimizersExpr].getName, "graft_kmer_minimizers")
  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_kmer_minimizers(seq) takes one argument")
    KmerMinimizersExpr(exprs.head)
  }

  /** Idempotent direct registration on an existing session. */
  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_kmer_minimizers", info, builder)
}
