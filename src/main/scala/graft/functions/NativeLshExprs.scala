package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sign-bit LSH over a quantized 64-dim embedding column.
  *
  * The composed higher-order-function form recomputes every hyperplane
  * weight — hash60("p|i") % 2001 − 1000, 64 md5s per plane — PER ROW,
  * interpreted (CodegenFallback): the dominant cost of the bucketed ANN
  * and embedding-dedup queries. The weights are constants of (plane, i)
  * alone, so here they are computed once per JVM and each row pays only
  * planes × 64 integer multiply-adds inside whole-stage codegen. Values
  * are bit-identical to the composed form (NativeExprSpec pins equality)
  * and to the DuckDB oracles.
  */
object NativeLsh {
  /** weights(p)(i) for i in 0..63 — one md5 pass per (planes) requested;
    * the EXPRESSIONS hold the resolved array (interpreted: lazy val;
    * codegen: ctx.addReferenceObj), so the hot loop never touches this map.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Long]]]()

  def weights(planes: Int): Array[Array[Long]] =
    cache.computeIfAbsent(planes, { n =>
      val md = NativeText.md5.get()
      Array.tabulate(n, 64) { (p, i) =>
        NativeText.h60(md, s"$p|${i + 1}") % 2001 - 1000
      }
    })

  /** The embedding contract is LOUD: exactly 64 non-null components. The
    * composed HOF form silently null-poisons a malformed row into bucket 0
    * — a silent divergence this native form must not reproduce quietly, so
    * malformed input fails with the dimension in the message instead.
    */
  private def check(q: ArrayData): Unit = {
    if (q.numElements() != 64)
      throw new IllegalArgumentException(
        s"graft_lsh_* requires a 64-element quantized embedding, got ${q.numElements()}")
  }

  def computeBucket(q: ArrayData, w: Array[Array[Long]]): Long = {
    check(q)
    var bucket = 0L
    var p = 0
    while (p < w.length) {
      val wp = w(p)
      var dot = 0L
      var i = 0
      while (i < 64) {
        if (q.isNullAt(i))
          throw new IllegalArgumentException(s"graft_lsh_*: null embedding component at $i")
        dot += q.getLong(i) * wp(i)
        i += 1
      }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  def computeDots(q: ArrayData, w: Array[Array[Long]]): ArrayData = {
    check(q)
    val dots = new Array[Long](w.length)
    var p = 0
    while (p < w.length) {
      val wp = w(p)
      var dot = 0L
      var i = 0
      while (i < 64) {
        if (q.isNullAt(i))
          throw new IllegalArgumentException(s"graft_lsh_*: null embedding component at $i")
        dot += q.getLong(i) * wp(i)
        i += 1
      }
      dots(p) = dot
      p += 1
    }
    new GenericArrayData(dots)
  }

  /** The ONE validated builder both registration paths (direct register and
    * GraftExtensions injection) share: planes must be a literal in [1, 60]
    * (2^60 is the bucket bit-width; a larger count would wrap 1L << p).
    */
  def planesOf(exprs: Seq[Expression], fn: String): Int = {
    require(exprs.length == 2, s"$fn(q, planes) takes two arguments")
    require(exprs(1).foldable, s"$fn planes argument must be a literal")
    val n = exprs(1).eval().asInstanceOf[Number].intValue()
    require(n >= 1 && n <= 60, s"$fn planes must be in [1, 60], got $n")
    n
  }

  def bucketBuilder: Seq[Expression] => Expression =
    exprs => LshBucketExpr(exprs.head, planesOf(exprs, "graft_lsh_bucket"))
  def dotsBuilder: Seq[Expression] => Expression =
    exprs => LshDotsExpr(exprs.head, planesOf(exprs, "graft_lsh_dots"))

  def register(spark: SparkSession): Unit = {
    Natives.registerOnce(spark, "graft_lsh_bucket",
      new ExpressionInfo(classOf[LshBucketExpr].getName, "graft_lsh_bucket"),
      bucketBuilder)
    Natives.registerOnce(spark, "graft_lsh_dots",
      new ExpressionInfo(classOf[LshDotsExpr].getName, "graft_lsh_dots"),
      dotsBuilder)
  }
}

case class LshBucketExpr(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  @transient private lazy val w = NativeLsh.weights(planes)

  override protected def nullSafeEval(input: Any): Any =
    NativeLsh.computeBucket(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", NativeLsh.weights(planes), "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeLsh.computeBucket($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

case class LshDotsExpr(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_dots"

  @transient private lazy val w = NativeLsh.weights(planes)

  override protected def nullSafeEval(input: Any): Any =
    NativeLsh.computeDots(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", NativeLsh.weights(planes), "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeLsh.computeDots($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshDotsExpr =
    copy(child = newChild)
}
