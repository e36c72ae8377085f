package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native product-quantization kernels for q_ann_pq: encode (per-subspace
  * argmin against a broadcast codebook) and ADC scoring (asymmetric
  * distance: exact query sub-vector vs the centroid of each stored code).
  *
  * Same lesson as [[NativeIvf]] / [[NativeLsh]]: the composed HOF forms
  * fold interpreted lambdas per row (one struct allocation per centroid per
  * subspace for encode) — these run the loops as codegen'd static calls,
  * zero allocation per row beyond the 8-long code array. The composed forms
  * survive as the equality-pinned specs in NativeExprSpec.
  */
object NativePq {

  /** Subspace count / dims per subspace / codes per subspace — the
    * Pipeline query and its DuckDB oracle read these (one definition).
    */
  val Sub = 8
  val Dim = 8
  val Codes = 16

  private def subsq(a: ArrayData, aOff: Int, b: ArrayData, bOff: Int, n: Int): Long = {
    var d = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(aOff + i) - b.getLong(bOff + i)
      d += x * x
      i += 1
    }
    d
  }

  /** Per-subspace argmin code ids (tie → smaller cid) of `q` against the
    * struct(cid, cq) codebook array. q must be Sub*Dim long; every centroid
    * must match q's length (LOUD contract, like the LSH expressions).
    */
  def encode(q: ArrayData, cents: ArrayData): ArrayData = {
    val dim = q.numElements()
    require(dim == Sub * Dim, s"graft_pq_encode: query has $dim dims, want ${Sub * Dim}")
    val n = cents.numElements()
    if (n == 0) throw new IllegalArgumentException("graft_pq_encode: empty codebook")
    val out = new Array[Long](Sub)
    var m = 0
    while (m < Sub) {
      var best = Long.MaxValue
      var bestCid = Long.MaxValue
      var c = 0
      while (c < n) {
        val cent = cents.getStruct(c, 2)
        val cid = cent.getLong(0)
        val cq = cent.getArray(1)
        if (cq.numElements() != dim)
          throw new IllegalArgumentException(
            s"graft_pq_encode: centroid $cid has ${cq.numElements()} components, query has $dim")
        val d = subsq(q, m * Dim, cq, m * Dim, Dim)
        if (d < best || (d == best && cid < bestCid)) { best = d; bestCid = cid }
        c += 1
      }
      out(m) = bestCid
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance: sum over subspaces of ||qq_sub − cent(code_m)_sub||².
    * `codes` indexes into the cid-ascending codebook (cid == position).
    */
  def adc(qq: ArrayData, codes: ArrayData, cents: ArrayData): Long = {
    val dim = qq.numElements()
    require(dim == Sub * Dim, s"graft_pq_adc: query has $dim dims, want ${Sub * Dim}")
    require(codes.numElements() == Sub,
      s"graft_pq_adc: ${codes.numElements()} codes, want $Sub")
    var total = 0L
    val n = cents.numElements()
    var m = 0
    while (m < Sub) {
      val code = codes.getLong(m).toInt
      if (code < 0 || code >= n)
        throw new IllegalArgumentException(
          s"graft_pq_adc: code $code outside codebook of $n centroids")
      val cent = cents.getStruct(code, 2)
      if (cent.getLong(0) != code)
        throw new IllegalArgumentException(
          s"graft_pq_adc: codebook not cid-ascending (position $code holds cid ${cent.getLong(0)})")
      val cq = cent.getArray(1)
      if (cq.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_pq_adc: centroid $code has ${cq.numElements()} components, query has $dim")
      total += subsq(qq, m * Dim, cq, m * Dim, Dim)
      m += 1
    }
    total
  }

  /** Elementwise residual `q − cents[cid].cq` (IVF-PQ: the vector minus its
    * coarse centroid; PQ then encodes the residual, not the raw vector).
    * `cents` must be cid-ascending with cid == position, the same contract
    * [[adc]] already imposes.
    */
  def residual(q: ArrayData, cents: ArrayData, cid: Long): ArrayData = {
    val dim = q.numElements()
    if (cid < 0 || cid >= cents.numElements())
      throw new IllegalArgumentException(
        s"graft_vec_residual: cid $cid outside codebook of ${cents.numElements()} centroids")
    val cent = cents.getStruct(cid.toInt, 2)
    val cq = cent.getArray(1)
    if (cq.numElements() != dim)
      throw new IllegalArgumentException(
        s"graft_vec_residual: centroid $cid has ${cq.numElements()} components, vector has $dim")
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      out(i) = q.getLong(i) - cq.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  // single validation path shared by register() and GraftExtensions
  val residualBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, "graft_vec_residual(q, cents, cid) takes three arguments")
    VecResidualExpr(exprs.head, exprs(1), exprs(2))
  }
  val encodeBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_pq_encode(q, cents) takes two arguments")
    PqEncodeExpr(exprs.head, exprs(1))
  }
  val adcBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, "graft_pq_adc(qq, codes, cents) takes three arguments")
    PqAdcExpr(exprs.head, exprs(1), exprs(2))
  }

  def register(spark: SparkSession): Unit = {
    Natives.registerOnce(spark, "graft_vec_residual",
      new ExpressionInfo(classOf[VecResidualExpr].getName, "graft_vec_residual"),
      residualBuilder)
    Natives.registerOnce(spark, "graft_pq_encode",
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "graft_pq_encode"),
      encodeBuilder)
    Natives.registerOnce(spark, "graft_pq_adc",
      new ExpressionInfo(classOf[PqAdcExpr].getName, "graft_pq_adc"),
      adcBuilder)
  }
}

case class PqEncodeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(q: Any, cents: Any): Any =
    NativePq.encode(q.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c) => s"graft.functions.NativePq.encode($q, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

case class VecResidualExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vec_residual"

  override protected def nullSafeEval(q: Any, cents: Any, cid: Any): Any =
    NativePq.residual(q.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      cid.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c, i) => s"graft.functions.NativePq.residual($q, $c, $i)")

  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression,
      newThird: Expression): VecResidualExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class PqAdcExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(qq: Any, codes: Any, cents: Any): Any =
    NativePq.adc(qq.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, co, ce) => s"graft.functions.NativePq.adc($q, $co, $ce)")

  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
