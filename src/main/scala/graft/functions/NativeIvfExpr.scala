package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native IVF coarse-quantizer assignment: argmax-dot of a quantized
  * embedding against a (tiny, broadcast) codebook of centroids, with ties
  * going to the smaller centroid id — the per-row kernel of the q_ann_ivf
  * assignment.
  *
  * The composed form (`array_max(transform(cents, c -> struct(qdot, -cid)))`)
  * is interpreted and allocates one zipped 64-element array per centroid
  * PER ROW — measurably slower at sf0.1 than the broadcast-join shape it
  * replaced, even though the plan is narrower. This expression keeps the
  * narrow no-shuffle plan AND the codegen'd inner loop: per row, centroids ×
  * 64 long multiply-adds, zero allocation. The same lesson as the LSH
  * bucket expressions ([[NativeLsh]]): never leave an interpreted HOF tree
  * on the per-row hot path.
  */
object NativeIvf {

  /** `cents` is an array of struct(cid: long, cq: array<long>) rows — the
    * collect_list'd codebook. Returns the cid with the maximal dot(q, cq);
    * tie → smaller cid. The dimension contract is LOUD like the LSH
    * expressions: q and every centroid must have matching non-null lengths.
    */
  def argmax(q: ArrayData, cents: ArrayData): Long = {
    val dim = q.numElements()
    val n = cents.numElements()
    if (n == 0) throw new IllegalArgumentException("graft_ivf_argmax: empty codebook")
    var best = Long.MinValue
    var bestCid = Long.MaxValue
    var c = 0
    while (c < n) {
      val cent = cents.getStruct(c, 2)
      val cid = cent.getLong(0)
      val cq = cent.getArray(1)
      if (cq.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_ivf_argmax: centroid $cid has ${cq.numElements()} components, query has $dim")
      var dot = 0L
      var i = 0
      while (i < dim) {
        dot += q.getLong(i) * cq.getLong(i)
        i += 1
      }
      if (dot > best || (dot == best && cid < bestCid)) { best = dot; bestCid = cid }
      c += 1
    }
    bestCid
  }

  def builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_ivf_argmax(q, cents) takes two arguments")
    IvfArgmaxExpr(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_ivf_argmax",
      new ExpressionInfo(classOf[IvfArgmaxExpr].getName, "graft_ivf_argmax"),
      builder)
}

case class IvfArgmaxExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ivf_argmax"

  override protected def nullSafeEval(q: Any, cents: Any): Any =
    NativeIvf.argmax(q.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c) => s"graft.functions.NativeIvf.argmax($q, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IvfArgmaxExpr =
    copy(left = newLeft, right = newRight)
}
