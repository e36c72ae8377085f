package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native genotype census: one codegen'd pass over a VCF `genotypes`
  * array-of-structs counting diploid GT classes, returning
  * `[homRef, het, homAlt]` (counts of `0/0`, `0/1`, `1/1`; anything else —
  * missing `./.`, phased variants the synthetic cohorts never emit — is
  * ignored, exactly like the `size(filter(gt === lit))` triple it
  * replaces).
  *
  * Why native: Catalyst evaluates lambda higher-order functions
  * (`filter`/`transform`) on the interpreted path — measured 5–7× slower
  * per row than codegen in this repo (see the minimizer note in
  * FormatQueries). The popgen family (`q_vcf_hwe` and friends) ran THREE
  * interpreted array scans per site; at a real cohort's 1000+ samples that
  * multiplies by genotype-array length. This expression is a single array
  * walk with static-method dispatch, inside whole-stage codegen.
  *
  * The `gt` ordinal is resolved by NAME from the child's struct schema at
  * bind time, so nested-schema pruning (which may drop `sample`/`fields`)
  * can never shift which field is read — the exact bug class the round-8
  * VCF pruning fix closed.
  */
case class GtCensusExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gt_census"

  private lazy val (numFields, gtOrdinal): (Int, Int) = child.dataType match {
    case ArrayType(st: StructType, _) => (st.length, st.fieldIndex("gt"))
    case other =>
      throw new IllegalArgumentException(
        s"graft_gt_census expects array<struct<..., gt: string, ...>>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _)
          if st.fieldNames.contains("gt") &&
            st(st.fieldIndex("gt")).dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_gt_census expects array<struct<..., gt: string, ...>>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    GtCensusExpr.compute(input.asInstanceOf[ArrayData], numFields, gtOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GtCensusExpr.compute($c, $numFields, $gtOrdinal)")

  override protected def withNewChildInternal(newChild: Expression): GtCensusExpr =
    copy(child = newChild)
}

object GtCensusExpr {
  private val HomRef = UTF8String.fromString("0/0")
  private val Het = UTF8String.fromString("0/1")
  private val HomAlt = UTF8String.fromString("1/1")

  def compute(genotypes: ArrayData, numFields: Int, gtOrd: Int): ArrayData = {
    val n = genotypes.numElements()
    var a = 0L // 0/0
    var b = 0L // 0/1
    var c = 0L // 1/1
    var i = 0
    while (i < n) {
      if (!genotypes.isNullAt(i)) {
        val row = genotypes.getStruct(i, numFields)
        if (!row.isNullAt(gtOrd)) {
          val gt = row.getUTF8String(gtOrd)
          if (gt.equals(HomRef)) a += 1L
          else if (gt.equals(Het)) b += 1L
          else if (gt.equals(HomAlt)) c += 1L
        }
      }
      i += 1
    }
    new GenericArrayData(Array(a, b, c))
  }

  // single validation path shared by register() and GraftExtensions
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_gt_census(genotypes) takes one argument")
    GtCensusExpr(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_gt_census",
      new ExpressionInfo(classOf[GtCensusExpr].getName, "graft_gt_census"),
      builder)
}
