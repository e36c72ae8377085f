package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the full minhash signature of a text
  * column in one tight JVM pass: split → 3-word shingles → md5-prefix hash →
  * K running minima. Returns NULL for documents with fewer than 3 words
  * (no shingles — the same rows `signedDocs` drops).
  *
  * Why an Expression and not composed built-ins: the composed form
  * (`transform`/`aggregate`/`zip_with`) is CodegenFallback — every lambda
  * element is interpreted with boxing, and projection collapse can inline
  * the whole chain into downstream lambdas. This expression generates a
  * single static call inside whole-stage codegen; the loops inside are
  * primitive JVM code. Values are bit-identical to the composed form (and
  * the DuckDB oracle): md5 is md5, the universal-hash family is integer
  * arithmetic.
  */
case class MinhashSigExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSigExpr.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {
  val K = 16
  val P = 2147483647L // 2^31 - 1, the portable minhash modulus

  private val hexDigits = "0123456789abcdef".toCharArray

  /** One document → signature array, or null when < 3 words. Called from
    * generated code — keep it static-shaped and allocation-light.
    */
  def compute(text: UTF8String): ArrayData = {
    // words: split on single spaces, empties dropped (matches
    // filter(split(text, " "), w -> length(w) > 0))
    val s = text.toString
    val words = new java.util.ArrayList[String](64)
    var i = 0
    val n = s.length
    while (i < n) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) words.add(s.substring(i, j))
      i = j + 1
    }
    val w = words.size
    if (w < 3) return null
    val sig = new Array[Long](K)
    java.util.Arrays.fill(sig, P)
    val md = NativeText.md5.get() // per-thread: no per-row JCA lookup
    val sb = new java.lang.StringBuilder(96)
    var t = 0
    while (t + 2 < w) {
      sb.setLength(0)
      sb.append(words.get(t)).append(' ').append(words.get(t + 1)).append(' ').append(words.get(t + 2))
      md.reset()
      val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits: bytes 0..6 fully + high nibble of byte 7
      var h60 = 0L
      var b = 0
      while (b < 7) { h60 = (h60 << 8) | (digest(b) & 0xffL); b += 1 }
      h60 = (h60 << 4) | ((digest(7) & 0xf0L) >> 4)
      val h = h60 % P
      var k = 0
      while (k < K) {
        val hk = ((2L * k + 1L) * h + k * 1000003L) % P
        if (hk < sig(k)) sig(k) = hk
        k += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  private val info = new ExpressionInfo(classOf[MinhashSigExpr].getName, "graft_minhash_sig")
  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_minhash_sig(text) takes one argument")
    MinhashSigExpr(exprs.head)
  }

  /** Idempotent direct registration on an existing session. */
  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_minhash_sig", info, builder)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` wires the native
  * functions into every session at build time (the standard
  * SparkSessionExtensions injection point).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // option-free map-key projection for the graft sources (VCF FORMAT/INFO,
    // reads-format attributes; runs in the operator-optimization fixpoint,
    // before V2 pushdown builds the scan)
    ext.injectOptimizerRule(_ => graft.plans.AutoProjection)
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSigExpr].getName, "graft_minhash_sig"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_minhash_sig(text) takes one argument")
        MinhashSigExpr(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kmer_minimizers"),
      new ExpressionInfo(classOf[KmerMinimizersExpr].getName, "graft_kmer_minimizers"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_kmer_minimizers(seq) takes one argument")
        KmerMinimizersExpr(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashExpr].getName, "graft_simhash"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_simhash(text) takes one argument")
        SimhashExpr(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprints"),
      new ExpressionInfo(classOf[FingerprintsExpr].getName, "graft_fingerprints"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_fingerprints(text) takes one argument")
        FingerprintsExpr(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_stop_hits"),
      new ExpressionInfo(classOf[StopHitsExpr].getName, "graft_stop_hits"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_stop_hits(text) takes one argument")
        StopHitsExpr(exprs.head)
      }))
    // same validated builders as NativeLsh.register — ONE validation path
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "graft_lsh_bucket"),
      NativeLsh.bucketBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_dots"),
      new ExpressionInfo(classOf[LshDotsExpr].getName, "graft_lsh_dots"),
      NativeLsh.dotsBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_ivf_argmax"),
      new ExpressionInfo(classOf[IvfArgmaxExpr].getName, "graft_ivf_argmax"),
      NativeIvf.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_hist_quantile"),
      new ExpressionInfo(classOf[HistQuantileAgg].getName, "graft_hist_quantile"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          "graft_hist_quantile(value, weight, permille) takes three arguments")
        HistQuantileAgg(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hist_quantiles"),
      new ExpressionInfo(classOf[HistQuantilesAgg].getName, "graft_hist_quantiles"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          "graft_hist_quantiles(value, weight, permilles) takes three arguments")
        HistQuantilesAgg(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_substr_fps"),
      new ExpressionInfo(classOf[SubstrFpsExpr].getName, "graft_substr_fps"),
      SubstrFpsExpr.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_gt_census"),
      new ExpressionInfo(classOf[GtCensusExpr].getName, "graft_gt_census"),
      GtCensusExpr.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_residual"),
      new ExpressionInfo(classOf[VecResidualExpr].getName, "graft_vec_residual"),
      NativePq.residualBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "graft_pq_encode"),
      NativePq.encodeBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcExpr].getName, "graft_pq_adc"),
      NativePq.adcBuilder))
    // fuse same-(value,weight) quantiles into one shared histogram buffer
    ext.injectOptimizerRule(_ => FuseHistQuantiles)
  }
}
