package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared word-split + 60-bit md5-prefix hashing for the native text
  * expressions — the exact semantics of `GraftFunctions.words` /
  * `GraftFunctions.hash60` (single-space split, empties dropped; first 15
  * md5 hex chars as a 60-bit integer), so values stay bit-identical to the
  * composed forms and the DuckDB oracles.
  */
private[functions] object NativeText {
  /** Per-thread digest instance: getInstance per ROW is a JCA provider
    * lookup + allocation inside the hot path these expressions exist to
    * optimize; reset() makes reuse safe.
    */
  val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def splitWords(text: UTF8String): java.util.ArrayList[String] = {
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
    words
  }

  /** Top 60 bits of md5(s), as hash60 computes them. */
  def h60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val digest = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
    (h << 4) | ((digest(7) & 0xf0L) >> 4)
  }
}

/** Native 60-bit SimHash of a text column: per-word md5-prefix hashes, bit j
  * of the result set when more than half the words have bit j set. One tight
  * JVM pass inside whole-stage codegen — the composed form is 60 interpreted
  * `filter` lambdas per row (CodegenFallback), ~60 array walks.
  * NativeExprSpec pins bit-equality to the composed form.
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  val Bits = 60

  def compute(text: UTF8String): Long = {
    val words = NativeText.splitWords(text)
    val w = words.size
    if (w == 0) return 0L
    val md = NativeText.md5.get()
    val setCounts = new Array[Int](Bits)
    var i = 0
    while (i < w) {
      val h = NativeText.h60(md, words.get(i))
      var j = 0
      while (j < Bits) {
        if (((h >> j) & 1L) == 1L) setCounts(j) += 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < Bits) {
      if (2 * setCounts(j) > w) sim |= 1L << j
      j += 1
    }
    sim
  }

  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_simhash",
      new ExpressionInfo(classOf[SimhashExpr].getName, "graft_simhash"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_simhash(text) takes one argument")
        SimhashExpr(exprs.head)
      })
}

/** Native word-5-gram fingerprint sampler: hash60 of every 5-word gram,
  * keeping hashes where h % 17 == 0 (the winnowing-style document sketch of
  * q_text_fingerprint). Returns an empty array for docs under 5 words.
  * The md5-per-gram pass is the dominant cost — one static call replaces an
  * interpreted transform+filter chain.
  */
case class FingerprintsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintsExpr =
    copy(child = newChild)
}

object FingerprintsExpr {
  val Gram = 5
  val Mod = 17

  /** Shared gram-sample kernel: hash60 of every `gram`-word window, keeping
    * hashes divisible by `mod` (content-stable winnowing sample).
    */
  private[functions] def gramSample(text: UTF8String, gram: Int, mod: Int): ArrayData = {
    val words = NativeText.splitWords(text)
    val w = words.size
    val out = new java.util.ArrayList[java.lang.Long](8)
    if (w >= gram) {
      val md = NativeText.md5.get()
      val sb = new java.lang.StringBuilder(128)
      var t = 0
      while (t + gram - 1 < w) {
        sb.setLength(0)
        var g = 0
        while (g < gram) {
          if (g > 0) sb.append(' ')
          sb.append(words.get(t + g))
          g += 1
        }
        val h = NativeText.h60(md, sb.toString)
        if (h % mod == 0) out.add(h)
        t += 1
      }
    }
    val arr = new Array[Long](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  def compute(text: UTF8String): ArrayData = gramSample(text, Gram, Mod)

  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_fingerprints",
      new ExpressionInfo(classOf[FingerprintsExpr].getName, "graft_fingerprints"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_fingerprints(text) takes one argument")
        FingerprintsExpr(exprs.head)
      })
}

/** Native word-8-gram fingerprint sampler for substring-level dedup
  * (q_dedup_substr): hash60 of every 8-word window, keeping h % 7 == 0.
  * Same kernel as [[FingerprintsExpr]] with the substring-dedup constants —
  * the composed HOF form (one interpreted md5 per gram) measured 30 s at
  * sf0.1 where this runs the whole pass inside whole-stage codegen.
  */
case class SubstrFpsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_substr_fps"

  override protected def nullSafeEval(input: Any): Any =
    SubstrFpsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubstrFpsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SubstrFpsExpr =
    copy(child = newChild)
}

object SubstrFpsExpr {
  val Gram = 8
  val Mod = 7

  def compute(text: UTF8String): ArrayData =
    FingerprintsExpr.gramSample(text, Gram, Mod)

  // single validation path shared by register() and GraftExtensions
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_substr_fps(text) takes one argument")
    SubstrFpsExpr(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_substr_fps",
      new ExpressionInfo(classOf[SubstrFpsExpr].getName, "graft_substr_fps"),
      builder)
}

/** Native stopword occurrence counter: one word-split pass producing
  * `[en, de, fr, es, union]` hit counts — the composed form is five
  * interpreted `filter` lambdas per row (CodegenFallback), five array
  * walks. The union slot counts words in ANY list once per occurrence
  * (not the sum of the four — shared words like "la"/"un" would double
  * count). The lists here are the canonical ones; `Pipeline` reads them
  * from this object so query and oracle can never diverge from the
  * expression.
  */
case class StopHitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_stop_hits"

  override protected def nullSafeEval(input: Any): Any =
    StopHitsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StopHitsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StopHitsExpr =
    copy(child = newChild)
}

object StopHitsExpr {
  val En: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  val De: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit")
  val Fr: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "dans")
  val Es: Seq[String] = Seq("el", "la", "los", "y", "es", "un", "una", "en")

  private val sets: Array[java.util.HashSet[String]] =
    Array(En, De, Fr, Es).map { l =>
      val s = new java.util.HashSet[String](l.size * 2)
      l.foreach(s.add)
      s
    }
  private val union: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](64)
    (En ++ De ++ Fr ++ Es).foreach(s.add)
    s
  }

  def compute(text: UTF8String): ArrayData = {
    val words = NativeText.splitWords(text)
    val counts = new Array[Long](5)
    var i = 0
    val n = words.size
    while (i < n) {
      val w = words.get(i)
      var k = 0
      while (k < 4) {
        if (sets(k).contains(w)) counts(k) += 1
        k += 1
      }
      if (union.contains(w)) counts(4) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_stop_hits",
      new ExpressionInfo(classOf[StopHitsExpr].getName, "graft_stop_hits"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_stop_hits(text) takes one argument")
        StopHitsExpr(exprs.head)
      })
}

/** Native SAM MD-tag mismatch-cycle extractor (q_bam_bqsr_covariates):
  * walks the MD grammar in one char pass — digit runs advance the read
  * cursor, `^`-prefixed deletion runs consume NO read positions, bare
  * letters emit the current cycle — returning the 0-based read offsets of
  * reference mismatches. The composed form (regexp_extract_all + a
  * higher-order aggregate with named_structs) measured ~10 µs/read; this
  * is one tight JVM loop inside whole-stage codegen. BqsrSpec pins
  * equality to the composed form including deletion runs.
  */
case class MdCyclesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_md_cycles"

  override protected def nullSafeEval(input: Any): Any =
    MdCyclesExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MdCyclesExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MdCyclesExpr =
    copy(child = newChild)
}

object MdCyclesExpr {
  def compute(md: UTF8String): ArrayData = {
    val s = md.toString
    val n = s.length
    val out = new java.util.ArrayList[Integer](12)
    var pos = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var run = 0
        while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
          run = run * 10 + (s.charAt(i) - '0'); i += 1
        }
        pos += run
      } else if (c == '^') {
        i += 1
        while (i < n && s.charAt(i) >= 'A' && s.charAt(i) <= 'Z') i += 1
      } else {
        out.add(pos); pos += 1; i += 1
      }
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  def register(spark: SparkSession): Unit =
    Natives.registerOnce(spark, "graft_md_cycles",
      new ExpressionInfo(classOf[MdCyclesExpr].getName, "graft_md_cycles"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_md_cycles(md) takes one argument")
        MdCyclesExpr(exprs.head)
      })
}
