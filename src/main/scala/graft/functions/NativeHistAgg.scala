package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, CreateArray, Expression, ExpressionInfo, GetArrayItem, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared histogram-buffer machinery of the exact-quantile aggregates: a
  * value→weight map, so partial aggregation (map-side combine) reduces
  * every partition to at most |domain| entries and the shuffle (or
  * streaming state store) carries bounded histograms, not rows — at
  * 100 TB this computes exact quantiles with ONE small shuffle where a
  * sort-based percentile would shuffle the corpus. That bargain only
  * holds for bounded domains (quantized quantities, discount steps,
  * scores); the aggregate enforces it loudly, throwing past
  * [[HistQuantileAgg.MaxBins]] distinct values rather than degrading into
  * an executor OOM.
  */
trait HistAggBase
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with TernaryLike[Expression] {

  def value: Expression
  def weight: Expression

  override def first: Expression = value
  override def second: Expression = weight

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, java.lang.Long] =
    new java.util.HashMap[java.lang.Long, java.lang.Long]()

  protected def add(
      buf: java.util.HashMap[java.lang.Long, java.lang.Long], v: Long, w: Long): Unit = {
    val prev = buf.get(java.lang.Long.valueOf(v))
    if ((prev eq null) && buf.size() >= HistQuantileAgg.MaxBins)
      throw new IllegalStateException(
        s"${prettyName}: domain exceeded ${HistQuantileAgg.MaxBins} distinct values — " +
          "this aggregate is for bounded (quantized) domains; widen the quantization instead")
    buf.put(v, if (prev eq null) w else prev.longValue() + w)
  }

  override def update(
      buf: java.util.HashMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val v = value.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wl = w.asInstanceOf[Number].longValue()
      if (wl > 0) add(buf, v.asInstanceOf[Number].longValue(), wl)
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[java.lang.Long, java.lang.Long],
      b2: java.util.HashMap[java.lang.Long, java.lang.Long]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(b1, e.getKey, e.getValue) }
    b1
  }

  /** Sorted (values, cumulative weights, total) of the buffer. */
  protected def cumulate(
      buf: java.util.HashMap[java.lang.Long, java.lang.Long]): (Array[Long], Array[Long], Long) = {
    val keys = new Array[Long](buf.size())
    val kit = buf.keySet().iterator()
    var i = 0
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys)
    val cum = new Array[Long](keys.length)
    var running = 0L
    var j = 0
    while (j < keys.length) { running += buf.get(keys(j)); cum(j) = running; j += 1 }
    (keys, cum, running)
  }

  /** Smallest value whose cumulative weight reaches p/1000 of the total
    * (p=500 → the lower weighted median: 2·cw ≥ W).
    */
  protected def quantileOf(keys: Array[Long], cum: Array[Long], total: Long, p: Long): Long = {
    var j = 0
    while (j < keys.length) {
      if (cum(j) * 1000L >= p * total) return keys(j)
      j += 1
    }
    keys(keys.length - 1)
  }

  override def serialize(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size() * 16)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[java.lang.Long, java.lang.Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  protected def permilleOf(e: Expression, what: String): Long = {
    val v = e.eval(null)
    require(v != null, s"$what: permille must be a literal")
    val pl = v.asInstanceOf[Number].longValue()
    require(pl >= 1 && pl <= 1000, s"$what: permille out of [1,1000]: $pl")
    pl
  }
}

/** `graft_hist_quantile(value, weight, permille)` — EXACT weighted
  * quantile of a bounded-domain integer column. NULL inputs and
  * NULL/non-positive weights are skipped; an empty group yields NULL —
  * matching the SQL oracle's `MIN(CASE WHEN ...)` over a cumulative-sum
  * window. See [[HistAggBase]] for the scale contract, and
  * [[FuseHistQuantiles]] for the optimizer rule that fuses several
  * quantiles of the same (value, weight) into one shared buffer.
  */
case class HistQuantileAgg(
    value: Expression,
    weight: Expression,
    permille: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends HistAggBase {

  private[functions] lazy val permilleValue: Long = permilleOf(permille, prettyName)
  private def p: Long = permilleValue

  override def prettyName: String = "graft_hist_quantile"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def third: Expression = permille

  override def eval(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
    if (buf.isEmpty) return null
    val (keys, cum, total) = cumulate(buf)
    quantileOf(keys, cum, total, p)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HistQuantileAgg =
    copy(value = newFirst, weight = newSecond, permille = newThird)
}

/** `graft_hist_quantiles(value, weight, array(p1, p2, …))` — the
  * multi-quantile form: ONE histogram buffer evaluated at every requested
  * permille, returning `array<long>` in argument order. This is what
  * [[FuseHistQuantiles]] rewrites N single-quantile calls into, so the
  * shuffle (or streaming state) carries one buffer instead of N copies of
  * the same histogram.
  */
case class HistQuantilesAgg(
    value: Expression,
    weight: Expression,
    permilles: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends HistAggBase {

  private lazy val ps: Array[Long] = {
    val arr = permilles.eval(null)
    require(arr != null, s"$prettyName: permilles must be a literal array")
    val longs = arr.asInstanceOf[ArrayData].toLongArray()
    require(longs.nonEmpty, s"$prettyName: permilles must be non-empty")
    longs.foreach(pl =>
      require(pl >= 1 && pl <= 1000, s"$prettyName: permille out of [1,1000]: $pl"))
    longs
  }

  override def prettyName: String = "graft_hist_quantiles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def third: Expression = permilles

  override def eval(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
    if (buf.isEmpty) return null
    val (keys, cum, total) = cumulate(buf)
    new GenericArrayData(ps.map(p => quantileOf(keys, cum, total, p)))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HistQuantilesAgg =
    copy(value = newFirst, weight = newSecond, permilles = newThird)
}

/** Optimizer rule: N `graft_hist_quantile` calls over the SAME
  * (value, weight) in one Aggregate build N identical histogram buffers —
  * N× the map-side memory, N× the shuffle payload, N× the streaming
  * state. This rule fuses them into one `graft_hist_quantiles` buffer and
  * re-derives each original column as an array extraction in a Project
  * above (aliased under the original ExprIds, so nothing upstream
  * notices). Conservative by design: only top-level
  * `Alias(AggregateExpression(HistQuantileAgg))` entries with no
  * FILTER/DISTINCT fuse; anything fancier is left untouched.
  */
object FuseHistQuantiles extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg: Aggregate =>
      val candidates = agg.aggregateExpressions.collect {
        case al @ Alias(AggregateExpression(h: HistQuantileAgg, _, false, None, _), _) => (al, h)
      }
      val groups = candidates
        .groupBy { case (_, h) => (h.value.canonicalized, h.weight.canonicalized) }
        .filter { case (_, g) => g.size >= 2 }
      if (groups.isEmpty) agg
      else {
        // per fused group: one multi-quantile alias + (original exprId → index)
        val fused = groups.values.toSeq.map { g =>
          val (_, h0) = g.head
          val perms = g.map { case (_, h) => Literal(h.permilleValue) }
          val fn = HistQuantilesAgg(h0.value, h0.weight, CreateArray(perms))
          val alias = Alias(AggregateExpression(fn, Complete, isDistinct = false), "hist_quantiles")()
          val slots = g.zipWithIndex.map { case ((al, _), i) => al.exprId -> i }.toMap
          (alias, slots)
        }
        val touched = fused.flatMap(_._2.keys).toSet
        val kept = agg.aggregateExpressions.filterNot {
          case al: Alias => touched.contains(al.exprId)
          case _ => false
        }
        val newAgg = agg.copy(aggregateExpressions = kept ++ fused.map(_._1))
        val projList = agg.aggregateExpressions.map {
          case al: Alias if touched.contains(al.exprId) =>
            val (fa, slots) = fused.find(_._2.contains(al.exprId)).get
            Alias(GetArrayItem(fa.toAttribute, Literal(slots(al.exprId))), al.name)(
              exprId = al.exprId, qualifier = al.qualifier)
          case ne => ne.toAttribute
        }
        Project(projList, newAgg)
      }
  }
}

object HistQuantileAgg {
  /** Loud ceiling on histogram cardinality (per partial buffer). */
  val MaxBins: Int = 1 << 20

  def register(spark: SparkSession): Unit = {
    Natives.registerOnce(spark, "graft_hist_quantile",
      new ExpressionInfo(classOf[HistQuantileAgg].getName, "graft_hist_quantile"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          "graft_hist_quantile(value, weight, permille) takes three arguments")
        HistQuantileAgg(exprs(0), exprs(1), exprs(2))
      })
    Natives.registerOnce(spark, "graft_hist_quantiles",
      new ExpressionInfo(classOf[HistQuantilesAgg].getName, "graft_hist_quantiles"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          "graft_hist_quantiles(value, weight, permilles) takes three arguments")
        HistQuantilesAgg(exprs(0), exprs(1), exprs(2))
      })
    // idempotent: the experimental list is tiny, scan by identity
    if (!spark.experimental.extraOptimizations.contains(FuseHistQuantiles))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseHistQuantiles
  }
}
