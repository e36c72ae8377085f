package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_hist_quantile(value, weight, permille)` — EXACT weighted
  * quantile of a bounded-domain integer column, as a native
  * [[TypedImperativeAggregate]].
  *
  * The buffer is a value→weight histogram, so partial aggregation
  * (map-side combine) reduces every partition to at most |domain| entries
  * and the shuffle carries bounded histograms, not rows — at 100 TB this
  * computes exact quantiles with ONE small shuffle where a sort-based
  * percentile would shuffle the corpus. That bargain only holds for
  * bounded domains (quantized quantities, discount steps, scores); the
  * aggregate enforces it loudly, throwing past [[HistQuantileAgg.MaxBins]]
  * distinct values rather than degrading into an executor OOM.
  *
  * Result: the smallest value v whose cumulative weight reaches
  * `permille`/1000 of the total (`permille` = 500 → the lower weighted
  * median; the exact rule is cw·1000 ≥ p·W, so p=500 is 2·cw ≥ W). NULL
  * inputs and NULL/non-positive weights are skipped; an empty group
  * yields NULL — matching the SQL oracle's `MIN(CASE WHEN ...)` over a
  * cumulative-sum window.
  */
case class HistQuantileAgg(
    value: Expression,
    weight: Expression,
    permille: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with TernaryLike[Expression] {

  private lazy val p: Long = {
    val v = permille.eval(null)
    require(v != null, "graft_hist_quantile: permille must be a literal")
    val pl = v.asInstanceOf[Number].longValue()
    require(pl >= 1 && pl <= 1000, s"graft_hist_quantile: permille out of [1,1000]: $pl")
    pl
  }

  override def prettyName: String = "graft_hist_quantile"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def first: Expression = value
  override def second: Expression = weight
  override def third: Expression = permille

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, java.lang.Long] =
    new java.util.HashMap[java.lang.Long, java.lang.Long]()

  private def add(buf: java.util.HashMap[java.lang.Long, java.lang.Long], v: Long, w: Long): Unit = {
    val prev = buf.get(java.lang.Long.valueOf(v))
    if ((prev eq null) && buf.size() >= HistQuantileAgg.MaxBins)
      throw new IllegalStateException(
        s"graft_hist_quantile: domain exceeded ${HistQuantileAgg.MaxBins} distinct values — " +
          "this aggregate is for bounded (quantized) domains; widen the quantization instead")
    buf.put(v, if (prev eq null) w else prev.longValue() + w)
  }

  override def update(
      buf: java.util.HashMap[java.lang.Long, java.lang.Long], input: InternalRow): java.util.HashMap[java.lang.Long, java.lang.Long] = {
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

  override def eval(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
    if (buf.isEmpty) return null
    val keys = new Array[Long](buf.size())
    val kit = buf.keySet().iterator()
    var i = 0
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys)
    var total = 0L
    var j = 0
    while (j < keys.length) { total += buf.get(keys(j)); j += 1 }
    var cw = 0L
    j = 0
    while (j < keys.length) {
      cw += buf.get(keys(j))
      if (cw * 1000L >= p * total) return keys(j)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HistQuantileAgg =
    copy(value = newFirst, weight = newSecond, permille = newThird)
}

object HistQuantileAgg {
  /** Loud ceiling on histogram cardinality (per partial buffer). */
  val MaxBins: Int = 1 << 20

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_hist_quantile"),
      new ExpressionInfo(classOf[HistQuantileAgg].getName, "graft_hist_quantile"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          "graft_hist_quantile(value, weight, permille) takes three arguments")
        HistQuantileAgg(exprs(0), exprs(1), exprs(2))
      })
}
