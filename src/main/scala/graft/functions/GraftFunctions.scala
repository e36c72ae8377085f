package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared by the graft query layer.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so it
  * stays inside whole-stage codegen, and every hash is *portable*: the
  * DuckDB oracle computes the identical value with vanilla SQL
  * (md5 hex prefix → 60-bit integer), so results hash-compare exactly.
  */
object GraftFunctions {

  /** Deterministic 60-bit hash of a string column, identical in DuckDB as
    * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`. 60 bits keeps the
    * value positive in a signed 64-bit integer in both engines.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact money arithmetic: doubles → integer cents. Summing cents is
    * exact and order-independent, unlike summing doubles, so aggregates
    * hash-match the oracle bit-for-bit at any parallelism.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Count-min sketch probe cells of `key`: one per hash row j,
    * `pmod(hash60("cms<j>|" + key), width)`. ONE definition shared by the
    * batch query (q_profile_cms), the streaming twin
    * (Streaming.cmsSketch), and any consumer estimating against a stored
    * sketch — changing the salt/depth/width in one place keeps the
    * grid-equality property the specs pin.
    */
  val CmsDepth = 4
  def cmsCells(key: Column, width: Long): Seq[Column] =
    (0 until CmsDepth).map(j =>
      pmod(hash60(concat(lit(s"cms$j|"), key.cast("string"))), lit(width)))

  /** Morton/Z-order interleave of two 16-bit dimensions into a 32-bit key:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Fixing a
    * z-key prefix fixes a prefix of BOTH dimensions, so any contiguous
    * z-range is a bounded hyperrectangle — the property multi-dimensional
    * data skipping rests on (file/row-group min-max stats stay tight in
    * every interleaved dimension after a z-ordered layout, where a linear
    * sort bounds only its leading column). 32 static shift-mask terms,
    * fully inside whole-stage codegen; the identical arithmetic is
    * expressible in vanilla SQL for the oracle.
    */
  def zkey16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(x.bitwiseAND(lit(1L << i)), i) + shiftleft(y.bitwiseAND(lit(1L << i)), i + 1)
    }.reduce(_ + _)

  /** Dot product of two double array columns (sequential fold, codegen'd). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Cosine similarity between two float-array columns, computed in double
    * precision. Used for embedding dedup / ANN.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    dotProduct(ad, bd) / (sqrt(dotProduct(ad, ad)) * sqrt(dotProduct(bd, bd)))
  }

  /** Non-empty whitespace-ish tokens (single-space split, empties dropped —
    * mirrors `string_split(text, ' ')` + filter in the oracle).
    *
    * Measured (round 10, 1M docs, local[32]): this filter-HOF form runs
    * 0.43 s vs 0.60 s for the codegen'd
    * `regexp_extract_all(text, '[^ ]+')` equivalent — the simple
    * length-predicate lambda is NOT the interpreted-lambda hot spot the
    * popgen HOFs were (those walked wide structs per element); don't
    * "optimize" this into a regex.
    */
  def words(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)
}
