package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal feature extraction, oracled: the stub codec's features are
  * integer byte statistics (mean of payload bytes congruent to k mod 16,
  * scaled — Multimodal.FakeCodec), so DuckDB reproduces them exactly by
  * re-deriving the payload bytes via hex(encode(text)) and mirroring the
  * double→float32→double widening the Spark side performs.
  */
object Extras {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> { (s, d) => graft.multimodal.Multimodal.featureSummary(s, d) }
  )

  def oracles: Map[String, String] = Map(
    "q_multimodal_features" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |    encode(text) AS payload FROM documents),
        |b AS (SELECT doc_id, kind, octet_length(payload) AS n_bytes,
        |    list_transform(range(0, octet_length(payload)),
        |      i -> CAST('0x' || substr(hex(payload), CAST(2 * i + 1 AS INTEGER), 2) AS INTEGER)) AS bytes
        |  FROM m),
        |f AS (SELECT kind, n_bytes,
        |    CAST(list_sum(list_filter(bytes, v -> v % 16 = 0)) AS DOUBLE) AS s0,
        |    len(list_filter(bytes, v -> v % 16 = 0)) AS c0
        |  FROM b),
        |g AS (SELECT kind, n_bytes,
        |    CASE WHEN c0 = 0 THEN CAST(0 AS REAL)
        |         ELSE CAST(s0 / c0 / 255.0 AS REAL) END AS f0
        |  FROM f)
        |SELECT kind, COUNT(*) AS n_media, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(SUM(CAST(round(CAST(f0 AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS f0_milli_sum
        |FROM g GROUP BY kind ORDER BY kind""".stripMargin
  )
}
