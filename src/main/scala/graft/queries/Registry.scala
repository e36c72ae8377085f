package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single registration point for every query module. SparkEntry delegates
  * here; each module contributes a (queries, oracles) pair with matching
  * keys. Keys must be globally unique — asserted at class-init so a clash
  * fails fast in tests rather than silently shadowing in the Map merge.
  */
object Registry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (FormatQueries.queries, FormatQueries.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Extras.queries, Extras.oracles)
    )

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_._1.toSeq)
    require(all.size == all.map(_._1).distinct.size, "duplicate query keys across modules")
    all.toMap
  }

  val oracles: Map[String, String] = {
    val all = modules.flatMap(_._2.toSeq)
    require(all.size == all.map(_._1).distinct.size, "duplicate oracle keys across modules")
    val m = all.toMap
    // every query carries its DuckDB oracle and vice versa — a missing
    // oracle would silently downgrade that query to the weaker rows-only
    // driver check; an orphaned oracle marks a renamed/deleted query
    val qk = queries.keySet
    require(m.keySet == qk,
      s"query/oracle key drift: oracle-only=${(m.keySet -- qk).toSeq.sorted.mkString(",")} " +
        s"query-only=${(qk -- m.keySet).toSeq.sorted.mkString(",")}")
    m
  }
}
