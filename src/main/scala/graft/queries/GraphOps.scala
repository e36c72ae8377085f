package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives shared by the graph queries and their
  * property specs. Connected components live in [[Pipeline]] (large-star/
  * small-star contraction + the adaptive single-task union-find); PageRank
  * is the `q_pagerank` power iteration. These are the remaining census
  * primitives, factored so specs can drive adversarial graphs through the
  * exact production plan.
  */
object GraphOps {

  /** Triangle census over UNDIRECTED distinct edges (`u` < `v` per row).
    *
    * Degree-ordered orientation: every edge points from its (degree, id)-
    * smaller endpoint, so each triangle materializes exactly once in the
    * wedge join and oriented out-degree is O(√m) even on power-law graphs
    * — a hub's edges mostly point INTO it, so the hub never fans out a
    * quadratic wedge set. Returns one row:
    * (n_nodes, n_edges, n_wedges, n_triangles, gcc_ppm) where n_wedges
    * counts unordered open+closed wedges (Σ C(deg,2)) and gcc_ppm =
    * 3·10⁶·triangles / wedges (the global clustering coefficient).
    */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val deg = pairs.select($"u".as("n")).union(pairs.select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("dg"))
    val fwd = $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v")
    // materialized once, probed three times by the wedge join
    val e = pairs
      .join(deg.select($"n".as("nu"), $"dg".as("du")), $"u" === $"nu")
      .join(deg.select($"n".as("nv"), $"dg".as("dv")), $"v" === $"nv")
      .select(when(fwd, $"u").otherwise($"v").as("src"),
        when(fwd, $"v").otherwise($"u").as("dst"))
      .localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), $"e1.dst" === $"e2.src")
      .join(e.as("e3"), $"e3.src" === $"e1.src" && $"e3.dst" === $"e2.dst")
      .agg(count(lit(1)).as("n_triangles"))
    val w = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("dg * (dg - 1) div 2")).as("n_wedges"))
    w.crossJoin(pairs.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        // wedge-free graphs (every component a single edge) have gcc 0,
        // not a division error
        when($"n_wedges" > 0, expr("n_triangles * 3000000 div n_wedges"))
          .otherwise(0L).as("gcc_ppm"))
  }

  /** BFS level census from `seeds` (column `id`) over DIRECTED edges
    * (`src`, `dst`), capped at `maxLvl` hops. Each round is one src-keyed
    * join + distinct + an anti join against the visited set;
    * localCheckpoint truncates lineage so round k plans against
    * materialized sizes, and an empty frontier short-circuits the
    * remaining rounds. Returns (lvl, n_nodes) — nodes at their MINIMUM
    * hop distance, seeds at level 0.
    */
  def bfsLevels(edges: DataFrame, seeds: DataFrame, maxLvl: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e = edges.select($"src", $"dst")
    var visited = seeds.select($"id").distinct()
      .withColumn("lvl", lit(0L)).localCheckpoint()
    var frontier = visited.select($"id")
    var lvl = 0L
    while (lvl < maxLvl && !frontier.isEmpty) {
      lvl += 1
      val next = frontier.join(e, $"id" === $"src")
        .select($"dst".as("id")).distinct()
        .join(visited.select($"id".as("vid")), $"id" === $"vid", "left_anti")
        .withColumn("lvl", lit(lvl)).localCheckpoint()
      // visited stays a plain union of CHECKPOINTED levels — each level is
      // already materialized, so re-checkpointing the union only re-copied
      // the same rows once per round (O(levels²) materialized bytes)
      visited = visited.union(next)
      frontier = next.select($"id")
    }
    visited.groupBy($"lvl").agg(count(lit(1)).as("n_nodes")).orderBy($"lvl")
  }
}
