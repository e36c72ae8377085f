package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Property pins for the graph census primitives, driven through the exact
  * production plan ([[GraphOps]] — the same code `q_triangle_count` /
  * `q_bfs_levels` run) on adversarial shapes the TPC-H-derived graphs
  * don't exhibit: hubs (orientation must not fan out quadratic wedges from
  * the hub — and must still count the hub's triangles), complete cliques
  * (every wedge closed), and seeded random graphs against brute force.
  */
class GraphOpsSpec extends AnyFunSuite with SparkFixture {

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
  }

  private def census(edges: Seq[(Long, Long)]): Map[String, Long] = {
    val row = GraphOps.triangleCensus(pairsDf(edges)).collect().head
    row.schema.fieldNames.zip(row.toSeq.map(_.asInstanceOf[Long])).toMap
  }

  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val has = (a: Long, b: Long) => es.contains((math.min(a, b), math.max(a, b)))
    (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size if has(nodes(i), nodes(j))
      k <- (j + 1) until nodes.size if has(nodes(i), nodes(k)) && has(nodes(j), nodes(k))
    } yield 1L).sum
  }

  test("complete K5: every wedge closed, gcc = 1.0") {
    val k5 = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val c = census(k5)
    assert(c("n_nodes") == 5 && c("n_edges") == 10)
    assert(c("n_triangles") == 10)
    assert(c("n_wedges") == 30)       // 5 * C(4,2)
    assert(c("gcc_ppm") == 1000000L)  // 3*10 / 30
  }

  test("hub star + one leaf closure: exactly one triangle, no hub blowup") {
    val star = (1L to 200L).map(l => (0L, l))
    val c = census(star :+ (1L, 2L))
    assert(c("n_triangles") == 1)
    // hub degree 200 dominates the wedge census but not the triangle count
    assert(c("n_wedges") == 200L * 199 / 2 + 2 /* leaves 1,2 have deg 2 */)
  }

  test("chain has zero triangles and gcc 0") {
    val c = census((0L until 10L).map(i => (i, i + 1)))
    assert(c("n_triangles") == 0 && c("gcc_ppm") == 0)
  }

  test("seeded random graphs match brute force") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 25 + trial * 5
      val edges = for {
        i <- 0L until n.toLong; j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.2
      } yield (i, j)
      assert(census(edges)("n_triangles") == bruteTriangles(edges),
        s"trial $trial mismatch")
    }
  }

  private def levels(edges: Seq[(Long, Long)], seeds: Seq[Long], cap: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val e = edges.toDF("src", "dst")
    val sd = seeds.toDF("id")
    GraphOps.bfsLevels(e, sd, cap).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfs on a directed chain: one node per level up to the cap") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    assert(levels(chain, Seq(0L), 4) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("bfs takes the MINIMUM hop distance and ignores unreachable nodes") {
    // 0→1→2→3 plus shortcut 0→3; node 9 reachable only FROM 3 backwards edge absent
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (7L, 8L))
    val got = levels(e, Seq(0L), 4)
    assert(got == Map(0L -> 1L, 1L -> 2L /* nodes 1 and 3 */, 2L -> 1L))
  }

  test("bfs edge cases: empty seeds, zero cap, seed dedup") {
    val chain = (0L until 5L).map(i => (i, i + 1))
    // no seeds → no levels
    assert(levels(chain, Seq(), 3).isEmpty)
    // cap 0 → only the seed level
    assert(levels(chain, Seq(0L), 0) == Map(0L -> 1L))
    // duplicate seeds count once
    assert(levels(chain, Seq(0L, 0L, 0L), 1) == Map(0L -> 1L, 1L -> 1L))
  }

  test("triangle census on a single edge: no wedges, gcc 0") {
    val c = census(Seq((1L, 2L)))
    assert(c("n_nodes") == 2 && c("n_edges") == 1 && c("n_wedges") == 0)
    assert(c("n_triangles") == 0)
  }

  test("bfs on the seeded random graph matches a reference BFS") {
    val rnd = new scala.util.Random(7)
    val n = 40L
    val dir = for {
      i <- 0L until n; j <- 0L until n
      if i != j && rnd.nextDouble() < 0.06
    } yield (i, j)
    val adj = dir.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // reference BFS from seed 0
    var dist = Map(0L -> 0L)
    var frontier = Seq(0L)
    for (l <- 1L to 5L) {
      frontier = frontier.flatMap(f => adj.getOrElse(f, Seq()))
        .distinct.filterNot(dist.contains)
      dist ++= frontier.map(_ -> l)
    }
    val want = dist.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(levels(dir, Seq(0L), 5) == want)
  }
}
