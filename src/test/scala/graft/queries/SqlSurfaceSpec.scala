package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The SQL-text surface: the same oracled queries, written as `spark.sql`
  * ANSI text over registered views, must return row-identical results to
  * the DataFrame implementations the correctness gate hashes. One
  * SQL-interface query (q_sql_interface) exercised the parser before; this
  * pins a join+limit, a window, a grouping-set, and an anti join through
  * the SQL path too, so a user can drive the engine entirely from SQL text.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toIndexedSeq
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString(""))

  private def registerViews(): Unit = {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    Tables.customer(spark, sf).createOrReplaceTempView("customer")
    Tables.supplier(spark, sf).createOrReplaceTempView("supplier")
  }

  private def check(name: String, sql: String): Unit = {
    registerViews()
    val viaDf = graft.SparkEntry.queries(name)(spark, sf)
    val viaSql = spark.sql(sql)
    assert(viaSql.columns.toSeq == viaDf.columns.toSeq, s"$name column names")
    assert(rows(viaSql) == rows(viaDf), s"$name rows differ between SQL and DataFrame paths")
  }

  test("join + aggregate + top-k via SQL text (q3_shipping_priority)") {
    check("q3_shipping_priority",
      """SELECT l_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
        |  o_orderpriority,
        |  SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin)
  }

  test("ratio-to-report window via SQL text (q_supplier_share)") {
    check("q_supplier_share",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT s_nationkey, l_suppkey AS suppkey, rev_c,
        |    SUM(rev_c) OVER (PARTITION BY s_nationkey) AS nation_c
        |  FROM rev JOIN supplier ON l_suppkey = s_suppkey)
        |SELECT s_nationkey, suppkey, rev_c, nation_c,
        |  rev_c * 1000000 div nation_c AS share_ppm
        |FROM j WHERE rev_c * 1000000 div nation_c >= 60000
        |ORDER BY s_nationkey, suppkey""".stripMargin)
  }

  test("grouping sets via SQL text (q_cube_sales)") {
    check("q_cube_sales",
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n_items,
        |  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS price_c
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin)
  }

  test("anti join via SQL text (q_customers_without_orders)") {
    check("q_customers_without_orders",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin)
  }
}
