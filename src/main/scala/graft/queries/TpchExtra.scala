package graft.queries

import graft.{Q, QueryPack}

/** Remaining TPC-H-shaped queries expressible over the reduced corpus
  * schema: Q7 (volume shipping), Q8 (market share), Q15 (top supplier),
  * Q17 (small-quantity revenue), Q19 (discounted revenue, predicate
  * reduced to brand+size — the corpus has no p_container/l_shipmode).
  * Q2/Q9/Q11/Q16/Q20 need partsupp and Q12/Q21 need
  * l_shipmode/l_commitdate, none of which exist in the corpus — documented
  * unexpressible rather than faked.
  *
  * Determinism: revenue sums through DECIMAL(18,6) like the rest of the
  * relational battery; explicit full ORDER BY.
  */
object TpchExtra extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // Q7: revenue volume between two nations by year, both directions.
    Q.shared("q7_volume_shipping", """
      SELECT supp_nation, cust_nation, l_year,
        CAST(SUM(volume) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          EXTRACT(YEAR FROM l_shipdate) AS l_year,
          CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00') shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""),

    // Q8: national market share within a region for a part type.
    Q.shared("q8_market_share", """
      SELECT o_year,
        ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
          / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
      FROM (
        SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
          CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
          n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND p_type = 'ECONOMY') all_nations
      GROUP BY o_year
      ORDER BY o_year"""),

    // Q15: the supplier(s) with maximum revenue in a quarter (view
    // inlined as a CTE; ties kept like the spec).
    Q.shared("q15_top_supplier", """
      WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
          SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
      ORDER BY s_suppkey"""),

    // Q17: average yearly revenue loss if small-quantity orders were not
    // taken — correlated avg-per-part subquery.
    Q.shared("q17_small_quantity", """
      SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS DOUBLE) AS avg_yearly
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
        AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)"""),

    // Q19: discounted revenue over OR-of-ANDs predicates (reduced to
    // brand+size+quantity — no p_container in the corpus). The operator
    // under test is disjunctive predicate pushdown across a join.
    Q.shared("q19_discounted_revenue", """
      SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS revenue
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE
        (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
          AND l_quantity >= 1 AND l_quantity <= 20)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
          AND l_quantity >= 10 AND l_quantity <= 30)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
          AND l_quantity >= 20 AND l_quantity <= 40)""")
  )
}
