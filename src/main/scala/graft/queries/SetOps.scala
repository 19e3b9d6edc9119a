package graft.queries

import graft.{Q, QueryPack}

/** Set operations & distinct (reference: UnionStep,
  * IntersectOrExceptStep/IntersectOrExceptTransform
  * (src/Processors/Transforms/IntersectOrExceptTransform.h:15),
  * DistinctTransform (src/Processors/Transforms/DistinctTransform.h:10),
  * Set/PreparedSets for IN (src/Interpreters/Set.h)).
  */
object SetOps extends QueryPack {

  override def queries: Seq[Q] = Seq(

    Q.shared("q_union_all", """
      SELECT k, src FROM (
        SELECT c_nationkey AS k, 'cust' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS k, 'supp' AS src FROM supplier) t
      GROUP BY k, src
      ORDER BY k, src"""),

    Q.shared("q_union_distinct", """
      SELECT c_nationkey AS k FROM customer
      UNION
      SELECT s_nationkey AS k FROM supplier
      ORDER BY k"""),

    Q.shared("q_intersect", """
      SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey AS k FROM supplier
      ORDER BY k"""),

    // Customers with no 400k+ order: non-empty at sf0.01 (202 rows) so
    // the oracle hash carries real EXCEPT signal — the previous
    // nationkey spelling returned 0 rows, which a broken EXCEPT would
    // also return (round-12 verdict wrong #1).
    Q.shared("q_except", """
      SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
      ORDER BY k"""),

    // ALL variants keep multiplicity (IntersectOrExceptTransform all=true).
    Q.shared("q_intersect_all", """
      SELECT k, COUNT(*) AS n FROM (
        SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
        INTERSECT ALL
        SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R') t
      GROUP BY k
      ORDER BY k"""),

    Q.shared("q_except_all", """
      SELECT k, COUNT(*) AS n FROM (
        SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
        EXCEPT ALL
        SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R') t
      GROUP BY k
      ORDER BY k"""),

    // DISTINCT on a projection (DistinctStep).
    Q.shared("q_distinct", """
      SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus, l_suppkey"""),

    // Literal IN list + tuple-IN subquery (tuple IN: src/Interpreters/Set.h
    // tuple path; Catalyst InSubquery on a struct). DuckDB has no
    // multi-column IN — the oracle spells the equivalent EXISTS.
    Q.sparkSql("q_in_tuple", """
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders
      WHERE o_orderstatus IN ('F', 'P')
        AND (o_orderstatus, o_orderpriority) IN (
          SELECT o_orderstatus, o_orderpriority FROM orders
          GROUP BY o_orderstatus, o_orderpriority
          HAVING COUNT(*) > 100)
      ORDER BY o_orderkey""",
      """
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders o
      WHERE o_orderstatus IN ('F', 'P')
        AND EXISTS (
          SELECT 1 FROM orders i
          WHERE i.o_orderstatus = o.o_orderstatus
            AND i.o_orderpriority = o.o_orderpriority
          GROUP BY i.o_orderstatus, i.o_orderpriority
          HAVING COUNT(*) > 100)
      ORDER BY o_orderkey"""),

    // Global-NOT-IN with a null-safe anti-join. Customers with no
    // near-max-price order — non-empty at sf0.01 (the previous supplier
    // spelling returned 0 rows: trivially-true hash, no signal).
    Q.shared("q_not_in", """
      SELECT c_custkey, c_name
      FROM customer
      WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
      ORDER BY c_custkey""")
  )
}
