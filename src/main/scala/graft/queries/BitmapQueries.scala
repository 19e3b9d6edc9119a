package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.functions.BitmapFunctions._
import org.apache.spark.sql.functions._

/** Roaring-bitmap aggregate queries (round-2 verdict gap #3): real
  * compressed-bitmap states with AND/OR/XOR/ANDNOT algebra, oracled
  * against the equivalent COUNT-DISTINCT set algebra in DuckDB.
  *
  * Reference: src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp
  * (groupBitmap, groupBitmapAnd/Or/Xor), src/Functions/FunctionsBitmap.h
  * (bitmapBuild/bitmapCardinality/bitmapAnd/...).
  *
  * Scale design: raw row ids aggregate once into per-group bitmap states
  * (partial aggregation = bitmap OR, shuffle carries compressed states,
  * not ids); all algebra then runs on the tiny state table.
  */
object BitmapQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // bitmapBuild + full scalar algebra between two order-key sets.
    Q.df("q_bitmap_algebra", """
      WITH a AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'O'),
           b AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'F')
      SELECT
        (SELECT COUNT(*) FROM a) AS card_a,
        (SELECT COUNT(*) FROM b) AS card_b,
        (SELECT COUNT(*) FROM a JOIN b USING (k)) AS card_and,
        (SELECT COUNT(*) FROM (SELECT k FROM a UNION SELECT k FROM b)) AS card_or,
        (SELECT COUNT(*) FROM (SELECT k FROM a UNION SELECT k FROM b))
          - (SELECT COUNT(*) FROM a JOIN b USING (k)) AS card_xor,
        (SELECT COUNT(*) FROM a)
          - (SELECT COUNT(*) FROM a JOIN b USING (k)) AS card_andnot""") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val a = li.filter(col("l_linestatus") === "O")
        .agg(bitmapBuildAgg(col("l_orderkey")).as("bm_a"))
      val b = li.filter(col("l_linestatus") === "F")
        .agg(bitmapBuildAgg(col("l_orderkey")).as("bm_b"))
      a.crossJoin(b).select(
        bitmapCardinality(col("bm_a")).as("card_a"),
        bitmapCardinality(col("bm_b")).as("card_b"),
        bitmapAndCardinality(col("bm_a"), col("bm_b")).as("card_and"),
        bitmapCardinality(bitmapOr(col("bm_a"), col("bm_b"))).as("card_or"),
        bitmapCardinality(bitmapXor(col("bm_a"), col("bm_b"))).as("card_xor"),
        bitmapCardinality(bitmapAndnot(col("bm_a"), col("bm_b"))).as("card_andnot"))
    },

    // groupBitmapOr / groupBitmapAnd over per-group STATES — the
    // -State/-Merge combinator pattern for bitmaps: states built per
    // returnflag, then merged without touching raw ids again.
    Q.df("q_bitmap_merge_states", """
      WITH u AS (SELECT COUNT(DISTINCT l_orderkey) AS card_union FROM lineitem),
           c AS (SELECT COUNT(*) AS card_common FROM (
             SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
             HAVING COUNT(DISTINCT l_returnflag) =
               (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem)) t)
      SELECT u.card_union, c.card_common FROM u CROSS JOIN c""") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val states = li.groupBy("l_returnflag")
        .agg(bitmapBuildAgg(col("l_orderkey")).as("st"))
      states.agg(
        bitmapCardinality(bitmapOrAgg(col("st"))).as("card_union"),
        bitmapCardinality(bitmapAndAgg(col("st"))).as("card_common"))
    }
  )
}
