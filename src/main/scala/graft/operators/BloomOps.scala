package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the runtime-filter pattern
  * (reference: the IN-set / row-level filter push the reference builds
  * from the right side of a join, src/Interpreters/Set.cpp +
  * MergeTreeIndexSet; Spark's own runtime row-group filtering uses the
  * same BloomFilterAggregate machinery this composes).
  *
  * Shape: the dim-side bloom is AGGREGATED DISTRIBUTED (map-side partial
  * blooms OR-merged), and only the finished ~numBits/8-byte filter
  * crosses to the driver to ride the fact-side scan as a plan literal —
  * at 100 TB the fact table is pre-filtered BEFORE its shuffle, which is
  * the whole value: a 1%-selective dim turns a 100 TB shuffle into 1 TB
  * plus a bounded false-positive tail. The exact join AFTER the reduce
  * keeps semantics exact (bloom has no false negatives; false positives
  * are re-checked).
  */
object BloomOps {

  /** Pre-filter `fact` to rows whose `factKey` might be in `dim`'s
    * `dimKey` set, then exact LEFT SEMI join. Result is provably equal to
    * the plain semi join. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L): DataFrame = {
    val spark = fact.sparkSession
    // distributed bloom build: hash the key column (BloomFilterAggregate
    // takes the 64-bit hash lane), partials merge map-side
    val keyExpr = ExprColumn.expression(dim.col(dimKey).cast("long"))
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(keyExpr), 42L),
      Literal(expectedItems), Literal(expectedItems * 8))
      .toAggregateExpression()
    val bloomBytes = dim.select(ExprColumn.column(agg).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    val reduced = fact.filter(
      ExprColumn.column(BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        XxHash64(Seq(ExprColumn.expression(
          fact.col(factKey).cast("long"))), 42L))))
    reduced.join(dim.select(dimKey).distinct()
        .withColumnRenamed(dimKey, factKey).hint("shuffle_hash"),
      Seq(factKey), "left_semi")
  }
}
