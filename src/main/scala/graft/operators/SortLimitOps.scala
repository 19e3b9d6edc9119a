package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Library renderings of the reference's sort/limit operators that Spark has
  * no direct clause for. All are declarative plan rewrites — no driver-side
  * loops — so they scale with partitioned execution.
  */
object SortLimitOps {

  /** LIMIT n BY key — per-group head (reference: LimitByTransform,
    * src/Processors/Transforms/LimitByTransform.h:10). Rewritten to
    * row_number over (partition by keys order by ord), the same rewrite the
    * dialect layer applies to `LIMIT n BY k` SQL. One shuffle on the keys. */
  def limitBy(df: DataFrame, n: Int, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** LIMIT n WITH TIES (reference: LimitTransform with_ties,
    * src/Processors/LimitTransform.h:19): keep every row tied with the n-th
    * on the (ascending) sort key.
    *
    * Scale-safe plan: a global rank() window would funnel EVERY row through
    * one task. Instead the n-th key tuple is found with orderBy().limit(n)
    * — Spark's TakeOrderedAndProject: per-partition top-n heaps merged on
    * the driver, n rows total — and rows are kept by a broadcast `key <=
    * threshold` filter (single-row nested-loop broadcast = a plain filter
    * scan). Two pruned scans, no global shuffle-to-one. */
  def limitWithTies(df: DataFrame, n: Int, order: Seq[Column]): DataFrame = {
    val keyed = df.withColumn("__k", struct(order: _*))
    val thr = keyed.select(col("__k")).orderBy(col("__k")).limit(n)
      .agg(max(col("__k")).as("__t"))
    keyed.join(broadcast(thr), col("__k") <= col("__t"))
      .drop("__k", "__t")
  }

  /** ORDER BY ... WITH FILL over an integer axis (reference:
    * FillingTransform, src/Processors/Transforms/FillingTransform.h:19):
    * materialize the missing axis points of [from, to) step `step` and
    * left-join the data onto the dense axis. `sequence()` + explode stays
    * fully distributed (the axis generator is a single small partition
    * seeded on the driver, then joined — at scale the fact side shuffles,
    * the axis broadcasts). */
  def withFillLong(df: DataFrame, axis: String, from: Long, to: Long, step: Long): DataFrame = {
    val spark = df.sparkSession
    val dense = spark.range(from, to, step).toDF(axis)
    dense.join(df, Seq(axis), "left")
  }

  /** WITH FILL over a month-granularity timestamp axis. */
  def withFillMonths(df: DataFrame, axis: String, fromMonth: String, toMonth: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dense = Seq(1).toDF("__one")
      .select(explode(sequence(
        to_timestamp(lit(fromMonth)), to_timestamp(lit(toMonth)),
        expr("INTERVAL 1 MONTH"))).as(axis))
    dense.join(df, Seq(axis), "left")
  }
}
