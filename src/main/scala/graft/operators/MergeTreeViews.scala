package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MergeTree engine-family semantics as view-time normalizations.
  *
  * The reference applies these during background merges and forces them at
  * read with FINAL (src/Storages/MergeTree/registerStorageMergeTree.cpp:924,
  * merge algorithms under src/Processors/Merges/Algorithms/ — Replacing,
  * Summing, Collapsing SortedAlgorithm files).
  * In a lakehouse design the base parquet is the immutable log and FINAL is
  * a deterministic view — same result the reference guarantees after a full
  * merge, computed with one shuffle on the primary key.
  */
object MergeTreeViews {

  /** ReplacingMergeTree FINAL (ReplacingSortedAlgorithm): keep the row with
    * the highest version per key; ties on version broken by the last tiebreak
    * column, so the view is total-order deterministic. */
  def replacingFinal(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** SummingMergeTree FINAL (SummingSortedAlgorithm): one row per key with
    * metric columns summed (decimal-exact). */
  def summingFinal(df: DataFrame, keys: Seq[String], sums: Seq[(String, Column)]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sums.head._2.as(sums.head._1),
        sums.tail.map { case (n, c) => c.as(n) }: _*)

  /** CollapsingMergeTree FINAL (CollapsingSortedAlgorithm): +1/-1 sign rows
    * cancel per key; a key survives only if its net sign is positive, and
    * its metrics are the sign-weighted sums. */
  def collapsingFinal(df: DataFrame, keys: Seq[String], sign: Column,
      metrics: Seq[(String, Column)]): DataFrame = {
    val agg = df.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__net"),
        metrics.map { case (n, c) => sum(sign * c).as(n) }: _*)
    agg.filter(col("__net") > 0).drop("__net")
  }

  /** VersionedCollapsingMergeTree FINAL (VersionedCollapsingSortedAlgorithm,
    * registerStorageMergeTree.cpp:924-942): rows cancel ONLY within the
    * same (key, version) — a +1 state survives unless a -1 with the SAME
    * version cancels it; the final row per key is the surviving state with
    * the highest version. Two shuffles on (key[, version]) — both
    * partial-aggregated. */
  def versionedCollapsingFinal(df: DataFrame, keys: Seq[String],
      version: String, sign: Column): DataFrame = {
    val net = df.groupBy((keys :+ version).map(col): _*)
      .agg(sum(sign).as("__net"))
      .filter(col("__net") > 0)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(version).desc)
    net.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__net")
  }
}
