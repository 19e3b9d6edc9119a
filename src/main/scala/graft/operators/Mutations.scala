package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch mutation + TTL operators — the Spark rendering of the reference's
  * ALTER TABLE UPDATE/DELETE (src/Interpreters/MutationsInterpreter.h:44:
  * mutations are background part REWRITES, never in-place edits) and TTL
  * sweeps (src/Processors/Transforms/TTLTransform.cpp: expired rows are
  * dropped and expired columns reset to defaults when a part is
  * rewritten).
  *
  * The Spark-native analog of "rewrite the affected parts" is INSERT
  * OVERWRITE of the affected PARTITIONS: express the mutation as a
  * declarative transform, then dynamically overwrite only partitions that
  * contain matching rows. At 100 TB the transform is embarrassingly
  * parallel, the overwrite touches only affected partition directories,
  * and nothing is ever edited in place — the same immutable-part model as
  * the reference.
  */
object Mutations {

  /** ALTER TABLE ... UPDATE col = expr WHERE pred — rows matching `pred`
    * get each assignment applied; everything else passes through. Pure
    * column-level rewrite, fully codegen'd. */
  def update(df: DataFrame, pred: Column, assignments: Map[String, Column]): DataFrame =
    assignments.foldLeft(df) { case (d, (name, expr)) =>
      d.withColumn(name, when(pred, expr).otherwise(col(name)))
    }

  /** ALTER TABLE ... DELETE WHERE pred. */
  def delete(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** Row TTL: drop rows whose `ts` is older than `cutoff`
    * (TTLTransform row-TTL: expired rows do not survive the rewrite). */
  def ttlRows(df: DataFrame, ts: Column, cutoff: Column): DataFrame =
    df.filter(ts >= cutoff)

  /** Column TTL: null out `column` on rows whose `ts` is older than
    * `cutoff` (TTLTransform column-TTL resets expired columns to their
    * default; this engine's default is NULL). */
  def ttlColumn(df: DataFrame, column: String, ts: Column, cutoff: Column): DataFrame =
    df.withColumn(column, when(ts >= cutoff, col(column)))

  /** Materialize a mutation as a dynamic partition overwrite: write only
    * the partitions of `partitionCol` present in `mutated` — the
    * INSERT-OVERWRITE-affected-parts shape (requires `mutated` to contain
    * every surviving row of those partitions, which `update`/`delete` of a
    * full-table read satisfies). */
  def overwritePartitions(mutated: DataFrame, path: String, partitionCol: String): Unit =
    mutated.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(path)

  /** Read-back helper for mutation round-trip tests. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
