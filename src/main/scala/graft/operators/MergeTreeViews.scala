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

  /** One age→precision step of a Graphite retention schedule: rows at
    * least `age` seconds old round their time down to `precision`-second
    * buckets (Graphite.h:49-51). */
  final case class GraphiteRetention(age: Long, precision: Long)

  /** One rollup pattern (Graphite.h:25-53): first-match-wins regexp on the
    * metric path, an aggregate function name (sum/avg/min/max/any), and a
    * retention schedule; empty retentions = aggregate at the raw time. The
    * LAST pattern must be the regexp-less default. */
  final case class GraphitePattern(regexp: Option[String], function: String,
      retentions: Seq[GraphiteRetention])

  /** GraphiteMergeTree FINAL (GraphiteRollupSortedAlgorithm.cpp): per
    * (path, time) keep the max-version row, pick the first pattern whose
    * regexp matches the path, round time down per the age-matched retention
    * precision, and aggregate values per (path, rounded time) with the
    * pattern's function.
    *
    * Determinism: values sum through a ×1e6 fixed-point BIGINT (exact,
    * merge-order-independent); avg divides the exact sum by the exact count
    * in one double expression; `any` is rendered as min (a deterministic
    * member of the group — the reference's `any` is merge-order-dependent,
    * which a re-runnable view must not be). One window + one exchange-
    * sharing aggregate — both shuffle on the (path, time) class of keys, so
    * the plan scales with path cardinality, not pattern count. */
  def graphiteFinal(df: DataFrame, path: String, time: String, value: String,
      version: String, patterns: Seq[GraphitePattern],
      nowEpochSec: Long): DataFrame = {
    require(patterns.nonEmpty && patterns.last.regexp.isEmpty,
      "last pattern must be the regexp-less default (Graphite.h:47)")
    require(patterns.init.forall(_.regexp.nonEmpty),
      "only the last pattern may omit the regexp")
    val w = Window.partitionBy(col(path), col(time)).orderBy(col(version).desc)
    val dedup = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val pi = patterns.init.zipWithIndex.foldRight(
      lit(patterns.length - 1): Column) { case ((p, i), acc) =>
      when(col(path).rlike(p.regexp.get), lit(i)).otherwise(acc)
    }
    val age = lit(nowEpochSec) -
      floor(unix_micros(col(time)) / lit(1000000.0)).cast("long")
    val prec = patterns.zipWithIndex.foldRight(lit(null).cast("long")) {
      case ((p, i), acc) =>
        val sched =
          if (p.retentions.isEmpty) lit(null).cast("long")
          else coalesce(p.retentions.sortBy(-_.age).map(r =>
            when(age >= r.age, lit(r.precision))): _*)
        when(col("__pi") === i, sched).otherwise(acc)
    }
    val rounded = when(col("__prec").isNull, col(time)).otherwise(
      timestamp_micros(
        floor(unix_micros(col(time)) / (col("__prec") * lit(1000000.0)))
          .cast("long") * col("__prec") * lit(1000000L)))
    val g = dedup
      .withColumn("__pi", pi)
      .withColumn("__prec", prec)
      .withColumn("__t", rounded)
      .groupBy(col(path), col("__pi"), col("__t"))
      .agg(sum(round(col(value) * 1000000).cast("long")).as("__s"),
        count(lit(1)).as("__n"),
        min(col(value)).as("__mn"), max(col(value)).as("__mx"))
    val rolled = patterns.zipWithIndex.foldRight(lit(null).cast("double")) {
      case ((p, i), acc) =>
        val v = p.function match {
          case "sum" => col("__s").cast("double") / lit(1000000.0)
          case "avg" =>
            col("__s").cast("double") / col("__n").cast("double") / lit(1000000.0)
          case "max" => col("__mx")
          case "min" | "any" => col("__mn")
          case other => throw new IllegalArgumentException(
            s"unsupported graphite rollup function: $other")
        }
        when(col("__pi") === i, v).otherwise(acc)
    }
    g.select(col(path), col("__t").as(time),
      round(rolled, 6).as(value))
  }
}
