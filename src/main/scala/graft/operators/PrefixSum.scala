package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running/moving sums — the scale-safe rendering of
  * `SUM(x) OVER (PARTITION BY p ORDER BY k ROWS ...)` when the PARTITION BY
  * key has tiny cardinality (reference: the streaming running-accumulator in
  * src/Processors/Transforms/MergeSortingTransform.h:18, which never funnels
  * a low-cardinality partition onto one thread).
  *
  * The naive Spark window serializes each partition value onto ONE task — a
  * 3-value key means 3 tasks at ANY data size (the round-3 q_win_running_sum
  * scale-killer). Here the ordering axis is cut into `buckets` contiguous
  * ranges by a DETERMINISTIC bucketing of the leading numeric order key
  * (`floor((k - min)/width)` — monotone, so bucket b's rows all precede
  * bucket b+1's in the window order and equal keys share a bucket). Then:
  *
  *   1. per-(bucket, p) local prefix sums — a window over buckets×|p| groups,
  *      fully parallel, one hash shuffle;
  *   2. per-(bucket, p) totals — map-side-combined aggregate, tiny output;
  *   3. cumulative carry-in offset per bucket — a window over the TINY totals
  *      table (buckets×|p| rows);
  *   4. broadcast-join offsets back and add.
  *
  * The big table is shuffled once; everything cross-bucket moves through the
  * broadcast offsets table. At 100 TB the plan is `buckets` parallel chains,
  * not |p| serial ones. Deterministic min/max bucketing (not
  * repartitionByRange) keeps the bucket id a pure column function, so no
  * sampling pass and the same row always lands in the same bucket.
  */
object PrefixSum {

  private def bucketed(
      df: DataFrame, leadKey: String, buckets: Int): (DataFrame, Column) = {
    val Array(lo, hi) = df.agg(
      min(col(leadKey).cast("double")), max(col(leadKey).cast("double")))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val width = math.max((hi - lo + 1.0) / buckets, 1e-9)
    (df.withColumn("__bucket",
      floor((col(leadKey).cast("double") - lit(lo)) / lit(width)).cast("int")),
      col("__bucket"))
  }

  /** Running sum: SUM(value) OVER (PARTITION BY partCols ORDER BY orderCols
    * ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), distributed over
    * `buckets` range chunks of the (non-null numeric) leading order key.
    * `orderCols` must start with `leadKey` and reach a total order. */
  def runningSum(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      leadKey: String,
      value: Column,
      out: String,
      buckets: Int): DataFrame = {
    val (withB, b) = bucketed(df, leadKey, buckets)
    val grp = b +: partCols.map(col)
    val local = Window.partitionBy(grp: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = withB.groupBy(grp: _*).agg(sum(value).as("__tot"))
    val carry = Window.partitionBy(partCols.map(col): _*).orderBy(b)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", sum(col("__tot")).over(carry))
      .drop("__tot")
    withB
      .withColumn("__loc", sum(value).over(local))
      .join(broadcast(offsets), "__bucket" +: partCols, "left")
      .withColumn(out, col("__loc") + coalesce(col("__off"), lit(0)))
      .drop("__bucket", "__loc", "__off")
  }

  /** Running AND trailing-frame sum in ONE plan — the form the bench query
    * needs. Chaining runningSum |> movingSum costs two extra full
    * materializations (movingSum re-buckets its input with a fresh min/max
    * action, and its multi-branch DAG recomputes the running-sum chain per
    * branch — the round-4 17s→84s bench pathology). Here:
    *
    *   - the moving sum is pure algebra over the running sum:
    *     mov_k(i) = R(i) - R(i-k), so no second aggregation pass;
    *   - R(i-k) crosses bucket starts via carried copies of each bucket's
    *     last k rows (tiny: buckets × |p| × k), so the lag window stays
    *     per-(bucket, p) — parallel, no low-cardinality serial window;
    *   - everything hangs off ONE bucketed shuffle in ONE action, so
    *     Catalyst's ReuseExchange computes the big shuffle once.
    */
  def runningAndMoving(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      leadKey: String,
      value: Column,
      frameRows: Int,
      runOut: String,
      movOut: String,
      buckets: Int): DataFrame = {
    val (withB, b) = bucketed(df, leadKey, buckets)
    val grp = b +: partCols.map(col)
    val local = Window.partitionBy(grp: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = withB.groupBy(grp: _*).agg(sum(value).as("__tot"))
    val carry = Window.partitionBy(partCols.map(col): _*).orderBy(b)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", sum(col("__tot")).over(carry))
      .drop("__tot")
    val run = withB
      .withColumn("__loc", sum(value).over(local))
      .join(broadcast(offsets), "__bucket" +: partCols, "left")
      .withColumn(runOut, col("__loc") + coalesce(col("__off"), lit(0)))
      .drop("__loc", "__off")
    // Carry candidates: each bucket's last `frameRows` rows per partition
    // value, WITH their running sums — the only lag targets any later
    // bucket's first rows can need. A destination bucket takes the last
    // `frameRows` among candidates from ANY earlier bucket (sparse buckets
    // may have to reach across several predecessors).
    val tail = Window.partitionBy(grp: _*).orderBy(orderCols.map(_.desc): _*)
    val candidates = run
      .withColumn("__rnd", row_number().over(tail))
      .filter(col("__rnd") <= frameRows)
      .drop("__rnd")
      .withColumnRenamed("__bucket", "__srcb")
    val dests = withB.groupBy(grp: _*).agg(count(lit(1)).as("__n"))
      .select((b.as("__dest") +: partCols.map(col)): _*)
    val pick = Window
      .partitionBy((col("__dest") +: partCols.map(col)): _*)
      .orderBy(orderCols.map(_.desc): _*)
    val carried = candidates
      .join(broadcast(dests), partCols)
      .filter(col("__srcb") < col("__dest"))
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") <= frameRows)
      .withColumn("__bucket", col("__dest"))
      .withColumn("__carry", lit(true))
      .drop("__srcb", "__dest", "__rk")
    val unioned = run.withColumn("__carry", lit(false)).unionByName(carried)
    val lagW = Window.partitionBy(grp: _*).orderBy(orderCols: _*)
    unioned
      .withColumn(movOut,
        col(runOut) - coalesce(lag(col(runOut), frameRows).over(lagW), lit(0)))
      .filter(!col("__carry"))
      .drop("__bucket", "__carry")
  }

  /** Moving sum over the trailing `frameRows` rows (ROWS frameRows-1
    * PRECEDING .. CURRENT ROW). Cross-bucket context is supplied by carrying
    * each bucket's LAST frameRows-1 rows into the NEXT bucket that holds rows
    * of the same partition value (a union of ~buckets×|p|×(frameRows-1)
    * rows), computing the window locally, then dropping the carried rows —
    * so the frame never reaches across tasks at execution time. */
  def movingSum(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      leadKey: String,
      value: Column,
      frameRows: Int,
      out: String,
      buckets: Int): DataFrame = {
    val (withB, b) = bucketed(df, leadKey, buckets)
    val grp = b +: partCols.map(col)
    val tail = Window.partitionBy(grp: _*).orderBy(orderCols.map(_.desc): _*)
    // Carry candidates: each bucket's last frameRows-1 rows per partition
    // value — the only rows any later bucket's frame can reach. Tiny
    // (buckets × |p| × (frameRows-1) rows). A destination bucket then takes
    // the last frameRows-1 among candidates from ANY earlier bucket (a
    // bucket can hold fewer than frameRows-1 rows of a value, so the carry
    // may have to reach across several source buckets).
    val candidates = withB
      .withColumn("__rnd", row_number().over(tail))
      .filter(col("__rnd") < frameRows)
      .drop("__rnd")
      .withColumnRenamed("__bucket", "__srcb")
    val dests = withB.groupBy(grp: _*).agg(count(lit(1)).as("__n"))
      .select((b.as("__dest") +: partCols.map(col)): _*)
    val pick = Window
      .partitionBy((col("__dest") +: partCols.map(col)): _*)
      .orderBy(orderCols.map(_.desc): _*)
    val carried = candidates
      .join(broadcast(dests), partCols)
      .filter(col("__srcb") < col("__dest"))
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") < frameRows)
      .withColumn("__bucket", col("__dest"))
      .withColumn("__carry", lit(true))
      .drop("__srcb", "__dest", "__rk")
    val unioned = withB.withColumn("__carry", lit(false))
      .unionByName(carried)
    val frame = Window.partitionBy(grp: _*).orderBy(orderCols: _*)
      .rowsBetween(-(frameRows - 1), Window.currentRow)
    unioned
      .withColumn(out, sum(value).over(frame))
      .filter(!col("__carry"))
      .drop("__bucket", "__carry")
  }
}
