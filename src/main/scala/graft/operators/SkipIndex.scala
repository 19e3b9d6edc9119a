package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn
import org.apache.spark.util.sketch.BloomFilter

/** Generic per-file bloom skip index for equality predicates — the analog
  * of the reference's `INDEX x TYPE bloom_filter GRANULARITY n` skip index
  * (src/Storages/MergeTree/MergeTreeIndexBloomFilter.cpp); the minmax
  * member of the family is parquet row-group statistics (free), the text
  * member is [[TextIndex]].
  *
  * Build: ONE distributed pass over the data dir — rows group by
  * `_metadata.file_path`, one [[BloomFilterAggregate]] per indexed column
  * (map-side partial blooms, OR-merged) — and the index lands as a tiny
  * parquet of (file, column, n_items, bloom) rows. Probe: the index is
  * driver-resident (|files| × |columns| rows), `mightContainLong` on the
  * same xxhash64(seed=42) lane the build used, then ONLY matching files
  * are scanned, with the exact predicate re-applied (bloom false
  * positives re-checked; no false negatives). Like the reference, the
  * index only prunes when the layout clusters the column — write with
  * `repartitionByRange`/`partitionBy` on the indexed key.
  */
object SkipIndex {

  private def hashOf(value: Any): Long = {
    val lit = Literal(value)
    XxHash64(Seq(lit), 42L).eval(InternalRow.empty).asInstanceOf[Long]
  }

  /** Index `columns` of every parquet part file under `dataDir`. */
  def create(spark: SparkSession, dataDir: String, indexDir: String,
             columns: Seq[String], expectedItemsPerFile: Long = 100000L): Unit = {
    val data = spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("__file") +: columns.map(col): _*)
    val aggs = columns.map { c =>
      val agg = new BloomFilterAggregate(
        XxHash64(Seq(ExprColumn.expression(col(c))), 42L),
        Literal(expectedItemsPerFile), Literal(expectedItemsPerFile * 8))
        .toAggregateExpression()
      ExprColumn.column(agg).as(s"__bloom_$c")
    } :+ count(lit(1)).as("__n")
    val perFile = data.groupBy("__file").agg(aggs.head, aggs.tail: _*)
    val long = columns.map { c =>
      perFile.select(col("__file").as("file"), lit(c).as("column"),
        col("__n").as("n_items"), col(s"__bloom_$c").as("bloom"))
    }.reduce(_ unionAll _)
    long.coalesce(1).write.mode("overwrite").parquet(indexDir)
  }

  /** Files whose bloom for `column` might contain ANY of `values`. */
  def matchingFiles(spark: SparkSession, indexDir: String,
                    column: String, values: Seq[Any]): Seq[String] = {
    val hashes = values.map(hashOf)
    spark.read.parquet(indexDir)
      .filter(col("column") === column)
      .select("file", "bloom").collect()
      .filter { r =>
        val bf = BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        hashes.exists(bf.mightContainLong)
      }
      .map(_.getString(0)).toSeq
  }

  /** Pruned scan: only bloom-matching files are read; the exact equality
    * predicate re-checks, so the result equals the full scan. Returns an
    * empty (correctly-typed) frame when no file can match. */
  def scan(spark: SparkSession, dataDir: String, indexDir: String,
           column: String, values: Seq[Any]): DataFrame = {
    val files = matchingFiles(spark, indexDir, column, values)
    val full = spark.read.parquet(dataDir)
    val pruned =
      if (files.isEmpty) full.limit(0)
      else spark.read.schema(full.schema).parquet(files: _*)
    pruned.filter(col(column).isin(values: _*))
  }

  def drop(spark: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
