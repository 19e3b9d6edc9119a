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

  /** Hash of `value` cast to the indexed column's own type — the build
    * side hashes XxHash64 over the COLUMN type, so an Int probe against a
    * Long column (or a date string against a DateType column) must land
    * on the same lane or every file is silently excluded. */
  private def hashOfTyped(value: Any, dt: org.apache.spark.sql.types.DataType): Long = {
    val lit = Literal(value)
    val typed: org.apache.spark.sql.catalyst.expressions.Expression =
      if (lit.dataType == dt) lit
      else org.apache.spark.sql.catalyst.expressions.Cast(lit, dt, Some("UTC"))
    XxHash64(Seq(typed), 42L).eval(InternalRow.empty).asInstanceOf[Long]
  }

  /** The indexed column's stored type, when the index recorded it. */
  private def indexedType(spark: SparkSession, indexDir: String,
      column: String): Option[org.apache.spark.sql.types.DataType] = {
    val df = spark.read.parquet(indexDir)
    if (!df.columns.contains("dtype")) None
    else df.filter(col("column") === column).select("dtype")
      .limit(1).collect().headOption
      .map(r => org.apache.spark.sql.types.DataType.fromDDL(r.getString(0)))
  }

  /** Hash lane for an already-typed literal (internal representation) —
    * the path the transparent pruning rule uses. */
  private[graft] def hashOfLiteral(lit: Literal): Long =
    XxHash64(Seq(lit), 42L).eval(InternalRow.empty).asInstanceOf[Long]

  /** Files whose bloom for `column` might contain ANY of the given
    * pre-computed hashes. */
  private[graft] def matchingFilesByHash(spark: SparkSession, indexDir: String,
      column: String, hashes: Seq[Long]): Seq[String] =
    spark.read.parquet(indexDir)
      .filter(col("column") === column)
      .select("file", "bloom").collect()
      .filter { r =>
        val bf = BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        hashes.exists(bf.mightContainLong)
      }
      .map(_.getString(0)).toSeq

  /** Index `columns` of every parquet part file under `dataDir`. Each row
    * records the column's data type so probes can cast to the build lane
    * ([[hashOfTyped]]). */
  def create(spark: SparkSession, dataDir: String, indexDir: String,
             columns: Seq[String], expectedItemsPerFile: Long = 100000L): Unit = {
    val src = spark.read.parquet(dataDir)
    val types = columns.map(c => c -> src.schema(c).dataType.sql).toMap
    val data = src
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
        lit(types(c)).as("dtype"),
        col("__n").as("n_items"), col(s"__bloom_$c").as("bloom"))
    }.reduce(_ unionAll _)
    long.coalesce(1).write.mode("overwrite").parquet(indexDir)
  }

  /** Files whose bloom for `column` might contain ANY of `values` —
    * probes are cast to the indexed column's recorded type first. */
  def matchingFiles(spark: SparkSession, indexDir: String,
                    column: String, values: Seq[Any]): Seq[String] = {
    val dt = indexedType(spark, indexDir, column)
    val hashes = dt match {
      case Some(t) => values.map(hashOfTyped(_, t))
      case None => values.map(hashOf)
    }
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
      else spark.read.option("basePath", dataDir)
        .schema(full.schema).parquet(files: _*)
    pruned.filter(col(column).isin(values: _*))
  }

  def drop(spark: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  // ------------------------------------------------------ minmax variant

  /** Per-file min/max index (the reference's `INDEX x TYPE minmax` —
    * MergeTreeIndexMinMax.cpp). Parquet already prunes ROW GROUPS from
    * footer stats, but at 100 TB the win is never LISTING the file into a
    * task at all: the driver consults |files| rows instead of opening
    * footers. */
  def createMinMax(spark: SparkSession, dataDir: String, indexDir: String,
                   columns: Seq[String]): Unit = {
    val data = spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("__file") +: columns.map(col): _*)
    val aggs = columns.flatMap { c =>
      // try_cast on the double lane: string columns (prefix pruning rides
      // the string lane) would throw under ANSI on a plain cast
      Seq(min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"),
        expr(s"try_cast(min($c) as double)").as(s"__mnd_$c"),
        expr(s"try_cast(max($c) as double)").as(s"__mxd_$c"))
    }
    val perFile = data.groupBy("__file").agg(aggs.head, aggs.tail: _*)
    columns.map { c =>
      perFile.select(col("__file").as("file"), lit(c).as("column"),
        col(s"__mn_$c").as("min_s"), col(s"__mx_$c").as("max_s"),
        col(s"__mnd_$c").as("min_d"), col(s"__mxd_$c").as("max_d"))
    }.reduce(_ unionAll _)
      .coalesce(1).write.mode("overwrite").parquet(indexDir)
  }

  /** Files whose [min,max] for `column` overlaps [lo,hi]. Numeric and
    * timestamp probes compare on the double lane, everything else
    * lexicographically on the string lane (valid for the corpus's string
    * categories). */
  def matchingFilesRange(spark: SparkSession, indexDir: String, column: String,
                         lo: Any, hi: Any): Seq[String] =
    matchingFilesBound(spark, indexDir, column, Some(lo), Some(hi))

  /** One-sided/two-sided minmax probe: files whose [min,max] can hold a
    * value satisfying `x >= lo` and/or `x <= hi` — the transparent rule's
    * rendering of >, >=, <, <=, =, BETWEEN conjuncts. */
  def matchingFilesBound(spark: SparkSession, indexDir: String, column: String,
                         lo: Option[Any], hi: Option[Any]): Seq[String] = {
    def dlane(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case t: java.sql.Timestamp => Some(t.getTime / 1000.0)
      case t: java.time.Instant => Some(t.toEpochMilli / 1000.0)
      case _ => None
    }
    val idx = spark.read.parquet(indexDir).filter(col("column") === column)
    val preds = Seq(
      lo.map(v => dlane(v).map(d => col("max_d") >= d)
        .getOrElse(col("max_s") >= v.toString)),
      hi.map(v => dlane(v).map(d => col("min_d") <= d)
        .getOrElse(col("min_s") <= v.toString))).flatten
    idx.filter(preds.reduceOption(_ && _).getOrElse(lit(true)))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range scan over the minmax-pruned file list, exact predicate
    * re-applied. */
  def scanRange(spark: SparkSession, dataDir: String, indexDir: String,
                column: String, lo: Any, hi: Any): DataFrame = {
    val files = matchingFilesRange(spark, indexDir, column, lo, hi)
    val full = spark.read.parquet(dataDir)
    val pruned =
      if (files.isEmpty) full.limit(0)
      else spark.read.option("basePath", dataDir)
        .schema(full.schema).parquet(files: _*)
    pruned.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  // --------------------------------------------------------- set variant

  /** Per-file exact distinct-value set, capped — the reference's
    * `INDEX x TYPE set(N)` (MergeTreeIndexSet.cpp): when a file's distinct
    * count for the column stays ≤ N the exact set is stored (membership
    * pruning with NO false positives); past the cap the file stores an
    * overflow marker and always matches, exactly the reference's
    * max_rows=N behavior. Values ride as strings for schema uniformity. */
  def createSet(spark: SparkSession, dataDir: String, indexDir: String,
                columns: Seq[String], maxValues: Int = 100): Unit = {
    val data = spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("__file") +: columns.map(col): _*)
    val aggs = columns.map { c =>
      collect_set(col(c).cast("string")).as(s"__set_$c")
    }
    val perFile = data.groupBy("__file").agg(aggs.head, aggs.tail: _*)
    columns.map { c =>
      perFile.select(col("__file").as("file"), lit(c).as("column"),
        when(size(col(s"__set_$c")) <= maxValues, col(s"__set_$c"))
          .otherwise(lit(null)).as("values"))
    }.reduce(_ unionAll _)
      .coalesce(1).write.mode("overwrite").parquet(indexDir)
  }

  /** Files whose stored set contains ANY of `values` (overflowed files
    * always match). */
  def matchingFilesSet(spark: SparkSession, indexDir: String,
                       column: String, values: Seq[Any]): Seq[String] = {
    val probe = values.map(String.valueOf)
    spark.read.parquet(indexDir)
      .filter(col("column") === column)
      .filter(col("values").isNull ||
        arrays_overlap(col("values"), lit(probe.toArray)))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Membership scan over the set-index-pruned file list. */
  def scanSet(spark: SparkSession, dataDir: String, indexDir: String,
              column: String, values: Seq[Any]): DataFrame = {
    val files = matchingFilesSet(spark, indexDir, column, values)
    val full = spark.read.parquet(dataDir)
    val pruned =
      if (files.isEmpty) full.limit(0)
      else spark.read.option("basePath", dataDir)
        .schema(full.schema).parquet(files: _*)
    pruned.filter(col(column).isin(values: _*))
  }

  // ----------------------------------------------------- ngrambf variant

  /** Per-file n-gram bloom for substring/LIKE pruning — the reference's
    * `ngrambf_v1` text skip index (MergeTreeIndexBloomFilterText.cpp).
    * Build explodes each row's lowercased text into distinct n-grams (one
    * distributed pass, the same work the reference spends per granule);
    * a needle can only match a file whose bloom holds EVERY gram of the
    * needle. */
  def createNgram(spark: SparkSession, dataDir: String, indexDir: String,
                  textColumn: String, n: Int = 3,
                  expectedItemsPerFile: Long = 200000L): Unit = {
    val grams = spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("__file"), lower(col(textColumn)).as("__t"))
      .select(col("__file"), explode(expr(
        // sequence(1, 0) is DESCENDING in Spark — guard short rows explicitly
        s"CASE WHEN length(__t) >= $n THEN transform(sequence(1, length(__t) - ${n - 1}), " +
          s"i -> substring(__t, i, $n)) ELSE array() END"))
        .as("gram"))
      .distinct()
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(ExprColumn.expression(col("gram"))), 42L),
      Literal(expectedItemsPerFile), Literal(expectedItemsPerFile * 8))
      .toAggregateExpression()
    grams.groupBy("__file")
      .agg(ExprColumn.column(agg).as("bloom"), count(lit(1)).as("n_items"))
      .select(col("__file").as("file"), lit(n).as("n"), col("n_items"), col("bloom"))
      .coalesce(1).write.mode("overwrite").parquet(indexDir)
  }

  /** Files that can contain `needle` as a substring of the indexed text
    * (every n-gram of the lowercased needle in the file's bloom). Needles
    * shorter than n admit every file — same degradation as the reference. */
  def matchingFilesLike(spark: SparkSession, indexDir: String,
                        needle: String): Seq[String] = {
    val rows = spark.read.parquet(indexDir)
      .select("file", "n", "bloom").collect()
    rows.filter { r =>
      val n = r.getAs[Int]("n")
      val low = needle.toLowerCase
      if (low.length < n) true
      else {
        val bf = BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        (0 to low.length - n).forall(i => bf.mightContainLong(hashOf(low.substring(i, i + n))))
      }
    }.map(_.getString(0)).toSeq
  }

  /** Case-insensitive substring scan via the ngram index (the pruned
    * rendering of `LIKE '%needle%'` / hasTokenCaseInsensitive). */
  def scanLike(spark: SparkSession, dataDir: String, indexDir: String,
               textColumn: String, needle: String): DataFrame = {
    val files = matchingFilesLike(spark, indexDir, needle)
    val full = spark.read.parquet(dataDir)
    val pruned =
      if (files.isEmpty) full.limit(0)
      else spark.read.option("basePath", dataDir)
        .schema(full.schema).parquet(files: _*)
    pruned.filter(lower(col(textColumn)).contains(needle.toLowerCase))
  }
}
