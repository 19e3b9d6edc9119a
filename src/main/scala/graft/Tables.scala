package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Table catalog over the driver-generated parquet corpus.
  *
  * Mirrors the reference's session-local table registry
  * (`src/Interpreters/DatabaseCatalog` semantics, engine = MergeTree reads)
  * as plain partition-prunable parquet scans: `spark.read.parquet` gives us
  * columnar vectorized reads, predicate pushdown, and row-group min/max
  * pruning — the Spark analog of MergeTree granule pruning
  * (reference: src/Storages/MergeTree/MergeTreeDataSelectExecutor.h:20).
  *
  * At cluster scale the same API reads a partitioned directory tree
  * (PARTITION BY date-ish expr → hive-style dirs), so nothing here is
  * local-mode specific.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Remember which (session, dir) pairs are already registered so repeated
  // query invocations don't re-derive schemas from footers.
  private val registered = TrieMap.empty[(String, String), Boolean]

  /** Register every corpus table of `dir` as a temp view (idempotent). */
  def register(spark: SparkSession, dir: String): Unit = {
    val key = (spark.sparkContext.applicationId + "#" + spark.hashCode(), dir)
    registered.getOrElseUpdate(key, {
      names.foreach { n =>
        load(spark, dir, n).createOrReplaceTempView(n)
      }
      true
    })
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright. Read it as raw nanos and truncate to
      // microseconds — the same ns→µs truncation DuckDB applies when casting
      // TIMESTAMP_NS to TIMESTAMP, so oracle comparisons line up.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
