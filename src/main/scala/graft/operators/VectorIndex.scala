package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{dot, l2norm}

/** Persisted IVF vector index — the reference's vector-similarity skip
  * index (src/Storages/MergeTree/MergeTreeIndexVectorSimilarity.cpp:1,
  * usearch HNSW) re-expressed as an inverted-file layout Spark can prune:
  * centroids + cell-partitioned vector assignments are written ONCE at
  * `create` and reused by every later `topK` — the per-query LSH/IVF
  * variants in LlmPipeline recompute their structure per query, which a
  * real user re-querying the same corpus never wants.
  *
  * Layout on disk (all parquet):
  *   indexDir/centroids/    (cid, cv: array<double>, cnrm)  — tiny
  *   indexDir/assignments/  cell=<cid>/...  (vec_id, v, nrm)
  *
  * The assignments are hive-partitioned BY CELL, so a query that probes
  * `nProbe` of `nCells` cells reads nProbe/nCells of the corpus — Spark's
  * PartitionFilters prune whole directories before listing files, the
  * same I/O shape as the reference skipping non-matching granules. At
  * 100 TB with 4096 cells and nProbe=8, a query touches ~0.2% of data.
  *
  * Centroids are the first `nCells` corpus vectors (deterministic seeds;
  * a production build k-means them — the layout and probe path are
  * identical either way).
  */
object VectorIndex {

  /** Float-array embeddings frame → (vec_id, v: array<double>, nrm). */
  def prep(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** Build and persist the index: pick centroids, assign every vector to
    * its best cell (one broadcast of the tiny centroid set + one window),
    * write assignments partitioned by cell. */
  def create(spark: SparkSession, embeddings: DataFrame, indexDir: String,
      nCells: Int = 16): Unit = {
    val e = prep(embeddings)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
    val scored = e.join(broadcast(cents), lit(true))
      .withColumn("csim",
        dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    scored.withColumn("__crn", row_number().over(wAssign))
      .filter(col("__crn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/assignments")
  }

  /** The nProbe best cells per query — (qid, qv, qnrm, cell). */
  private def probes(spark: SparkSession, indexDir: String,
      queries: DataFrame, nProbe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cid"))
    queries.join(broadcast(cents), lit(true))
      .withColumn("csim",
        dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm")))
      .withColumn("__crn", row_number().over(wProbe))
      .filter(col("__crn") <= nProbe)
      .select(col("qid"), col("qv"), col("qnrm"), col("cid").as("cell"))
  }

  /** Top-`k` cosine neighbors per query, reading ONLY the probed cells'
    * partitions of the persisted index (never the original corpus). The
    * probed-cell list is collected (bounded: |queries| × nProbe ints — a
    * partition-pruning decision, metadata not data) so the cell filter is
    * a plan-time literal Spark turns into PartitionFilters. */
  def topK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, nProbe: Int = 4): DataFrame = {
    val p = probes(spark, indexDir, queries, nProbe).localCheckpoint()
    val cells = p.select("cell").distinct().collect()
      .map(_.get(0).toString.toLong)
    val scan = spark.read.parquet(s"$indexDir/assignments")
      .filter(col("cell").isin(cells: _*))
    val cands = scan.join(p, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"),
        round(col("cos"), 6).as("cos"))
  }

  /** Streaming index maintenance (the reference's vector skip index is
    * likewise maintained per inserted part): each micro-batch of new
    * embeddings is assigned to its cell against the EXISTING centroids
    * and appended into the cell-partitioned layout — dynamic partition
    * append, only touched cells' directories gain files. Queries issued
    * after a batch see the new vectors with no rebuild. Returns the
    * running query (AvailableNow trigger drains a bounded backlog). */
  def appendStream(spark: SparkSession, stream: DataFrame, indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val e = prep(batch)
        val scored = e.join(broadcast(cents), lit(true))
          .withColumn("csim",
            dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))
        scored.withColumn("__crn", row_number().over(wAssign))
          .filter(col("__crn") === 1)
          .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
          .write.mode("append").partitionBy("cell")
          .parquet(s"$indexDir/assignments")
        ()
      }
      .start()
  }

  def drop(spark: SparkSession, indexDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(path, true)
  }
}
