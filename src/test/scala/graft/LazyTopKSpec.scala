package graft

import graft.operators.LazyTopK
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Lazy top-N materialization: the wide columns are read only for the k
  * winners — the narrow sort scan reads two columns, the fetch scan
  * carries a pushed IN filter. */
class LazyTopKSpec extends SparkFunSuite {

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan)
  }

  test("values equal the plain ORDER BY LIMIT; wide scan is IN-filtered") {
    val path = s"$sf/documents.parquet"
    val plain = spark.read.parquet(path)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(10)
      .select("doc_id", "n_chars", "text")
      .collect().map(_.toString).toSeq
    val lazyDf = LazyTopK.topK(spark, path, "doc_id", "n_chars",
      descending = true, k = 10, Seq("doc_id", "n_chars", "text"))
    assert(lazyDf.collect().map(_.toString).toSeq == plain)

    // the fetch scan pushes the winner IN-list down to parquet
    val fetch = scans(lazyDf)
    assert(fetch.nonEmpty)
    val pushed = fetch.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("In(doc_id"),
      s"winner keys not pushed to the wide scan: $pushed")
    assert(fetch.head.schema.fieldNames.contains("text"))
  }

  test("the narrow scan reads only the key and sort columns") {
    // reproduce stage 1's plan shape: key+sort select over the same path
    val path = s"$sf/documents.parquet"
    val narrow = spark.read.parquet(path)
      .select("doc_id", "n_chars")
      .orderBy(col("n_chars").desc).limit(10)
    narrow.collect()
    val s0 = scans(narrow)
    assert(s0.nonEmpty)
    val readSchema = s0.head.schema.fieldNames.toSet
    assert(readSchema == Set("doc_id", "n_chars"),
      s"narrow scan read more than key+sort: $readSchema")
  }
}
