package graft

import org.apache.spark.sql.functions.col

/** Delta NATIVE partitioned scans (round 16): the plain read lane
  * serves log-stored partitionValues through a
  * PartitionedListFileIndex instead of a broadcast join from
  * input_file_name(). Pins:
  *  - a partition predicate prunes FILES at planning time (the
  *    FileSourceScan numFiles metric drops);
  *  - the plan carries NO join for partition-column restoration;
  *  - values (incl. nulls and date-typed partitions) are identical to
  *    the oracle restatement;
  *  - DV-carrying tables keep the coordinate lane and stay correct. */
class DeltaPartitionPruneSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dpp_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scans(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  test("partition predicate prunes files at planning time; no join in " +
      "the plan; null partitions and date types restore correctly") {
    val dir = tmp("prune")
    try {
      val rows = (1L to 30L).map { i =>
        (i, s"n$i",
          if (i % 10 == 0) null
          else java.sql.Date.valueOf(s"2024-03-0${(i % 3) + 1}"))
      }
      DeltaLakeSink.append(rows.toDF("id", "name", "d"), dir,
        partitionBy = Seq("d"), checkpointInterval = 0)
      val all = DeltaLakeSource.read(spark, dir)
      // no join anywhere in the partition-restoration plan
      val planStr = all.queryExecution.executedPlan.toString
      assert(!planStr.contains("Join"),
        s"partition columns must restore inside the scan, got:\n$planStr")
      assert(all.count() == 30L)
      val totalFiles = all.inputFiles.length
      assert(totalFiles >= 4, s"4 partitions expected, got $totalFiles")
      // a partition predicate prunes files
      val one = DeltaLakeSource.read(spark, dir)
        .filter(col("d") === java.sql.Date.valueOf("2024-03-02"))
      one.collect()
      val numFiles = scans(one.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      assert(numFiles < totalFiles && numFiles >= 1,
        s"partition pruning: $numFiles of $totalFiles files")
      assert(one.count() ==
        rows.count(_._3 == java.sql.Date.valueOf("2024-03-02")))
      // null partition: IS NULL restores + prunes
      val nulls = DeltaLakeSource.read(spark, dir)
        .filter(col("d").isNull)
      nulls.collect()
      assert(nulls.count() == 3L)
      val nullFiles = scans(nulls.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      assert(nullFiles < totalFiles,
        s"null-partition pruning: $nullFiles of $totalFiles")
      // values identical to a full restatement
      val got = all.orderBy("id").as[(Long, String, java.sql.Date)]
        .collect().toSeq
      assert(got == rows.sortBy(_._1))
    } finally cleanup(dir)
  }

  test("a DV-carrying table keeps the coordinate lane and stays " +
      "correct; time travel still serves the pre-delete state") {
    val dir = tmp("dv")
    try {
      DeltaLakeSink.append(
        (1L to 20L).map(i => (i, if (i % 2 == 0) "e" else "o"))
          .toDF("id", "p"), dir, partitionBy = Seq("p"),
        checkpointInterval = 0)
      val (v1, n) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") % 5 === 0, checkpointInterval = 0)
      assert(n == 4L)
      val ids = DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == (1L to 20L).filterNot(_ % 5 == 0))
      // partition columns still restore on the DV lane — and (round
      // 17) the DV lane now PRUNES at planning time through the same
      // FileIndex, with no join in the plan: the _metadata-anchored
      // mask rides the pruned scan
      val evens = DeltaLakeSource.read(spark, dir)
        .filter(col("p") === "e").select("id").as[Long]
      val evenVals = evens.collect().sorted.toSeq
      assert(evenVals == Seq(2L, 4L, 6L, 8L, 12L, 14L, 16L, 18L))
      val planStr = evens.queryExecution.executedPlan.toString
      assert(!planStr.contains("Join"),
        s"the DV lane must not join for partition columns:\n$planStr")
      val total = DeltaLakeSource.read(spark, dir).inputFiles.length
      val dvScan = DeltaLakeSource.read(spark, dir)
        .filter(col("p") === "e")
      dvScan.collect()
      val numFiles = scans(dvScan.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      assert(numFiles < total && numFiles >= 1,
        s"DV-lane partition pruning: $numFiles of $total files")
      // pre-delete time travel rides the PLAIN (FileIndex) lane
      assert(DeltaLakeSource.read(spark, dir,
        versionAsOf = Some(v1 - 1)).count() == 20L)
    } finally cleanup(dir)
  }
}
