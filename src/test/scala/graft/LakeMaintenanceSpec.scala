package graft

import org.apache.spark.sql.functions.col

/** Round-16 maintenance-verb completion: Delta VACUUM and Hudi CLEAN —
  * the storage-reclaim twins of Iceberg's expire_snapshots (which
  * round 16 also added). Pins:
  *  - VACUUM deletes only files the CURRENT snapshot does not
  *    reference AND older than the retention window; referenced files,
  *    the log dir, and young files survive; reads identical after;
  *    time travel needing a vacuumed file is loud at scan; DV bins of
  *    live adds survive while replaced ones collect;
  *  - CLEAN retains the newest N visible slices per file group,
  *    deletes older slices + their attached logs; reads identical
  *    after; a `clean` timeline instant completes and does not gate
  *    data visibility. */
class LakeMaintenanceSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource, HudiSink, HudiSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lm_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("delta vacuum: unreferenced + old deletes, referenced/young/log " +
      "survive, reads identical, stale time travel is loud") {
    val dir = tmp("vac")
    try {
      DeltaLakeSink.append((1L to 20L).map(i => (i, s"n$i"))
        .toDF("id", "name"), dir, checkpointInterval = 0)
      // a DV delete writes a bin; a CoW update strands the old files
      val (_, nDv) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") % 10 === 0, checkpointInterval = 0)
      assert(nDv == 2L)
      // compaction materializes the DVs away → the bin + old parquet
      // files become unreferenced
      val (vComp, before, after) = DeltaLakeSink.compact(spark, dir,
        checkpointInterval = 0)
      assert(before >= after)
      val expect = DeltaLakeSource.read(spark, dir)
        .orderBy("id").as[(Long, String)].collect().toSeq
      // retention guard: everything is young, so a default vacuum
      // deletes NOTHING
      assert(DeltaLakeSink.vacuum(spark, dir) == ((0, 0L)))
      // retention 0 collects the stranded files (the old parquet +
      // the DV bin), never the live ones or the log
      val files0 = new java.io.File(dir).listFiles.map(_.getName)
      assert(files0.exists(_.startsWith("deletion_vector_")))
      val (deleted, bytes) = DeltaLakeSink.vacuum(spark, dir,
        retentionMs = 0L)
      assert(deleted > 0 && bytes > 0L, s"got ($deleted, $bytes)")
      val files1 = new java.io.File(dir).listFiles.map(_.getName)
      assert(!files1.exists(_.startsWith("deletion_vector_")),
        "the DV bin is unreferenced after compaction — must collect")
      assert(files1.contains("_delta_log"))
      val got = DeltaLakeSource.read(spark, dir)
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(got == expect, "the current read must be unchanged")
      // time travel to the pre-compaction version now hits missing
      // files — loud at scan, the protocol's documented vacuum trade
      val loud = scala.util.Try(DeltaLakeSource.read(spark, dir,
        versionAsOf = Some(vComp - 1)).collect())
      assert(loud.isFailure)
      // the dialect verb reports (files, bytes)
      val viaSql = graft.sql.ClickHouseSql.sql(spark,
        s"OPTIMIZE TABLE FUNCTION deltaLake('$dir') VACUUM " +
          "RETAIN 0 HOURS").collect().head
      assert(viaSql.getLong(0) == 0L, "nothing left to collect")
    } finally cleanup(dir)
  }

  test("delta vacuum ages by the REMOVE action's deletionTimestamp — " +
      "an old file removed moments ago survives default retention " +
      "(round 17 ADVICE)") {
    val dir = tmp("vacage")
    try {
      DeltaLakeSink.append((1L to 10L).map(i => (i, s"n$i"))
        .toDF("id", "name"), dir, checkpointInterval = 0)
      // backdate every data file far past any retention window — an
      // mtime-gated vacuum would collect them the instant they
      // unreference
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val old = System.currentTimeMillis() - 30L * 24 * 3600 * 1000
      new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => fs.setTimes(new org.apache.hadoop.fs.Path(
          f.getPath), old, -1))
      // compact NOW: the backdated files unreference with a fresh
      // deletionTimestamp
      DeltaLakeSink.compact(spark, dir, checkpointInterval = 0)
      // default retention: nothing may collect — concurrent readers
      // and time travel within the window are protocol-promised safe
      assert(DeltaLakeSink.vacuum(spark, dir) == ((0, 0L)),
        "files removed within retention must survive regardless of age")
      // the pre-compaction version still travels
      assert(DeltaLakeSource.read(spark, dir, versionAsOf = Some(0L))
        .count() == 10L)
      // zero retention still collects them (removal predates the cutoff)
      val (deleted, _) = DeltaLakeSink.vacuum(spark, dir,
        retentionMs = 0L)
      assert(deleted > 0)
    } finally cleanup(dir)
  }

  test("hudi clean: keeps the newest N visible slices per group, " +
      "deletes older slices + their logs, reads identical") {
    val dir = tmp("clean")
    try {
      val df = (1L to 8L).map(i => (s"k$i", i, s"a$i"))
        .toDF("_hoodie_record_key", "id", "v")
      HudiSink.upsert(df, dir)
      HudiSink.upsert(Seq(("k1", 1L, "UPD1"), ("k3", 3L, "UPD3"))
        .toDF("_hoodie_record_key", "id", "v"), dir)
      // compaction creates second slices per log-bearing group
      val (_, g) = HudiSink.compact(spark, dir)
      assert(g > 0)
      val expect = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      val logsBefore = new java.io.File(dir).listFiles.map(_.getName)
        .count(n => n.contains(".log.") && !n.endsWith(".crc"))
      assert(logsBefore > 0)
      val (bases, logs) = HudiSink.clean(spark, dir, keepSlices = 1)
      assert(bases == g && logs == logsBefore,
        s"expected ($g, $logsBefore), got ($bases, $logs)")
      val got = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(got == expect)
      // a clean instant completed and does not gate visibility
      assert(new java.io.File(dir, ".hoodie").listFiles
        .exists(n => n.getName.endsWith(".clean") &&
          !n.getName.contains("inflight")))
      // cleaning again is a no-op; the dialect verb reports counts
      val viaSql = graft.sql.ClickHouseSql.sql(spark,
        s"OPTIMIZE TABLE FUNCTION hudi('$dir') CLEAN KEEP 1")
        .collect().head
      assert(viaSql.getLong(0) == 0L && viaSql.getLong(1) == 0L)
    } finally cleanup(dir)
  }

  test("hudi partitioned COW reads prune files at planning time " +
      "(round 16): after compact + clean the hive layout scans through " +
      "the PartitionedListFileIndex") {
    val dir = tmp("hprune")
    try {
      val d = (1L to 24L).map(i =>
        (s"k$i", i, s"a$i", (i % 4).toString))
        .toDF("_hoodie_record_key", "id", "v", "p")
      HudiSink.upsert(d, dir, partitionBy = Seq("p"))
      HudiSink.upsert(Seq(("k4", 4L, "UPD", "0"))
        .toDF("_hoodie_record_key", "id", "v", "p"), dir)
      HudiSink.compact(spark, dir)
      HudiSink.clean(spark, dir, keepSlices = 1)
      val expect = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(expect("k4") == "UPD" && expect.size == 24)
      // the log-free partitioned read rides the FileIndex: a partition
      // predicate prunes files
      val all = HudiSource.read(spark, dir)
      val totalFiles = all.inputFiles.length
      assert(totalFiles >= 4, s"4 partitions expected, got $totalFiles")
      val one = HudiSource.read(spark, dir).filter(col("p") === "1")
      one.collect()
      def scans(pl: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        pl match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => scans(q.plan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(s)
          case other => other.children.flatMap(scans)
        }
      val numFiles = scans(one.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      assert(numFiles < totalFiles && numFiles >= 1,
        s"hudi partition pruning: $numFiles of $totalFiles files")
      assert(one.select("id").as[Long].collect().sorted.toSeq ==
        (1L to 24L).filter(_ % 4 == 1))
      // values identical to the pre-clean merge result
      val got = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(got == expect)
    } finally cleanup(dir)
  }
}
