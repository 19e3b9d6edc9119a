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
}
