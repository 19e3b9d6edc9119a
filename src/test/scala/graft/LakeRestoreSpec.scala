package graft

import org.apache.spark.sql.functions.col

/** Point-in-time recovery (round 16): Delta RESTORE + Iceberg
  * ROLLBACK. Pins:
  *  - restore reverts content with ONE commit; history is preserved
  *    (pre-restore state still travels); re-adds echo DV descriptors
  *    and stats verbatim; a vacuumed target refuses loudly; a no-op
  *    restore commits nothing; CDF tables capture the restore's
  *    change rows (round 17 — re-adds as inserts, removes as deletes);
  *  - rollback re-points the current snapshot; newer snapshots stay
  *    travelable; a rolled-back-then-expired snapshot refuses. */
class LakeRestoreSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource, IcebergSink, IcebergSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lr_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("delta restore: content reverts in one commit, DV adds echo, " +
      "history preserved, vacuumed target refuses, no-op no-ops") {
    val dir = tmp("restore")
    try {
      DeltaLakeSink.append((1L to 20L).map(i => (i, s"n$i"))
        .toDF("id", "name"), dir, checkpointInterval = 0) // v0
      val (v1, _) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") % 5 === 0, checkpointInterval = 0) // v1: DV delete
      DeltaLakeSink.append(Seq((21L, "n21")).toDF("id", "name"), dir,
        checkpointInterval = 0) // v2
      val (v3, _) = DeltaLakeSink.delete(spark, dir, col("id") <= 3,
        checkpointInterval = 0) // v3: CoW delete
      val atV1 = DeltaLakeSource.read(spark, dir,
        versionAsOf = Some(v1)).select("id").as[Long]
        .collect().sorted.toSeq
      // restore to v1 through the dialect
      val res = graft.sql.ClickHouseSql.sql(spark,
        s"RESTORE TABLE FUNCTION deltaLake('$dir') TO VERSION $v1")
        .collect().head
      val v4 = res.getLong(0)
      assert(v4 == v3 + 1 && res.getLong(1) > 0 && res.getLong(2) > 0)
      val now = DeltaLakeSource.read(spark, dir).select("id").as[Long]
        .collect().sorted.toSeq
      assert(now == atV1, "the restored content must equal version v1")
      // the DV re-add carried its descriptor: masked rows stay absent
      assert(!now.exists(_ % 5 == 0))
      // history preserved: the pre-restore v3 state still travels
      val atV3 = DeltaLakeSource.read(spark, dir,
        versionAsOf = Some(v3)).select("id").as[Long]
        .collect().sorted.toSeq
      assert(!atV3.contains(1L) && atV3.contains(21L))
      // restoring to the version we are already at is a no-op
      assert(DeltaLakeSink.restore(spark, dir, v4) == ((v4, 0, 0)))
      // a vacuumed target refuses loudly: strand v3's files, vacuum,
      // then ask for them back
      DeltaLakeSink.restore(spark, dir, v3)
      DeltaLakeSink.restore(spark, dir, v1)
      DeltaLakeSink.vacuum(spark, dir, retentionMs = 0L)
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSink.restore(spark, dir, v3)
      }
      assert(e.getMessage.contains("unrecoverable"))
    } finally cleanup(dir)
  }

  test("delta restore on a CDF table CAPTURES its change rows (round " +
      "17 — the r16 refusal drops): re-adds serve as inserts, removes " +
      "as deletes, through table_changes") {
    val dir = tmp("cdf")
    try {
      DeltaLakeSink.append(Seq((1L, "a")).toDF("id", "name"), dir,
        checkpointInterval = 0) // v0
      val v1 = DeltaLakeSink.setTableProperties(spark, dir,
        Map("delta.enableChangeDataFeed" -> "true"))
      val v2 = DeltaLakeSink.append(Seq((2L, "b"), (3L, "c"))
        .toDF("id", "name"), dir, checkpointInterval = 0)
      // restore to v1 (state = just row 1): the v2 file removes
      val (v3, readded, removed) = DeltaLakeSink.restore(spark, dir, v1)
      assert(readded == 0 && removed >= 1 && v3 == v2 + 1)
      assert(DeltaLakeSource.read(spark, dir).count() == 1L)
      // the restore commit carries cdc actions — its removed rows
      // serve as deletes through table_changes
      val text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"$v3%020d.json"))
      assert(text.contains("\"cdc\""),
        s"the restore commit must capture change data: $text")
      import SparkTestBase.spark.implicits._
      val ch = DeltaLakeSource.readChanges(spark, dir, v3, Some(v3))
        .select("id", "name", "_change_type")
        .as[(Long, String, String)].collect().toSet
      assert(ch == Set((2L, "b", "delete"), (3L, "c", "delete")),
        s"got $ch")
      // restoring FORWARD (undo the restore) re-adds the file — its
      // rows serve as inserts
      val (v4, re2, rm2) = DeltaLakeSink.restore(spark, dir, v2)
      assert(re2 == removed && rm2 == 0)
      val ch2 = DeltaLakeSource.readChanges(spark, dir, v4, Some(v4))
        .select("id", "name", "_change_type")
        .as[(Long, String, String)].collect().toSet
      assert(ch2 == Set((2L, "b", "insert"), (3L, "c", "insert")),
        s"got $ch2")
      assert(DeltaLakeSource.read(spark, dir).count() == 3L)
    } finally cleanup(dir)
  }

  test("iceberg rollback: current snapshot re-points, newer stays " +
      "travelable, expired target refuses") {
    val dir = tmp("rb")
    try {
      val s1 = IcebergSink.append(Seq((1L, "a")).toDF("id", "name"), dir)
      val s2 = IcebergSink.append(Seq((2L, "b")).toDF("id", "name"), dir)
      assert(IcebergSource.read(spark, dir).count() == 2L)
      val mv = graft.sql.ClickHouseSql.sql(spark,
        s"ALTER TABLE FUNCTION iceberg('$dir') ROLLBACK TO SNAPSHOT $s1")
        .collect().head.getLong(0)
      assert(mv == 3L)
      assert(IcebergSource.read(spark, dir).count() == 1L,
        "the rolled-back current state is the first append")
      // the newer snapshot is still present and travelable
      assert(IcebergSource.read(spark, dir,
        snapshotId = Some(s2)).count() == 2L)
      // appends continue on top of the rolled-back state
      IcebergSink.append(Seq((3L, "c")).toDF("id", "name"), dir)
      assert(IcebergSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
      // expire, then roll back to a dropped snapshot: loud
      IcebergSink.expireSnapshots(spark, dir, keepLast = 1)
      val e = intercept[IllegalArgumentException] {
        IcebergSink.rollback(spark, dir, s2)
      }
      assert(e.getMessage.contains("not present"))
    } finally cleanup(dir)
  }
}
