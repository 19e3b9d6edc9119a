package graft

import org.apache.spark.sql.functions.col

/** Hudi WRITE support (round 14 — beyond the reference, which is
  * read-only on Hudi): merge-on-read upserts (log data blocks per
  * affected file group, written by executors; new keys become fresh
  * base groups), lightweight deletes (delete blocks), and the timeline
  * state machine (requested → inflight → completed; a crash before
  * completion leaves a PENDING instant the timeline-aware reader
  * refuses to serve). */
class HudiSinkSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{HudiSink, HudiSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_hsink_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def df(rows: Seq[(String, Long, String)]) =
    rows.toDF("_hoodie_record_key", "id", "v")

  test("create + upsert + delete roundtrip: updates land as log blocks " +
      "in the right group, inserts as a new base group, deletes drop " +
      "keys; base files never rewrite") {
    val dir = tmp("rt")
    try {
      // create: all inserts
      val (i1, n1) = HudiSink.upsert(
        df((1L to 6L).map(i => (s"k$i", i, s"a$i"))), dir)
      assert(n1 == 6L && i1.length == 17)
      val bases0 = new java.io.File(dir).listFiles.map(_.getName)
        .filter(_.endsWith(".parquet")).toSet
      // round 15: inserts write DISTRIBUTED — one base group per
      // non-empty staged part, so a multi-partition create yields
      // MULTIPLE file groups (the r14 coalesce(1) single-task funnel
      // is gone); empty shuffle partitions are skipped
      assert(bases0.size > 1, s"expected multi-group create, got $bases0")
      assert(HudiSource.read(spark, dir).count() == 6L)
      // upsert: k1/k2 update (log blocks), k9 inserts (new base group)
      val (_, n2) = HudiSink.upsert(
        df(Seq(("k1", 1L, "UPD1"), ("k2", 2L, "UPD2"), ("k9", 9L, "NEW"))),
        dir)
      assert(n2 == 3L)
      val bases1 = new java.io.File(dir).listFiles.map(_.getName)
        .filter(_.endsWith(".parquet")).toSet
      assert(bases0.subsetOf(bases1) && bases1.size == bases0.size + 1,
        "updates must NOT rewrite the base; a 1-key insert adds ONE group")
      assert(new java.io.File(dir).listFiles.map(_.getName)
        .exists(_.contains(".log.")), "updates must land as log files")
      val got = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(got("k1") == "UPD1" && got("k2") == "UPD2" &&
        got("k9") == "NEW" && got("k3") == "a3" && got.size == 7)
      // lightweight delete via the dialect lane
      val del = graft.sql.ClickHouseSql.sql(spark,
        s"DELETE FROM FUNCTION hudi('$dir') WHERE id % 2 = 0")
        .collect().head
      assert(del.getLong(1) == 3L) // k2, k4, k6
      val after = HudiSource.read(spark, dir)
        .select("_hoodie_record_key").as[String].collect().toSet
      assert(after == Set("k1", "k3", "k5", "k9"))
      assert(new java.io.File(dir).listFiles.map(_.getName)
        .filter(_.endsWith(".parquet")).toSet == bases1,
        "deletes must not rewrite base files")
      // dialect INSERT = upsert
      val up = graft.sql.ClickHouseSql.sql(spark,
        s"INSERT INTO FUNCTION hudi('$dir') " +
          "SELECT 'k3' AS _hoodie_record_key, 3 AS id, 'UPD3' AS v")
        .collect().head
      assert(up.getLong(1) == 1L)
      assert(HudiSource.read(spark, dir)
        .where(col("_hoodie_record_key") === "k3")
        .select("v").as[String].collect().head == "UPD3")
    } finally cleanup(dir)
  }

  test("streaming chunked log writes: a skewed group splits into " +
      "multiple blocks, delete keys never collect to the driver whole, " +
      "and concurrent-commit log names can never collide") {
    val dir = tmp("chunks")
    val (oldRows, oldKeys) =
      (graft.sources.HudiSink.ChunkRows, graft.sources.HudiSink.DeleteChunkKeys)
    try {
      // shrink the chunk bounds so the streaming path MUST emit several
      // blocks per group — pins the bounded-buffer lane end-to-end
      graft.sources.HudiSink.ChunkRows = 7
      graft.sources.HudiSink.DeleteChunkKeys = 5
      val (_, n1) = HudiSink.upsert(
        df((1L to 40L).map(i => (f"k$i%03d", i, s"a$i"))), dir)
      assert(n1 == 40L)
      // update EVERY key: each group's log is written in 7-row chunks
      val (i2, n2) = HudiSink.upsert(
        df((1L to 40L).map(i => (f"k$i%03d", i, s"U$i"))), dir)
      assert(n2 == 40L)
      val logs = new java.io.File(dir).listFiles.map(_.getName)
        .filter(n => n.contains(".log.") && !n.endsWith(".crc")).toSeq
      assert(logs.nonEmpty)
      // concurrent-commit safety (r14 ADVICE medium): every log name
      // carries its commit instant as the write token, so two commits
      // computing the same next version can never claim the same name
      assert(logs.forall(_.matches(".*\\.log\\.[0-9]+_[0-9]{17}$")),
        s"log names must embed the commit instant token: $logs")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val multiBlock = logs.filter { n =>
        val bytes = {
          val in = fs.open(new org.apache.hadoop.fs.Path(dir, n))
          try in.readAllBytes() finally in.close()
        }
        graft.sources.HudiLogFormat.readLogFile(bytes)
          .count(_.instant == i2) > 7
      }
      assert(multiBlock.nonEmpty,
        "at least one group must have split its update into >1 chunk")
      assert(HudiSource.read(spark, dir)
        .where(col("v").startsWith("U")).count() == 40L)
      // chunked delete blocks (5 keys per block), executor-written
      val (_, nd) = HudiSink.deleteWhere(spark, dir, col("id") <= 33L)
      assert(nd == 33L)
      assert(HudiSource.read(spark, dir).count() == 7L)
    } finally {
      graft.sources.HudiSink.ChunkRows = oldRows
      graft.sources.HudiSink.DeleteChunkKeys = oldKeys
      cleanup(dir)
    }
  }

  test("a crash before completion leaves a pending instant the reader " +
      "refuses to serve; loud gates: missing key column, partitioned " +
      "layout, missing base columns") {
    val dir = tmp("crash")
    try {
      HudiSink.upsert(df(Seq(("k1", 1L, "a"), ("k2", 2L, "b"))), dir)
      HudiSink.completeFailpoint = () =>
        throw new RuntimeException("simulated crash before completion")
      val e0 = try intercept[RuntimeException] {
        HudiSink.upsert(df(Seq(("k1", 1L, "CRASHED"))), dir)
      } finally HudiSink.completeFailpoint = () => ()
      assert(e0.getMessage.contains("simulated"))
      // the pending deltacommit's log block must be INVISIBLE
      val v = HudiSource.read(spark, dir)
        .where(col("_hoodie_record_key") === "k1")
        .select("v").as[String].collect().head
      assert(v == "a", "a pending instant's blocks must not serve")
      // a later completed upsert still works and wins
      HudiSink.upsert(df(Seq(("k1", 1L, "GOOD"))), dir)
      assert(HudiSource.read(spark, dir)
        .where(col("_hoodie_record_key") === "k1")
        .select("v").as[String].collect().head == "GOOD")
      val e1 = intercept[IllegalArgumentException] {
        HudiSink.upsert(Seq((1L, "x")).toDF("id", "v"), dir)
      }
      assert(e1.getMessage.contains("_hoodie_record_key"))
      val e2 = intercept[IllegalArgumentException] {
        HudiSink.upsert(df(Seq(("k1", 1L, "x"))).drop("v")
          .withColumn("w", col("id")), dir)
      }
      assert(e2.getMessage.contains("lacks base columns"))
      // a base file under a NON-hive-style dir: inserts cannot be
      // routed — loud, not silently misplaced (round 15: hive-style
      // partitioned layouts are first-class, arbitrary dirs are not)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val aBase = new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).head
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "oops"))
      fs.rename(new org.apache.hadoop.fs.Path(aBase.getPath),
        new org.apache.hadoop.fs.Path(s"$dir/oops/${aBase.getName}"))
      val e3 = intercept[IllegalArgumentException] {
        HudiSink.upsert(df(Seq(("zz", 99L, "x"))), dir)
      }
      assert(e3.getMessage.contains("hive-style"))
    } finally cleanup(dir)
  }

  test("partitioned table (round 15): create with partitionBy, appends " +
      "derive the layout, updates/deletes publish logs INTO partition " +
      "dirs, new partitions appear, reads need no reconstruction") {
    val dir = tmp("part")
    try {
      def pdf(rows: Seq[(String, Long, String, String)]) =
        rows.toDF("_hoodie_record_key", "id", "v", "p")
      val (_, n1) = HudiSink.upsert(pdf(
        (1L to 12L).map(i => (f"k$i%02d", i, s"a$i",
          if (i <= 6) "x" else "y"))), dir, partitionBy = Seq("p"))
      assert(n1 == 12L)
      val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory)
        .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
      assert(dirs == Seq("p=x", "p=y"), s"got $dirs")
      assert(HudiSource.read(spark, dir).count() == 12L)
      // upsert: update k01 (log block IN p=x), insert k99 into a NEW
      // partition z — the derived layout routes it
      val (_, n2) = HudiSink.upsert(pdf(Seq(
        ("k01", 1L, "UPD", "x"), ("k99", 99L, "NEW", "z"))), dir)
      assert(n2 == 2L)
      assert(new java.io.File(s"$dir/p=x").listFiles.map(_.getName)
        .exists(n => n.contains(".log.") && !n.endsWith(".crc")),
        "the update's log must land INSIDE p=x")
      assert(new java.io.File(s"$dir/p=z").listFiles.map(_.getName)
        .exists(_.endsWith(".parquet")),
        "the new key must create partition p=z")
      val got = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(got("k01") == "UPD" && got("k99") == "NEW" &&
        got("k07") == "a7" && got.size == 13)
      // an explicit partitionBy that disagrees with the layout is loud
      val eMismatch = intercept[IllegalArgumentException] {
        HudiSink.upsert(pdf(Seq(("k50", 50L, "w", "x"))), dir,
          partitionBy = Seq("v"))
      }
      assert(eMismatch.getMessage.contains("does not match"))
      // delete across partitions: delete blocks land in their groups'
      // partition dirs, rows drop table-wide
      val (_, nd) = HudiSink.deleteWhere(spark, dir, col("id") % 2 === 0)
      assert(nd == 6L, s"got $nd") // k02 k04 k06 k08 k10 k12
      assert(HudiSource.read(spark, dir).count() == 7L)
      val logDirs = Seq("p=x", "p=y").filter(d =>
        new java.io.File(s"$dir/$d").listFiles.map(_.getName)
          .exists(n => n.contains(".log.") && !n.endsWith(".crc")))
      assert(logDirs == Seq("p=x", "p=y"),
        s"delete logs must land in both partitions, got $logDirs")
    } finally cleanup(dir)
  }
}
