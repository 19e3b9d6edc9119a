package graft

import org.apache.hadoop.fs.Path

/** Delta Lake append-only WRITE path (round 14 — the round-13
  * verdict's #3 directive): optimistic-concurrency commits per
  * delta.io PROTOCOL.md. The reader under test is this repo's own
  * DeltaLakeSource — the write/read pair both implement the public
  * spec, and the commit JSON is additionally asserted structurally. */
class DeltaLakeSinkSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  test("create (partitioned) + append + read roundtrip, with time " +
      "travel seeing the pre-append state") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dsink").toString + "/t"
    try {
      val v0 = DeltaLakeSink.append(
        Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x"))
          .toDF("id", "name", "p"),
        dir, partitionBy = Seq("p"))
      assert(v0 == 0L, "creation must commit version 0")
      val v1 = DeltaLakeSink.append(
        Seq((4L, "d", "z")).toDF("id", "name", "p"), dir)
      assert(v1 == 1L)
      val now = DeltaLakeSource.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      assert(now == Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x"),
        (4L, "d", "z")),
        s"partition column must round trip through the log, got $now")
      assert(DeltaLakeSource.read(spark, dir, versionAsOf = Some(0L))
        .count() == 3L, "time travel to v0 must not see the append")
      // the commit is spec-shaped: v0 carries protocol + metaData with
      // the partition column; adds carry RELATIVE paths + partitionValues
      val text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"${0L}%020d.json"))
      assert(text.contains("\"minReaderVersion\":1") &&
        text.contains("\"partitionColumns\":[\"p\"]") &&
        text.contains("\"partitionValues\":{\"p\":"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("commit collision: a racing add-only commit bumps and retries; " +
      "a racing metaData change refuses loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dsink2").toString + "/t"
    // the failpoint fires between the log read and the first claim —
    // exactly the window a real race occupies
    def claim(version: Long, line: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"$version%020d.json"), line + "\n")
    try {
      DeltaLakeSink.append(Seq((1L, "a")).toDF("id", "name"), dir)
      DeltaLakeSink.commitFailpoint = () => claim(1L,
        """{"add":{"path":"ghost.parquet","partitionValues":{},""" +
          """"size":1,"modificationTime":1,"dataChange":true}}""")
      val v = try DeltaLakeSink.append(
        Seq((2L, "b")).toDF("id", "name"), dir)
      finally DeltaLakeSink.commitFailpoint = () => ()
      assert(v == 2L, s"collision must bump past the race to 2, got $v")
      // a racing commit carrying a metaData action is a REAL conflict
      DeltaLakeSink.commitFailpoint = () => claim(3L,
        """{"metaData":{"id":"x","format":{"provider":"parquet"},""" +
          """"schemaString":"{}","partitionColumns":[],""" +
          """"configuration":{}}}""")
      val e = try intercept[IllegalStateException] {
        DeltaLakeSink.append(Seq((3L, "c")).toDF("id", "name"), dir)
      } finally DeltaLakeSink.commitFailpoint = () => ()
      assert(e.getMessage.contains("metadata"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("two concurrent appends both land (distinct versions) and the " +
      "read sees the union") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dsink3").toString + "/t"
    try {
      DeltaLakeSink.append(Seq((0L, "seed")).toDF("id", "name"), dir)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        import scala.jdk.CollectionConverters._
        val tasks: java.util.List[
          java.util.concurrent.Callable[Long]] = Seq(1L, 2L)
          .map[java.util.concurrent.Callable[Long]] { i => () =>
            DeltaLakeSink.append(
              Seq((i * 10, s"w$i")).toDF("id", "name"), dir)
          }.asJava
        val vs = pool.invokeAll(tasks).asScala.map(_.get()).toSeq
        assert(vs.toSet.size == 2, s"versions must be distinct, got $vs")
      } finally pool.shutdown()
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(0L, 10L, 20L),
        s"both concurrent appends must be visible, got $ids")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("loud gates: schema mismatch, partition mismatch, writer-feature " +
      "tables") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dsink4").toString + "/t"
    try {
      DeltaLakeSink.append(Seq((1L, "a")).toDF("id", "name"), dir)
      val e1 = intercept[IllegalArgumentException] {
        DeltaLakeSink.append(Seq((1L, 2L)).toDF("id", "other"), dir)
      }
      assert(e1.getMessage.contains("schema mismatch"))
      val e2 = intercept[IllegalArgumentException] {
        DeltaLakeSink.append(Seq((2L, "b")).toDF("id", "name"), dir,
          partitionBy = Seq("name"))
      }
      assert(e2.getMessage.contains("partitions by"))
      // the writer-feature gate is a per-feature OBLIGATION matrix
      // (round 14): a v7 table whose invariants feature has nothing to
      // enforce (no delta.invariants in the schema) appends fine…
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${1L}%020d.json"),
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["invariants"]}}""" + "\n")
      DeltaLakeSink.append(Seq((2L, "b")).toDF("id", "name"), dir)
      // …an UNKNOWN feature still refuses (obligation unknowable)…
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${3L}%020d.json"),
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["icebergCompatV2"]}}""" + "\n")
      val e3 = intercept[IllegalArgumentException] {
        DeltaLakeSink.append(Seq((3L, "c")).toDF("id", "name"), dir)
      }
      assert(e3.getMessage.contains("icebergCompatV2"))
      // …and delta.appendOnly blocks deletes but never appends
      java.nio.file.Files.delete(java.nio.file.Path.of(
        dir, "_delta_log", f"${3L}%020d.json"))
      val schemaString = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Path.of(
          dir, "_delta_log", f"${0L}%020d.json")).split("\n")
          .find(_.contains("metaData")).get)
        .get("metaData").get("schemaString").asText
      val metaLine = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(java.util.Map.of("metaData", java.util.Map.of(
          "id", "t", "schemaString", schemaString,
          "partitionColumns", java.util.List.of[String](),
          "configuration", java.util.Map.of("delta.appendOnly", "true"))))
      // enable the FEATURE too: on a v7 table the delta.appendOnly
      // property only binds when appendOnly is in writerFeatures
      // (PROTOCOL.md enablement rule)
      val protoLine =
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["invariants","appendOnly"]}}"""
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${3L}%020d.json"),
        protoLine + "\n" + metaLine + "\n")
      DeltaLakeSink.append(Seq((4L, "d")).toDF("id", "name"), dir)
      val e4 = intercept[IllegalArgumentException] {
        DeltaLakeSink.delete(spark, dir,
          org.apache.spark.sql.functions.col("id") === 1L)
      }
      assert(e4.getMessage.contains("appendOnly"))
      // change data feed blocks row CHANGES, never plain appends (CDF
      // readers derive append commits from the dataChange adds)
      val metaCdf = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(java.util.Map.of("metaData", java.util.Map.of(
          "id", "t", "schemaString", schemaString,
          "partitionColumns", java.util.List.of[String](),
          "configuration",
          java.util.Map.of("delta.enableChangeDataFeed", "true"))))
      val protoCdf =
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["invariants","changeDataFeed"]}}"""
      val v5 = new java.io.File(dir, "_delta_log").listFiles
        .map(_.getName).filter(_.endsWith(".json")).length.toLong
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"$v5%020d.json"),
        protoCdf + "\n" + metaCdf + "\n")
      DeltaLakeSink.append(Seq((5L, "e")).toDF("id", "name"), dir)
      // round 16: the copy-on-write DELETE now EMITS cdc actions +
      // _change_data files on CDF tables instead of refusing — the
      // refusal moved to the lanes that cannot capture per-row changes
      // (the DV delete lane, overwrite)
      val (vDel, nDel) = DeltaLakeSink.delete(spark, dir,
        org.apache.spark.sql.functions.col("id") === 1L)
      assert(nDel == 1L)
      val cdfCommit = java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "_delta_log", f"$vDel%020d.json"))
      assert(cdfCommit.contains("\"cdc\"") &&
        cdfCommit.contains("_change_data/"),
        s"a CDF delete must carry cdc actions, got: $cdfCommit")
      // overwrite remains the one CDF refusal (per-row change capture
      // would rewrite everything an overwrite exists to avoid); the
      // DV delete lane emits cdc like the CoW lane (DeltaCdfSpec pins
      // both emission lanes)
      val e5 = intercept[IllegalArgumentException] {
        DeltaLakeSink.overwrite(Seq((9L, "z")).toDF("id", "name"), dir)
      }
      assert(e5.getMessage.contains("change data feed"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }
}
