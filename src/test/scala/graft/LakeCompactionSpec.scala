package graft

import org.apache.spark.sql.functions.col

/** Lakehouse compaction — OPTIMIZE TABLE FUNCTION deltaLake|iceberg
  * (round 14): the current state materializes into fresh files, masks
  * (Delta DVs / Iceberg delete files) apply and then disappear, time
  * travel still serves the pre-compaction state, and Iceberg
  * copy-on-write mutations work again afterwards (the "compact first"
  * gate's own remedy). Delta commits with dataChange = false, which the
  * spec permits even on delta.appendOnly tables. */
class LakeCompactionSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource, IcebergSink, IcebergSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cpt_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("delta: compaction merges small files, materializes DVs away, " +
      "keeps time travel, and commits dataChange=false") {
    val dir = tmp("delta")
    try {
      // three small commits → three files, plus a DV mask
      (1 to 3).foreach { i =>
        DeltaLakeSink.append(
          ((i * 10L) until (i * 10L + 5L)).map(j => (j, s"n$j"))
            .toDF("id", "name").repartition(1), dir)
      }
      DeltaLakeSink.deleteLightweight(spark, dir, col("id") % 10 === 0)
      val preCount = DeltaLakeSource.read(spark, dir).count()
      assert(preCount == 12L) // 15 minus ids 10, 20, 30
      val (v, before, after) = DeltaLakeSink.compact(spark, dir)
      assert(v == 4L && before == 3 && after < before,
        s"got ($v, $before, $after)")
      val text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"$v%020d.json"))
      assert(!text.contains("\"dataChange\":true"),
        "compaction must be dataChange=false throughout")
      assert(!text.contains("deletionVector"),
        "compaction must materialize the DV masks away")
      assert(DeltaLakeSource.read(spark, dir).count() == preCount)
      assert(DeltaLakeSource.read(spark, dir, versionAsOf = Some(3L))
        .count() == preCount, "pre-compaction version must still read")
      // appendOnly tables may compact (dataChange=false is permitted)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val schemaString = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "_delta_log", f"${0L}%020d.json"))
        .split("\n").find(_.contains("metaData")).get)
        .get("metaData").get("schemaString").asText
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${5L}%020d.json"),
        mapper.writeValueAsString(java.util.Map.of(
          "metaData", java.util.Map.of(
            "id", "t", "schemaString", schemaString,
            "partitionColumns", java.util.List.of[String](),
            "configuration",
            java.util.Map.of("delta.appendOnly", "true")))) + "\n")
      DeltaLakeSink.append(Seq((99L, "x"), (98L, "y")).toDF("id", "name")
        .repartition(2), dir)
      val (v2, _, _) = DeltaLakeSink.compact(spark, dir)
      assert(v2 == 7L, "compaction must work on an appendOnly table")
      assert(DeltaLakeSource.read(spark, dir).count() == preCount + 2)
    } finally cleanup(dir)
  }

  test("iceberg: compaction drops delete files from the current state " +
      "and re-enables copy-on-write mutations; dialect OPTIMIZE lane") {
    val dir = tmp("ice")
    try {
      IcebergSink.append((1L to 20L).map(i => (i, i * 10L))
        .toDF("id", "v"), dir)
      IcebergSink.deleteLightweight(spark, dir, col("id") % 4 === 0)
      // CoW mutation refuses while delete files are live
      val e = intercept[IllegalArgumentException] {
        IcebergSink.update(spark, dir, Seq("v" -> (col("v") + 1)),
          col("id") === 1)
      }
      assert(e.getMessage.contains("delete files"))
      val del = graft.sql.ClickHouseSql.sql(spark,
        s"OPTIMIZE TABLE FUNCTION iceberg('$dir') FINAL")
        .collect().head
      assert(del.getLong(0) != 0L)
      assert(IcebergSource.read(spark, dir).count() == 15L)
      // the compacted snapshot carries no delete files → CoW works
      val (_, n) = IcebergSink.update(spark, dir,
        Seq("v" -> (col("v") + 1)), col("id") === 1)
      assert(n == 1L)
      val got = IcebergSource.read(spark, dir)
        .where(col("id") === 1).select("v").as[Long].collect().head
      assert(got == 11L)
      // dialect lane for delta too
      val dd = tmp("delta_sql")
      try {
        DeltaLakeSink.append((1L to 9L).map(i => (i, s"n$i"))
          .toDF("id", "name").repartition(3), dd)
        val r = graft.sql.ClickHouseSql.sql(spark,
          s"OPTIMIZE TABLE FUNCTION deltaLake('$dd')").collect().head
        assert(r.getLong(0) == 1L && r.getLong(1) == 3L &&
          r.getLong(2) < 3L)
        assert(DeltaLakeSource.read(spark, dd).count() == 9L)
      } finally cleanup(dd)
    } finally cleanup(dir)
  }
}
