package graft

import org.apache.spark.sql.functions.col

/** Delta TYPE WIDENING (round 15 — the last r14 "Delta protocol
  * residue" item with read semantics; PROTOCOL.md "Type Widening"):
  * after a widening commit the metaData carries the WIDENED schema
  * while pre-widening files keep the narrow physical type. Spark 4's
  * parquet reader converts int→long / float→double / growing decimals
  * natively, so the table reads as a plain wide-schema scan; the
  * typeWidening reader/writer features are therefore un-gated. Writer
  * side: this sink never CHANGES types (drift refuses), and appends at
  * the current widened schema are spec-legal. */
class DeltaTypeWideningSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  test("a widened table reads: old int/float files serve under the " +
      "long/double schema, post-widening appends merge, DVs compose") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tw").toString + "/t"
    try {
      // v0: narrow schema (int, float)
      DeltaLakeSink.append(
        spark.range(1, 6).selectExpr("cast(id as int) as i",
          "cast(id as float) as x"), dir, checkpointInterval = 0)
      // v1: the WIDENING commit — new metaData with the widened
      // schema + the protocol upgrade a real widening writer commits
      val wide = new org.apache.spark.sql.types.StructType()
        .add("i", org.apache.spark.sql.types.LongType)
        .add("x", org.apache.spark.sql.types.DoubleType)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val proto = mapper.createObjectNode()
      proto.put("minReaderVersion", 3)
      proto.put("minWriterVersion", 7)
      val rf = proto.putArray("readerFeatures")
      rf.add("typeWidening")
      val wf = proto.putArray("writerFeatures")
      Seq("appendOnly", "invariants", "typeWidening").foreach(wf.add)
      val protoLine = mapper.createObjectNode()
      protoLine.set[com.fasterxml.jackson.databind.JsonNode](
        "protocol", proto)
      val meta = mapper.createObjectNode()
      meta.put("id", java.util.UUID.randomUUID().toString)
      val fmt = mapper.createObjectNode(); fmt.put("provider", "parquet")
      meta.set[com.fasterxml.jackson.databind.JsonNode]("format", fmt)
      meta.put("schemaString", wide.json)
      meta.putArray("partitionColumns")
      meta.putObject("configuration")
      val metaLine = mapper.createObjectNode()
      metaLine.set[com.fasterxml.jackson.databind.JsonNode](
        "metaData", meta)
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "_delta_log", f"${1L}%020d.json"),
        mapper.writeValueAsString(protoLine) + "\n" +
          mapper.writeValueAsString(metaLine) + "\n")
      // the narrow files now serve under the widened schema
      val got = DeltaLakeSource.read(spark, dir)
      assert(got.schema("i").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(got.schema("x").dataType ==
        org.apache.spark.sql.types.DoubleType)
      assert(got.select("i").as[Long].collect().sorted.toSeq ==
        (1L to 5L))
      // appends at the widened schema commit and merge with old files
      DeltaLakeSink.append(Seq((99L, 9.5d)).toDF("i", "x"), dir,
        checkpointInterval = 0)
      assert(DeltaLakeSource.read(spark, dir).count() == 6L)
      // and the DV delete lane composes on the widened table
      val (_, nDel) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("i") % 2 === 0)
      assert(nDel == 2L) // 2, 4
      assert(DeltaLakeSource.read(spark, dir)
        .select("i").as[Long].collect().sorted.toSeq ==
        Seq(1L, 3L, 5L, 99L))
      // an UNKNOWN reader feature still refuses loudly
      val v4 = java.nio.file.Path.of(dir, "_delta_log", f"${4L}%020d.json")
      rf.add("someFutureFeature")
      java.nio.file.Files.writeString(v4,
        mapper.writeValueAsString(protoLine) + "\n")
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSource.read(spark, dir).collect()
      }
      assert(e.getMessage.contains("someFutureFeature"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }
}
