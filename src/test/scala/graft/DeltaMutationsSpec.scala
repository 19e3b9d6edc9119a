package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, expr}

/** Delta row-level DELETE / UPDATE through copy-on-write remove+add
  * commits (round 14 — the write-side twin of the deletion-vector
  * READ). Pins the scale-critical contract: only files HOLDING
  * matching rows rewrite (untouched files keep byte-identity), time
  * travel still serves the pre-mutation state, existing deletion
  * vectors apply before the rewrite, and a commit collision is loud. */
class DeltaMutationsSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dmut_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  /** (path → partitionValues("p")) of every add, and the remove paths,
    * in one commit JSON. */
  private def commitActions(dir: String, v: Long)
      : (Map[String, String], Set[String]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val text = java.nio.file.Files.readString(java.nio.file.Path.of(
      dir, "_delta_log", f"$v%020d.json"))
    val adds = Map.newBuilder[String, String]
    val removes = Set.newBuilder[String]
    text.split("\n").map(_.trim).filter(_.nonEmpty).foreach { line =>
      val node = mapper.readTree(line)
      Option(node.get("add")).foreach(a => adds +=
        a.get("path").asText -> Option(a.get("partitionValues"))
          .flatMap(pv => Option(pv.get("p"))).map(_.asText).getOrElse(""))
      Option(node.get("remove")).foreach(r =>
        removes += r.get("path").asText)
    }
    (adds.result(), removes.result())
  }

  test("delete: only matched files rewrite; others keep identity; time " +
      "travel sees the pre-delete rows; zero-match commits nothing") {
    val dir = tmp("del")
    try {
      DeltaLakeSink.append(
        (1L to 30L).map(i => (i, s"n$i", if (i <= 15) "a" else "b"))
          .toDF("id", "name", "p"),
        dir, partitionBy = Seq("p"))
      val (adds0, _) = commitActions(dir, 0L)
      // delete inside partition a only — partition b's files must
      // survive UNTOUCHED (no remove may name them)
      val (v, n) = DeltaLakeSink.delete(spark, dir,
        col("p") === "a" && col("id") % 3 === 0)
      assert(v == 1L && n == 5L, s"expected (1, 5), got ($v, $n)")
      val (adds1, removes1) = commitActions(dir, 1L)
      assert(removes1.nonEmpty)
      assert(removes1.forall(p => adds0.get(p).contains("a")),
        s"only partition-a files may rewrite; removed $removes1 of $adds0")
      assert(adds1.values.forall(_ == "a"))
      val now = DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(now == (1L to 30L).filterNot(i => i <= 15 && i % 3 == 0))
      assert(DeltaLakeSource.read(spark, dir, versionAsOf = Some(0L))
        .count() == 30L, "time travel must still serve pre-delete rows")
      // zero-match: no new commit, current version unchanged
      val (v2, n2) = DeltaLakeSink.delete(spark, dir, col("id") > 999)
      assert(v2 == 1L && n2 == 0L)
      assert(!new java.io.File(dir,
        "_delta_log/" + f"${2L}%020d.json").exists,
        "a zero-match delete must not claim a version")
    } finally cleanup(dir)
  }

  test("update: assignment applies WHERE-matched rows only, casts to " +
      "the declared type; key-column assignment and column-mapped " +
      "tables refuse") {
    val dir = tmp("upd")
    try {
      DeltaLakeSink.append(
        Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"))
          .toDF("id", "v", "p"),
        dir, partitionBy = Seq("p"))
      val (v, n) = DeltaLakeSink.update(spark, dir,
        Seq("v" -> (col("v") * 2 + expr("0.5"))), // double → casts to long
        col("id") <= 2)
      assert(v == 1L && n == 2L)
      val got = DeltaLakeSource.read(spark, dir)
        .select("id", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 20L), (2L, 40L), (3L, 30L)))
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSink.update(spark, dir, Seq("p" -> col("p")),
          col("id") === 1)
      }
      assert(e.getMessage.contains("key column"))
      val e2 = intercept[IllegalArgumentException] {
        DeltaLakeSink.update(spark, dir, Seq("nope" -> col("v")),
          col("id") === 1)
      }
      assert(e2.getMessage.contains("no column"))
      // a metaData action switching on column mapping WITHOUT
      // physicalName metadata stays loud (mutations on properly-mapped
      // tables are supported — DeltaColumnMappingSpec — but a mapped
      // schema with no physical names can only be guessed at)
      val schemaString = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Path.of(
          dir, "_delta_log", f"${0L}%020d.json")).split("\n")
          .find(_.contains("metaData")).get)
        .get("metaData").get("schemaString").asText
      val metaLine = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(java.util.Map.of("metaData", java.util.Map.of(
          "id", "t", "schemaString", schemaString,
          "partitionColumns", java.util.List.of("p"),
          "configuration",
          java.util.Map.of("delta.columnMapping.mode", "name"))))
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${2L}%020d.json"), metaLine + "\n")
      val e3 = intercept[IllegalArgumentException] {
        DeltaLakeSink.delete(spark, dir, col("id") === 3)
      }
      assert(e3.getMessage.contains("physicalName"))
    } finally cleanup(dir)
  }

  test("delete on a DV-carrying table applies the existing mask first " +
      "and the rewritten file drops the DV") {
    val dir = tmp("dv")
    try {
      // build: ONE file of ids 1..10, then a DV masking ids 1 and 2
      // (hand-written per PROTOCOL.md, like the read spec's fixtures)
      DeltaLakeSink.append((1L to 10L).map(i => (i, s"n$i"))
        .toDF("id", "name").repartition(1), dir)
      assert(DeltaLakeSource.read(spark, dir).count() == 10L)
      val active = new java.io.File(dir).listFiles
        .map(_.getName).filter(_.endsWith(".parquet"))
      assert(active.length == 1)
      val rel = active.head
      // which row positions hold ids 1 and 2
      val pos = spark.read.parquet(s"$dir/$rel")
        .select(col("id"), col("_metadata.row_index").as("ri"))
        .as[(Long, Long)].collect().toMap
      val dvBytes = graft.sources.DeltaDeletionVectors
        .serializeBitmaps(Seq(pos(1L), pos(2L)))
      val fsys = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val dvPath = new Path(dir, "dv_test.bin")
      val off = graft.sources.DeltaDeletionVectors
        .writeDvFile(fsys, dvPath, Seq(dvBytes)).head
      val line1 = s"""{"remove":{"path":"$rel","dataChange":true}}"""
      val line2 = s"""{"add":{"path":"$rel","partitionValues":{},""" +
        s""""size":1,"modificationTime":1,"dataChange":true,""" +
        s""""deletionVector":{"storageType":"p",""" +
        s""""pathOrInlineDv":"$dvPath","offset":$off,""" +
        s""""sizeInBytes":${dvBytes.length},"cardinality":2}}}"""
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${1L}%020d.json"), line1 + "\n" + line2 + "\n")
      assert(DeltaLakeSource.read(spark, dir).count() == 8L,
        "the DV must mask ids 1 and 2 before any mutation")
      // now DELETE id <= 4: only ids 3, 4 remain deletable (1, 2 are
      // already masked) — and the rewritten file must carry NO DV
      val (v, n) = DeltaLakeSink.delete(spark, dir, col("id") <= 4)
      assert(v == 2L && n == 2L, s"got ($v, $n)")
      val ids = DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == (5L to 10L))
      val text = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"${2L}%020d.json"))
      assert(text.contains("\"remove\"") &&
        !text.contains("deletionVector"),
        "the rewrite commit must retire the DV'd file and add a clean one")
    } finally cleanup(dir)
  }

  test("rows where the DELETE predicate evaluates to NULL survive the " +
      "rewrite (not(pred) would drop them — silent data loss)") {
    val dir = tmp("nullpred")
    try {
      DeltaLakeSink.append(
        Seq((1L, java.lang.Long.valueOf(5L)), (2L, null.asInstanceOf[java.lang.Long]),
          (3L, java.lang.Long.valueOf(7L)))
          .toDF("id", "v").repartition(1), dir)
      val (_, n) = DeltaLakeSink.delete(spark, dir, col("v") === 5L)
      assert(n == 1L)
      val ids = DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(2L, 3L),
        s"the NULL-valued row must survive the rewrite, got $ids")
    } finally cleanup(dir)
  }

  test("commit collision during a mutation is loud, not a lost update") {
    val dir = tmp("race")
    try {
      DeltaLakeSink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
        dir)
      DeltaLakeSink.commitFailpoint = () =>
        java.nio.file.Files.writeString(java.nio.file.Path.of(
          dir, "_delta_log", f"${1L}%020d.json"),
          """{"add":{"path":"ghost.parquet","partitionValues":{},""" +
            """"size":1,"modificationTime":1,"dataChange":true}}""" + "\n")
      val e = try intercept[IllegalStateException] {
        DeltaLakeSink.delete(spark, dir, col("id") === 1)
      } finally DeltaLakeSink.commitFailpoint = () => ()
      assert(e.getMessage.contains("concurrent commit"))
    } finally cleanup(dir)
  }

  test("dialect lanes: DELETE FROM FUNCTION / ALTER TABLE FUNCTION " +
      "UPDATE commit and report (version, rows)") {
    val dir = tmp("sql")
    try {
      DeltaLakeSink.append(
        (1L to 12L).map(i => (i, i * 10L)).toDF("id", "v"), dir)
      val del = graft.sql.ClickHouseSql.sql(spark,
        s"DELETE FROM FUNCTION deltaLake('$dir') WHERE id % 4 = 0")
        .collect().head
      assert(del.getLong(0) == 1L && del.getLong(1) == 3L)
      val upd = graft.sql.ClickHouseSql.sql(spark,
        s"ALTER TABLE FUNCTION deltaLake('$dir') UPDATE v = v + 1 " +
          "WHERE id <= 2").collect().head
      assert(upd.getLong(0) == 2L && upd.getLong(1) == 2L)
      val got = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT id, v FROM deltaLake('$dir') ORDER BY id")
        .as[(Long, Long)].collect().toSeq
      assert(got == (1L to 12L).filter(_ % 4 != 0)
        .map(i => (i, if (i <= 2) i * 10 + 1 else i * 10)))
      // ALTER ... DELETE spelling too
      val del2 = graft.sql.ClickHouseSql.sql(spark,
        s"ALTER TABLE FUNCTION deltaLake('$dir') DELETE WHERE id = 1")
        .collect().head
      assert(del2.getLong(0) == 3L && del2.getLong(1) == 1L)
    } finally cleanup(dir)
  }
}
