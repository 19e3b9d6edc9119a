package graft

import org.apache.spark.sql.functions.col

/** Lightweight DELETE writing Iceberg v2 POSITION-DELETE files
  * (round 14 — the write-side twin of the position-delete READ; the
  * reference's lightweight `DELETE FROM` masks rows instead of
  * rewriting parts, and the Iceberg spelling of that mask is a
  * content=1 delete file). Pins: data files keep identity, the delete
  * file holds (file_path, pos) sorted and manifest-spelled paths, the
  * prior snapshot stays travelable, existing deletes apply first (no
  * double-delete), zero matches commit nothing, a later CoW mutation
  * refuses loudly (compact first), and the metadata claim collision is
  * loud. */
class IcebergPosDeleteWriteSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{IcebergSink, IcebergSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ipdw_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def dataDirFiles(dir: String): Set[String] =
    Option(new java.io.File(dir, "data").listFiles)
      .map(_.map(_.getName).filter(_.endsWith(".parquet")).toSet)
      .getOrElse(Set.empty)

  test("position-delete write: data files keep identity, the mask " +
      "applies, prior snapshots stay travelable, deletes compose, " +
      "zero-match is a no-op") {
    val dir = tmp("basic")
    try {
      val snap0 = IcebergSink.append(
        (1L to 30L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
      val files0 = dataDirFiles(dir)
      val (snap1, n1) = IcebergSink.deleteLightweight(spark, dir,
        col("id") % 3 === 0)
      assert(n1 == 10L)
      val files1 = dataDirFiles(dir)
      assert(files0.subsetOf(files1),
        "lightweight delete must not remove or rewrite data files")
      val delFiles = files1 -- files0
      assert(delFiles.nonEmpty && delFiles.forall(_.contains("-delete-")))
      // the delete file holds manifest-spelled paths, sorted
      val delDf = spark.read.parquet(
        delFiles.map(n => s"$dir/data/$n").toSeq: _*)
      assert(delDf.columns.toSeq == Seq("file_path", "pos"))
      val rows = delDf.as[(String, Long)].collect().toSeq
      assert(rows.length == 10 &&
        rows.forall(r => files0.exists(f => r._1.endsWith(f))))
      assert(rows == rows.sortBy(r => (r._1, r._2)),
        "delete rows must be sorted by (file_path, pos)")
      // the spec's RESERVED field ids ride in the parquet schema
      // (external engines resolve delete columns by id, not name):
      // file_path = 2147483546, pos = 2147483545 (r14 ADVICE)
      delFiles.foreach { n =>
        val pin = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$dir/data/$n"),
          spark.sparkContext.hadoopConfiguration)
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(pin)
        val pqSchema =
          try rd.getFooter.getFileMetaData.getSchema finally rd.close()
        val idByName = pqSchema.getFields.toArray.toSeq.map {
          case t: org.apache.parquet.schema.Type =>
            t.getName -> t.getId.intValue
        }.toMap
        assert(idByName("file_path") == 2147483546,
          s"file_path field id: ${idByName("file_path")}")
        assert(idByName("pos") == 2147483545,
          s"pos field id: ${idByName("pos")}")
      }
      val ids = IcebergSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == (1L to 30L).filterNot(_ % 3 == 0))
      assert(IcebergSource.read(spark, dir, snapshotId = Some(snap0))
        .count() == 30L, "the pre-delete snapshot must stay travelable")
      // a second delete only touches VISIBLE rows (no double delete)
      val (_, n2) = IcebergSink.deleteLightweight(spark, dir,
        col("id") <= 6) // 3 and 6 already masked → 1, 2, 4, 5
      assert(n2 == 4L, s"got $n2")
      assert(IcebergSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq ==
        (7L to 30L).filterNot(_ % 3 == 0))
      // zero matches commit nothing
      val before = new java.io.File(dir, "metadata").listFiles.length
      val (s3, n3) = IcebergSink.deleteLightweight(spark, dir,
        col("id") > 999)
      assert(n3 == 0L)
      assert(new java.io.File(dir, "metadata").listFiles.length == before)
      assert(s3 == snap1 || n3 == 0L)
      // a CoW mutation on a delete-carrying snapshot refuses loudly
      val e = intercept[IllegalArgumentException] {
        IcebergSink.update(spark, dir, Seq("name" -> col("name")),
          col("id") === 7)
      }
      assert(e.getMessage.contains("delete files"))
    } finally cleanup(dir)
  }

  test("dialect DELETE FROM routes to the position-delete lane; the " +
      "metadata claim collision is loud") {
    val dir = tmp("sql")
    try {
      IcebergSink.append((1L to 12L).map(i => (i, i * 10L))
        .toDF("id", "v"), dir)
      val files0 = dataDirFiles(dir)
      val del = graft.sql.ClickHouseSql.sql(spark,
        s"DELETE FROM FUNCTION iceberg('$dir') WHERE id % 4 = 0")
        .collect().head
      assert(del.getLong(1) == 3L)
      assert(files0.subsetOf(dataDirFiles(dir)),
        "DELETE FROM must be the masking lane — no rewrites")
      assert(graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM iceberg('$dir')")
        .collect().head.getLong(0) == 9L)
      IcebergSink.commitFailpoint = () => {
        val v = new java.io.File(dir, "metadata").listFiles
          .map(_.getName).collect {
            case n if n.matches("v\\d+\\.metadata\\.json") =>
              n.stripPrefix("v").stripSuffix(".metadata.json").toInt
          }.max
        java.nio.file.Files.writeString(java.nio.file.Path.of(
          dir, "metadata", s"v${v + 1}.metadata.json"), "{}")
      }
      val e = try intercept[IllegalStateException] {
        IcebergSink.deleteLightweight(spark, dir, col("id") === 1)
      } finally IcebergSink.commitFailpoint = () => ()
      assert(e.getMessage.contains("concurrently"))
    } finally cleanup(dir)
  }
}
