package graft

import org.apache.spark.sql.types._

/** One / Form / HiveText input formats (round 14 — the round-13
  * verdict's format-residue directive; reference OneFormat.cpp,
  * FormRowInputFormat.cpp, HiveTextRowInputFormat.cpp). */
class ChSmallFormatsSpec extends SparkFunSuite {
  import graft.sources.ChSmallFormats

  private def write(dir: String, name: String, text: String): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, name), text)

  test("One: one dummy=0 row per file, content never read") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_one").toString
    try {
      write(dir, "a.bin", "whatever \u0000 bytes")
      write(dir, "b.csv", "not,parsed")
      write(dir, "c.txt", "")
      val rows = ChSmallFormats.readOne(spark, dir).collect()
      assert(rows.length == 3 && rows.forall(_.getShort(0) == 0))
      // dialect: SELECT count() FROM file(dir, 'One') — the existence
      // probe the reference uses the format for
      val n = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM file('$dir', 'One')")
        .collect().head.getLong(0)
      assert(n == 3L)
      // a non-dummy structure is LOUD (OneFormat.cpp ctor), not ignored
      val e = intercept[IllegalArgumentException] {
        graft.sql.ClickHouseSql.sql(spark,
          s"SELECT * FROM file('$dir', 'One', 'a Int64, b String')")
      }
      assert(e.getMessage.contains("dummy"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("Form: percent-decoding with literal '+', unknown keys skip, " +
      "omitted columns default, duplicates are loud") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_form").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    try {
      write(dir, "r1.form",
        "id=7&name=a%20b%2Bc+d&junk=zzz&score=1.5")
      write(dir, "r2.form", "name=only&id=8")
      val rows = ChSmallFormats.readForm(spark, dir, schema)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      // '+' stays literal (Poco::URI::decode semantics, not form decode)
      assert(rows == Seq((7L, "a b+c+d", 1.5), (8L, "only", 0.0)),
        s"got $rows")
      write(dir, "r3.form", "id=9&id=10")
      val e = intercept[Exception] {
        ChSmallFormats.readForm(spark, dir, schema).collect()
      }
      assert(e.getMessage.contains("duplicate") ||
        Option(e.getCause).exists(_.getMessage.contains("duplicate")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("MySQLDump: INSERT parsing with escapes/NULL/multi-tuple, " +
      "column-list mapping, table pick, multi-table loudness") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mysqldump").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    try {
      write(dir, "dump.sql",
        """-- MySQL dump 10.13
          |-- INSERT INTO `t1` VALUES (999,'comment-noise',0.0);
          |DROP TABLE IF EXISTS `t1`;
          |CREATE TABLE `t1` (id bigint, name varchar(20), score double);
          |LOCK TABLES `t1` WRITE;
          |INSERT INTO `t1` VALUES (1,'plain',1.5),(2,'qu''ote \'x\'',NULL),
          |  (3,'semi;colon )paren',2.25);
          |INSERT INTO `t1` (`score`, `id`, `name`) VALUES (9.0, 4, 'mapped');
          |UNLOCK TABLES;
          |""".stripMargin)
      val rows = graft.sources.ChSmallFormats
        .readMySQLDump(spark, dir, schema)
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(rows == Seq(
        (1L, "plain", 1.5), (2L, "qu'ote 'x'", null),
        (3L, "semi;colon )paren", 2.25), (4L, "mapped", 9.0)),
        s"got $rows")
      // a second table makes the pick mandatory
      write(dir, "dump2.sql",
        "INSERT INTO a VALUES (1,'x',0.0);\n" +
          "INSERT INTO b VALUES (2,'y',0.0);\n")
      java.nio.file.Files.delete(java.nio.file.Path.of(dir, "dump.sql"))
      val e = intercept[Exception] {
        graft.sources.ChSmallFormats
          .readMySQLDump(spark, dir, schema).collect()
      }
      assert(e.getMessage.contains("2 tables") ||
        Option(e.getCause).exists(_.getMessage.contains("2 tables")))
      val picked = graft.sources.ChSmallFormats
        .readMySQLDump(spark, dir, schema, tableName = "b").collect()
      assert(picked.length == 1 && picked.head.getLong(0) == 2L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("Template: row-template parse/read/write with Quoted/CSV/Raw " +
      "escaping, skipped placeholders, and loud mismatches") {
    import graft.sources.ChSmallFormats
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tpl").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    try {
      val fmt = "id=${id:Quoted}; name=${name:CSV} (${score:None})"
      val t = ChSmallFormats.parseTemplate(fmt)
      assert(t.delims == Seq("id=", "; name=", " (", ")") &&
        t.cols.map(_._2) == Seq("Quoted", "CSV", "None"))
      write(dir, "rows.tpl",
        "id='1'; name=\"al;pha\" (1.5)\n" +
          "id='2'; name=bare (2.5)\n" +
          "id='3'; name=\"q\"\"uote\" (0.0)")
      val rows = ChSmallFormats.readTemplate(spark, dir, schema, fmt)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(rows == Seq((1L, "al;pha", 1.5), (2L, "bare", 2.5),
        (3L, "q\"uote", 0.0)), s"got $rows")
      // write → read roundtrip with a different rows-between delimiter
      val out = s"$dir/out"
      import SparkTestBase.spark.implicits._
      ChSmallFormats.writeTemplate(
        Seq((7L, "x y", 0.5)).toDF("id", "name", "score").coalesce(1),
        out, fmt, rowsBetween = ";;\n")
      val back = ChSmallFormats.readTemplate(spark, out, schema, fmt,
        rowsBetween = ";;\n").collect()
      assert(back.length == 1 && back.head.getString(1) == "x y")
      // a row that misses the literal delimiter is LOUD
      write(dir, "rows.tpl", "id='1'! name=\"a\" (1.0)")
      val e = intercept[Exception] {
        ChSmallFormats.readTemplate(spark, dir, schema, fmt).collect()
      }
      assert((e.getMessage + Option(e.getCause).map(_.getMessage)
        .getOrElse("")).contains("expected"))
      // unsupported escaping rule is loud at parse time
      intercept[IllegalArgumentException] {
        ChSmallFormats.parseTemplate("x=${a:XML}")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("HiveText: 0x01 delimiter, no header, \\N nulls, schema names") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hive").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    try {
      write(dir, "part1.hive",
        "1\u0001alpha\n2\u0001\\N\n3\u0001gamma\n")
      val rows = graft.sources.ChSmallFormats
        .readHiveText(spark, dir, schema)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1)))
        .sortBy(_._1).toSeq
      assert(rows == Seq((1L, "alpha"), (2L, null), (3L, "gamma")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
