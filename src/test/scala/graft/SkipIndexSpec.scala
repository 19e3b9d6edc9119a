package graft

import java.nio.file.Files

import graft.operators.SkipIndex
import org.apache.spark.sql.functions._

/** Generic bloom skip index (ref MergeTreeIndexBloomFilter.cpp): pruning
  * must cut FILES, never change ANSWERS. */
class SkipIndexSpec extends SparkFunSuite {

  private val base = {
    val d = Files.createTempDirectory("skipindex").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private lazy val fixture: Unit = {
    val docs = Tables.load(spark, sf, "documents")
    docs.repartitionByRange(8, col("source"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/data")
    SkipIndex.create(spark, s"$base/data", s"$base/index",
      Seq("source", "lang"), expectedItemsPerFile = 10000L)
  }

  test("pruned scan equals the full scan") {
    fixture
    val pruned = SkipIndex.scan(spark, s"$base/data", s"$base/index",
        "source", Seq("src3", "src17"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val full = spark.read.parquet(s"$base/data")
      .filter(col("source").isin("src3", "src17"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(pruned.nonEmpty && pruned.toSeq == full.toSeq)
  }

  test("range-clustered layout prunes files") {
    fixture
    val total = new java.io.File(s"$base/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val matched = SkipIndex.matchingFiles(spark, s"$base/index",
      "source", Seq("src3"))
    assert(total == 8, s"fixture should be 8 part files, got $total")
    assert(matched.size < total,
      s"bloom should prune: ${matched.size} of $total files")
  }

  test("absent value matches no file and returns an empty typed frame") {
    fixture
    assert(SkipIndex.matchingFiles(spark, s"$base/index",
      "source", Seq("no_such_source")).isEmpty)
    val empty = SkipIndex.scan(spark, s"$base/data", s"$base/index",
      "source", Seq("no_such_source"))
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.contains("doc_id"))
  }

  test("second indexed column probes independently") {
    fixture
    val langs = Tables.load(spark, sf, "documents")
      .select("lang").distinct().collect().map(_.getString(0))
    val l = langs.head
    val viaIndex = SkipIndex.scan(spark, s"$base/data", s"$base/index",
      "lang", Seq(l)).count()
    val full = spark.read.parquet(s"$base/data")
      .filter(col("lang") === l).count()
    assert(viaIndex == full && full > 0)
  }
}
