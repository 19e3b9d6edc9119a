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

  test("minmax range scan equals full scan and prunes non-overlapping files") {
    val mmBase = Files.createTempDirectory("skipmm").toString
    Tables.load(spark, sf, "documents")
      .repartitionByRange(6, col("doc_id"))
      .write.mode("overwrite").parquet(s"$mmBase/data")
    SkipIndex.createMinMax(spark, s"$mmBase/data", s"$mmBase/mm", Seq("doc_id"))
    val viaIndex = SkipIndex.scanRange(spark, s"$mmBase/data", s"$mmBase/mm",
      "doc_id", 5L, 20L).select("doc_id").collect().map(_.getLong(0)).sorted
    val full = spark.read.parquet(s"$mmBase/data")
      .filter(col("doc_id").between(5, 20))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(viaIndex.toSeq == full.toSeq && full.nonEmpty)
    val matched = SkipIndex.matchingFilesRange(spark, s"$mmBase/mm", "doc_id", 5L, 20L)
    assert(matched.size < 6, s"range [5,20] should touch few of 6 files, got ${matched.size}")
  }

  test("ngram bloom prunes files for a needle unique to one file") {
    val ngBase = Files.createTempDirectory("skipng").toString
    val ss = SparkTestBase.spark
    import ss.implicits._
    val rows = (1 to 300).map { i =>
      val marker = if (i == 7) " zyzzyvaquark " else " "
      (i.toLong, s"common words here$marker row $i")
    }
    rows.toDF("id", "body").repartitionByRange(5, col("id"))
      .write.mode("overwrite").parquet(s"$ngBase/data")
    SkipIndex.createNgram(spark, s"$ngBase/data", s"$ngBase/ng", "body", n = 3)
    val matched = SkipIndex.matchingFilesLike(spark, s"$ngBase/ng", "zyzzyvaquark")
    assert(matched.size < 5, s"unique needle should prune, got ${matched.size} of 5")
    val hit = SkipIndex.scanLike(spark, s"$ngBase/data", s"$ngBase/ng",
      "body", "ZyzzyvaQuark").select("id").collect().map(_.getLong(0))
    assert(hit.toSeq == Seq(7L))
    // short-needle degradation: below n, every file admits (no pruning,
    // still correct)
    val short = SkipIndex.scanLike(spark, s"$ngBase/data", s"$ngBase/ng",
      "body", "ro").count()
    assert(short == 300)
  }

  test("transparent rule prunes the plan's file list and keeps answers exact") {
    fixture
    graft.plans.SkipIndexPruning.register(spark, s"$base/data", s"$base/index",
      Seq("source", "lang"))
    try {
      val df = spark.read.parquet(s"$base/data")
        .filter(col("source") === "src3")
        .select("doc_id")
      val scannedFiles = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }.sum
      assert(scannedFiles < 8, s"rule should prune: scanned $scannedFiles of 8")
      val viaRule = df.collect().map(_.getLong(0)).sorted
      graft.plans.SkipIndexPruning.drop(s"$base/data")
      val full = spark.read.parquet(s"$base/data")
        .filter(col("source") === "src3")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(viaRule.toSeq == full.toSeq && full.nonEmpty)
    } finally graft.plans.SkipIndexPruning.drop(s"$base/data")
  }

  test("transparent rule leaves non-indexed predicates untouched") {
    fixture
    graft.plans.SkipIndexPruning.register(spark, s"$base/data", s"$base/index",
      Seq("source", "lang"))
    try {
      val df = spark.read.parquet(s"$base/data")
        .filter(col("n_chars") > 100)  // not an indexed column
      val scannedFiles = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }.sum
      assert(scannedFiles == 8, s"no probe → no pruning, got $scannedFiles")
    } finally graft.plans.SkipIndexPruning.drop(s"$base/data")
  }

  test("index DDL: ADD builds + registers, DROP unregisters and removes") {
    val t = "graft_idx_ddl_spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    Tables.load(spark, sf, "documents")
      .repartitionByRange(4, col("source"), col("doc_id"))
      .write.mode("overwrite").saveAsTable(t)
    graft.sql.ClickHouseSql.sql(spark,
      s"ALTER TABLE $t ADD INDEX s_idx source TYPE bloom_filter GRANULARITY 2")
    val viaDialect = graft.sql.ClickHouseSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM $t WHERE source = 'src1'").head().getLong(0)
    val direct = Tables.load(spark, sf, "documents")
      .filter(col("source") === "src1").count()
    assert(viaDialect == direct && direct > 0)
    // minmax + ngram kinds build through the same DDL
    graft.sql.ClickHouseSql.sql(spark,
      s"ALTER TABLE $t ADD INDEX id_idx doc_id TYPE minmax")
    graft.sql.ClickHouseSql.sql(spark,
      s"ALTER TABLE $t ADD INDEX txt_idx text TYPE ngrambf_v1(3) GRANULARITY 1")
    // DROP removes structure and unregisters the transparent rule
    Seq("s_idx", "id_idx", "txt_idx").foreach { ix =>
      graft.sql.ClickHouseSql.sql(spark, s"ALTER TABLE $t DROP INDEX $ix")
    }
    assert(graft.sql.ClickHouseSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM $t WHERE source = 'src1'").head().getLong(0) == direct)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("set index: exact pruning under the cap, overflow degrades to match-all") {
    val setBase = Files.createTempDirectory("skipset").toString
    Tables.load(spark, sf, "documents")
      .repartitionByRange(5, col("source"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$setBase/data")
    // cap 50 ≥ per-file distinct sources → exact sets everywhere
    SkipIndex.createSet(spark, s"$setBase/data", s"$setBase/ex", Seq("source"), 50)
    val matched = SkipIndex.matchingFilesSet(spark, s"$setBase/ex", "source", Seq("src2"))
    assert(matched.size < 5, s"exact set should prune, got ${matched.size} of 5")
    val viaIdx = SkipIndex.scanSet(spark, s"$setBase/data", s"$setBase/ex",
      "source", Seq("src2")).count()
    val full = spark.read.parquet(s"$setBase/data")
      .filter(col("source") === "src2").count()
    assert(viaIdx == full && full > 0)
    // cap 1 < distinct count → every file overflows and matches (correct,
    // just unpruned)
    SkipIndex.createSet(spark, s"$setBase/data", s"$setBase/ov", Seq("source"), 1)
    assert(SkipIndex.matchingFilesSet(spark, s"$setBase/ov", "source",
      Seq("src2")).size == 5)
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
