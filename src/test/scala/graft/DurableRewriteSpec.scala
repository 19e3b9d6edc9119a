package graft

import graft.operators.DurableRewrite
import graft.sql.ClickHouseSql
import org.apache.spark.sql.functions._

/** Round-10 verdict #1 pins: mutations are durable (a crash between the
  * staged copy and the swap leaves original-or-staged, never neither)
  * and partition-pruned (a statement touching one partition never
  * rewrites the others' files). */
class DurableRewriteSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private def mkPartitioned(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, 10.0, "p1"), (2L, 20.0, "p1"), (3L, 30.0, "p2"),
        (4L, 40.0, "p3"), (5L, 50.0, "p3"))
      .toDF("id", "v", "part")
      .write.partitionBy("part").saveAsTable(t)
  }

  private def partFiles(t: String): Map[String, Set[(String, Long)]] =
    spark.table(t).inputFiles.toSet[String]
      .groupBy((f: String) => new org.apache.hadoop.fs.Path(f).getParent.getName)
      .map { case (d, files) =>
        d -> files.map { f =>
          val st = new java.io.File(new java.net.URI(f))
          (st.getName, st.lastModified())
        }
      }

  test("UPDATE hitting one partition leaves other partitions' files untouched") {
    val t = "graft_durable_upd"
    mkPartitioned(t)
    val before = partFiles(t)
    ClickHouseSql.sql(spark, s"ALTER TABLE $t UPDATE v = 0.0 WHERE part = 'p2'")
    val after = partFiles(t)
    // p1/p3 byte-identical file lists with unchanged mtimes; p2 rewritten
    assert(after("part=p1") == before("part=p1"))
    assert(after("part=p3") == before("part=p3"))
    assert(after("part=p2") != before("part=p2"))
    assert(DurableRewrite.stats.get(t) == DurableRewrite.Result(1, 2))
    val rows = spark.table(t).select("id", "v").orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 10.0), (2L, 20.0), (3L, 0.0), (4L, 40.0), (5L, 50.0)))
    spark.sql(s"DROP TABLE $t")
  }

  test("predicate on a data column still prunes to partitions with matches") {
    val t = "graft_durable_prune2"
    mkPartitioned(t)
    val before = partFiles(t)
    // id=3 lives only in p2 — p1/p3 must not rewrite even though the
    // WHERE references no partition column
    ClickHouseSql.sql(spark, s"ALTER TABLE $t UPDATE v = -1.0 WHERE id = 3")
    val after = partFiles(t)
    assert(after("part=p1") == before("part=p1"))
    assert(after("part=p3") == before("part=p3"))
    assert(DurableRewrite.stats.get(t) == DurableRewrite.Result(1, 2))
    spark.sql(s"DROP TABLE $t")
  }

  test("no-match mutation touches no files at all") {
    val t = "graft_durable_noop"
    mkPartitioned(t)
    val before = partFiles(t)
    ClickHouseSql.sql(spark, s"ALTER TABLE $t DELETE WHERE id = 999")
    assert(partFiles(t) == before)
    assert(DurableRewrite.stats.get(t) == DurableRewrite.Result(0, 3))
    spark.sql(s"DROP TABLE $t")
  }

  test("DELETE that empties a partition retires it (no resurrection)") {
    val t = "graft_durable_empty"
    mkPartitioned(t)
    ClickHouseSql.sql(spark, s"ALTER TABLE $t DELETE WHERE part = 'p2'")
    val rows = spark.table(t).select("id").orderBy("id").as[Long].collect().toSeq
    assert(rows == Seq(1L, 2L, 4L, 5L))
    assert(!spark.table(t).inputFiles.exists(_.contains("part=p2")))
    spark.sql(s"DROP TABLE $t")
  }

  test("failure between stage and swap leaves original-or-staged, never neither") {
    val t = "graft_durable_crash"
    mkPartitioned(t)
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .location.getPath
    DurableRewrite.failpoint = _ => throw new RuntimeException("simulated crash")
    try {
      intercept[RuntimeException] {
        ClickHouseSql.sql(spark, s"ALTER TABLE $t UPDATE v = 0.0 WHERE part = 'p2'")
      }
    } finally DurableRewrite.failpoint = _ => ()
    // original table data is intact (the destructive swap never started)
    val rows = spark.table(t).select("id", "v").orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(rows.map(_._2) == Seq(10.0, 20.0, 30.0, 40.0, 50.0))
    // AND the staged copy is durable on disk — the recovery artifact
    val stage = new org.apache.hadoop.fs.Path(loc + "__mutating")
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(stage), "staged copy must survive the simulated crash")
    val staged = spark.read.schema(spark.table(t).schema).parquet(stage.toString)
    assert(staged.filter(col("part") === "p2").select("v").as[Double]
      .collect().toSeq == Seq(0.0))
    fs.delete(stage, true)
    spark.sql(s"DROP TABLE $t")
  }

  test("replaceTable failure leaves the original table readable") {
    val t = "graft_durable_replace"
    mkPartitioned(t)
    DurableRewrite.failpoint = _ => throw new RuntimeException("simulated crash")
    try {
      intercept[RuntimeException] {
        ClickHouseSql.sql(spark, s"ALTER TABLE $t DROP COLUMN v")
      }
    } finally DurableRewrite.failpoint = _ => ()
    assert(spark.table(t).columns.toSeq == Seq("id", "v", "part"))
    assert(spark.table(t).count() == 5)
    spark.sql(s"DROP TABLE $t")
  }

  test("partition-key columns cannot be mutated (reference key-column rule)") {
    val t = "graft_durable_keyguard"
    mkPartitioned(t)
    try {
      val e1 = intercept[IllegalArgumentException] {
        ClickHouseSql.sql(spark, s"ALTER TABLE $t UPDATE part = 'p9' WHERE id = 1")
      }
      assert(e1.getMessage.contains("key column"))
      val e2 = intercept[IllegalArgumentException] {
        ClickHouseSql.sql(spark, s"ALTER TABLE $t CLEAR COLUMN part")
      }
      assert(e2.getMessage.contains("key column"))
      // non-key mutations still work afterwards
      ClickHouseSql.sql(spark, s"ALTER TABLE $t UPDATE v = 0.0 WHERE id = 1")
      assert(spark.table(t).filter(col("id") === 1).select("v")
        .as[Double].collect().head == 0.0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("unpartitioned mutation still durable via full staged rewrite") {
    val t = "graft_durable_flat"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v").write.saveAsTable(t)
    ClickHouseSql.sql(spark, s"ALTER TABLE $t UPDATE v = 9.0 WHERE id = 2")
    val rows = spark.table(t).orderBy("id").as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))
    assert(DurableRewrite.stats.get(t) == DurableRewrite.Result(1, 0))
    spark.sql(s"DROP TABLE $t")
  }
}
