package graft

import graft.operators.Mutations
import org.apache.spark.sql.functions._

class MutationsSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  test("update/delete mutate matching rows only") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "grp", "v")
    val upd = Mutations.update(df, col("grp") === "a", Map("v" -> (col("v") + 1)))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(upd == Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "a", 31.0)))
    val del = Mutations.delete(df, col("v") >= 20.0)
      .select("id").as[Long].collect().toSeq
    assert(del == Seq(1L))
  }

  test("dynamic partition overwrite rewrites only affected partitions") {
    val spark = SparkTestBase.spark
    val path = java.nio.file.Files.createTempDirectory("graft_mut").toString
    val base = Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("id", "part", "v")
    base.write.partitionBy("part").mode("overwrite").parquet(path)
    // Mutate ONLY partition p1 (delete id=1) and overwrite dynamically:
    // p2's files must survive untouched.
    val mutated = Mutations.delete(
      Mutations.readTable(spark, path).filter(col("part") === "p1"),
      col("id") === 1L)
    Mutations.overwritePartitions(mutated, path, "part")
    val after = Mutations.readTable(spark, path)
      .select("id", "part").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(after == Seq((2L, "p1"), (3L, "p2")))
  }
}
