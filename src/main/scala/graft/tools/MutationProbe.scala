package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split probe for q_mutation_rewrite (diagnostic only): CTAS write,
  * ALTER UPDATE durable rewrite, final aggregate. */
object MutationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ch = graft.sql.ClickHouseSql
    val t = "graft_mutbench_t"

    def phase(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    graft.Tables.register(spark, sfDir)
    (1 to 4).foreach { i =>
      println(s"== iteration $i")
      phase("scratch") {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t)
        wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(wh, true)
      }
      phase("ctas") {
        graft.Tables.load(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_discount", "l_returnflag",
            "l_shipdate")
          .repartition(8, col("l_orderkey"))
          .write.partitionBy("l_returnflag").saveAsTable(t)
      }
      phase("alter update") {
        ch.sql(spark, s"ALTER TABLE $t UPDATE l_discount = 0.0 " +
          "WHERE l_returnflag = 'R' AND l_quantity < 10")
      }
      phase("final agg") {
        ch.sql(spark, s"""
          SELECT l_returnflag, count() AS n,
            CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
          FROM $t GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
      }
    }
    spark.stop()
  }
}
