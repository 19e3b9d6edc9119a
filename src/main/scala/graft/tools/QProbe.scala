package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-floor probes for optimization work: times the irreducible pieces
  * (scan, collect, sort) that bound what any query over the corpus can
  * achieve. Diagnostic only — never part of the bench contract.
  */
object QProbe {
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

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name min ${ts.min}%.3f s  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val li = () => graft.Tables.load(spark, sfDir, "lineitem")
    time("lineitem scan noop (all cols)") {
      li().write.format("noop").mode("overwrite").save()
    }
    time("lineitem narrow noop (3 cols)") {
      li().select("l_orderkey", "l_linenumber", "l_quantity")
        .write.format("noop").mode("overwrite").save()
    }
    time("lineitem narrow collect unsorted (5 cols)") {
      li().select(col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("int").as("a"),
        col("l_linenumber").cast("int").as("b"),
        col("l_quantity").cast("double").as("c")).collect()
    }
    time("lineitem narrow orderBy collect (5 cols)") {
      li().select(col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("int").as("a"),
        col("l_linenumber").cast("int").as("b"),
        col("l_quantity").cast("double").as("c"))
        .orderBy("l_orderkey", "l_linenumber").collect()
    }
    time("lineitem fanout orderBy collect (5 cols)") {
      graft.operators.ScaleOps.fanOutIfTiny(li(), col("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_linenumber").cast("int").as("a"),
          col("l_linenumber").cast("int").as("b"),
          col("l_quantity").cast("double").as("c"))
        .orderBy("l_orderkey", "l_linenumber").collect()
    }
    spark.stop()
  }
}
