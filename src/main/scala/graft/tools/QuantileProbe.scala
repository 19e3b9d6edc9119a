package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split probe for q_agg_quantile_exact (diagnostic only — never part
  * of the bench contract): times base construction, checkpoint, and each
  * driver-orchestrated job of the ExactQuantiles selection loop.
  */
object QuantileProbe {
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
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name min ${ts.min}%.3f s  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def basePlan() = graft.operators.ScaleOps.fanOutIfTiny(
        graft.Tables.load(spark, sfDir, "lineitem"), col("l_orderkey"))
      .selectExpr("l_returnflag",
        "stack(2, 'q', CAST(l_quantity AS DOUBLE), " +
          "'p', CAST(l_extendedprice AS DOUBLE)) AS (which, v)")
      .select(concat(col("l_returnflag"), lit("|"), col("which")).as("gk"),
        col("v"))

    time("base noop (fanout+stack)") {
      basePlan().write.format("noop").mode("overwrite").save()
    }
    time("base localCheckpoint") {
      basePlan().localCheckpoint()
    }
    time("stats agg over checkpointed base") {
      val b = basePlan().localCheckpoint()
      b.groupBy("gk").agg(count(lit(1)), min("v"), max("v")).collect()
    }
    time("full groupPercentiles over checkpointed base") {
      val b = basePlan().localCheckpoint()
      graft.operators.ExactQuantiles.groupPercentiles(
        b, "gk", "v", Seq(0.25, 0.5, 0.75, 0.9))
    }
    time("full groupPercentiles, NO checkpoint") {
      graft.operators.ExactQuantiles.groupPercentiles(
        basePlan(), "gk", "v", Seq(0.25, 0.5, 0.75, 0.9))
    }
    time("weighted pre-agg (gk,v,count) collect-size probe") {
      println("  weighted rows=" +
        basePlan().groupBy("gk", "v").count().count())
    }
    spark.stop()
  }
}
