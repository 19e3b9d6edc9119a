package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the plan
  * evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [q1,q2,...]
  * (no query list = the bench headline set). Explain only — no query is
  * executed, so this is safe to run next to nothing-in-particular; queries
  * that EXECUTE work at build time (CTAS/mutation verbs) still run their
  * setup, so prefer the bench-headline subset on a quiet box.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/plans"
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else graft.Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val queries = graft.SparkEntry.queries
    names.foreach { n =>
      queries.get(n) match {
        case None => System.err.println(s"PLANDUMP unknown query $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/$n.txt"), txt)
            System.err.println(s"PLANDUMP $n ok (${txt.length} chars)")
          } catch {
            case e: Throwable =>
              System.err.println(s"PLANDUMP $n FAILED: $e")
          }
      }
    }
    spark.stop()
  }
}
