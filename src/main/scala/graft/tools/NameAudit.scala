package graft.tools

import org.apache.spark.sql.SparkSession

/** Registry audit: reads one function name per line from `args(0)`,
  * installs the alias registry, and writes the names that do NOT
  * resolve (neither a Spark built-in nor a graft registration) to
  * `args(1)`. Backs the FUNCTIONS.md sweep claims — run it against
  * the list extracted from the reference's registration macros to get
  * the real residue instead of a text diff. */
object NameAudit {
  def main(args: Array[String]): Unit = {
    val Array(inFile, outFile) = args
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.ChFunctionRegistry.install(spark)
    val names = scala.io.Source.fromFile(inFile).getLines()
      .map(_.trim).filter(_.nonEmpty).toSeq
    val reg = spark.sessionState.functionRegistry
    val unresolved = names.filterNot(n => reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier(n.toLowerCase)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      unresolved.mkString("\n") + "\n")
    println(s"checked ${names.size}, unresolved ${unresolved.size}")
    spark.stop()
  }
}
