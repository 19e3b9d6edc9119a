package graft.tools

/** Dev utility: print query/oracle counts and the no-oracle tail. */
object QCount {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${qs.size} oracled=${os.size}")
    println("no_oracle: " + (qs -- os).toSeq.sorted.mkString(", "))
  }
}
