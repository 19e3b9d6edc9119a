package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Executable (subprocess) UDF — the reference's
  * src/Functions/UserDefined/ExecutableUserDefinedFunction.h contract:
  * rows stream to a child process as TSV on stdin, transformed rows come
  * back on stdout. Spark-native rendering: `RDD.pipe` — one child process
  * PER PARTITION, streaming both ways, so at 1000 executors the
  * subprocess fan-out is exactly the reference's pool-per-shard model.
  */
object ExecutableUdf {

  /** Pipe `df` through `command` (launched via /bin/sh -c). Input rows are
    * TAB-joined column casts-to-string; output lines are TAB-split and
    * cast to `outSchema`'s types.
    *
    * NULL columns are emitted as EMPTY fields: concat_ws DROPS null inputs
    * entirely, which would shift every later column one TSV field left and
    * silently parse wrong values into wrong columns (the reference emits
    * empty fields for NULLs — ExecutableUserDefinedFunction.h's TSV
    * contract) — hence the coalesce-to-"" wrap per column. */
  def pipe(df: DataFrame, command: String, outSchema: StructType): DataFrame = {
    val spark = df.sparkSession
    val tsv = df.select(
      concat_ws("\t",
        df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*).as("line"))
    val piped = tsv.rdd.map(_.getString(0)).pipe(Seq("/bin/sh", "-c", command))
    val n = outSchema.length
    val rawSchema = StructType(outSchema.map(f => StructField(f.name, StringType)))
    val rows = piped.map { line =>
      val parts = line.split("\t", -1)
      Row.fromSeq((0 until n).map(i => if (i < parts.length) parts(i) else null))
    }
    val raw = spark.createDataFrame(rows, rawSchema)
    // try_cast, not cast: an empty field (the NULL encoding above) must
    // read back as NULL, and under ANSI mode a plain CAST('' AS BIGINT)
    // throws instead.
    raw.select(outSchema.map(f =>
      expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)): _*)
  }
}
