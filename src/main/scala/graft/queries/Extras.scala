package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 inventory lines: table functions, recursive CTE,
  * statistical tests, combinator variants, interpolation, collation,
  * bitmap-cardinality, array math.
  */
object Extras extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // Table functions numbers()/zeros()/generate_series()/values()
    // (src/TableFunctions/TableFunctionNumbers.cpp, ...GenerateSeries.cpp,
    // ...Values.cpp) → spark.range / Seq.toDF.
    Q.df("q_tf_numbers", """
      SELECT n, n * n AS sq FROM (SELECT UNNEST(GENERATE_SERIES(0, 99)) AS n)
      ORDER BY n""") { (s, _) =>
      s.range(0, 100).toDF("n")
        .select(col("n"), (col("n") * col("n")).as("sq"))
        .orderBy("n")
    },

    Q.df("q_tf_generate_series", """
      SELECT UNNEST(GENERATE_SERIES(10, 50, 5)) AS v ORDER BY v""") { (s, _) =>
      s.range(10, 51, 5).toDF("v").orderBy("v")
    },

    Q.df("q_tf_values", """
      SELECT * FROM (VALUES ('a', 1), ('b', 2), ('c', 3)) AS t(tag, v)
      ORDER BY tag""") { (s, _) =>
      import s.implicits._
      Seq(("a", 1), ("b", 2), ("c", 3)).toDF("tag", "v").orderBy("tag")
    },

    // file() table function (round 8 — TableFunctionFile.cpp): a CSV
    // fixture written through the engine's own CSVWithNames writer reads
    // back via `FROM file('path', 'CSVWithNames', 'cols')` through the
    // dialect; oracle recomputes from the source table.
    Q.df("q_tf_file", """
      SELECT n_nationkey AS k, n_name AS name FROM nation ORDER BY k""") { (s, dir) =>
      val path = s"/tmp/graft_filefn_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val src = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("k"),
          col("n_name").as("name"))
      graft.sources.ChTextFormats.writeCsv(src, path, withNames = true)
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT k, name FROM file('$path', 'CSVWithNames', " +
          "'k Int64, name String') ORDER BY k")
        .select(col("k").cast("integer").as("k"), col("name"))
    },

    // format() table function (round 12 — TableFunctionFormat.cpp):
    // inline data parsed through the named input format with the schema
    // INFERRED from the data; nameless formats name columns c1..cN.
    // Three format lanes (CSV / JSONEachRow / Values) unioned into one
    // frame the oracle restates as plain VALUES.
    Q.df("q_tf_format", """
      SELECT * FROM (VALUES
        ('csv', 1, 'one'), ('csv', 2, 'two'),
        ('json', 1, 'one'), ('json', 2, 'two'),
        ('values', 1, 'one'), ('values', 2, 'two'))
        AS t(src, k, v) ORDER BY src, k""") { (s, _) =>
      graft.sql.ClickHouseSql.sql(s, """
        SELECT 'csv' AS src, c1 AS k, c2 AS v
          FROM format(CSV, '1,one\n2,two')
        UNION ALL
        SELECT 'json' AS src, a AS k, b AS v
          FROM format(JSONEachRow,
            '{"a": 1, "b": "one"}\n{"a": 2, "b": "two"}')
        UNION ALL
        SELECT 'values' AS src, c1 AS k, c2 AS v
          FROM format(Values, '(1, ''one''), (2, ''two'')')
        ORDER BY src, k""")
        .select(col("src"), col("k").cast("integer").as("k"), col("v"))
    },

    // remote()/null() table functions (round 12 —
    // TableFunctionRemote.cpp, TableFunctionNull.cpp): localhost
    // addresses resolve to the local catalog table (what the reference
    // does on a one-node cluster; any OTHER address is a loud error,
    // never a silent local read); null('structure') reads empty.
    Q.df("q_tf_remote_null", """
      SELECT (SELECT count(*) FROM nation) AS remote_n,
             CAST(0 AS BIGINT) AS null_n,
             CAST(500 AS BIGINT) AS zeros_n,
             CAST(0 AS BIGINT) AS zeros_sum""") { (s, dir) =>
      Tables.register(s, dir)
      graft.sql.ClickHouseSql.sql(s, """
        SELECT a.n AS remote_n, b.n AS null_n, c.n AS zeros_n,
               c.s AS zeros_sum
        FROM (SELECT count() AS n FROM remote('localhost', default, nation)) a
        CROSS JOIN (SELECT count() AS n FROM null('x Int64')) b
        CROSS JOIN (SELECT count() AS n, sum(zero) AS s FROM zeros(500)) c""")
    },

    // Recursive CTE (src/Processors/QueryPlan/ReadFromRecursiveCTEStep.h):
    // Spark has no recursive CTE — rendered as a driver-side fixpoint loop
    // of DataFrame unions (each iteration is still a distributed job).
    // Computes 1..10 factorial-ish chain: path lengths in a key graph.
    Q.df("q_recursive_cte", """
      WITH RECURSIVE r(n, fact) AS (
        SELECT 1, CAST(1 AS BIGINT)
        UNION ALL
        SELECT n + 1, fact * (n + 1) FROM r WHERE n < 10)
      SELECT n, fact FROM r ORDER BY n""") { (s, _) =>
      import s.implicits._
      var acc = Seq((1, 1L)).toDF("n", "fact")
      var frontier = acc
      var done = false
      var iter = 0
      val maxIter = 1000 // fixpoint guard, like the reference's
                         // max_recursive_cte_evaluation_depth setting
      while (!done && iter < maxIter) {
        iter += 1
        val next = frontier.filter(col("n") < 10)
          .select((col("n") + 1).as("n"), (col("fact") * (col("n") + 1)).as("fact"))
        if (next.isEmpty) done = true
        else {
          acc = acc.unionByName(next); frontier = next
          // truncate lineage every few iterations: an unbounded union chain
          // makes the plan (and each isEmpty job) grow quadratically deep
          if (iter % 8 == 0) acc = acc.localCheckpoint()
        }
      }
      acc.orderBy("n")
    },

    // Welch t-test statistic (AggregateFunctionStudentTTest/WelchTTest):
    // composed from moment aggregates — identical arithmetic in the oracle.
    Q.shared("q_agg_welch_ttest", """
      WITH g AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 'a' ELSE 'b' END AS grp,
               l_extendedprice AS x
        FROM lineitem),
      m AS (SELECT grp, COUNT(*) AS n, AVG(x) AS mean, VAR_SAMP(x) AS v
            FROM g GROUP BY grp)
      SELECT ROUND((a.mean - b.mean)
               / SQRT(a.v / a.n + b.v / b.n), 4) AS t_stat,
             a.n AS n_a, b.n AS n_b
      FROM (SELECT * FROM m WHERE grp = 'a') a
      CROSS JOIN (SELECT * FROM m WHERE grp = 'b') b"""),

    // -Array combinator (Combinators/AggregateFunctionArray.cpp):
    // aggregate over array elements — sumArray/avgArray/maxArray over the
    // embedding vectors per label.
    Q.df("q_agg_array_combinator", """
      SELECT label,
        ROUND(SUM(e) , 4) AS sum_array,
        ROUND(MAX(e), 6) AS max_array,
        COUNT(*) AS n_elems
      FROM (SELECT label, UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS e
            FROM embeddings)
      GROUP BY label
      ORDER BY label""") { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("label"),
          explode(transform(col("embedding"), x => x.cast("double"))).as("e"))
        .groupBy("label")
        .agg(round(sum(col("e")), 4).as("sum_array"),
          round(max(col("e")), 6).as("max_array"),
          count(lit(1)).as("n_elems"))
        .orderBy("label")
    },

    // -State/-Merge semantics via re-aggregable partials (the
    // AggregatingMergeTree read path, src/Processors/Merges/Algorithms/
    // AggregatingSortedAlgorithm): store per-(flag,status) partial
    // (sum, count) states, then MERGE them to per-flag finals — exactly
    // what -State columns + -Merge reads do, with the state as columns.
    Q.shared("q_agg_state_merge", """
      WITH states AS (
        SELECT l_returnflag, l_linestatus,
          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_state,
          COUNT(*) AS count_state
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus)
      SELECT l_returnflag,
        CAST(SUM(sum_state) AS DOUBLE) AS merged_sum,
        CAST(SUM(count_state) AS BIGINT) AS merged_count,
        CAST(SUM(sum_state) AS DOUBLE) / SUM(count_state) AS merged_avg
      FROM states
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),

    // WITH FILL + INTERPOLATE carry-forward (FillingTransform +
    // InterpolateDescription): missing months take the last seen value.
    Q.df("q_fill_interpolate", """
      WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS m,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders WHERE o_custkey <= 30 GROUP BY 1),
      axis AS (SELECT UNNEST(GENERATE_SERIES(TIMESTAMP '1995-01-01',
                 TIMESTAMP '2001-08-01', INTERVAL 1 MONTH)) AS m)
      SELECT axis.m,
        COALESCE(revenue,
          LAST_VALUE(revenue IGNORE NULLS) OVER (ORDER BY axis.m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS revenue
      FROM axis LEFT JOIN monthly USING (m)
      ORDER BY axis.m""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 30)
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      val filled = graft.operators.SortLimitOps
        .withFillMonths(monthly, "m", "1995-01-01", "2001-08-01")
      val w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
      filled.select(col("m"),
        coalesce(col("revenue"), last(col("revenue"), ignoreNulls = true).over(w),
          lit(0.0)).as("revenue"))
        .orderBy("m")
    },

    // Collation-style case-insensitive ordering (src/Columns/Collator.cpp)
    // rendered as an explicit collation key.
    Q.shared("q_collation_sort", """
      SELECT p_partkey, p_name
      FROM part
      ORDER BY LOWER(p_name), p_partkey
      LIMIT 300"""),

    // groupBitmap cardinality (AggregateFunctionGroupBitmap.cpp): the
    // bitmap's observable surface is set cardinality + membership algebra —
    // AND/OR cardinalities across two event-type sets per user.
    Q.shared("q_bitmap_cardinality", """
      SELECT
        COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS card_view,
        COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS card_purchase,
        COUNT(DISTINCT CASE WHEN event_type IN ('view', 'purchase') THEN user_id END) AS card_or,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
           + COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
           - COUNT(DISTINCT CASE WHEN event_type IN ('view', 'purchase') THEN user_id END) AS BIGINT) AS card_and
      FROM events"""),

    // arrayCumSum / arrayDifference (src/Functions/array/arrayCumSum.cpp,
    // arrayDifference.cpp) — HOF compositions over a small array.
    Q.sparkSql("q_array_math", """
      SELECT
        ARRAY_JOIN(TRANSFORM(TRANSFORM(SEQUENCE(1, 6), (x, i) ->
          AGGREGATE(SLICE(SEQUENCE(1, 6), 1, i + 1), 0, (a, y) -> a + y)),
          v -> CAST(v AS STRING)), ',') AS cumsum,
        ARRAY_JOIN(TRANSFORM(TRANSFORM(SEQUENCE(1, 6), (x, i) ->
          CASE WHEN i = 0 THEN 0 ELSE x - ELEMENT_AT(SEQUENCE(1, 6), i) END),
          v -> CAST(v AS STRING)), ',') AS diff,
        AGGREGATE(SEQUENCE(1, 6), 0, (a, x) -> a + x * x) AS sum_squares""",
      """
      SELECT
        '1,3,6,10,15,21' AS cumsum,
        '0,1,1,1,1,1' AS diff,
        CAST(91 AS INT) AS sum_squares""")
  ,

    // deltaLake('path') table function (round-13 — native transaction-
    // log replay, sources/DeltaLakeSource; reference
    // TableFunctionObjectStorage.h:100 over DeltaLakeMetadata.cpp).
    // The fixture is a hand-built PROTOCOL.md table: commit 0 adds two
    // partition files of customer rows, commit 1 REMOVES the second and
    // adds a third — the read must see exactly commit 1's active set
    // with the partition column restored from the log, which the
    // oracle states as the equivalent predicate over customer.
    Q.df("q_tf_delta_lake", """
      SELECT c_custkey, c_name, seg FROM (
        SELECT c_custkey, c_name, 'lo' AS seg FROM customer
        WHERE c_custkey <= 100
        UNION ALL
        SELECT c_custkey, c_name, 'hi' AS seg FROM customer
        WHERE c_custkey > 200 AND c_custkey <= 300) t
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_deltafn_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      def file(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val tmp = s"$root/__tmp_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.startsWith("part-")).get
        fs.rename(part, new org.apache.hadoop.fs.Path(root, name))
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      file("lo.parquet", cust.filter(col("c_custkey") <= 100))
      file("mid.parquet", cust.filter(
        col("c_custkey") > 100 && col("c_custkey") <= 200))
      file("hi.parquet", cust.filter(
        col("c_custkey") > 200 && col("c_custkey") <= 300))
      val schemaString = ("""{"type":"struct","fields":[""" +
        """{"name":"c_custkey","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"c_name","type":"string","nullable":true,"metadata":{}},""" +
        """{"name":"seg","type":"string","nullable":true,"metadata":{}}]}""")
        .replace("\"", "\\\"")
      val log = new org.apache.hadoop.fs.Path(root, "_delta_log")
      fs.mkdirs(log)
      def commit(v: Long, lines: Seq[String]): Unit = {
        val out = fs.create(new org.apache.hadoop.fs.Path(log, f"$v%020d.json"), true)
        try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
        finally out.close()
      }
      commit(0L, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"graft-q","format":{"provider":"parquet"},"schemaString":"$schemaString","partitionColumns":["seg"],"configuration":{}}}""",
        """{"add":{"path":"lo.parquet","partitionValues":{"seg":"lo"},"size":1,"modificationTime":1,"dataChange":true}}""",
        """{"add":{"path":"mid.parquet","partitionValues":{"seg":"mid"},"size":1,"modificationTime":1,"dataChange":true}}"""))
      commit(1L, Seq(
        """{"remove":{"path":"mid.parquet","deletionTimestamp":2,"dataChange":true}}""",
        """{"add":{"path":"hi.parquet","partitionValues":{"seg":"hi"},"size":1,"modificationTime":2,"dataChange":true}}"""))
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name, seg FROM deltaLake('$root') " +
          "ORDER BY c_custkey")
    },

    // hudi('path') table function (round-13 — HudiMetadata.cpp
    // semantics: latest-timestamp base file per file group). The
    // fixture writes file group fg1 TWICE — the stale version carries
    // the keys shifted by 1e6, so a reader that picked the wrong
    // version (or both) is a red row, not a row-count coincidence.
    Q.df("q_tf_hudi", """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey <= 150 ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_hudifn_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(root, ".hoodie"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      def file(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val tmp = s"$root/__tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.startsWith("part-")).get
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/p0"))
        fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/p0", name))
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      val fresh = cust.filter(col("c_custkey") <= 100)
      val stale = fresh.withColumn("c_custkey",
        col("c_custkey") + 1000000L)
      file("fg1_0-1-0_20240101000000.parquet", stale)
      file("fg1_0-2-0_20240102000000.parquet", fresh)
      file("fg2_0-1-0_20240101000000.parquet", cust.filter(
        col("c_custkey") > 100 && col("c_custkey") <= 150))
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name FROM hudi('$root') ORDER BY c_custkey")
    },

    // iceberg('path') table function (round-13 — native metadata/
    // manifest replay, sources/IcebergSource; reference
    // IcebergMetadata.cpp). Spec-conformant fixture: two data files
    // live in the manifest, a third is a DELETED entry — the read must
    // see exactly the live set, which the oracle states as the
    // equivalent predicate over customer.
    Q.df("q_tf_iceberg", """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey <= 120 ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_icefn_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      def file(name: String, df: org.apache.spark.sql.DataFrame): String = {
        val tmp = s"$root/__tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.startsWith("part-")).get
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/data"))
        val dst = new org.apache.hadoop.fs.Path(s"$root/data", name)
        fs.rename(part, dst)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
        dst.toString
      }
      val f1 = file("d1.parquet", cust.filter(col("c_custkey") <= 60))
      val f2 = file("d2.parquet", cust.filter(
        col("c_custkey") > 60 && col("c_custkey") <= 120))
      val f3 = file("d3.parquet", cust.filter(
        col("c_custkey") > 120 && col("c_custkey") <= 180))
      val entrySchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"manifest_entry","fields":[
          {"name":"status","type":"int"},
          {"name":"data_file","type":{"type":"record","name":"data_file",
            "fields":[{"name":"content","type":"int","default":0},
              {"name":"file_path","type":"string"},
              {"name":"file_format","type":"string"},
              {"name":"record_count","type":"long"}]}}]}""")
      val listSchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"manifest_file","fields":[
          {"name":"manifest_path","type":"string"},
          {"name":"manifest_length","type":"long"},
          {"name":"content","type":"int","default":0}]}""")
      def entry(status: Int, p: String) = {
        val d = new org.apache.avro.generic.GenericData.Record(
          entrySchema.getField("data_file").schema())
        d.put("content", 0); d.put("file_path", p)
        d.put("file_format", "PARQUET"); d.put("record_count", 1L)
        val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
        e.put("status", status); e.put("data_file", d); e
      }
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/metadata"))
      def writeAvro(path: String, sch: org.apache.avro.Schema,
          rows: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](sch))
        w.create(sch, new java.io.File(path))
        try rows.foreach(w.append) finally w.close()
      }
      val mPath = s"$root/metadata/m1.avro"
      writeAvro(mPath, entrySchema,
        Seq(entry(1, f1), entry(0, f2), entry(2, f3)))
      val ml = new org.apache.avro.generic.GenericData.Record(listSchema)
      ml.put("manifest_path", mPath)
      ml.put("manifest_length", 1L)
      ml.put("content", 0)
      val mlPath = s"$root/metadata/snap-1.avro"
      writeAvro(mlPath, listSchema, Seq(ml))
      val metaJson = s"""{
        "format-version": 2, "table-uuid": "graft-q-iceberg",
        "current-snapshot-id": 101, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
          {"id": 1, "name": "c_custkey", "required": false, "type": "long"},
          {"id": 2, "name": "c_name", "required": false, "type": "string"}]}],
        "snapshots": [{"snapshot-id": 101, "manifest-list": "$mlPath"}]}"""
      val out = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/metadata/v1.metadata.json"), true)
      try out.write(metaJson.getBytes("UTF-8")) finally out.close()
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name FROM iceberg('$root') ORDER BY c_custkey")
    }
  )
}
