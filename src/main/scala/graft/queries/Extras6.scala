package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Round-14 lakehouse row-level surface: Delta deletion-vector reads,
  * Iceberg v2 position/equality deletes, and the Delta append-only
  * write path — the round-13 verdict's top three directives. Each
  * fixture is built per the PUBLIC spec (delta.io PROTOCOL.md /
  * iceberg.apache.org/spec) and oracled against the equivalent
  * predicate over the source table.
  */
object Extras6 extends QueryPack {

  private def fsOf(s: org.apache.spark.sql.SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(
      s.sparkContext.hadoopConfiguration)

  /** Write `df` as one ordered single-file parquet named `name` under
    * `root`, returning the absolute path. */
  private def oneFile(s: org.apache.spark.sql.SparkSession, root: String,
      name: String, df: org.apache.spark.sql.DataFrame,
      sub: String = ""): String = {
    val fs = fsOf(s, root)
    val tmp = s"$root/__tmp_$name"
    df.write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    val dir = if (sub.isEmpty) root else s"$root/$sub"
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    fs.rename(part, dst)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    dst.toString
  }

  override def queries: Seq[Q] = Seq(

    // Delta deletion vectors (round 14 — PROTOCOL.md "Deletion
    // Vectors"; reference reads them through delta-kernel, sources
    // DeltaLake/TableSnapshot.cpp). Fixture: f1 = customers ≤ 100
    // written in key order with a "u"-stored DV masking the positions
    // of keys divisible by 7; f2 = 101..200 without a DV. The oracle
    // states the surviving set as a predicate — a reader that ignored
    // the DV (or mis-indexed it) produces extra/missing rows, not a
    // count coincidence.
    Q.df("q_tf_delta_dv", """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey <= 200
        AND NOT (c_custkey <= 100 AND c_custkey % 7 = 0)
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_deltadv_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      oneFile(s, root, "f1.parquet",
        cust.filter(col("c_custkey") <= 100)
          .repartition(1).sortWithinPartitions("c_custkey"))
      oneFile(s, root, "f2.parquet",
        cust.filter(col("c_custkey") > 100 && col("c_custkey") <= 200))
      val keys = cust.filter(col("c_custkey") <= 100)
        .collect().map(_.getAs[Number](0).longValue).sorted
      val delPos = keys.zipWithIndex.collect {
        case (k, i) if k % 7 == 0 => i.toLong
      }.toSeq
      val data = graft.sources.DeltaDeletionVectors.serializeBitmaps(delPos)
      val uuid = java.util.UUID.randomUUID()
      val off = graft.sources.DeltaDeletionVectors.writeDvFile(fs,
        new org.apache.hadoop.fs.Path(root, s"deletion_vector_$uuid.bin"),
        Seq(data)).head
      val enc = graft.sources.DeltaDeletionVectors.z85EncodeUuid(uuid)
      val schemaString = cust.schema.json.replace("\\", "\\\\")
        .replace("\"", "\\\"")
      val log = new org.apache.hadoop.fs.Path(root, "_delta_log")
      fs.mkdirs(log)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(log, f"${0L}%020d.json"), true)
      try out.write((Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors"],""" +
          """"writerFeatures":["deletionVectors"]}}""",
        s"""{"metaData":{"id":"graft-dv","format":{"provider":"parquet"},""" +
          s""""schemaString":"$schemaString","partitionColumns":[],""" +
          s""""configuration":{}}}""",
        s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,""" +
          s""""modificationTime":1,"dataChange":true,"deletionVector":""" +
          s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":$off,""" +
          s""""sizeInBytes":${data.length},""" +
          s""""cardinality":${delPos.length}}}}""",
        """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,""" +
          """"modificationTime":1,"dataChange":true}}""")
        .mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name FROM deltaLake('$root') " +
          "ORDER BY c_custkey")
    },

    // Iceberg v2 position deletes (round 14 — spec "Position Delete
    // Files"; reference Iceberg/IcebergMetadata.cpp). Fixture: d1 =
    // keys ≤ 60 in key order, d2 = 61..120; a delete manifest (content
    // 1) carries a parquet position-delete file masking d1's positions
    // of keys divisible by 5. Oracle = the surviving predicate.
    Q.df("q_tf_iceberg_posdel", """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey <= 120
        AND NOT (c_custkey <= 60 AND c_custkey % 5 = 0)
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_icepd_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      val f1 = oneFile(s, root, "d1.parquet",
        cust.filter(col("c_custkey") <= 60)
          .repartition(1).sortWithinPartitions("c_custkey"), sub = "data")
      val f2 = oneFile(s, root, "d2.parquet",
        cust.filter(col("c_custkey") > 60 && col("c_custkey") <= 120),
        sub = "data")
      val keys = cust.filter(col("c_custkey") <= 60)
        .collect().map(_.getAs[Number](0).longValue).sorted
      val delPos = keys.zipWithIndex.collect {
        case (k, i) if k % 5 == 0 => i.toLong
      }.toSeq
      import s.implicits._
      val pd = oneFile(s, root, "pd1.parquet",
        delPos.map(p => (f1, p)).toDF("file_path", "pos").coalesce(1),
        sub = "data")

      val listSchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"manifest_file","fields":[
          {"name":"manifest_path","type":"string"},
          {"name":"manifest_length","type":"long"},
          {"name":"content","type":"int","default":0},
          {"name":"sequence_number","type":"long","default":0}]}""")
      val entrySchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"manifest_entry","fields":[
          {"name":"status","type":"int"},
          {"name":"data_file","type":{"type":"record","name":"data_file",
            "fields":[{"name":"content","type":"int","default":0},
              {"name":"file_path","type":"string"},
              {"name":"file_format","type":"string"},
              {"name":"record_count","type":"long"}]}}]}""")
      def entry(p: String, content: Int) = {
        val d = new org.apache.avro.generic.GenericData.Record(
          entrySchema.getField("data_file").schema())
        d.put("content", content); d.put("file_path", p)
        d.put("file_format", "PARQUET"); d.put("record_count", 1L)
        val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
        e.put("status", 1); e.put("data_file", d); e
      }
      def ref(p: String, content: Int, seq: Long) = {
        val r = new org.apache.avro.generic.GenericData.Record(listSchema)
        r.put("manifest_path", p); r.put("manifest_length", 1L)
        r.put("content", content); r.put("sequence_number", seq); r
      }
      def writeAvro(path: String, sch: org.apache.avro.Schema,
          rows: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](sch))
        w.create(sch, new java.io.File(path))
        try rows.foreach(w.append) finally w.close()
      }
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/metadata"))
      val mData = s"$root/metadata/m-data.avro"
      writeAvro(mData, entrySchema, Seq(entry(f1, 0), entry(f2, 0)))
      val mDel = s"$root/metadata/m-del.avro"
      writeAvro(mDel, entrySchema, Seq(entry(pd, 1)))
      val ml = s"$root/metadata/snap-9.avro"
      writeAvro(ml, listSchema, Seq(ref(mData, 0, 1L), ref(mDel, 1, 2L)))
      val metaJson = s"""{
        "format-version": 2, "table-uuid": "graft-q-icepd",
        "current-snapshot-id": 9, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
          {"id": 1, "name": "c_custkey", "required": false, "type": "long"},
          {"id": 2, "name": "c_name", "required": false, "type": "string"}]}],
        "snapshots": [{"snapshot-id": 9, "manifest-list": "$ml"}]}"""
      val out = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/metadata/v1.metadata.json"), true)
      try out.write(metaJson.getBytes("UTF-8")) finally out.close()
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name FROM iceberg('$root') " +
          "ORDER BY c_custkey")
    },

    // Iceberg v2 equality deletes (spec "Equality Delete Files"):
    // a seq-2 delete on c_custkey ∈ {10,20,30} masks the seq-1 data,
    // while a seq-3 data file RE-ADDS key 10 — the spec's
    // sequence-number rule keeps the re-add. Oracle restates both.
    Q.df("q_tf_iceberg_eqdel", """
      SELECT c_custkey, c_name FROM (
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey <= 60 AND c_custkey NOT IN (10, 20, 30)
        UNION ALL
        SELECT c_custkey, c_name FROM customer WHERE c_custkey = 10) t
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_iceeq_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      val f1 = oneFile(s, root, "d1.parquet",
        cust.filter(col("c_custkey") <= 60), sub = "data")
      val f2 = oneFile(s, root, "d2.parquet",
        cust.filter(col("c_custkey") === 10), sub = "data")
      import s.implicits._
      val ed = oneFile(s, root, "ed1.parquet",
        Seq(10L, 20L, 30L).toDF("c_custkey")
          .select(col("c_custkey").cast(
            cust.schema("c_custkey").dataType)).coalesce(1), sub = "data")

      val listSchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"manifest_file","fields":[
          {"name":"manifest_path","type":"string"},
          {"name":"manifest_length","type":"long"},
          {"name":"content","type":"int","default":0},
          {"name":"sequence_number","type":"long","default":0}]}""")
      val entrySchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"manifest_entry","fields":[
          {"name":"status","type":"int"},
          {"name":"data_file","type":{"type":"record","name":"data_file",
            "fields":[{"name":"content","type":"int","default":0},
              {"name":"file_path","type":"string"},
              {"name":"file_format","type":"string"},
              {"name":"record_count","type":"long"},
              {"name":"equality_ids",
                "type":["null",{"type":"array","items":"int"}],
                "default":null}]}}]}""")
      def entry(p: String, content: Int, eqIds: Seq[Int]) = {
        val d = new org.apache.avro.generic.GenericData.Record(
          entrySchema.getField("data_file").schema())
        d.put("content", content); d.put("file_path", p)
        d.put("file_format", "PARQUET"); d.put("record_count", 1L)
        if (eqIds.nonEmpty) {
          import scala.jdk.CollectionConverters._
          d.put("equality_ids", eqIds.map(Integer.valueOf).asJava)
        }
        val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
        e.put("status", 1); e.put("data_file", d); e
      }
      def ref(p: String, content: Int, seq: Long) = {
        val r = new org.apache.avro.generic.GenericData.Record(listSchema)
        r.put("manifest_path", p); r.put("manifest_length", 1L)
        r.put("content", content); r.put("sequence_number", seq); r
      }
      def writeAvro(path: String, sch: org.apache.avro.Schema,
          rows: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](sch))
        w.create(sch, new java.io.File(path))
        try rows.foreach(w.append) finally w.close()
      }
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/metadata"))
      val m1 = s"$root/metadata/m1.avro"
      writeAvro(m1, entrySchema, Seq(entry(f1, 0, Seq.empty)))
      val m2 = s"$root/metadata/m2.avro"
      writeAvro(m2, entrySchema, Seq(entry(f2, 0, Seq.empty)))
      val mEq = s"$root/metadata/m-eq.avro"
      writeAvro(mEq, entrySchema, Seq(entry(ed, 2, Seq(1))))
      val ml = s"$root/metadata/snap-5.avro"
      writeAvro(ml, listSchema, Seq(
        ref(m1, 0, 1L), ref(mEq, 1, 2L), ref(m2, 0, 3L)))
      val metaJson = s"""{
        "format-version": 2, "table-uuid": "graft-q-iceeq",
        "current-snapshot-id": 5, "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
          {"id": 1, "name": "c_custkey", "required": false, "type": "long"},
          {"id": 2, "name": "c_name", "required": false, "type": "string"}]}],
        "snapshots": [{"snapshot-id": 5, "manifest-list": "$ml"}]}"""
      val out = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/metadata/v1.metadata.json"), true)
      try out.write(metaJson.getBytes("UTF-8")) finally out.close()
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name FROM iceberg('$root') " +
          "ORDER BY c_custkey")
    },

    // Delta WRITE roundtrip (round 14 — the reference's INSERT INTO
    // TABLE FUNCTION deltaLake(...) surface over its kernel write
    // support): create a partitioned table through the dialect write
    // lane, append a second commit, read it back through the native
    // log replay. The oracle restates the union; time-travel v0 row
    // count is asserted inside the fixture (a wrong commit layout
    // would double- or under-count).
    Q.df("q_delta_write_roundtrip", """
      SELECT c_custkey, c_name, seg FROM (
        SELECT c_custkey, c_name, CASE WHEN c_custkey % 2 = 0
          THEN 'even' ELSE 'odd' END AS seg
        FROM customer WHERE c_custkey <= 80
        UNION ALL
        SELECT c_custkey, c_name, 'late' AS seg FROM customer
        WHERE c_custkey > 80 AND c_custkey <= 120) t
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_deltaw_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .createOrReplaceTempView("graft_dw_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      val v0 = ch(
        s"INSERT INTO FUNCTION deltaLake('$root') PARTITION BY (seg) " +
          "SELECT c_custkey, c_name, CASE WHEN c_custkey % 2 = 0 " +
          "THEN 'even' ELSE 'odd' END AS seg " +
          "FROM graft_dw_cust WHERE c_custkey <= 80")
        .collect().head.getLong(0)
      require(v0 == 0L, s"creation must commit version 0, got $v0")
      val v1 = ch(
        s"INSERT INTO FUNCTION deltaLake('$root') " +
          "SELECT c_custkey, c_name, 'late' AS seg " +
          "FROM graft_dw_cust WHERE c_custkey > 80 AND c_custkey <= 120")
        .collect().head.getLong(0)
      require(v1 == 1L, s"append must commit version 1, got $v1")
      val n0 = ch(s"SELECT count() AS n FROM deltaLake('$root', 0)")
        .collect().head.getLong(0)
      val expect0 = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 80).count()
      require(n0 == expect0,
        s"time travel to v0 must see only the creation ($expect0), got $n0")
      ch(s"SELECT c_custkey, c_name, seg FROM deltaLake('$root') " +
        "ORDER BY c_custkey")
    },

    // Delta column mapping (round 14 — PROTOCOL.md "Column Mapping",
    // closes the minReaderVersion-2 gate): the parquet files store
    // columns under delta.columnMapping.physicalName and the log keys
    // partitionValues by physical names; the read must surface LOGICAL
    // names with the right values. A reader that matched by position
    // or leaked physical names fails the schema/hash compare.
    Q.df("q_tf_delta_colmap", """
      SELECT c_custkey, c_name,
        CASE WHEN c_custkey % 2 = 0 THEN 'e' ELSE 'o' END AS par
      FROM customer WHERE c_custkey <= 90 ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_deltacm_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 90)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 2 === 0, "e").otherwise("o").as("par"))
      val keyType = cust.schema("c_custkey").dataType.typeName
      // physical files: key → col-k, name → col-n; partition col par →
      // col-p lives only in the log
      oneFile(s, root, "fe.parquet", cust.filter(col("par") === "e")
        .select(col("c_custkey").as("col-k"), col("c_name").as("col-n")))
      oneFile(s, root, "fo.parquet", cust.filter(col("par") === "o")
        .select(col("c_custkey").as("col-k"), col("c_name").as("col-n")))
      def f(name: String, typ: String, id: Int, phys: String) =
        s"""{\\"name\\":\\"$name\\",\\"type\\":\\"$typ\\",""" +
          s"""\\"nullable\\":true,\\"metadata\\":""" +
          s"""{\\"delta.columnMapping.id\\":$id,""" +
          s"""\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
      val schemaString = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
        f("c_custkey", keyType, 1, "col-k") + "," +
        f("c_name", "string", 2, "col-n") + "," +
        f("par", "string", 3, "col-p") + "]}"
      val log = new org.apache.hadoop.fs.Path(root, "_delta_log")
      fs.mkdirs(log)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(log, f"${0L}%020d.json"), true)
      try out.write((Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"graft-cm","format":{"provider":"parquet"},""" +
          s""""schemaString":"$schemaString","partitionColumns":["par"],""" +
          s""""configuration":{"delta.columnMapping.mode":"name",""" +
          s""""delta.columnMapping.maxColumnId":"3"}}}""",
        """{"add":{"path":"fe.parquet","partitionValues":{"col-p":"e"},""" +
          """"size":1,"modificationTime":1,"dataChange":true}}""",
        """{"add":{"path":"fo.parquet","partitionValues":{"col-p":"o"},""" +
          """"size":1,"modificationTime":1,"dataChange":true}}""")
        .mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name, par FROM deltaLake('$root') " +
          "ORDER BY c_custkey")
    },

    // FORMAT One (round 14 — OneFormat.cpp): one dummy=0 row per input
    // file, the content never read — the reference's existence probe.
    // Fixture: three junk files; oracle = three constant rows.
    Q.df("q_format_one", """
      SELECT CAST(0 AS SMALLINT) AS dummy
      FROM (VALUES (1), (2), (3)) t(i)""") { (s, dir) =>
      val root = s"/tmp/graft_fmt_one_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(root))
      Seq("a.bin" -> "opaque", "b.csv" -> "not,parsed", "c" -> "")
        .foreach { case (n, t) =>
          val out = fs.create(new org.apache.hadoop.fs.Path(root, n), true)
          try out.write(t.getBytes("UTF-8")) finally out.close()
        }
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT dummy FROM file('$root', 'One')")
    },

    // FORMAT Form (FormRowInputFormat.cpp): url-encoded k=v&k=v rows,
    // one per file; unknown keys skip, omitted columns default. The
    // fixture percent-encodes real customer names (space → %20, '+'
    // literal), so a form-decoding reader (eating '+') or a skipped
    // junk-key bug shows as a value mismatch, not a count.
    Q.df("q_format_form", """
      SELECT c_custkey, c_name, CAST(0 AS BIGINT) AS extra
      FROM customer WHERE c_custkey <= 4 ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_fmt_form_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(root))
      def pct(v: String): String = v.map { c =>
        if (c.isLetterOrDigit) c.toString
        else "%%%02X".format(c.toInt)
      }.mkString
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 4)
        .select(col("c_custkey"), col("c_name"))
        .collect().foreach { r =>
          val k = r.getAs[Number](0).longValue
          val out = fs.create(
            new org.apache.hadoop.fs.Path(root, s"r$k.form"), true)
          try out.write(
            (s"c_custkey=$k&junk=skipme&c_name=${pct(r.getString(1))}")
              .getBytes("UTF-8"))
          finally out.close()
        }
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name, extra FROM file('$root', 'Form', " +
          "'c_custkey Int64, c_name String, extra Int64') " +
          "ORDER BY c_custkey")
    },

    // FORMAT HiveText (HiveTextRowInputFormat.cpp): header-less CSV
    // with the Hive 0x01 delimiter and \N nulls, read through Spark's
    // native CSV source (distributed/splittable). Fixture restates
    // nation with one NULLed name.
    Q.df("q_format_hivetext", """
      SELECT n_nationkey,
        CASE WHEN n_nationkey = 3 THEN NULL ELSE n_name END AS n_name
      FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_fmt_hive_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(root))
      val lines = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .collect().sortBy(_.getAs[Number](0).longValue)
        .map { r =>
          val k = r.getAs[Number](0).longValue
          val v = if (k == 3) "\\N" else r.getString(1)
          s"$k\u0001$v"
        }
      val out = fs.create(
        new org.apache.hadoop.fs.Path(root, "part1.hive"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT n_nationkey, n_name FROM file('$root', 'HiveText', " +
          "'n_nationkey Int64, n_name String') ORDER BY n_nationkey")
    },

    // Iceberg APPEND (round 14 — write-side counterpart of the native
    // reader; Hadoop-catalog version-file commits): two appends through
    // the sink, read back through the dialect, with the creation
    // snapshot count asserted via snapshot time travel.
    Q.df("q_iceberg_write_roundtrip", """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey <= 100 ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_icew_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      cust.createOrReplaceTempView("graft_icew_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      // both commits ride the dialect's INSERT INTO FUNCTION lane
      val s1 = ch(
        s"INSERT INTO FUNCTION iceberg('$root') " +
          "SELECT c_custkey, c_name FROM graft_icew_cust " +
          "WHERE c_custkey <= 50").collect().head.getLong(0)
      ch(s"INSERT INTO FUNCTION iceberg('$root') " +
        "SELECT c_custkey, c_name FROM graft_icew_cust " +
        "WHERE c_custkey > 50 AND c_custkey <= 100")
      val atS1 = graft.sources.IcebergSource
        .read(s, root, snapshotId = Some(s1)).count()
      val expect1 = cust.filter(col("c_custkey") <= 50).count()
      require(atS1 == expect1,
        s"snapshot travel to the creation must see $expect1, got $atS1")
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name FROM iceberg('$root') " +
          "ORDER BY c_custkey")
    },

    // Iceberg PARTITIONED write, identity transform (round 15 — r14
    // verdict Missing #2): create partitioned-by-nationkey, append a
    // second commit, then read ONE partition through the manifest-level
    // pruning lane — the oracle restates that partition from the source
    // parquet, so a wrong tuple in any manifest entry is a red row. The
    // pruned-scan file count is asserted in-query (must be strictly
    // fewer files than the table holds).
    Q.df("q_iceberg_partitioned_write", """
      SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS nat
      FROM customer WHERE c_custkey <= 600 AND c_nationkey = 7
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_icepw_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("nat"))
        .filter(col("c_custkey") <= 600)
      graft.sources.IcebergSink.append(
        cust.filter(col("c_custkey") <= 300), root,
        partitionBy = Seq("nat"))
      // the second commit derives the spec from the table
      graft.sources.IcebergSink.append(
        cust.filter(col("c_custkey") > 300), root)
      val pruned = graft.sources.IcebergSource.read(s, root,
        partitionEq = Map("nat" -> Some("7")))
      val allFiles = graft.sources.IcebergSource.read(s, root)
        .inputFiles.length
      require(pruned.inputFiles.length < allFiles,
        s"manifest pruning must scan < $allFiles files, " +
          s"got ${pruned.inputFiles.length}")
      pruned.orderBy("c_custkey")
    },

    // FORMAT MySQLDump (MySQLDumpRowInputFormat.cpp): parses the
    // INSERT statements of a mysqldump file, skipping DDL; NULLs,
    // multi-row tuples and a by-name column list all exercised. The
    // oracle restates nation with the NULLed comment.
    Q.df("q_format_mysqldump", """
      SELECT n_nationkey, n_name,
        CASE WHEN n_nationkey % 4 = 0 THEN NULL
             ELSE CAST(n_regionkey AS BIGINT) END AS region
      FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_fmt_mysqldump_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(root))
      val rows = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .collect().sortBy(_.getAs[Number](0).longValue)
      val tuples = rows.map { r =>
        val k = r.getAs[Number](0).longValue
        val rk = if (k % 4 == 0) "NULL"
          else r.getAs[Number](2).longValue.toString
        s"($k,'${r.getString(1).replace("'", "''")}',$rk)"
      }
      val dump =
        "-- MySQL dump (fixture)\n" +
          "DROP TABLE IF EXISTS `nation`;\n" +
          "CREATE TABLE `nation` (x int);\n" +
          s"INSERT INTO `nation` VALUES ${tuples.mkString(",\n  ")};\n" +
          "UNLOCK TABLES;\n"
      val out = fs.create(
        new org.apache.hadoop.fs.Path(root, "dump.sql"), true)
      try out.write(dump.getBytes("UTF-8")) finally out.close()
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT n_nationkey, n_name, region FROM file('$root', " +
          "'MySQLDump', 'n_nationkey Int64, n_name String, " +
          "region Int64') ORDER BY n_nationkey")
    },

    // Delta checkpoint WRITING + overwrite (round 14, pulled forward
    // from the round-15 list): three dialect-written commits with
    // checkpointInterval 2, the pre-checkpoint JSON commits deleted —
    // the read must reconstruct everything from the written checkpoint
    // + the v2 commit; then an overwrite replaces the table. Oracle
    // restates the post-overwrite contents.
    Q.df("q_delta_checkpoint_write", """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey > 40 AND c_custkey <= 70 ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_deltackw_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      def slice(a: Int, b: Int) =
        cust.filter(col("c_custkey") > a && col("c_custkey") <= b)
      graft.sources.DeltaLakeSink.append(slice(0, 10), root,
        checkpointInterval = 2)
      graft.sources.DeltaLakeSink.append(slice(10, 20), root,
        checkpointInterval = 2) // checkpoint at v1
      graft.sources.DeltaLakeSink.append(slice(20, 30), root,
        checkpointInterval = 2)
      val log = new org.apache.hadoop.fs.Path(root, "_delta_log")
      require(fs.exists(new org.apache.hadoop.fs.Path(log,
        f"${1L}%020d.checkpoint.parquet")), "checkpoint must exist")
      fs.delete(new org.apache.hadoop.fs.Path(log, f"${0L}%020d.json"), false)
      fs.delete(new org.apache.hadoop.fs.Path(log, f"${1L}%020d.json"), false)
      val n = graft.sql.ClickHouseSql.sql(s,
        s"SELECT count() AS n FROM deltaLake('$root')")
        .collect().head.getLong(0)
      val expect = cust.filter(
        col("c_custkey") > 0 && col("c_custkey") <= 30).count()
      require(n == expect,
        s"checkpoint-seeded read must see all $expect rows, got $n")
      // overwrite: the final table contents are keys 40..70
      graft.sources.DeltaLakeSink.overwrite(slice(40, 70), root)
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT c_custkey, c_name FROM deltaLake('$root') " +
          "ORDER BY c_custkey")
    },

    // FORMAT CapnProto (CapnProtoRowInputFormat.cpp over libcapnp —
    // here a native implementation of the public encoding; the LAST
    // unported data format): framed single-segment messages, hole-
    // packed scalars, NUL-terminated Text. OUTFILE→INFILE roundtrip
    // behind the reference's format_schema setting.
    Q.df("q_format_capnproto", """
      SELECT n_nationkey, n_name, CAST(n_regionkey * 2.5 AS DOUBLE) AS w
      FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_fmt_capnp_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      fsOf(s, root).mkdirs(new org.apache.hadoop.fs.Path(root))
      Tables.register(s, dir)
      val schemaPath = s"$root/row.capnp"
      val out = fsOf(s, root).create(
        new org.apache.hadoop.fs.Path(schemaPath), true)
      try out.write(("struct N { n_nationkey @0 :Int64; " +
        "n_name @1 :Text; w @2 :Float64; }\n").getBytes("UTF-8"))
      finally out.close()
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"SET format_schema = '$schemaPath:N'")
      try {
        ch("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, " +
          "CAST(n_regionkey * 2.5 AS DOUBLE) AS w FROM nation " +
          s"ORDER BY n_nationkey INTO OUTFILE '$root/data' " +
          "FORMAT CapnProto")
        ch("DROP TABLE IF EXISTS graft_capnp_t")
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), "graft_capnp_t")
        wh.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(wh, true)
        ch("CREATE TABLE graft_capnp_t (n_nationkey Int64, " +
          "n_name String, w Float64) ENGINE = MergeTree " +
          "ORDER BY n_nationkey")
        ch(s"INSERT INTO graft_capnp_t FROM INFILE '$root/data' " +
          "FORMAT CapnProto")
        ch("SELECT n_nationkey, n_name, w FROM graft_capnp_t " +
          "ORDER BY n_nationkey")
      } finally s.conf.unset("graft.ch.format_schema")
    },

    // FORMAT Template (TemplateRowInputFormat.cpp + the
    // format_template_row_format / rows_between settings): a roundtrip
    // through a user-defined row template with mixed escaping rules —
    // OUTFILE writes it, INFILE reads it back into a table.
    Q.df("q_format_template", """
      SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_fmt_tpl_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.register(s, dir)
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch("SET format_template_row_format = " +
        "'row: ${n_nationkey:Quoted} -> ${n_name:CSV}'")
      try {
        ch(s"SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey " +
          s"INTO OUTFILE '$root/data' FORMAT Template")
        ch("DROP TABLE IF EXISTS graft_tpl_t")
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), "graft_tpl_t")
        wh.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(wh, true)
        ch("CREATE TABLE graft_tpl_t (n_nationkey Int64, n_name String) " +
          "ENGINE = MergeTree ORDER BY n_nationkey")
        ch(s"INSERT INTO graft_tpl_t FROM INFILE '$root/data' " +
          "FORMAT Template")
        ch("SELECT n_nationkey, n_name FROM graft_tpl_t " +
          "ORDER BY n_nationkey")
      } finally s.conf.unset("graft.ch.format_template_row_format")
    },

    // FORMAT ProtobufList (ProtobufListInputFormat.cpp — the envelope
    // variant: ONE length-delimited message per stream whose field 1
    // repeats the row message). Roundtrip over nation through the
    // dialect's OUTFILE/INFILE lanes with format_schema set.
    Q.df("q_format_protobuf_list", """
      SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_pblist_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(root))
      val protoPath = s"$root/row.proto"
      val out = fs.create(new org.apache.hadoop.fs.Path(protoPath), true)
      try out.write(("syntax = \"proto3\";\n" +
        "message N { int64 n_nationkey = 1; string n_name = 2; }\n")
        .getBytes("UTF-8"))
      finally out.close()
      val src = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"))
      graft.sources.ChProtobufFormat.writeProtobufList(
        src.coalesce(1), s"$root/data", "syntax = \"proto3\";\n" +
          "message N { int64 n_nationkey = 1; string n_name = 2; }", "N")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"SET format_schema = '$protoPath:N'")
      try {
        ch("DROP TABLE IF EXISTS graft_pblist_t")
        // a prior JVM's managed location survives the catalog — clear it
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), "graft_pblist_t")
        wh.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(wh, true)
        ch("CREATE TABLE graft_pblist_t (n_nationkey Int64, " +
          "n_name String) ENGINE = MergeTree ORDER BY n_nationkey")
        ch(s"INSERT INTO graft_pblist_t FROM INFILE '$root/data' " +
          "FORMAT ProtobufList")
        ch("SELECT n_nationkey, n_name FROM graft_pblist_t " +
          "ORDER BY n_nationkey")
      } finally s.conf.unset("graft.ch.format_schema")
    },

    // Protobuf NESTED messages + enums (round 14 — the reference's
    // ProtobufSerializer handles nesting; this closes the round-13
    // flat-scalar gate): a message field round-trips as a StructType
    // (length-delimited sub-message), an enum as its NAME, a repeated
    // message as an array of structs. The oracle restates the
    // flattened projection over nation.
    Q.df("q_format_protobuf_nested", """
      SELECT n_nationkey AS key, n_name AS label,
        CAST(n_nationkey * 1.5 AS DOUBLE) AS score,
        CASE WHEN n_regionkey = 0 THEN 'LOW'
             WHEN n_regionkey = 1 THEN 'MID' ELSE 'HIGH' END AS band,
        n_name || ',x' AS hist_labels
      FROM nation ORDER BY key""") { (s, dir) =>
      val src = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("key"),
          struct(col("n_name").as("label"),
            (col("n_nationkey") * 1.5).cast("double").as("score"))
            .as("sub"),
          when(col("n_regionkey") === 0, "LOW")
            .when(col("n_regionkey") === 1, "MID")
            .otherwise("HIGH").as("band"),
          array(
            struct(col("n_name").as("label"),
              lit(1.0).cast("double").as("score")),
            struct(lit("x").as("label"),
              lit(2.0).cast("double").as("score"))).as("history"))
        .repartition(3)
      val proto = """
        syntax = "proto3";
        enum Band { LOW = 0; MID = 1; HIGH = 2; }
        message Sub { string label = 1; double score = 2; }
        message Part {
          int64 key = 1;
          Sub sub = 2;
          Band band = 3;
          repeated Sub history = 4;
        }"""
      val path = s"/tmp/graft_pb_nested_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.ChProtobufFormat.writeProtobuf(src, path, proto, "Part")
      graft.sources.ChProtobufFormat.readProtobuf(s, path, proto, "Part")
        .select(col("key"), col("sub.label").as("label"),
          col("sub.score").as("score"), col("band"),
          array_join(expr("transform(history, h -> h.label)"), ",")
            .as("hist_labels"))
        .orderBy("key")
    },

    // Delta row-level DELETE (round 14 — copy-on-write remove+add
    // commits, the write-side twin of the DV read): build a partitioned
    // table through the dialect, DELETE a predicate slice, read the
    // survivors back through the native log replay. Time travel to the
    // pre-delete version is asserted inside the fixture; the oracle
    // recomputes the surviving set from the source table.
    Q.df("q_delta_delete_rows", """
      SELECT c_custkey, c_name, CASE WHEN c_custkey % 2 = 0
        THEN 'even' ELSE 'odd' END AS seg
      FROM customer
      WHERE c_custkey <= 120 AND c_custkey % 3 <> 0
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_deltadel_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .createOrReplaceTempView("graft_dd_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"INSERT INTO FUNCTION deltaLake('$root') PARTITION BY (seg) " +
        "SELECT c_custkey, c_name, CASE WHEN c_custkey % 2 = 0 " +
        "THEN 'even' ELSE 'odd' END AS seg " +
        "FROM graft_dd_cust WHERE c_custkey <= 120")
      val total = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 120).count()
      val expectDel = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 120 && col("c_custkey") % 3 === 0)
        .count()
      val del = ch(s"DELETE FROM FUNCTION deltaLake('$root') " +
        "WHERE c_custkey % 3 = 0").collect().head
      require(del.getLong(0) == 1L && del.getLong(1) == expectDel,
        s"delete must commit v1 removing $expectDel rows, got $del")
      val n0 = ch(s"SELECT count() AS n FROM deltaLake('$root', 0)")
        .collect().head.getLong(0)
      require(n0 == total,
        s"time travel to v0 must still see all $total rows, got $n0")
      ch(s"SELECT c_custkey, c_name, seg FROM deltaLake('$root') " +
        "ORDER BY c_custkey")
    },

    // Delta row-level UPDATE (round 14): the same copy-on-write
    // machinery with assignments applied WHERE-matched (unmatched rows
    // in rewritten files carry over verbatim — a whole-file transform
    // would corrupt them and hash-mismatch here).
    Q.df("q_delta_update_rows", """
      SELECT c_custkey,
        CASE WHEN c_custkey % 5 = 0 THEN upper(c_name)
             ELSE c_name END AS c_name
      FROM customer WHERE c_custkey <= 100
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_deltaupd_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .createOrReplaceTempView("graft_du_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"INSERT INTO FUNCTION deltaLake('$root') " +
        "SELECT c_custkey, c_name FROM graft_du_cust " +
        "WHERE c_custkey <= 100")
      ch(s"ALTER TABLE FUNCTION deltaLake('$root') " +
        "UPDATE c_name = upper(c_name) WHERE c_custkey % 5 = 0")
      ch(s"SELECT c_custkey, c_name FROM deltaLake('$root') " +
        "ORDER BY c_custkey")
    },

    // Iceberg row-level DELETE + UPDATE (round 14 — the Iceberg twin of
    // q_delta_delete_rows/q_delta_update_rows): copy-on-write manifest
    // rewrites through the dialect lanes; untouched files carry by
    // reference, prior snapshots stay travelable. The oracle restates
    // both mutations over the source table.
    Q.df("q_iceberg_mutate_rows", """
      SELECT c_custkey,
        CASE WHEN c_custkey % 5 = 0 THEN upper(c_name)
             ELSE c_name END AS c_name
      FROM customer
      WHERE c_custkey <= 100 AND c_custkey % 3 <> 0
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_icemut_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .createOrReplaceTempView("graft_im_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"INSERT INTO FUNCTION iceberg('$root') " +
        "SELECT c_custkey, c_name FROM graft_im_cust " +
        "WHERE c_custkey <= 100")
      val total = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 100).count()
      val expectDel = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 100 && col("c_custkey") % 3 === 0)
        .count()
      // ALTER … DELETE is the COPY-ON-WRITE lane (DELETE FROM is the
      // lightweight position-delete lane, oracled separately by
      // q_iceberg_posdel_write — a CoW UPDATE after it would refuse)
      val del = ch(s"ALTER TABLE FUNCTION iceberg('$root') " +
        "DELETE WHERE c_custkey % 3 = 0").collect().head
      require(del.getLong(1) == expectDel,
        s"delete must remove $expectDel rows, got ${del.getLong(1)}")
      ch(s"ALTER TABLE FUNCTION iceberg('$root') " +
        "UPDATE c_name = upper(c_name) WHERE c_custkey % 5 = 0")
      // the pre-mutation snapshot stays travelable (snapshot listing
      // comes from the system lane; assert via count at the first id)
      val firstSnap = graft.sources.IcebergSource
        .read(s, root, snapshotId = None) // current
      require(firstSnap.count() == total - expectDel)
      ch(s"SELECT c_custkey, c_name FROM iceberg('$root') " +
        "ORDER BY c_custkey")
    },

    // Hudi MERGE-ON-READ (round 14 — beyond the reference, which reads
    // base files only): a base file plus log blocks (upserts over
    // region-0 names, deletes of region-1 nations) merge through one
    // key shuffle; the oracle restates the merged state over nation.
    Q.df("q_tf_hudi_mor", """
      SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS k,
        CAST(n_nationkey AS BIGINT) AS n_nationkey,
        CASE WHEN n_regionkey = 0 THEN upper(n_name)
             ELSE n_name END AS n_name
      FROM nation WHERE n_regionkey <> 1
      ORDER BY n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_hudimor_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/.hoodie"))
      val nation = Tables.load(s, dir, "nation")
        .select(concat(lit("n"), col("n_nationkey").cast("string"))
          .as("_hoodie_record_key"),
          col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"), col("n_regionkey").cast("int").as("rk"))
      oneFile(s, root, "fg1_0-1-0_20240101000000.parquet",
        nation.drop("rk").orderBy("n_nationkey"))
      val avroSchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"r","fields":[
          {"name":"_hoodie_record_key","type":"string"},
          {"name":"n_nationkey","type":"long"},
          {"name":"n_name","type":"string"}]}""")
      val r0 = nation.filter(col("rk") === 0)
        .select("_hoodie_record_key", "n_nationkey", "n_name")
        .collect() // 25-row dimension — fixture-scale collect
      val upserts = r0.toSeq.map { r =>
        val g = new org.apache.avro.generic.GenericData.Record(avroSchema)
        g.put("_hoodie_record_key", r.getString(0))
        g.put("n_nationkey", r.getLong(1))
        g.put("n_name", r.getString(2).toUpperCase)
        g.asInstanceOf[org.apache.avro.generic.GenericRecord]
      }
      val delKeys = nation.filter(col("rk") === 1)
        .select("_hoodie_record_key").collect().map(_.getString(0)).toSeq
      val log = new org.apache.hadoop.fs.Path(root,
        ".fg1_20240101000000.log.1_0-1-0")
      graft.sources.HudiLogFormat.appendDataBlock(fs, log,
        "20240102000000", avroSchema, upserts)
      graft.sources.HudiLogFormat.appendDeleteBlock(fs, log,
        "20240102000001", delKeys)
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT _hoodie_record_key AS k, n_nationkey, n_name " +
          s"FROM hudi('$root') ORDER BY n_nationkey")
    },

    // Protobuf map<K,V> + oneof (round 14 — the LAST protobuf surface
    // gap; reference ProtobufSerializer handles both): a map column
    // round-trips as MapType through the spec's repeated entry-message
    // wire shape, and oneof members keep EXPLICIT presence — the unset
    // member of each row must read back NULL, never the proto3
    // default (a default-filling decoder hash-mismatches on a/b).
    Q.df("q_format_protobuf_map", """
      SELECT n_nationkey AS key,
        CAST(n_regionkey AS BIGINT) AS tag_val,
        CAST(length(n_name) AS BIGINT) AS tag_len,
        CASE WHEN n_nationkey % 2 = 0
          THEN CAST(n_regionkey AS BIGINT) END AS a,
        CASE WHEN n_nationkey % 2 <> 0 THEN n_name END AS b
      FROM nation ORDER BY key""") { (s, dir) =>
      val src = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("key"),
          col("n_name").as("nm"),
          map(col("n_name"), col("n_regionkey").cast("long"),
            lit("len"), length(col("n_name")).cast("long")).as("tags"),
          when(col("n_nationkey") % 2 === 0,
            col("n_regionkey").cast("long")).as("a"),
          when(col("n_nationkey") % 2 =!= 0, col("n_name")).as("b"))
        .repartition(3)
      val proto = """
        syntax = "proto3";
        message N {
          int64 key = 1;
          string nm = 2;
          map<string, int64> tags = 3;
          oneof pick { int64 a = 4; string b = 5; }
        }"""
      val path = s"/tmp/graft_pb_map_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.ChProtobufFormat.writeProtobuf(src, path, proto, "N")
      graft.sources.ChProtobufFormat.readProtobuf(s, path, proto, "N")
        .select(col("key"),
          element_at(col("tags"), col("nm")).as("tag_val"),
          element_at(col("tags"), lit("len")).as("tag_len"),
          col("a"), col("b"))
        .orderBy("key")
    },

    // Delta LIGHTWEIGHT delete (round 14 continuation — the reference's
    // DELETE FROM is the lightweight mask, MutationsInterpreter's
    // _row_exists path; the Delta spelling is a DELETION VECTOR
    // commit): two successive DELETE FROM statements mask through DVs
    // with NO data-file rewrites (file identity asserted in-fixture;
    // the second delete OR-merges the first file's bitmap). The oracle
    // restates the surviving predicate; a reader that ignored or
    // mis-merged the DVs returns extra rows.
    Q.df("q_delta_delete_dv_write", """
      SELECT c_custkey, c_name, CASE WHEN c_custkey % 2 = 0
        THEN 'even' ELSE 'odd' END AS seg
      FROM customer
      WHERE c_custkey <= 150 AND c_custkey % 3 <> 0
        AND NOT (c_custkey % 5 = 0 AND c_custkey % 2 = 0)
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_dvwrite_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .createOrReplaceTempView("graft_dvw_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"INSERT INTO FUNCTION deltaLake('$root') PARTITION BY (seg) " +
        "SELECT c_custkey, c_name, CASE WHEN c_custkey % 2 = 0 " +
        "THEN 'even' ELSE 'odd' END AS seg " +
        "FROM graft_dvw_cust WHERE c_custkey <= 150")
      def files(): Set[String] = fsOf(s, root)
        .listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
      val files0 = files()
      ch(s"DELETE FROM FUNCTION deltaLake('$root') " +
        "WHERE c_custkey % 3 = 0")
      ch(s"DELETE FROM FUNCTION deltaLake('$root') " +
        "WHERE c_custkey % 5 = 0 AND seg = 'even'")
      require(files() == files0,
        "lightweight deletes must not rewrite or add data files")
      val total = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 150).count()
      val n0 = ch(s"SELECT count() AS n FROM deltaLake('$root', 0)")
        .collect().head.getLong(0)
      require(n0 == total,
        s"time travel to v0 must see all $total rows, got $n0")
      ch(s"SELECT c_custkey, c_name, seg FROM deltaLake('$root') " +
        "ORDER BY c_custkey")
    },

    // Iceberg LIGHTWEIGHT delete (round 14 continuation — the same
    // DELETE FROM mask, spelled as a v2 POSITION-DELETE file per the
    // spec): the second delete only matches VISIBLE rows (the first
    // delete's mask applies during the matching scan), so a
    // double-delete would hash-mismatch the oracle.
    Q.df("q_iceberg_posdel_write", """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey <= 120 AND c_custkey % 4 <> 0
        AND NOT (c_custkey <= 30)
      ORDER BY c_custkey""") { (s, dir) =>
      val root = s"/tmp/graft_icepdw_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      fsOf(s, root).delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .createOrReplaceTempView("graft_ipdw_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"INSERT INTO FUNCTION iceberg('$root') " +
        "SELECT c_custkey, c_name FROM graft_ipdw_cust " +
        "WHERE c_custkey <= 120")
      def dataFiles(): Set[String] = fsOf(s, root)
        .listStatus(new org.apache.hadoop.fs.Path(s"$root/data"))
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
      val files0 = dataFiles()
      ch(s"DELETE FROM FUNCTION iceberg('$root') WHERE c_custkey % 4 = 0")
      ch(s"DELETE FROM FUNCTION iceberg('$root') WHERE c_custkey <= 30")
      require(files0.subsetOf(dataFiles()),
        "lightweight deletes must not rewrite or remove data files")
      ch(s"SELECT c_custkey, c_name FROM iceberg('$root') " +
        "ORDER BY c_custkey")
    },

    // Hudi timeline awareness + time travel (round 14 continuation —
    // beyond the reference's base-file listing): a file group written
    // at t1, rewritten at t2 (committed) and rewritten AGAIN at t3
    // (INFLIGHT — an uncommitted write that must stay invisible).
    // Current read = t2 state; 'asOf t1' = the original. The oracle
    // restates both lanes over nation — a reader serving the pending
    // slice, or time-traveling wrongly, hash-mismatches.
    Q.df("q_tf_hudi_timetravel", """
      SELECT 'current' AS lane, CAST(n_nationkey AS BIGINT) AS n_nationkey,
        CASE WHEN n_regionkey = 0 THEN upper(n_name) ELSE n_name END
          AS n_name
      FROM nation
      UNION ALL
      SELECT 'asof_t1' AS lane, CAST(n_nationkey AS BIGINT), n_name
      FROM nation
      ORDER BY lane, n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_huditt_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/.hoodie"))
      val nation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"), col("n_regionkey"))
      oneFile(s, root, "fg1_0-1-0_20240101000000.parquet",
        nation.select("n_nationkey", "n_name").orderBy("n_nationkey"))
      oneFile(s, root, "fg1_0-2-0_20240102000000.parquet",
        nation.select(col("n_nationkey"),
          when(col("n_regionkey") === 0, upper(col("n_name")))
            .otherwise(col("n_name")).as("n_name"))
          .orderBy("n_nationkey"))
      oneFile(s, root, "fg1_0-3-0_20240103000000.parquet",
        nation.select(col("n_nationkey"),
          lit("UNCOMMITTED").as("n_name")).orderBy("n_nationkey"))
      Seq("20240101000000.commit", "20240102000000.commit",
        "20240103000000.commit.inflight").foreach { n =>
        val out = fs.create(new org.apache.hadoop.fs.Path(
          s"$root/.hoodie/$n"), true)
        try out.write("{}".getBytes("UTF-8")) finally out.close()
      }
      graft.sql.ClickHouseSql.sql(s,
        s"SELECT 'current' AS lane, n_nationkey, n_name " +
          s"FROM hudi('$root') " +
          "UNION ALL " +
          s"SELECT 'asof_t1' AS lane, n_nationkey, n_name " +
          s"FROM hudi('$root', '20240101000000') " +
          "ORDER BY lane, n_nationkey")
    },

    // Column-mapped Delta WRITES (round 14 continuation — appends,
    // UPDATE and both delete lanes on a minReaderVersion-2 'name'-mode
    // table): the fixture hand-writes the mapped metaData per
    // PROTOCOL.md, then every mutation flows through LOGICAL names
    // while the staged parquet stores PHYSICAL columns and the log
    // keys partitionValues physically. The oracle restates the final
    // state over nation; wrong physical/logical plumbing surfaces as
    // nulls or missing columns, not a count drift.
    Q.df("q_delta_colmap_mutate", """
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        CASE WHEN n_nationkey % 3 = 0 THEN upper(n_name)
             ELSE n_name END AS n_name,
        CASE WHEN n_nationkey % 2 = 0 THEN 'e' ELSE 'o' END AS seg
      FROM nation WHERE n_nationkey % 5 <> 0
      ORDER BY n_nationkey""") { (s, dir) =>
      val root = s"/tmp/graft_cmapmut_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_delta_log"))
      def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
      val schemaString =
        """{"type":"struct","fields":[""" +
          """{"name":"n_nationkey","type":"long","nullable":true,"metadata":""" +
          """{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-k"}},""" +
          """{"name":"n_name","type":"string","nullable":true,"metadata":""" +
          """{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-n"}},""" +
          """{"name":"seg","type":"string","nullable":true,"metadata":""" +
          """{"delta.columnMapping.id":3,"delta.columnMapping.physicalName":"col-p"}}]}"""
      val v0 = Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cm","format":{"provider":"parquet"},""" +
          s""""schemaString":"${esc(schemaString)}",""" +
          s""""partitionColumns":["seg"],""" +
          s""""configuration":{"delta.columnMapping.mode":"name",""" +
          s""""delta.columnMapping.maxColumnId":"3"}}}""").mkString("\n")
      val out = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/_delta_log/" + f"${0L}%020d.json"), true)
      try out.write((v0 + "\n").getBytes("UTF-8")) finally out.close()
      graft.sources.DeltaLakeSink.append(
        Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_name"),
            when(col("n_nationkey") % 2 === 0, "e").otherwise("o")
              .as("seg")),
        root, partitionBy = Seq("seg"))
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"ALTER TABLE FUNCTION deltaLake('$root') " +
        "UPDATE n_name = upper(n_name) WHERE n_nationkey % 3 = 0")
      ch(s"DELETE FROM FUNCTION deltaLake('$root') " +
        "WHERE n_nationkey % 5 = 0")
      ch(s"SELECT n_nationkey, n_name, seg FROM deltaLake('$root') " +
        "ORDER BY n_nationkey")
    },

    // Lakehouse compaction (round 14 continuation — OPTIMIZE TABLE
    // FUNCTION, ClickHouse's OPTIMIZE FINAL over the lakehouse lanes):
    // both tables take lightweight deletes, compact (masks materialize
    // away: Delta DVs drop from the commits, Iceberg delete files drop
    // from the snapshot), and the Iceberg side proves the "compact
    // first" remedy by running a CoW UPDATE afterwards. The oracle
    // restates both lanes; a compaction that lost or resurrected
    // masked rows hash-mismatches.
    Q.df("q_lake_optimize", """
      SELECT 'delta' AS lane, c_custkey, c_name FROM customer
      WHERE c_custkey <= 80 AND c_custkey % 3 <> 0
      UNION ALL
      SELECT 'iceberg' AS lane, c_custkey,
        CASE WHEN c_custkey % 7 = 0 THEN upper(c_name) ELSE c_name END
      FROM customer
      WHERE c_custkey <= 80 AND c_custkey % 4 <> 0
      ORDER BY lane, c_custkey""") { (s, dir) =>
      val dRoot = s"/tmp/graft_opt_d_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val iRoot = s"/tmp/graft_opt_i_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      Seq(dRoot, iRoot).foreach(r =>
        fsOf(s, r).delete(new org.apache.hadoop.fs.Path(r), true))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .createOrReplaceTempView("graft_opt_cust")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"INSERT INTO FUNCTION deltaLake('$dRoot') " +
        "SELECT c_custkey, c_name FROM graft_opt_cust WHERE c_custkey <= 80")
      ch(s"DELETE FROM FUNCTION deltaLake('$dRoot') WHERE c_custkey % 3 = 0")
      val opt = ch(s"OPTIMIZE TABLE FUNCTION deltaLake('$dRoot') FINAL")
        .collect().head
      require(opt.getLong(0) == 2L, s"delta compaction must commit v2, got $opt")
      val post = java.nio.file.Files.readString(java.nio.file.Path.of(
        dRoot, "_delta_log", f"${2L}%020d.json"))
      require(!post.contains("deletionVector"),
        "compaction must materialize the DV masks away")
      ch(s"INSERT INTO FUNCTION iceberg('$iRoot') " +
        "SELECT c_custkey, c_name FROM graft_opt_cust WHERE c_custkey <= 80")
      ch(s"DELETE FROM FUNCTION iceberg('$iRoot') WHERE c_custkey % 4 = 0")
      ch(s"OPTIMIZE TABLE FUNCTION iceberg('$iRoot')")
      // the compacted snapshot carries no delete files → CoW works again
      ch(s"ALTER TABLE FUNCTION iceberg('$iRoot') " +
        "UPDATE c_name = upper(c_name) WHERE c_custkey % 7 = 0")
      ch(s"SELECT 'delta' AS lane, c_custkey, c_name " +
        s"FROM deltaLake('$dRoot') " +
        "UNION ALL " +
        s"SELECT 'iceberg' AS lane, c_custkey, c_name " +
        s"FROM iceberg('$iRoot') " +
        "ORDER BY lane, c_custkey")
    },

    // Hudi WRITE roundtrip (round 14 continuation — beyond the
    // reference, whose Hudi support is read-only): create-as-upsert,
    // then an UPSERT whose updates land as merge-on-read log blocks
    // (region-0 names uppercased — base files asserted untouched) and
    // whose new keys open a fresh base group, then a lightweight
    // DELETE (delete blocks) of region 1. The oracle restates the
    // merged state over nation; serving stale base rows or losing the
    // new-key group hash-mismatches.
    Q.df("q_hudi_write_roundtrip", """
      SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS k,
        CAST(n_nationkey AS BIGINT) AS n_nationkey,
        CASE WHEN n_regionkey = 0 THEN upper(n_name)
             ELSE n_name END AS n_name
      FROM nation WHERE n_regionkey <> 1
      UNION ALL
      SELECT 'extra', 99, 'NEWLAND'
      ORDER BY n_nationkey, k""") { (s, dir) =>
      val root = s"/tmp/graft_hudiwr_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      Tables.load(s, dir, "nation")
        .select(concat(lit("n"), col("n_nationkey").cast("string"))
          .as("_hoodie_record_key"),
          col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"), col("n_regionkey").cast("long").as("rk"))
        .createOrReplaceTempView("graft_hw_nation")
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(s, q)
      ch(s"INSERT INTO FUNCTION hudi('$root') " +
        "SELECT _hoodie_record_key, n_nationkey, n_name " +
        "FROM graft_hw_nation")
      def bases(): Set[String] = fs
        .listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
      val bases0 = bases()
      // upsert: uppercase region-0 names (updates) + one new key
      ch(s"INSERT INTO FUNCTION hudi('$root') " +
        "SELECT _hoodie_record_key, n_nationkey, upper(n_name) AS n_name " +
        "FROM graft_hw_nation WHERE rk = 0 " +
        "UNION ALL SELECT 'extra', 99, 'NEWLAND'")
      require(bases0.subsetOf(bases()) && bases().size == bases0.size + 1,
        "updates must land as log blocks; the new key opens one group")
      val delKeys = Tables.load(s, dir, "nation")
        .filter(col("n_regionkey") === 1)
        .select(concat(lit("n"), col("n_nationkey").cast("string")))
        .collect().map(r => s"'${r.getString(0)}'") // 25-row dim fixture
      ch(s"DELETE FROM FUNCTION hudi('$root') WHERE _hoodie_record_key " +
        s"IN (${delKeys.mkString(", ")})")
      require(bases() == bases0 + (bases() -- bases0).head,
        "deletes must not rewrite base files")
      ch(s"SELECT _hoodie_record_key AS k, n_nationkey, n_name " +
        s"FROM hudi('$root') ORDER BY n_nationkey, k")
    },

    // Hudi PARTITIONED merge-on-read writes (round 15 — closes the r14
    // Missing-#3 partitioned gate): hive-style k=v dirs, logs publish
    // into their group's partition dir, new keys route by partition
    // values (incl. a partition born mid-stream), deletes span
    // partitions. The oracle restates the merged state from the source
    // parquet — a row misrouted or double-served is a red row.
    Q.df("q_hudi_partitioned_write", """
      SELECT 'c' || CAST(c_custkey AS VARCHAR) AS k,
        CAST(c_custkey AS BIGINT) AS c_custkey,
        CASE WHEN c_custkey % 10 = 0 THEN 'UPDATED' ELSE c_name END
          AS c_name,
        CAST(c_nationkey AS BIGINT) AS nat
      FROM customer
      WHERE c_custkey <= 200 AND c_custkey % 7 <> 0
      UNION ALL SELECT 'x1', 9001, 'NEWCOMER', 999
      ORDER BY c_custkey, k""") { (s, dir) =>
      val root = s"/tmp/graft_hudipw_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = fsOf(s, root)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(concat(lit("c"), col("c_custkey").cast("string"))
          .as("_hoodie_record_key"),
          col("c_custkey").cast("long").as("c_custkey"),
          col("c_name"), col("c_nationkey").cast("long").as("nat"))
      graft.sources.HudiSink.upsert(cust, root, partitionBy = Seq("nat"))
      // updates across partitions + a key in a BRAND-NEW partition
      import org.apache.spark.sql.functions.{lit => l}
      graft.sources.HudiSink.upsert(
        cust.filter(col("c_custkey") % 10 === 0)
          .withColumn("c_name", l("UPDATED"))
          .unionByName(s.createDataFrame(Seq(
            ("x1", 9001L, "NEWCOMER", 999L))).toDF(
            "_hoodie_record_key", "c_custkey", "c_name", "nat")),
        root)
      require(fs.exists(new org.apache.hadoop.fs.Path(root, "nat=999")),
        "the new key must open partition nat=999")
      val (_, nDel) = graft.sources.HudiSink.deleteWhere(s, root,
        col("c_custkey") % 7 === 0)
      require(nDel > 0, "the delete must match across partitions")
      graft.sources.HudiSource.read(s, root)
        .select(col("_hoodie_record_key").as("k"), col("c_custkey"),
          col("c_name"), col("nat"))
        .orderBy("c_custkey", "k")
    }
  )
}
