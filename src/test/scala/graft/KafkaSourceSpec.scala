package graft

import graft.streaming.KafkaSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class KafkaSourceSpec extends SparkFunSuite {

  test("option plumbing covers the consumer surface") {
    val m = KafkaSource.optionMap(KafkaSource.KafkaOptions(
      bootstrapServers = "broker1:9092,broker2:9092",
      subscribe = "events,orders",
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(50000L)))
    assert(m("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(m("subscribe") == "events,orders")
    assert(m("startingOffsets") == "latest")
    assert(m("maxOffsetsPerTrigger") == "50000")
    assert(m("failOnDataLoss") == "false")
    // reader construction must not resolve the source (no broker/jar here)
    KafkaSource.reader(SparkTestBase.spark, KafkaSource.KafkaOptions("b:9092", "t"))
  }

  test("parse decodes the kafka wire frame into typed rows + virtual cols") {
    val spark = SparkTestBase.spark
    val payload = StructType(Seq(
      StructField("user_id", LongType), StructField("v", DoubleType)))
    val wire = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("k1".getBytes, """{"user_id": 7, "v": 1.5}""".getBytes,
          "events", 0, 42L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0),
        Row(null, """{"user_id": 8, "v": 2.5}""".getBytes,
          "events", 1, 43L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 0)),
      KafkaSource.wireSchema)
    val out = KafkaSource.parse(wire, payload)
    assert(out.columns.toSeq ==
      Seq("_topic", "_partition", "_offset", "_timestamp", "user_id", "v"))
    val rows = out.orderBy("_offset").collect()
    assert(rows(0).getAs[Long]("user_id") == 7L && rows(0).getAs[Double]("v") == 1.5)
    assert(rows(1).getAs[String]("_topic") == "events" && rows(1).getAs[Long]("_offset") == 43L)
  }
}
