package graft.dsl

import graft.SparkSpec
import graft.model.KafkaRecordIn
import graft.serde.{JsonSerde, StringSerde}
import graft.testkit.TestHarness
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pipeline tests over the testkit — the reference TestClient
  * scenarios (FIXTURES.md §3-4): metadata injection, header extraction,
  * filter-by-drop, fan-out, DLQ routing.
  */
class GraftAppSpec extends SparkSpec {

  private val clickSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("url", StringType),
    StructField("timestamp", LongType)))

  private def record(value: String, topic: String = "user_clicks",
                     offset: Long = 1L,
                     headers: Map[String, Array[Byte]] = null): KafkaRecordIn =
    KafkaRecordIn(topic = topic, partition = 2, offset = offset,
      timestamp = 1700000000123L, key = "k1".getBytes,
      value = if (value == null) null else value.getBytes, headers = headers)

  private def app: GraftApp = new GraftApp().consume(ConsumerSpec(
    topic = "user_clicks",
    sinkTopics = Seq("user_clicks_json", "user_clicks_audit"),
    valueSerde = JsonSerde(clickSchema),
    headerSerdes = Map("x-correlation-id" -> StringSerde),
    outValueSerde = Some(StringSerde),
    handler = df => df
      .filter(col("value.user_id") % 2 === 0) // drop = publish nothing (A15)
      .select(concat(lit("user="), col("value.user_id"),
        lit(" off="), col("offset"),
        lit(" part="), col("partition"),
        lit(" corr="), coalesce(col("header_x-correlation-id"), lit("none")))
        .as("value"))))

  test("full pipeline: deserialize, metadata injection, headers, fan-out") {
    val result = new TestHarness(spark).publish(app, Seq(
      record("""{"user_id": 2, "url": "http://x", "timestamp": 1}""",
        headers = Map("x-correlation-id" -> "abc".getBytes))))
    assert(result.dlq.isEmpty)
    // fan-out: 1 record × 2 sink topics (A16)
    assert(result.outputs.length == 2)
    val byTopic = result.outputs.map(r => r.getAs[String]("topic") ->
      new String(r.getAs[Array[Byte]]("value"), "UTF-8")).toMap
    assert(byTopic.keySet == Set("user_clicks_json", "user_clicks_audit"))
    assert(byTopic("user_clicks_json") == "user=2 off=1 part=2 corr=abc")
  }

  test("handler filter drops records (1 → 0-or-1 semantics)") {
    val result = new TestHarness(spark).publish(app, Seq(
      record("""{"user_id": 3, "url": "http://x", "timestamp": 1}""")))
    assert(result.outputs.isEmpty)
    assert(result.dlq.isEmpty)
  }

  test("malformed value routes to DLQ with raw bytes (A20)") {
    val result = new TestHarness(spark).publish(app, Seq(
      record("{not json", offset = 42L)))
    assert(result.outputs.isEmpty)
    assert(result.dlq.length == 1)
    val row = result.dlq.head
    assert(row.getAs[Long]("offset") == 42L)
    assert(new String(row.getAs[Array[Byte]]("value_raw"), "UTF-8") == "{not json")
    assert(row.getAs[String]("error") == "deserialization_error")
  }

  test("missing header deserializes to null, record not dropped") {
    val result = new TestHarness(spark).publish(app, Seq(
      record("""{"user_id": 4, "url": "u", "timestamp": 1}""")))
    assert(result.outputs.length == 2)
    assert(new String(result.outputs.head.getAs[Array[Byte]]("value"), "UTF-8")
      .endsWith("corr=none"))
  }

  test("duplicate topic registration fails fast (deviation from reference)") {
    val a = new GraftApp().consume(ConsumerSpec("t", Nil))
    intercept[IllegalArgumentException](a.consume(ConsumerSpec("t", Nil)))
  }

  test("records for unregistered topics are ignored") {
    val result = new TestHarness(spark).publish(app, Seq(
      record("""{"user_id": 2, "url": "u", "timestamp": 1}""", topic = "other")))
    assert(result.outputs.isEmpty && result.dlq.isEmpty)
  }
}
