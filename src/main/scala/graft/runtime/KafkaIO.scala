package graft.runtime

import graft.dsl.GraftApp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Kafka client configuration surface (reference `Kaflow.__init__`,
  * kaflow `applications.py:54-186`) mapped onto Spark's Kafka source/sink
  * options.
  *
  * Mapping notes (SURVEY.md §2 A25-A27):
  *  - `auto_offset_reset` → `startingOffsets` (latest/earliest);
  *  - group management, heartbeats, assignors, auto-commit are subsumed by
  *    Spark's checkpoint-based offset tracking — at-least-once, strictly
  *    stronger than the reference's auto-commit at-most-once window;
  *  - every `kafka.*`-prefixed client knob (security, fetch sizes, acks,
  *    idempotence, transactional ids, …) passes through verbatim;
  *  - backpressure: `maxOffsetsPerTrigger` (the reference's implicit
  *    head-of-line blocking has no analog — Spark pulls bounded batches).
  */
final case class KafkaConfig(
    bootstrapServers: String,
    startingOffsets: String = "latest", // "earliest" | "latest" | json offsets
    includeHeaders: Boolean = true,
    maxOffsetsPerTrigger: Option[Long] = None,
    minPartitions: Option[Int] = None,
    failOnDataLoss: Boolean = true,
    securityProtocol: Option[String] = None, // e.g. SASL_SSL
    saslMechanism: Option[String] = None,    // PLAIN/SCRAM-SHA-256/...
    saslJaasConfig: Option[String] = None,
    sslTruststoreLocation: Option[String] = None,
    sslKeystoreLocation: Option[String] = None,
    extra: Map[String, String] = Map.empty) {

  /** Options for `spark.readStream.format("kafka")`. */
  def sourceOptions(topics: Seq[String]): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "includeHeaders" -> includeHeaders.toString,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      minPartitions.map("minPartitions" -> _.toString) ++
      securityOptions ++ extra

  /** Options for the Kafka sink. */
  def sinkOptions: Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers) ++ securityOptions ++ extra

  private def securityOptions: Map[String, String] =
    (securityProtocol.map("kafka.security.protocol" -> _) ++
      saslMechanism.map("kafka.sasl.mechanism" -> _) ++
      saslJaasConfig.map("kafka.sasl.jaas.config" -> _) ++
      sslTruststoreLocation.map("kafka.ssl.truststore.location" -> _) ++
      sslKeystoreLocation.map("kafka.ssl.keystore.location" -> _)).toMap
}

/** Streaming assembly: Kafka source → GraftApp routing → Kafka sink(s).
  *
  * The Kafka connector jar is not present in this container, so `.load()`
  * here is exercised in integration environments; the option assembly,
  * record normalization, and per-batch routing are unit-tested against
  * memory/batch frames (testkit).
  */
object KafkaIO {

  /** Normalize the Kafka source's `headers array<struct<key,value>>` to the
    * engine's `map<string,binary>` record shape.
    */
  def normalizeHeaders(df: DataFrame): DataFrame =
    if (df.columns.contains("headers"))
      df.withColumn("headers", map_from_entries(col("headers")))
    else df.withColumn("headers", lit(null).cast("map<string,binary>"))

  /** Build the streaming source for every topic the app consumes. */
  def source(spark: SparkSession, app: GraftApp, conf: KafkaConfig): DataFrame = {
    val reader = spark.readStream.format("kafka")
    conf.sourceOptions(app.topics).foreach { case (k, v) => reader.option(k, v) }
    normalizeHeaders(reader.load())
      .withColumn("timestamp", unix_millis(col("timestamp")))
  }

  /** Run the app as one streaming query: route each micro-batch, write
    * outputs to Kafka and DLQ rows to the configured DLQ topic.
    * Checkpointing gives at-least-once end-to-end.
    */
  def run(spark: SparkSession, app: GraftApp, conf: KafkaConfig,
          checkpointLocation: String, dlqTopic: Option[String] = None,
          trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val src = source(spark, app, conf)
    src.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val routed = app.processBatch(batch)
        writeToKafka(routed.outputs, conf)
        dlqTopic.foreach { t =>
          writeToKafka(routed.dlq.select(
            lit(t).as("topic"), col("key_raw").as("key"),
            col("value_raw").as("value")), conf)
        }
      }
      .start()
  }

  /** Batch write of (topic, key, value[, headers]) rows to the Kafka sink. */
  def writeToKafka(df: DataFrame, conf: KafkaConfig): Unit = {
    val writer = df.write.format("kafka")
    conf.sinkOptions.foreach { case (k, v) => writer.option(k, v) }
    writer.save()
  }
}
