package graft.model

/** Record shapes of the stream-processing surface.
  *
  * Mirrors the reference's message model (kaflow `message.py:8-23`,
  * `testclient.py:45-57`): an inbound Kafka-shaped record with metadata, and
  * an outbound message of raw bytes. In Spark these are the row types of the
  * Kafka source/sink DataFrames; the case classes give the typed
  * (`Dataset[KafkaRecordIn]`) view and the testkit its input encoder.
  */
case class KafkaRecordIn(
    topic: String,
    partition: Int = 0,
    offset: Long = 0L,
    timestamp: Long = 0L, // epoch millis, as Kafka delivers
    timestampType: Int = 0,
    key: Array[Byte] = null,
    value: Array[Byte] = null,
    headers: Map[String, Array[Byte]] = null)

/** Outbound message (reference `message.py:17-23`): all fields optional;
  * the producer fills topic-level routing.
  *
  * Deliberate deviation from the reference (SURVEY.md §7.4): kaflow passes
  * `offset` into the producer's `timestamp` slot (`_consumer.py:227-229`) —
  * a positional-arg bug we do not replicate; timestamp here is a timestamp.
  */
case class MessageOut(
    value: Array[Byte],
    key: Array[Byte] = null,
    headers: Map[String, Array[Byte]] = null,
    partition: Option[Int] = None,
    timestamp: Option[Long] = None)

object KafkaRecordIn {
  /** Spark SQL schema of the Kafka source (with includeHeaders), normalized
    * to a map-typed headers column.
    */
  val schemaDdl: String =
    "topic STRING, partition INT, offset BIGINT, timestamp BIGINT, " +
      "timestampType INT, key BINARY, value BINARY, headers MAP<STRING, BINARY>"
}
