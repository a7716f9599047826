package graft.testkit

import graft.dsl.{GraftApp, RoutedBatch}
import graft.model.KafkaRecordIn
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Synchronous test harness — the reference TestClient equivalent
  * (kaflow `testclient.py:15-64`), with the publish-capture fix: the
  * reference's interceptor silently discards published messages
  * (`testclient.py:15-22`); this harness returns them for assertion.
  */
final case class PublishResult(outputs: Seq[Row], dlq: Seq[Row])

class TestHarness(spark: SparkSession) {
  import spark.implicits._

  /** Build a Kafka-shaped DataFrame from records. */
  def recordsDf(records: Seq[KafkaRecordIn]): DataFrame =
    spark.createDataset(records).toDF()

  /** Push records through the app's full decode→handle→fan-out path and
    * collect every would-be-published message plus DLQ rows.
    */
  def publish(app: GraftApp, records: Seq[KafkaRecordIn]): PublishResult = {
    val routed: RoutedBatch = app.processBatch(recordsDf(records))
    PublishResult(routed.outputs.collect().toSeq, routed.dlq.collect().toSeq)
  }
}
