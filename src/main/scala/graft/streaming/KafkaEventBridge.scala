package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka wiring for the entity runtime — the production transport the
  * reference uses (`client_request`/`internal`/`client_reply` topics,
  * /root/reference/stateflow/client/kafka_client.py:165-206).
  *
  * This container has no broker and no kafka connector jar, so these
  * builders are compile-checked shape only (NOT exercised by tests —
  * the MemoryStream loopback in [[StreamingEntityRuntime]] plays the
  * same topology role locally). On a real cluster:
  *
  * {{{
  * val events = KafkaEventBridge.reader(spark, "broker:9092",
  *   "client_request,internal")
  * // -> deserialize -> groupByKey -> flatMapGroupsWithState(handle)
  * // -> KafkaEventBridge.writer(replies, "broker:9092", "client_reply")
  * //    and continuations back to "internal"
  * }}}
  */
object KafkaEventBridge {

  /** Wire schema of the event envelope on Kafka (JSON, FIXTURES.md A.2). */
  val wireSchema: String =
    "event_id STRING, namespace STRING, name STRING, key STRING, event_type STRING, payload STRING"

  def reader(spark: SparkSession, bootstrap: String, topics: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", "latest")
      .load()
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(wireSchema)).as("ev"))
      .select("ev.*")

  def writer(events: DataFrame, bootstrap: String, topic: String) =
    events
      .select(col("event_id").as("key"),
        to_json(struct(events.columns.toIndexedSeq.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
}
