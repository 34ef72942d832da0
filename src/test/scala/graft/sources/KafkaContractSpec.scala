package graft.sources

import graft.SparkSpec

/** Contract test for the one source this environment cannot execute
  * (no spark-sql-kafka jar, no broker): the reader option map is
  * pinned so a refactor that renames or drops an option — subscribe,
  * startingOffsets, failOnDataLoss, maxOffsetsPerTrigger — fails here
  * instead of at deploy. Mirrors the reference's consumer options
  * (stream_processor.py:102-109). */
class KafkaContractSpec extends SparkSpec {

  test("KafkaEventSource wires the full reference option set") {
    val src = KafkaEventSource(
      topic = "orders",
      bootstrapServers = "broker-1:9092,broker-2:9092",
      maxOffsetsPerTrigger = 5000L,
      startingOffsets = "earliest")
    assert(src.readerOptions == Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
      "subscribe" -> "orders",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "5000"))
  }

  test("defaults: latest offsets, bounded 10k per trigger") {
    val src = KafkaEventSource("events", "localhost:9092")
    assert(src.readerOptions("startingOffsets") == "latest")
    assert(src.readerOptions("maxOffsetsPerTrigger") == "10000")
  }
}
