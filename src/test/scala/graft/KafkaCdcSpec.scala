package graft

import graft.streaming.KafkaCdc

/** Config-mapping tests for the Kafka transport wiring (the Kafka
  * broker itself is a cluster deployment concern; the mapping is what
  * must be right here).
  */
class KafkaCdcSpec extends SparkSpec {

  private val connectorJson =
    """{
      |  "name": "orders-connector",
      |  "config": {
      |    "connector.class": "io.debezium.connector.mysql.MySqlConnector",
      |    "database.hostname": "db.internal",
      |    "database.port": "3306",
      |    "topic.prefix": "cdc",
      |    "database.include.list": "shop",
      |    "table.include.list": "shop.orders, shop.customers",
      |    "snapshot.mode": "initial"
      |  }
      |}""".stripMargin

  test("connector JSON maps to per-table topics and earliest offsets") {
    val cfg = KafkaCdc.parseConnectorJson(connectorJson, brokers = "k1:9092,k2:9092")
    assert(cfg.topics == Seq("cdc.shop.orders", "cdc.shop.customers"))
    assert(cfg.startingOffsets == "earliest")
    val opts = cfg.sourceOptions
    assert(opts("kafka.bootstrap.servers") == "k1:9092,k2:9092")
    assert(opts("subscribe") == "cdc.shop.orders,cdc.shop.customers")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("failOnDataLoss") == "true")
    assert(!opts.contains("subscribePattern"))
  }

  test("no table include list falls back to a prefix subscribe pattern") {
    val cfg = KafkaCdc.fromConnectorConfig(
      Map("database.server.name" -> "srv"), brokers = "k:9092")
    assert(cfg.sourceOptions("subscribePattern") == "\\Qsrv\\E\\..*")
  }

  test("snapshot.mode decides a fresh consumer's starting offsets") {
    def mode(m: String) = KafkaCdc.fromConnectorConfig(
      Map("topic.prefix" -> "p", "snapshot.mode" -> m), "k:9092").startingOffsets
    assert(mode("initial") == "earliest")     // snapshot rows head the topic
    assert(mode("when_needed") == "earliest")
    assert(mode("schema_only") == "latest")   // reconnect without re-snapshot
    assert(mode("never") == "latest")
    intercept[IllegalArgumentException](mode("bogus"))
  }

  test("routine-load Kafka properties map to source options") {
    val cfg = KafkaCdc.fromRoutineLoadProps(Map(
      "kafka_broker_list" -> "broker:9092",
      "kafka_topic" -> "cdc.shop.orders",
      "property.group.id" -> "loader_group",
      "property.kafka_default_offsets" -> "OFFSET_BEGINNING"))
    val opts = cfg.sourceOptions
    assert(opts("subscribe") == "cdc.shop.orders")
    assert(opts("kafka.group.id") == "loader_group")
    assert(opts("startingOffsets") == "earliest")
    assert(KafkaCdc.fromRoutineLoadProps(Map(
      "kafka_broker_list" -> "b:9092",
      "property.kafka_default_offsets" -> "OFFSET_END")).startingOffsets == "latest")
  }

  test("restart recovery follows the snapshot-mode decision table") {
    import KafkaCdc.{recoveryAction => r}
    import KafkaCdc.RecoveryAction._
    // fresh start
    assert(r("initial", hasCommittedOffsets = false) == Snapshot)
    assert(r("schema_only", hasCommittedOffsets = false) == ResumeFromLatest)
    assert(r("never", hasCommittedOffsets = false) == Fail)
    // clean restart: everyone resumes
    for (m <- Seq("initial", "when_needed", "schema_only", "never"))
      assert(r(m, hasCommittedOffsets = true) == Resume)
    // offsets exist but the source log was purged past them
    assert(r("initial", hasCommittedOffsets = true, sourceLogAvailable = false) == Fail)
    assert(r("when_needed", hasCommittedOffsets = true, sourceLogAvailable = false) == Snapshot)
    assert(r("schema_only", hasCommittedOffsets = true, sourceLogAvailable = false) == ResumeFromLatest)
    intercept[IllegalArgumentException](r("bogus", hasCommittedOffsets = true))
  }

  test("rate cap and group id surface as the right option keys") {
    val cfg = KafkaCdc.Config(brokers = "k:9092", topics = Seq("t"),
      groupId = Some("g"), maxOffsetsPerTrigger = Some(500000L))
    val opts = cfg.sourceOptions
    assert(opts("maxOffsetsPerTrigger") == "500000")
    assert(opts("kafka.group.id") == "g")
  }
}
