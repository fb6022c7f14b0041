package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka transport wiring for the CDC stream — the translation layer
  * between the reference deployment's connector/consumer configs and
  * Spark's Structured Streaming Kafka source options.
  *
  * The reference pipeline's transport is Kafka on both sides: Debezium
  * publishes `<topic.prefix>.<db>.<table>` topics
  * (/root/reference/debezium-connector.json) and StarRocks Routine
  * Load consumes them with `kafka_broker_list` / `kafka_topic` /
  * `property.group.id` / `property.kafka_default_offsets`
  * (/root/reference/create-routine-load.sh:26-31). Spark's equivalent
  * consumer is `readStream.format("kafka")` (the published
  * `spark-sql-kafka-0-10` artifact — add it to the cluster classpath;
  * it is intentionally absent from this sandbox, so [[kafkaSource]]
  * is exercised by config-mapping unit tests plus the file-source
  * stand-in for the downstream pipeline).
  */
object KafkaCdc {

  /** Consumer-side config, normalized from either a Debezium connector
    * JSON or Routine-Load-style Kafka properties.
    *
    * @param brokers          bootstrap servers ("host:9092,host2:9092")
    * @param topics           explicit topic list; empty ⇒ subscribe to
    *                         every topic under `topicPrefix`
    * @param topicPrefix      Debezium `topic.prefix` (fallback:
    *                         `database.server.name`)
    * @param startingOffsets  "earliest" | "latest" (or a per-partition
    *                         offset JSON, passed through verbatim)
    * @param groupId          Kafka consumer group id
    * @param maxOffsetsPerTrigger rate cap per micro-batch; None = unbounded
    */
  final case class Config(brokers: String,
                          topics: Seq[String] = Nil,
                          topicPrefix: String = "",
                          startingOffsets: String = "earliest",
                          groupId: Option[String] = None,
                          maxOffsetsPerTrigger: Option[Long] = None,
                          failOnDataLoss: Boolean = true) {

    /** Spark Kafka source options (the exact keys
      * `readStream.format("kafka")` accepts).
      */
    def sourceOptions: Map[String, String] = {
      val subscribe: (String, String) =
        if (topics.nonEmpty) "subscribe" -> topics.mkString(",")
        else "subscribePattern" -> (java.util.regex.Pattern.quote(topicPrefix) + "\\..*")
      Map(
        "kafka.bootstrap.servers" -> brokers,
        subscribe,
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        groupId.map("kafka.group.id" -> _) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
    }
  }

  /** Translate a Debezium connector config map (the `"config"` object
    * of the connector-create JSON) into consumer wiring:
    *
    *  - topics = `<topic.prefix>.<entry>` per `table.include.list`
    *    entry (entries are already `db.table`); no include list ⇒
    *    subscribe-by-pattern on the prefix.
    *  - `snapshot.mode` decides where a NEW consumer group starts:
    *    `initial` / `when_needed` replay the topic from the beginning
    *    (the snapshot rows live at the head of the topic), while
    *    `schema_only` / `never` start at the latest offset — the
    *    reconnect-without-re-snapshot semantics.
    */
  def fromConnectorConfig(config: Map[String, String], brokers: String): Config = {
    val prefix = config.get("topic.prefix")
      .orElse(config.get("database.server.name"))
      .getOrElse(throw new IllegalArgumentException(
        "connector config needs topic.prefix or database.server.name"))
    val topics = config.get("table.include.list").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      .map(t => s"$prefix.$t")
    val starting = config.getOrElse("snapshot.mode", "initial") match {
      case "initial" | "when_needed" | "always" => "earliest"
      case "schema_only" | "never" | "no_data"  => "latest"
      case other => throw new IllegalArgumentException(s"unknown snapshot.mode: $other")
    }
    Config(brokers = brokers, topics = topics, topicPrefix = prefix,
      startingOffsets = starting)
  }

  /** Parse a full connector-create JSON document (`{"name": …,
    * "config": {…}}`) — json4s ships with Spark, no extra dependency.
    */
  def parseConnectorJson(json: String, brokers: String): Config = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(json)
    val config = (root \ "config") match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> v
      }.toMap
      case _ => throw new IllegalArgumentException("no \"config\" object in connector JSON")
    }
    fromConnectorConfig(config, brokers)
  }

  /** Translate Routine-Load-style Kafka properties
    * (`kafka_broker_list`, `kafka_topic`, `property.group.id`,
    * `property.kafka_default_offsets`) into consumer wiring.
    */
  def fromRoutineLoadProps(props: Map[String, String]): Config = {
    val brokers = props.getOrElse("kafka_broker_list",
      throw new IllegalArgumentException("kafka_broker_list required"))
    val topics = props.get("kafka_topic").toSeq
    val starting = props.getOrElse("property.kafka_default_offsets", "OFFSET_BEGINNING") match {
      case "OFFSET_BEGINNING" => "earliest"
      case "OFFSET_END"       => "latest"
      case other => throw new IllegalArgumentException(s"unknown kafka_default_offsets: $other")
    }
    Config(brokers = brokers, topics = topics,
      topicPrefix = topics.headOption.map(_.split('.').head).getOrElse(""),
      startingOffsets = starting,
      groupId = props.get("property.group.id"))
  }

  /** What a restarted pipeline must do, per snapshot mode — the
    * connector-restart decision users hit on every recovery incident.
    */
  sealed trait RecoveryAction
  object RecoveryAction {
    /** Re-read the whole source table, then stream. */
    case object Snapshot extends RecoveryAction
    /** Continue from the committed offsets. */
    case object Resume extends RecoveryAction
    /** Skip history, stream from the latest offset (accepting the gap). */
    case object ResumeFromLatest extends RecoveryAction
    /** Unrecoverable without intervention (offsets lost/purged and the
      * mode forbids re-snapshotting). */
    case object Fail extends RecoveryAction
  }

  /** Restart decision table (public Debezium snapshot-mode semantics):
    *
    *  - `initial`: snapshot exactly once (no offsets yet); with
    *    offsets, resume — and if the source log has been purged past
    *    the stored offset, that is an error, NOT a silent re-snapshot.
    *  - `when_needed`: resume when possible, re-snapshot whenever the
    *    offsets are missing OR no longer available in the log.
    *  - `schema_only`/`no_data`: never snapshot data; resume if
    *    possible, otherwise start at the latest offset (gap accepted).
    *  - `never`: no snapshot ever; unrecoverable when offsets are
    *    missing or purged.
    *
    * @param hasCommittedOffsets checkpoint/offset state exists
    * @param sourceLogAvailable  the stored offset is still within the
    *                            source's retained log (binlog/topic)
    */
  def recoveryAction(snapshotMode: String, hasCommittedOffsets: Boolean,
                     sourceLogAvailable: Boolean = true): RecoveryAction = {
    import RecoveryAction._
    val resumable = hasCommittedOffsets && sourceLogAvailable
    snapshotMode match {
      case "initial"                 => if (resumable) Resume
                                        else if (!hasCommittedOffsets) Snapshot
                                        else Fail
      case "when_needed" | "always"  => if (resumable) Resume else Snapshot
      case "schema_only" | "no_data" => if (resumable) Resume else ResumeFromLatest
      case "never"                   => if (resumable) Resume else Fail
      case other => throw new IllegalArgumentException(s"unknown snapshot.mode: $other")
    }
  }

  /** The Kafka envelope stream: one `json` column (the Debezium
    * envelope string) plus source metadata, shaped identically to
    * [[CdcStream.fileSource]] so the downstream pipeline
    * (unwrap → upsert state → sink) is transport-agnostic.
    *
    * Needs the `spark-sql-kafka-0-10` artifact on the classpath (a
    * cluster deployment concern; not bundled here).
    */
  def kafkaSource(spark: SparkSession, config: Config): DataFrame = {
    val reader = config.sourceOptions.foldLeft(
      spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
    reader.load().selectExpr(
      "CAST(value AS STRING) AS json",
      "topic", "partition", "offset", "timestamp AS kafka_ts")
  }
}
