package graft

import graft.streaming.{EventStreams, KafkaAdmin, StreamJobs}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Opt-in integration lap against a REAL Kafka broker (VERDICT r7):
  * the reference's first production step is ensure-topic + delivery
  * (events.rs:23-98), and in this build container — which has no
  * kafka-clients jar and no broker — those paths only have
  * compile-level contract specs. This suite closes the gap on a
  * cluster checkout so the first deploy is not the first execution.
  *
  * In-container every test CANCELS (shows as skipped) with the
  * activation instructions. One-command cluster run:
  *
  * {{{
  * sbt -Dgraft.kafka.bootstrap=broker1:9092 \
  *     "testOnly graft.KafkaIntegrationSpec"
  * }}}
  *
  * Requirements on that checkout: `kafka-clients` and
  * `spark-sql-kafka-0-10` on the classpath (both ship with any Spark
  * distribution's Kafka connector) and a reachable broker that allows
  * topic auto-creation by AdminClient. The suite creates uniquely
  * named `graft_it_*` topics; they are small and safe to delete.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private def kafkaClientsPresent: Boolean =
    scala.util.Try(
      Class.forName("org.apache.kafka.clients.admin.AdminClient")).isSuccess

  private def connectorPresent: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  private def bootstrap: Option[String] =
    sys.props.get("graft.kafka.bootstrap")
      .orElse(sys.env.get("GRAFT_KAFKA_BOOTSTRAP"))

  private def requireBroker(): String = {
    assume(kafkaClientsPresent,
      "kafka-clients not on the classpath (expected in this container) — " +
        "run on a cluster checkout: sbt -Dgraft.kafka.bootstrap=host:9092 " +
        "\"testOnly graft.KafkaIntegrationSpec\"")
    assume(bootstrap.isDefined,
      "no broker address — pass -Dgraft.kafka.bootstrap=host:9092 " +
        "or set GRAFT_KAFKA_BOOTSTRAP")
    bootstrap.get
  }

  test("ensureTopic creates a missing topic, then reports AlreadyExists") {
    val broker = requireBroker()
    val props = new java.util.Properties()
    props.setProperty("bootstrap.servers", broker)
    val topic = s"graft_it_admin_${System.currentTimeMillis()}"
    assert(KafkaAdmin.ensureTopic(props, topic, 3, 1.toShort) ===
      KafkaAdmin.Created)
    assert(KafkaAdmin.ensureTopic(props, topic, 3, 1.toShort) ===
      KafkaAdmin.AlreadyExists)
    // force_create off → no-op regardless of broker state
    assert(KafkaAdmin.ensureTopic(props, s"${topic}_never", 3, 1.toShort,
      forceCreate = false) === KafkaAdmin.SkippedForceCreateOff)
  }

  test("kafka sink delivers reference-shaped records; source reads them back") {
    val broker = requireBroker()
    assume(connectorPresent,
      "spark-sql-kafka-0-10 not on the classpath — ship the Kafka " +
        "connector with the cluster checkout")
    val topic = s"graft_it_sink_${System.currentTimeMillis()}"
    val props = new java.util.Properties()
    props.setProperty("bootstrap.servers", broker)
    KafkaAdmin.ensureTopic(props, topic, 3, 1.toShort)
    // reference-shaped records from the real pipeline, routed to the
    // integration topic (toKafkaRecords emits a `topic` column the
    // sink honors natively)
    val logs = graft.core.Tables.events(spark, sf).limit(50)
      .select(concat(lit(graft.model.NearEvent.EventJsonPrefix),
          to_json(struct(lit("nep297").as("standard"),
            lit("1.0.0").as("version"), col("event_type").as("event")))).as("log"),
        concat(lit("r"), col("event_id")).as("receipt_id"),
        unix_micros(col("ts")).as("block_timestamp"),
        (lit(1000L) + col("event_id")).as("block_height"),
        (col("user_id") % 4).as("shard_id"),
        lit("it.graft.near").as("contract_account_id"))
    val events = EventStreams.validated(EventStreams.extractEvents(logs))
    val n = events.count()
    assert(n > 0, "fixture must produce deliverable events")
    events.select(col("event").as("key"),
        to_json(struct(col("*"))).as("value"), lit(topic).as("topic"))
      .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)", "topic")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .save()
    val read = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()
    assert(read.count() === n)
  }

  test("streaming sink builder runs AvailableNow delivery end-to-end") {
    val broker = requireBroker()
    assume(connectorPresent, "spark-sql-kafka-0-10 not on the classpath")
    val topic = s"graft_it_stream_${System.currentTimeMillis()}"
    val props = new java.util.Properties()
    props.setProperty("bootstrap.servers", broker)
    KafkaAdmin.ensureTopic(props, topic, 3, 1.toShort)
    val dir = java.nio.file.Files.createTempDirectory("graft_it_src").toString
    graft.core.Tables.events(spark, sf).limit(20)
      .select(concat(lit(graft.model.NearEvent.EventJsonPrefix),
          to_json(struct(lit("nep297").as("standard"),
            lit("1.0.0").as("version"), col("event_type").as("event")))).as("log"),
        concat(lit("r"), col("event_id")).as("receipt_id"),
        unix_micros(col("ts")).as("block_timestamp"),
        (lit(1000L) + col("event_id")).as("block_height"),
        (col("user_id") % 4).as("shard_id"),
        lit("it.graft.near").as("contract_account_id"))
      .write.mode("overwrite").json(dir)
    val logs = spark.readStream.schema(StreamJobs.logSchema).json(dir)
    val records = EventStreams.toKafkaRecords(
      EventStreams.validated(EventStreams.extractEvents(logs)),
      prefix = topic, allTopic = s"$topic.all")
    val q = StreamJobs.Kafka.sink(records
        .withColumn("topic", lit(topic)), broker,
        java.nio.file.Files.createTempDirectory("graft_it_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val read = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()
    assert(read.count() > 0)
  }
}
