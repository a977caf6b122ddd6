package graft.streaming

/** Admin analog of the reference's create-topic-if-missing step
  * (events.rs:23-74 `ensure_topic`): before the producer's first
  * delivery, check the cluster's topic list and create the topic with
  * the configured partition/replication counts when absent.
  *
  * Spark's Kafka SINK never creates topics — it relies on broker
  * auto-create or an out-of-band admin step — so a reference
  * deployment moving to this library loses `ensure_topic` unless the
  * library carries it. This object carries it, against the standard
  * `kafka-clients` AdminClient (the Java client underlying the
  * reference's rdkafka admin calls).
  *
  * The container this library is BUILT in has no kafka-clients jar
  * (verified constraint — same as the Kafka connector), so the client
  * is reached by name at call time rather than imported: the code
  * compiles and tests here, and on a cluster (where spark-sql-kafka
  * ships kafka-clients) the same bytes run the real admin flow.
  * KafkaAdminSpec drives this to the documented failure point — the
  * class lookup — proving every step before it (the force_create
  * gate, property plumbing) without a broker.
  *
  * Semantics mirrored from the reference, step for step:
  *  - `force_create_new_topic == false` → no-op (events.rs:30-32).
  *  - metadata fetch fails → warn and continue WITHOUT creating; a
  *    delivery-time error surfaces downstream instead (events.rs:35-38
  *    returns Ok on metadata failure — topic admin must never wedge
  *    the pipeline).
  *  - topic present → no-op; absent → create with
  *    `new_topic_partitions` / `new_topic_replication`
  *    (events.rs:50-69).
  */
object KafkaAdmin {

  /** Result of an [[ensureTopic]] call, for callers that log like the
    * reference's info!/warn! lines.
    */
  sealed trait Outcome
  case object SkippedForceCreateOff extends Outcome
  case object SkippedMetadataUnavailable extends Outcome
  case object AlreadyExists extends Outcome
  case object Created extends Outcome

  /** Ensure `topic` exists on the cluster addressed by `adminProps`
    * (at minimum `bootstrap.servers`).
    *
    * @throws ClassNotFoundException when kafka-clients is not on the
    *         classpath — the exact (and only) failure point in this
    *         container, pinned by KafkaAdminSpec.
    */
  def ensureTopic(
      adminProps: java.util.Properties,
      topic: String,
      partitions: Int,
      replication: Short,
      forceCreate: Boolean = true): Outcome = {
    if (!forceCreate) return SkippedForceCreateOff
    // the contract boundary: everything below requires kafka-clients
    val adminCls = Class.forName("org.apache.kafka.clients.admin.AdminClient")
    val admin = adminCls.getMethod("create", classOf[java.util.Properties])
      .invoke(null, adminProps)
    try {
      val existing: java.util.Set[String] =
        try {
          val names = admin.getClass.getMethod("listTopics").invoke(admin)
          val future = names.getClass.getMethod("names").invoke(names)
          future.getClass.getMethod("get").invoke(future)
            .asInstanceOf[java.util.Set[String]]
        } catch {
          case scala.util.control.NonFatal(_) =>
            // events.rs:35-38: metadata unavailable → warn, do not
            // create, do not fail the pipeline
            return SkippedMetadataUnavailable
        }
      if (existing.contains(topic)) AlreadyExists
      else {
        val ntCls = Class.forName("org.apache.kafka.clients.admin.NewTopic")
        val newTopic = ntCls
          .getConstructor(classOf[String], classOf[Int], classOf[Short])
          .newInstance(topic, Int.box(partitions), Short.box(replication))
        val result = admin.getClass.getMethods
          .find(m => m.getName == "createTopics" && m.getParameterCount == 1)
          .getOrElse(throw new NoSuchMethodException("createTopics"))
          .invoke(admin, java.util.Collections.singleton(newTopic))
        val all = result.getClass.getMethod("all").invoke(result)
        all.getClass.getMethod("get").invoke(all)
        Created
      }
    } finally admin.getClass.getMethod("close").invoke(admin)
  }

  /** [[ensureTopic]] wired from a [[NesConfig]] — the exact call shape
    * of events.rs:84 `ensure_topic(consumer, admin, config, topic)`.
    * Admin properties come from the config's `kafka.*` map with the
    * Spark-connector `kafka.` prefix stripped back off (AdminClient
    * takes raw client keys).
    */
  def ensureTopic(config: NesConfig, topic: String): Outcome = {
    val props = new java.util.Properties()
    config.kafka.foreach { case (k, v) => props.setProperty(k, v) }
    ensureTopic(props, topic,
      config.newTopicPartitions, config.newTopicReplication.toShort,
      config.forceCreateNewTopic)
  }
}
