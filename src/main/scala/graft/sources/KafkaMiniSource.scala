package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.KafkaMiniBroker

/** Structured Streaming source over the Kafka wire protocol — the
  * connector shape a user runs with spark-sql-kafka against a real
  * broker (kafka_plugin.c's consumers on the other end), expressed as a
  * DataSourceV2 `MicroBatchStream` against [[KafkaMiniBroker]]:
  *
  *  - the DRIVER tracks only offsets: Metadata + ListOffsets(latest)
  *    over the wire pick up the partition map and log ends per trigger
  *    (`latestOffset`), and each micro-batch is the per-partition range
  *    (start, end] — no data ever moves through the driver (unlike
  *    [[UdpDatagramSource]], whose datagrams have no addressable store);
  *  - EXECUTORS fetch their ranges directly from the broker over their
  *    own sockets (`KafkaMiniBroker.consumeRange`, lazy page walk,
  *    O(fetch page) memory), one InputPartition per topic-partition —
  *    the real connector's parallelism unit;
  *  - offsets serialize into the checkpoint, so a RESTARTED query
  *    resumes exactly after the last committed batch: the broker's log
  *    is the durable store, ranges re-fetch deterministically, and the
  *    source is exactly-once where the UDP source is documented
  *    fail-fast. q251 gates precisely that: run 1 drains the log, more
  *    records land, run 2 on the same checkpoint emits ONLY the new
  *    ones.
  *
  * Options: `port` (the broker), optional `topics` (comma filter,
  * default all discovered). Schema mirrors the real connector's:
  * (topic, partition, offset, key, value).
  */
class KafkaMiniSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaMiniSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val port = properties.get("port")
    require(port != null, "option 'port' is required")
    val topics = Option(properties.get("topics"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val group = Option(properties.get("group")).filter(_.nonEmpty)
    val protocol = Option(properties.get("protocol")).getOrElse("classic")
    require(protocol == "classic" || protocol == "consumer",
      s"unknown group protocol '$protocol' (classic | consumer)")
    // KIP-848 SubscribedTopicRegex: broker-resolved, so it exists only
    // on the consumer-protocol wire (the classic protocol's pattern
    // subscriptions are a client-side fiction this source doesn't fake)
    val topicRegex = Option(
      new CaseInsensitiveStringMap(properties).get("topicregex"))
      .filter(_.nonEmpty)
    require(topicRegex.isEmpty ||
      (protocol == "consumer" && group.nonEmpty),
      "topicRegex requires protocol=consumer group mode")
    require(group.isEmpty || topics.nonEmpty || topicRegex.nonEmpty,
      "group mode needs a topic or topicRegex subscription")
    new KafkaMiniTable(port.toInt, topics, group,
      nextGen = protocol == "consumer", topicRegex = topicRegex)
  }
}

object KafkaMiniSource {
  val schema: StructType = new StructType()
    .add("topic", StringType).add("partition", IntegerType)
    .add("offset", LongType)
    .add("key", StringType).add("value", BinaryType)

  /** Driver-side assignment history per (group, member) — the KIP-848
    * gate reads it to pin the no-stop-the-world property (an
    * incumbent's assignment timeline must never pass through ∅ while a
    * member joins). Planning runs on the driver, so a plain
    * synchronized buffer suffices. */
  private val assignments =
    scala.collection.mutable.Map[(String, String),
      scala.collection.mutable.Buffer[Set[(String, Int)]]]()
  private[sources] def logAssignment(group: String, member: String,
                                     assigned: Set[(String, Int)]): Unit =
    assignments.synchronized {
      val buf = assignments.getOrElseUpdate((group, member),
        scala.collection.mutable.Buffer.empty)
      if (buf.isEmpty || buf.last != assigned) buf += assigned
    }
  def assignmentHistory(group: String)
      : Map[String, Seq[Set[(String, Int)]]] =
    assignments.synchronized {
      assignments.toSeq.collect { case ((g, m), h) if g == group =>
        m -> h.toSeq
      }.toMap
    }
  def clearAssignmentHistory(group: String): Unit =
    assignments.synchronized {
      assignments.keysIterator.filter(_._1 == group).toVector
        .foreach(assignments.remove)
    }
}

private class KafkaMiniTable(port: Int, topics: Seq[String],
                             group: Option[String], nextGen: Boolean,
                             topicRegex: Option[String] = None)
    extends Table with SupportsRead {
  override def name(): String = s"kafkamini:$port"
  override def schema(): StructType = KafkaMiniSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaMiniSource.schema
        override def toBatch: Batch =
          throw new UnsupportedOperationException("streaming only")
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new KafkaMiniMicroBatchStream(port, topics, group, nextGen,
            topicRegex)
      }
    }
}

/** Per-partition end offsets. JSON is `topic/partition=end` entries
  * ';'-joined sorted by key, ONE line — Spark's offset log is
  * line-based, a multi-line offset would corrupt it. Topic names with
  * '/', '=', ';' or '\n' are rejected at planning (ours never carry
  * them). */
private[sources] case class KafkaOffsets(ends: Map[(String, Int), Long])
    extends Offset {
  override def json(): String =
    ends.toSeq.sortBy { case ((t, p), _) => (t, p) }
      .map { case ((t, p), o) => s"$t/$p=$o" }.mkString(";")
}

private[sources] object KafkaOffsets {
  def parse(json: String): KafkaOffsets =
    KafkaOffsets(json.split(';').iterator.filter(_.nonEmpty).map { ln =>
      val eq = ln.lastIndexOf('=')
      val slash = ln.lastIndexOf('/', eq - 1)
      ((ln.substring(0, slash), ln.substring(slash + 1, eq).toInt),
        ln.substring(eq + 1).toLong)
    }.toMap)
}

private case class KafkaRangePartition(port: Int, topic: String,
    partition: Int, from: Long, until: Long) extends InputPartition

private[sources] class KafkaMiniMicroBatchStream(port: Int,
    topics: Seq[String], group: Option[String] = None,
    nextGen: Boolean = false, topicRegex: Option[String] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // ---- broker-coordinated planning (group mode) --------------------
  // With option `group`, the stream is a MEMBER of a consumer group:
  // its partition plan is whatever the membership protocol assigned it
  // (JoinGroup barrier → leader-computed range → SyncGroup), not the
  // full Metadata partition map — pmacct's consumer model
  // (CONFIG-KEYS kafka group.id; src/kafka_common.c registers a
  // group.id and lets the broker coordinate). Each planning round
  // HEARTBEATS first: error 27/25/22 means a rebalance — rejoin, adopt
  // the new assignment, and resume newly-acquired partitions from the
  // group's broker-committed offsets (the fenced commit this stream
  // writes in commit()). The driver still moves only offsets; data
  // stays on executor sockets.
  private var memberId: String = ""
  private var generation: Int = 0
  private var assigned: Set[(String, Int)] = Set.empty
  private var joined = false

  private def ensureMembership(): Unit =
    if (nextGen) ensureMembership848()
    else ensureMembershipClassic()

  // ---- KIP-848 membership (ConsumerGroupHeartbeat, api 68) ---------
  // No join barrier: every planning round is ONE heartbeat reporting
  // the currently-owned partitions; the broker's assignor answers with
  // this member's reconciled assignment (grants AND, by omission,
  // revocations). A joining member therefore never pauses the
  // incumbents — their untouched partitions keep flowing in the same
  // round. `generation` carries the member epoch, which also fences
  // the offset commits (the commit path runs BEFORE the heartbeat, so
  // revoked partitions hand their offsets over first — the same
  // ordering the classic lane uses).
  private def ensureMembership848(): Unit = group.foreach { g =>
    val ownedByTopic = assigned.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, ps) => (t, ps.map(_._2).toSeq.sorted) }
    var r = KafkaMiniBroker.heartbeat848(port, g,
      if (joined) memberId else "", if (joined) generation else 0,
      topics, ownedByTopic, topicRegex = topicRegex)
    if (r._1 == 25) // unknown: rejoin fresh
      r = KafkaMiniBroker.heartbeat848(port, g, "", 0, topics, Nil,
        topicRegex = topicRegex)
    else if (r._1 == 110) // FENCED_MEMBER_EPOCH: keep id, epoch 0
      r = KafkaMiniBroker.heartbeat848(port, g, memberId, 0, topics,
        Nil, topicRegex = topicRegex)
    require(r._1 == 0, s"ConsumerGroupHeartbeat error ${r._1}")
    memberId = r._2
    generation = r._3
    assigned = r._4.flatMap { case (t, ps) => ps.map(p => (t, p)) }.toSet
    joined = true
    KafkaMiniSource.logAssignment(g, memberId, assigned)
  }

  // Partition counts per subscribed topic at the time the CURRENT
  // generation formed — the member's metadata snapshot. Real consumers
  // refresh metadata (metadata.max.age.ms) and a partition-count
  // change triggers a re-join so the new generation covers the grown
  // topic; this stream refreshes every planning round (even fresher).
  // The r12 10x soak surfaced the gap: partitions minted after a
  // generation forms were invisible to classic members forever.
  private var metaSnapshot: Map[String, Int] = Map.empty
  private def partitionCounts(): Map[String, Int] =
    KafkaMiniBroker.discoverEnds(port, topics)
      .groupBy(_._1).map { case (t, ps) => (t, ps.size) }

  private def ensureMembershipClassic(): Unit = group.foreach { g =>
    val hb = if (joined)
      KafkaMiniBroker.heartbeat(port, g, generation, memberId) else -1
    val metaChanged = joined && hb == 0 && partitionCounts() != metaSnapshot
    if (!joined || hb != 0 || metaChanged) {
      // a rebalance (27) or stale generation (22) keeps the memberId;
      // an evicted member (25) is UNKNOWN to the broker — real-broker
      // semantics demand it rejoin with the empty id and get a new one.
      // A metadata change also keeps the id: the member initiates the
      // round (its join flips everyone else's heartbeat to 27)
      val keepId = if (joined && hb != 25) memberId else ""
      // the subscription is the FULL topic list; the leader's range
      // assignor splits each topic independently across subscribers
      val (me, gen, byTopic) =
        KafkaMiniBroker.groupAssignTopics(port, g, topics, keepId)
      memberId = me; generation = gen
      assigned = byTopic.flatMap { case (t, ps) =>
        ps.map(p => (t, p))
      }.toSet
      joined = true
      // snapshot AFTER the join so it reflects the metadata the
      // leader's assignment covered; a further grow re-triggers
      metaSnapshot = partitionCounts()
    }
  }

  /** Broker-committed start offsets for `parts` (−1 → earliest = 0). */
  private def committedStarts(parts: Seq[(String, Int)])
      : Map[(String, Int), Long] =
    group match {
      case Some(g) if parts.nonEmpty =>
        parts.groupBy(_._1).flatMap { case (t, tps) =>
          KafkaMiniBroker.fetchCommitted(port, g, t, tps.map(_._2))
            .map { case (p, off) => ((t, p), math.max(off, 0L)) }
        }
      case _ => Map.empty
    }

  private def ends(): Map[(String, Int), Long] = {
    ensureMembership()
    // a regex subscription learns its topic set FROM the assignment —
    // discovery covers the explicit list plus whatever the broker's
    // regex resolution granted this member
    val discover =
      if (topicRegex.isEmpty) topics
      else (topics ++ assigned.map(_._1)).distinct
    val all = KafkaMiniBroker.discoverEnds(port, discover)
      .map { case (t, p, o) =>
        require(!t.contains('/') && !t.contains('=') &&
          !t.contains(';') && !t.contains('\n'),
          s"unsupported topic name: $t")
        ((t, p), o)
      }.toMap
    if (group.isEmpty) all
    else all.filter { case ((t, p), _) => assigned((t, p)) }
  }

  /** Trigger.AvailableNow bound: the log ends snapshotted when the
    * trigger starts — batches drain up to here, then the query stops
    * (the same contract the real Kafka connector implements). */
  private var availableNowBound: Option[Map[(String, Int), Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(ends())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** First planning on a FRESH checkpoint: earliest (0 — the mini
    * broker never truncates), except in group mode, where the group's
    * broker-COMMITTED offsets win (a fresh member trusts the
    * coordinator over local state — the librdkafka restart semantics
    * q268 gates). A restarted query never calls this; it resumes from
    * the checkpointed [[KafkaOffsets]]. */
  override def initialOffset(): Offset = {
    val e = ends()
    val committed = committedStarts(e.keys.toSeq)
    KafkaOffsets(e.map { case (k, _) => (k, committed.getOrElse(k, 0L)) })
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // Group mode: fence-commit `start` BEFORE the heartbeat/rejoin in
    // ends(). Spark only invokes commit(N) when batch N+1 runs, so a
    // drained stream's last offsets would never reach the coordinator;
    // `start` is safe to commit here because latestOffset is only
    // called after every previously planned batch has fully run (a
    // restarted query re-executes its WAL batch first). Committing
    // before the heartbeat is the real consumer's revocation ordering:
    // commit what you processed, then learn about the rebalance. A
    // commit the coordinator rejects (the round already re-formed) is
    // the same at-least-once handover window real Kafka has.
    if (group.isDefined) commitOwned(start)
    KafkaOffsets(availableNowBound.getOrElse(ends()))
  }

  private def commitOwned(off: Offset): Unit = group.foreach { g =>
    if (joined)
      off.asInstanceOf[KafkaOffsets].ends.toSeq
        .groupBy { case ((t, _), _) => t }.toSeq.sortBy(_._1)
        .foreach { case (t, offs) =>
          KafkaMiniBroker.commitOffsetsFenced(port, g, generation,
            memberId, t,
            offs.map { case ((_, p), o) => (p, o) }.sortBy(_._1))
        }
  }

  override def reportLatestOffset(): Offset = KafkaOffsets(ends())

  override def deserializeOffset(json: String): Offset =
    KafkaOffsets.parse(json)

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaOffsets].ends
    val e = end.asInstanceOf[KafkaOffsets].ends
    // partitions in `end` but not in `start` were ACQUIRED in a
    // rebalance: they resume from the group's committed offsets (what
    // the previous owner fenced-committed), never from 0 — a re-read
    // here is exactly the duplicate a consumer group exists to prevent
    val acquired = committedStarts(
      e.keys.filterNot(s.contains).toSeq)
    e.toSeq.sortBy { case ((t, p), _) => (t, p) }.flatMap {
      case ((t, p), until) =>
        val from = s.getOrElse((t, p),
          acquired.getOrElse((t, p), 0L))
        if (until > from)
          Some(KafkaRangePartition(port, t, p, from, until))
        else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] = {
        val kp = p.asInstanceOf[KafkaRangePartition]
        new PartitionReader[InternalRow] {
          private val (it, closeConn) = KafkaMiniBroker
            .consumeRangeCloseable(kp.port, kp.topic, kp.partition,
              kp.from, kp.until)
          private var cur: (Long, graft.sinks.KafkaWire.Record) = _
          override def next(): Boolean = {
            if (it.hasNext) { cur = it.next(); true } else false
          }
          override def get(): InternalRow = new GenericInternalRow(
            Array[Any](UTF8String.fromString(kp.topic), kp.partition,
              cur._1, UTF8String.fromString(cur._2.key), cur._2.value))
          // A task may end before the range drains (failure, kill,
          // limit); release the broker connection either way.
          override def close(): Unit = closeConn()
        }
      }
    }

  /** The broker's log is the durable store; in group mode the batch's
    * end offsets also FENCE-commit to the coordinator (OffsetCommit
    * v1 with this member's generation), so the next owner of any
    * partition we lose resumes exactly here. A rejected commit
    * (rebalanced underneath us) is not an error: the checkpoint still
    * owns OUR sink's exactly-once story, and the new owner's reads
    * start from the last commit that did land. */
  override def commit(end: Offset): Unit = commitOwned(end)
  /** A stopping group-mode stream LEAVES cleanly (the consumer-close
    * path real clients run): the group re-forms immediately instead of
    * waiting out our session timeout, and our committed offsets are
    * the handover point. Best-effort — a dead broker can't object. */
  override def stop(): Unit = group.foreach { g =>
    if (joined)
      try {
        if (nextGen) // KIP-848 leave: member epoch −1
          KafkaMiniBroker.heartbeat848(port, g, memberId, -1, topics,
            Nil)
        else KafkaMiniBroker.leaveGroup(port, g, memberId)
      } catch { case _: Exception => () }
  }
}
