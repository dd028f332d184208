package graft.sinks

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Exactly-once Structured Streaming SINK over the Kafka wire — the
  * write-side twin of [[graft.sources.KafkaMiniSource]] (whose
  * checkpointed resume q251 gates): a DataSourceV2 `StreamingWrite`
  * whose per-task writers speak the transactional protocol
  * (InitProducerId / transactional Produce / EndTxn, KIP-98) against
  * [[KafkaMiniBroker]].
  *
  * The exactly-once argument, task by task:
  *  - every (epoch, spark-partition) writer owns the deterministic
  *    transactional.id `prefix-e<epoch>-p<partition>`;
  *  - a task RETRY re-runs InitProducerId on the same id — the broker
  *    bumps the producer epoch and DISCARDS the dead attempt's open
  *    transaction (zombie fencing), so half-written attempts leave
  *    nothing behind;
  *  - a zombie attempt still holding the old epoch gets error 47
  *    (fenced) on produce or commit and cannot corrupt the log;
  *  - a REPLAYED epoch (driver restart before the checkpoint recorded
  *    the batch) re-runs the same transactional.ids; the broker's
  *    commit-once marker answers 48 (invalid state), which the writer
  *    treats as already-committed — the idempotent-restore protocol
  *    production Kafka sinks (e.g. Flink's) use on recovery;
  *  - consumers see a transaction's records only after its EndTxn
  *    commit (read_committed), all-or-nothing.
  *
  * Routing: records hash by key across `partitions` kafka partitions
  * (one transaction may span several — EndTxn commits them atomically).
  * Schema: (key STRING, value BINARY). Scale shape: the driver never
  * touches data; each executor task holds ONE broker connection and
  * streams its buffered rows as size-bounded batches.
  */
class KafkaMiniSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaMiniSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val port = properties.get("port")
    require(port != null, "option 'port' is required")
    val topic = Option(properties.get("topic")).getOrElse("graft_sink")
    val nParts = Option(properties.get("partitions"))
      .map(_.toInt).getOrElse(1)
    val prefix = Option(properties.get("txnprefix")).getOrElse("graft")
    new KafkaMiniSink.SinkTable(port.toInt, topic, nParts, prefix)
  }
}

object KafkaMiniSink {
  val schema: StructType = new StructType()
    .add("key", StringType).add("value", BinaryType)

  private[sinks] final class SinkTable(port: Int, topic: String,
                                       nParts: Int, prefix: String)
      extends Table with SupportsWrite {
    override def name(): String = s"kafka-mini-sink($topic)"
    override def schema(): StructType = KafkaMiniSink.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.STREAMING_WRITE,
        TableCapability.BATCH_WRITE)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val cols = info.schema().fields.map(_.name).toSeq
      require(cols == Seq("key", "value"),
        s"kafka-mini-sink expects (key STRING, value BINARY), got $cols")
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toStreaming: StreamingWrite =
            new TxnStreamingWrite(port, topic, nParts, prefix)
          // batch writes ride the same per-task transactions, with the
          // write's queryId (a fresh UUID per logical batch job) folded
          // into the txn-id prefix: two DIFFERENT batch jobs can never
          // collide on txn ids (a collision would hit the commit-once
          // marker and silently drop the second job's data), while task
          // RETRIES within one job share the queryId and still dedup
          // via fencing + commit-once, exactly like a replayed
          // streaming epoch
          override def toBatch: org.apache.spark.sql.connector.write
              .BatchWrite =
            new org.apache.spark.sql.connector.write.BatchWrite {
              override def createBatchWriterFactory(
                  pinfo: PhysicalWriteInfo)
                  : org.apache.spark.sql.connector.write
                    .DataWriterFactory =
                new TxnBatchWriterFactory(port, topic, nParts,
                  s"$prefix-j${info.queryId()}")
              override def commit(
                  messages: Array[WriterCommitMessage]): Unit = ()
              override def abort(
                  messages: Array[WriterCommitMessage]): Unit = ()
            }
        }
      }
    }
  }

  private final case class TxnCommit(txnId: String, records: Long)
      extends WriterCommitMessage

  private final class TxnStreamingWrite(port: Int, topic: String,
                                        nParts: Int, prefix: String)
      extends StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : StreamingDataWriterFactory =
      new TxnWriterFactory(port, topic, nParts, prefix)
    // transactions commit per task (EndTxn in DataWriter.commit); the
    // driver-side epoch hooks have nothing left to coordinate — a
    // replayed epoch's tasks resolve themselves via the commit-once
    // marker (error 48 => already done)
    override def commit(epochId: Long,
                        messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long,
                       messages: Array[WriterCommitMessage]): Unit = ()
  }

  private final class TxnWriterFactory(port: Int, topic: String,
                                       nParts: Int, prefix: String)
      extends StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
                              epochId: Long): DataWriter[InternalRow] =
      new TxnWriter(port, topic, nParts,
        s"$prefix-e$epochId-p$partitionId")
  }

  /** Batch-path factory: the same transactional writers pinned to
    * epoch 0 under a per-job prefix (queryId folded in upstream) — a
    * task retry within the job replays its own txn id and dedups on
    * the commit-once marker; a separate job run gets fresh ids and
    * appends. */
  private final class TxnBatchWriterFactory(port: Int, topic: String,
                                            nParts: Int, prefix: String)
      extends org.apache.spark.sql.connector.write.DataWriterFactory {
    override def createWriter(partitionId: Int,
                              taskId: Long): DataWriter[InternalRow] =
      new TxnWriter(port, topic, nParts, s"$prefix-e0-p$partitionId")
  }

  /** One task's transactional writer. Buffers rows, then on commit runs
    * the full wire conversation: InitProducerId (fencing any prior
    * attempt), transactional Produce in bounded batches, EndTxn. */
  private final class TxnWriter(port: Int, topic: String, nParts: Int,
                                txnId: String)
      extends DataWriter[InternalRow] {
    private val buf =
      scala.collection.mutable.ArrayBuffer[(Int, KafkaWire.Record)]()

    override def write(row: InternalRow): Unit = {
      val key = row.getUTF8String(0).toString
      val value = row.getBinary(1)
      val p = math.floorMod(key.hashCode, nParts)
      buf += ((p, KafkaWire.Record(key, value)))
    }

    override def commit(): WriterCommitMessage = {
      if (buf.isEmpty) return TxnCommit(txnId, 0L)
      val (sock, in, out) = KafkaMiniBroker.connect(port)
      try {
        val (pid, epoch) = KafkaMiniBroker.initProducer(in, out, txnId)
        var corr = 10
        var alreadyCommitted = false
        buf.grouped(200).foreach { group =>
          if (!alreadyCommitted) {
            val pbs = group.groupBy(_._1).toSeq.sortBy(_._1).map {
              case (p, recs) =>
                KafkaWire.PartitionBatch(topic, p, recs.map(_._2).toSeq)
            }
            val acks = KafkaWire.decodeProduceResponse(
              KafkaMiniBroker.exchange(in, out, KafkaWire.encodeProduce(
                corr, "graft_txn_sink", pbs, 1700000000000L,
                txnId = Some(txnId), producerId = pid,
                producerEpoch = epoch)))
            corr += 1
            if (acks.exists(_._3 == 48)) alreadyCommitted = true
            else require(acks.nonEmpty && acks.forall(_._3 == 0),
              s"transactional produce rejected: $acks")
          }
        }
        if (!alreadyCommitted) {
          val err = KafkaMiniBroker.endTxn(in, out, txnId, pid, epoch,
            commit = true)
          // 48 = commit-once marker already present (replayed epoch):
          // the transaction's data is durable; treat as success
          require(err == 0 || err == 48, s"EndTxn failed: error $err")
        }
        TxnCommit(txnId, buf.length.toLong)
      } finally sock.close()
    }

    override def abort(): Unit = {
      // best-effort: the broker's fencing makes this optional — the
      // NEXT attempt's InitProducerId discards this open transaction
      try {
        val (sock, in, out) = KafkaMiniBroker.connect(port)
        try {
          val (pid, epoch) = KafkaMiniBroker.initProducer(in, out, txnId)
          KafkaMiniBroker.endTxn(in, out, txnId, pid, epoch,
            commit = false)
        } finally sock.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    }

    override def close(): Unit = buf.clear()
  }
}
