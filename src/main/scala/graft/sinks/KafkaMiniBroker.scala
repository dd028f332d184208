package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.mutable

/** In-process Kafka broker speaking the subset of the PUBLIC wire
  * protocol (kafka.apache.org/protocol) the engine's producer and
  * consumer paths use: Produce v9 (flexible) and Fetch v4. The sandbox
  * stand-in for the env-blocked real broker (no kafka jar, no egress —
  * documented since r4), playing the same role the in-process UDP
  * senders play for q238's live collector gate: real sockets, real
  * frames, so the q248 end-to-end proof exercises every byte the
  * reference's librdkafka path (src/kafka_common.c) puts on the wire.
  *
  * Log semantics mirrored from the real broker:
  *  - append assigns baseOffset = log-end offset and REWRITES the first
  *    8 bytes of the producer's RecordBatch in place — legal because the
  *    batch CRC32C covers attributes..end and deliberately excludes
  *    baseOffset/batchLength/epoch (that exclusion exists precisely so
  *    brokers can do this without re-CRCing);
  *  - fetch serves stored batch bytes VERBATIM from the requested offset
  *    (a real broker is zero-copy here), at least one batch per response
  *    even when it exceeds maxBytes (the v3+ large-message rule), plus
  *    the partition high watermark;
  *  - per-partition appends serialize on the partition log (one leader
  *    per partition), concurrent producers to different partitions don't
  *    contend.
  *
  * One connection = one blocking request/response loop (the broker's
  * network-thread model, minus pipelining — the gate's clients await
  * each ack like acks=1 librdkafka does). Bootstrap/metadata discovery
  * is out of scope: the gate connects straight to the one "leader".
  */
final class KafkaMiniBroker {

  private final class PartitionLog {
    val batches = mutable.ArrayBuffer[Array[Byte]]()   // raw, offset-patched
    val baseOffsets = mutable.ArrayBuffer[Long]()
    var logEnd: Long = 0L
  }

  /** One transactional.id's coordinator state (KIP-98 subset): the
    * current (producerId, producerEpoch), the OPEN transaction's
    * buffered batches (invisible to fetch until EndTxn commit — the
    * read_committed contract, realized here by staging instead of the
    * real broker's abort-marker/LSO machinery), and the committed flag
    * that makes a replayed commit idempotent (error 48, which a
    * recovering writer treats as already-done — the Flink/Kafka-sink
    * restore protocol). */
  private final class TxnState {
    var pid: Long = -1L
    var epoch: Short = 0
    val buffered = mutable.ArrayBuffer[(String, Int, Array[Byte])]()
    var committed = false
  }
  private val txns = mutable.Map[String, TxnState]()
  private val pidToTxn = mutable.Map[Long, String]()
  private var nextPid = 1000L
  /** (committed, aborted-or-fence-discarded, fenced-request) counters —
    * the gate's txn lanes. */
  @volatile private var txnCommitted = 0
  @volatile private var txnAborted = 0
  @volatile private var txnFenced = 0
  def txnStats: (Int, Int, Int) = (txnCommitted, txnAborted, txnFenced)

  /** Consumer-group committed offsets, (group, topic, partition) →
    * offset — the __consumer_offsets stand-in. Like the partition logs,
    * the map survives a stop/start cycle (the durable-log semantics a
    * restarted consumer's OffsetFetch recovery depends on). */
  private val groupOffsets = mutable.Map[(String, String, Int), Long]()

  /** KIP-848 next-generation group (ConsumerGroupHeartbeat, api 68):
    * the BROKER owns the assignor. No join/sync barrier — the group
    * keeps a per-member (epoch, owned) ledger plus a target assignment
    * recomputed on membership change, and each heartbeat reconciles
    * ONE member: it may own target(me) minus whatever other members
    * still hold. A joiner therefore never stops the world; owners
    * release partitions one heartbeat at a time and the joiner picks
    * them up as they free. */
  private final class Group848 {
    var epoch = 1
    /** join-ordered: memberId → (memberEpoch last sent, owned). */
    val members =
      mutable.LinkedHashMap[String, (Int, Set[(String, Int)])]()
    var nextId = 0
    var target: Map[String, Set[(String, Int)]] = Map.empty
    /** liveness ledger + the broker-side session timeout (KIP-848's
      * group.consumer.session.timeout.ms — a GROUP config, not a
      * request field). */
    val lastSeenNs = mutable.Map[String, Long]()
    var sessionTimeoutMs: Int = Int.MaxValue
    /** KIP-345 static membership on the new wire: instance id →
      * member id. A static member that comes back with the empty
      * member id resumes its OLD identity and assignment — no epoch
      * bump, nobody rebalances. */
    val instanceIds = mutable.Map[String, String]()
    /** Evict members whose last heartbeat is older than the session
      * timeout: membership shrinks, the epoch bumps, and survivors
      * absorb the freed partitions INCREMENTALLY on their own next
      * heartbeats — nobody pauses (contrast GroupState.sweep, which
      * forces every survivor through a new join barrier). */
    def sweep(now: Long): Unit = {
      val dead = members.keysIterator.filter { m =>
        now - lastSeenNs.getOrElse(m, now) >
          sessionTimeoutMs.toLong * 1000000L
      }.toVector
      if (dead.nonEmpty) {
        dead.foreach { m =>
          members.remove(m); lastSeenNs.remove(m)
          instanceIds.filterInPlace((_, id) => id != m)
        }
        epoch += 1
      }
    }
    /** Range assignor over the subscribed topics in join order. */
    def recomputeTarget(parts: Seq[(String, Int)]): Unit = {
      val ids = members.keysIterator.toIndexedSeq
      target =
        if (ids.isEmpty) Map.empty
        else parts.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
          case (_, tps) =>
            val sorted = tps.sortBy(_._2)
            val per = (sorted.size + ids.size - 1) / ids.size
            ids.zipWithIndex.map { case (id, i) =>
              id -> sorted.slice(i * per, (i + 1) * per).toSet
            }
        }.groupBy(_._1).map { case (id, xs) =>
          id -> xs.iterator.map(_._2).foldLeft(
            Set.empty[(String, Int)])(_ ++ _)
        }
    }
  }
  private val groups848 = mutable.Map[String, Group848]()

  /** Set the KIP-848 group's broker-side session timeout. */
  def set848SessionTimeout(group: String, ms: Int): Unit = {
    val gr = groups848.synchronized {
      groups848.getOrElseUpdate(group, new Group848)
    }
    gr.synchronized { gr.sessionTimeoutMs = ms }
  }

  /** (epoch, members → owned) snapshot for gates. */
  def group848Snapshot(group: String)
      : (Int, Map[String, Set[(String, Int)]]) =
    groups848.synchronized {
      groups848.get(group) match {
        case Some(g) => g.synchronized {
          (g.epoch, g.members.map { case (id, (_, owned)) =>
            id -> owned }.toMap)
        }
        case None => (0, Map.empty)
      }
    }

  /** One group's membership round (JoinGroup/SyncGroup coordinator
    * state): members joined so far, the generation, and the leader's
    * synced assignments. The broker is policy-free — it elects the
    * FIRST joiner leader and relays bytes; the assignment itself is
    * computed client-side, as in real Kafka. */
  private final class GroupState {
    var generation = 0
    /** Join rounds complete when this many members have joined — the
      * deterministic stand-in for the real broker's rebalance timeout
      * (wall-clock waits would make gates racy). Declared up front via
      * [[expectGroupMembers]]; -1 = complete on the first join. */
    var expected = -1
    var roundComplete = false
    val members = mutable.LinkedHashMap[String, Array[Byte]]()
    var nextMemberN = 0
    var assignments: Map[String, Array[Byte]] = null
    /** Members of the PREVIOUS stable generation during a rebalance:
      * their heartbeats answer 27 (rejoin!) rather than 25 (gone). */
    val prevMembers = mutable.Set[String]()
    /** Liveness bookkeeping for the session-timeout sweep: last
      * heartbeat/join/commit nanoTime and the per-member session
      * timeout each member declared in its JoinGroup. */
    val lastSeen = mutable.Map[String, Long]()
    val timeoutMs = mutable.Map[String, Int]()
    /** Members the sweep has thrown out (their commits/heartbeats get
      * 25 forever) and a counter the gates read. */
    val evicted = mutable.Set[String]()
    /** Set (under both the groups and this lock) when DeleteGroups
      * removes the group from the map: a joiner that fetched this state
      * before removal must not resurrect it — it re-fetches a fresh one
      * instead (the delete-then-recreate semantics of q301). */
    var dead = false

    /** Session-timeout sweep (the coordinator's liveness rule): a
      * stable group drops every member whose last heartbeat is older
      * than its own session timeout — the group re-forms without it,
      * assignments die, survivors learn via heartbeat error 27. */
    def sweep(now: Long): Unit = if (roundComplete) {
      val dead = members.keysIterator.filter { m =>
        now - lastSeen.getOrElse(m, now) >
          timeoutMs.getOrElse(m, Int.MaxValue).toLong * 1000000L
      }.toVector
      if (dead.nonEmpty) {
        dead.foreach { m =>
          members.remove(m); evicted += m
          lastSeen.remove(m); timeoutMs.remove(m)
        }
        prevMembers ++= members.keys // survivors must rejoin
        members.clear()
        assignments = null
        roundComplete = false
      }
    }
  }
  private val groups = mutable.Map[String, GroupState]()

  /** Declare how many members the next join round of `group` waits
    * for (see [[GroupState.expected]]). */
  def expectGroupMembers(group: String, n: Int): Unit =
    groups.synchronized {
      val st = groups.getOrElseUpdate(group, new GroupState)
      st.synchronized { st.expected = n }
    }

  /** Gate observability: (generation, live members, evicted members)
    * of a group — what the coordinator currently believes. */
  def groupSnapshot(group: String): (Int, Set[String], Set[String]) =
    groups.synchronized { groups.get(group) } match {
      case None => (0, Set.empty, Set.empty)
      case Some(st) => st.synchronized {
        (st.generation, st.members.keySet.toSet, st.evicted.toSet)
      }
    }

  private val logs = mutable.Map[(String, Int), PartitionLog]()
  private var server: ServerSocket = _
  @volatile private var running = false
  /** Protocol-level "the broker process is gone": new connections are
    * reset on accept, live ones severed. Modeled ABOVE the socket bind —
    * rebinding a freed ephemeral port races the kernel's own port
    * allocator under load (any outgoing connection can grab it), so the
    * listener stays bound across a stop/start cycle and down-ness lives
    * in the accept path, which is also what a dead host looks like to a
    * client: connect may complete, the first round trip dies. */
  @volatile private var down = false
  private val conns = mutable.Set[Socket]()

  /** Bind a loopback port (0 = ephemeral) on first call and start the
    * accept loop; on a later call (after [[stop]]) just lift the down
    * flag — the partition logs survive, the in-memory stand-in for the
    * real broker's durable log (q249, reference test 900, leans on
    * both). Returns the port (the gate's "bootstrap"). */
  def start(port: Int = 0): Int = synchronized {
    if (server != null && !server.isClosed) { down = false; return server.getLocalPort }
    server = new ServerSocket()
    server.setReuseAddress(true)
    server.bind(new java.net.InetSocketAddress(
      InetAddress.getLoopbackAddress, port), 64)
    running = true
    down = false
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          if (down) sock.close()
          else {
            val t = new Thread(() => serve(sock), "kafka-mini-conn")
            t.setDaemon(true); t.start()
          }
        } catch { case _: Exception => /* closed */ }
      }
    }, "kafka-mini-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  /** The broker "process" goes away: reset new connections, sever live
    * ones. The listener socket itself stays bound (see [[down]]). */
  def stop(): Unit = {
    down = true
    conns.synchronized {
      conns.foreach(s => try s.close() catch { case _: Exception => })
      conns.clear()
    }
  }

  /** Final shutdown: stop + release the listener. */
  def close(): Unit = synchronized {
    stop()
    running = false
    if (server != null) server.close()
  }

  /** Snapshot of (topic, partition, highWatermark) — what Metadata +
    * ListOffsets would tell a consumer group; read driver-side to build
    * the fetch assignment. */
  def partitionEnds: Seq[(String, Int, Long)] = logs.synchronized {
    logs.toSeq.map { case ((t, p), l) => (t, p, l.logEnd) }.sortBy(x => (x._1, x._2))
  }

  private def log(topic: String, partition: Int): PartitionLog =
    logs.synchronized {
      logs.getOrElseUpdate((topic, partition), new PartitionLog)
    }

  /** Append a raw producer batch: assign the base offset, patch it into
    * the batch header, advance the log end by the batch's record count
    * (RecordBatch v2 keeps it at byte 57). */
  private def append(topic: String, partition: Int,
                     batch: Array[Byte]): Long = {
    val l = log(topic, partition)
    l.synchronized {
      val base = l.logEnd
      val bb = java.nio.ByteBuffer.wrap(batch)
      bb.putLong(0, base)
      val nRecords = if (batch.length >= 61) bb.getInt(57) else 0
      l.batches += batch
      l.baseOffsets += base
      l.logEnd = base + math.max(0, nRecords)
      base
    }
  }

  /** Serve fetch: batches whose range reaches past `offset`, verbatim,
    * stopping after maxBytes but never before the first batch. A fetch
    * of an unknown partition serves an empty log WITHOUT creating one
    * (so health probes don't pollute [[partitionEnds]]). */
  private def read(topic: String, partition: Int, offset: Long,
                   maxBytes: Int): (Long, Array[Byte]) = {
    val l = logs.synchronized {
      logs.getOrElse((topic, partition), null)
    }
    if (l == null) return (0L, Array.emptyByteArray)
    l.synchronized {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < l.batches.length &&
             (out.size() == 0 || out.size() < maxBytes)) {
        // Defense in depth vs append()'s length gate: skip anything too
        // short to carry the v2 record count instead of throwing and
        // dropping the connection for every future fetch.
        if (l.batches(i).length >= 61) {
          val nRecords = java.nio.ByteBuffer.wrap(l.batches(i)).getInt(57)
          if (l.baseOffsets(i) + nRecords > offset)
            out.write(l.batches(i))
        }
        i += 1
      }
      (l.logEnd, out.toByteArray)
    }
  }

  /** SASL/PLAIN credentials; when set, every connection must
    * handshake + authenticate before any other API (unauthenticated
    * requests sever the connection — the real broker's posture). */
  @volatile private var saslCreds: Option[(String, String)] = None
  def requireSasl(user: String, pass: String): Unit =
    saslCreds = Some((user, pass))

  /** SCRAM credentials (reference CONFIG-KEYS sasl.mechanisms
    * SCRAM-SHA-256/512): the broker stores only (salt, i, StoredKey,
    * ServerKey) — password-derived, never the password. When set
    * without [[requireSasl]], PLAIN is NOT an enabled mechanism and
    * its handshake gets 33. */
  @volatile private var scramCreds
      : Option[(String, Scram.Credential)] = None
  def requireScram(user: String, pass: String,
                   mechanism: String = "SCRAM-SHA-256",
                   iterations: Int = 4096): Unit = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    scramCreds =
      Some((user, Scram.credential(mechanism, pass, salt, iterations)))
  }

  private def enabledMechs: Seq[String] =
    saslCreds.map(_ => "PLAIN").toSeq ++
      scramCreds.map(_._2.mechanism).toSeq

  private def serve(sock: Socket): Unit = {
    conns.synchronized { conns += sock }
    var authenticated = saslCreds.isEmpty && scramCreds.isEmpty
    var handshookMech: String = null
    var scramSrv: Scram.Server = null
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (running && !down) {
        val size = in.readInt()
        if (size < 8 || size > 64 * 1024 * 1024)
          throw new java.io.IOException(s"bad frame size $size")
        val payload = new Array[Byte](size)
        in.readFully(payload)
        val apiKey = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
        if (!authenticated && apiKey != 17 && apiKey != 36)
          throw new java.io.IOException("unauthenticated request")
        val resp: Array[Byte] = apiKey match {
          case 17 =>
            KafkaWire.parseSaslHandshake(payload) match {
              case Some((corr, mech)) =>
                val ok = enabledMechs.contains(mech)
                if (ok) { handshookMech = mech; scramSrv = null }
                KafkaWire.encodeSaslHandshakeResponse(corr,
                  if (ok) 0
                  else 33, // UNSUPPORTED_SASL_MECHANISM
                  enabledMechs)
              case None => null
            }
          case 36 =>
            KafkaWire.parseSaslAuthenticate(payload) match {
              case Some((corr, token))
                  if handshookMech != null &&
                    handshookMech.startsWith("SCRAM-") =>
                if (scramSrv == null) {
                  val snonce = java.util.UUID.randomUUID().toString
                    .replace("-", "")
                  scramSrv = new Scram.Server(
                    u => scramCreds.collect {
                      case (su, c) if su == u => c
                    }, snonce)
                }
                scramSrv.step(token) match {
                  case Right((reply, done)) =>
                    if (done) authenticated = true
                    KafkaWire.encodeSaslAuthenticateResponse(corr, 0,
                      "", reply)
                  case Left(why) =>
                    scramSrv = null // conversation is dead; start over
                    KafkaWire.encodeSaslAuthenticateResponse(corr,
                      58, why) // SASL_AUTHENTICATION_FAILED
                }
              case Some((corr, token)) =>
                // RFC 4616: [authzid] NUL authcid NUL passwd
                val parts = {
                  val s = new String(token, "UTF-8")
                  s.split("\u0000", -1)
                }
                val ok = saslCreds.exists { case (u, p) =>
                  parts.length == 3 && parts(1) == u && parts(2) == p
                }
                if (ok) {
                  authenticated = true
                  KafkaWire.encodeSaslAuthenticateResponse(corr, 0, "")
                } else
                  KafkaWire.encodeSaslAuthenticateResponse(corr,
                    58, "Authentication failed") // SASL_AUTH_FAILED
              case None => null
            }
          case 0 =>
            KafkaWire.parseProduce(payload) match {
              case Some(req) =>
                val acks = req.batches.map { case (t, p, batch) =>
                  // RecordBatch v2 header is 61 bytes; anything shorter
                  // can't carry a record count and would poison every
                  // later fetch of the partition — refuse it at the door
                  // (errorCode 2 = CORRUPT_MESSAGE), never store it.
                  if (batch.length < 61) (t, p, 2.toShort, -1L)
                  else {
                    val (pid, ep, isTxn) = KafkaWire.batchTxnInfo(batch)
                    if (isTxn) {
                      // transactional produce: validate identity, stage
                      // until EndTxn — never visible to fetch before the
                      // commit (read_committed)
                      txns.synchronized {
                        pidToTxn.get(pid).map(txns) match {
                          case Some(st) if st.pid == pid &&
                              st.epoch.toInt == ep =>
                            if (st.committed) (t, p, 48.toShort, -1L)
                            else {
                              st.buffered += ((t, p, batch)); (t, p, 0.toShort, -1L)
                            }
                          case Some(_) =>
                            txnFenced += 1; (t, p, 47.toShort, -1L)
                          case None =>
                            // a fenced producer's pid was evicted on
                            // re-init — same rejection, same count
                            txnFenced += 1; (t, p, 47.toShort, -1L)
                        }
                      }
                    }
                    else (t, p, 0.toShort, append(t, p, batch))
                  }
                }
                KafkaWire.encodeProduceResponse(req.correlationId, acks)
              case None => null
            }
          case 22 =>
            KafkaWire.parseInitProducerId(payload) match {
              case Some((corr, _, txnId)) =>
                txns.synchronized {
                  val st = txns.getOrElseUpdate(txnId, new TxnState)
                  if (st.pid >= 0) pidToTxn.remove(st.pid)
                  // re-init FENCES any live producer of this id: epoch
                  // bumps and the zombie's open transaction is discarded
                  // (the recovery path a crashed writer's retry takes)
                  if (st.buffered.nonEmpty) txnAborted += 1
                  st.buffered.clear()
                  st.pid = nextPid; nextPid += 1
                  st.epoch = (st.epoch + 1).toShort
                  pidToTxn(st.pid) = txnId
                  KafkaWire.encodeInitProducerIdResponse(corr, 0, st.pid,
                    st.epoch.toInt)
                }
              case None => null
            }
          case 26 =>
            KafkaWire.parseEndTxn(payload) match {
              case Some((corr, txnId, pid, ep, commit)) =>
                txns.synchronized {
                  txns.get(txnId) match {
                    case Some(st) if st.pid == pid &&
                        st.epoch.toInt == ep =>
                      if (st.committed)
                        KafkaWire.encodeEndTxnResponse(corr, 48)
                      else if (commit) {
                        // atomic visibility: batches append in produce
                        // order under the txn lock, then the commit-once
                        // marker makes any replay idempotent
                        st.buffered.foreach { case (t, p, b) =>
                          append(t, p, b)
                        }
                        st.buffered.clear()
                        st.committed = true
                        txnCommitted += 1
                        KafkaWire.encodeEndTxnResponse(corr, 0)
                      } else {
                        if (st.buffered.nonEmpty) txnAborted += 1
                        st.buffered.clear()
                        KafkaWire.encodeEndTxnResponse(corr, 0)
                      }
                    case Some(_) =>
                      // stale epoch: a fenced zombie trying to commit
                      txnFenced += 1
                      KafkaWire.encodeEndTxnResponse(corr, 47)
                    case None =>
                      KafkaWire.encodeEndTxnResponse(corr, 48)
                  }
                }
              case None => null
            }
          case 1 =>
            KafkaWire.parseFetch(payload) match {
              case Some(req) =>
                val (hw, rs) = read(req.topic, req.partition, req.offset,
                  req.maxBytes)
                KafkaWire.encodeFetchResponse(req.correlationId, req.topic,
                  req.partition, hw, rs)
              case None => null
            }
          case 2 =>
            KafkaWire.parseListOffsets(payload) match {
              case Some((corr, topic, p, ts)) =>
                val l = logs.synchronized { logs.get((topic, p)) }
                // -1 latest = log end; -2 earliest = 0 (nothing expires)
                val off = if (ts == -2L) 0L
                          else l.map(x => x.synchronized(x.logEnd))
                            .getOrElse(0L)
                KafkaWire.encodeListOffsetsResponse(corr, topic, p, off)
              case None => null
            }
          case 3 =>
            KafkaWire.parseMetadata(payload) match {
              case Some((corr, wanted)) =>
                val all = logs.synchronized {
                  logs.keys.toSeq.groupBy(_._1)
                    .map { case (t, ks) => (t, ks.map(_._2).sorted) }
                    .toSeq.sortBy(_._1)
                }
                val topics = if (wanted.isEmpty) all
                             else all.filter(t => wanted.contains(t._1))
                KafkaWire.encodeMetadataResponse(corr, "127.0.0.1",
                  server.getLocalPort, topics)
              case None => null
            }
          case 11 =>
            KafkaWire.parseJoinGroup(payload) match {
              case Some((corr, g, member, meta, sessionTimeout)) =>
                var joinResp: Array[Byte] = null
                while (joinResp == null) {
                val st = groups.synchronized {
                  groups.getOrElseUpdate(g, new GroupState)
                }
                joinResp = st.synchronized {
                  if (st.dead) null // DeleteGroups won the race between our
                  // map fetch and this lock: the state is detached — loop
                  // and re-fetch (re-creating the group, as a join after a
                  // completed delete legitimately does)
                  else {
                  // a join after a stable round starts a REBALANCE:
                  // membership re-forms, the old assignments die, and
                  // prior members answer 27 on heartbeat until they
                  // rejoin (or 25 once the sweep evicts them)
                  if (st.roundComplete) {
                    st.assignments = null
                    st.prevMembers ++= st.members.keys
                    st.members.clear()
                    st.roundComplete = false
                  }
                  val id = if (member.nonEmpty) member
                    else { st.nextMemberN += 1; s"member-${st.nextMemberN}" }
                  st.members(id) = meta
                  st.prevMembers -= id
                  // a rejoining id is live again — groupSnapshot must
                  // not report it as both live and evicted
                  st.evicted -= id
                  st.lastSeen(id) = System.nanoTime()
                  st.timeoutMs(id) = sessionTimeout
                  // the completing joiner bumps the generation ONCE;
                  // prior members that never rejoined are OUT — their
                  // ids die with the old generation (heartbeats → 25)
                  if (!st.roundComplete &&
                    (st.expected < 0 || st.members.size >= st.expected)) {
                    st.roundComplete = true
                    st.generation += 1
                    st.evicted ++= st.prevMembers
                    st.prevMembers.clear()
                    st.notifyAll()
                  }
                  // barrier: wait for the round to fill (15 s guard)
                  val deadline = System.nanoTime() + 15000000000L
                  while (!st.roundComplete && System.nanoTime() < deadline)
                    st.wait(100)
                  if (!st.roundComplete)
                    KafkaWire.encodeJoinGroupResponse(corr, 27, -1, "",
                      id, Nil) // REBALANCE_IN_PROGRESS: round never filled
                  else {
                    val leader = st.members.head._1
                    KafkaWire.encodeJoinGroupResponse(corr, 0,
                      st.generation, leader, id,
                      if (id == leader) st.members.toSeq else Nil)
                  }
                  }
                }
                }
                joinResp
              case None => null
            }
          case 14 =>
            KafkaWire.parseSyncGroup(payload) match {
              case Some((corr, g, gen, member, as)) =>
                groups.synchronized { groups.get(g) } match {
                  case None =>
                    KafkaWire.encodeSyncGroupResponse(corr, 25,
                      Array.emptyByteArray) // UNKNOWN_MEMBER_ID
                  case Some(st) => st.synchronized {
                    if (gen != st.generation ||
                      !st.members.contains(member))
                      KafkaWire.encodeSyncGroupResponse(corr, 22,
                        Array.emptyByteArray) // ILLEGAL_GENERATION
                    else {
                      if (as.nonEmpty) {
                        st.assignments = as.toMap
                        st.notifyAll()
                      }
                      val deadline = System.nanoTime() + 15000000000L
                      while (st.assignments == null &&
                        System.nanoTime() < deadline)
                        st.wait(100)
                      if (st.assignments == null)
                        KafkaWire.encodeSyncGroupResponse(corr, 27,
                          Array.emptyByteArray)
                      else
                        KafkaWire.encodeSyncGroupResponse(corr, 0,
                          st.assignments.getOrElse(member,
                            Array.emptyByteArray))
                    }
                  }
                }
              case None => null
            }
          case 12 =>
            KafkaWire.parseHeartbeat(payload) match {
              case Some((corr, g, gen, member)) =>
                val stOpt = groups.synchronized { groups.get(g) }
                val err = stOpt match {
                  case None => 25            // UNKNOWN_MEMBER_ID
                  case Some(st) => st.synchronized {
                    st.sweep(System.nanoTime())
                    if (st.members.contains(member)) {
                      st.lastSeen(member) = System.nanoTime()
                      if (!st.roundComplete) 27 // REBALANCE_IN_PROGRESS
                      else if (gen != st.generation) 22 // ILLEGAL_GENERATION
                      else 0
                    } else if (!st.roundComplete &&
                      st.prevMembers.contains(member)) 27
                    else 25
                  }
                }
                KafkaWire.encodeHeartbeatResponse(corr, err)
              case None => null
            }
          case 13 =>
            KafkaWire.parseLeaveGroup(payload) match {
              case Some((corr, g, member)) =>
                val stOpt = groups.synchronized { groups.get(g) }
                val err = stOpt match {
                  case None => 25            // UNKNOWN_MEMBER_ID
                  case Some(st) => st.synchronized {
                    if (!st.members.contains(member)) 25
                    else {
                      // a clean leave re-forms the group NOW: the
                      // leaver's id dies, survivors must rejoin (27 on
                      // their next heartbeat), no session-timeout wait
                      st.members.remove(member)
                      st.lastSeen.remove(member)
                      st.timeoutMs.remove(member)
                      st.evicted += member
                      st.prevMembers ++= st.members.keys
                      st.members.clear()
                      st.assignments = null
                      st.roundComplete = false
                      0
                    }
                  }
                }
                KafkaWire.encodeLeaveGroupResponse(corr, err)
              case None => null
            }
          case 42 =>
            KafkaWire.parseDeleteGroups(payload) match {
              case Some((corr, gids)) =>
                val results = gids.map { g =>
                  // lock order groups → st (matching expectGroupMembers);
                  // the emptiness check and removal happen under both
                  // locks so a racing JoinGroup can't slip between them
                  val err = groups.synchronized {
                    groups.get(g) match {
                      case None => 69 // GROUP_ID_NOT_FOUND
                      case Some(st) => st.synchronized {
                        if (st.members.nonEmpty) 68 // NON_EMPTY_GROUP
                        else { st.dead = true; groups.remove(g); 0 }
                      }
                    }
                  }
                  // the group's committed offsets die with it
                  if (err == 0) groupOffsets.synchronized {
                    groupOffsets.keysIterator
                      .filter(_._1 == g).toVector
                      .foreach(groupOffsets.remove)
                  }
                  (g, err)
                }
                KafkaWire.encodeDeleteGroupsResponse(corr, results)
              case None => null
            }
          case 15 =>
            KafkaWire.parseDescribeGroups(payload) match {
              case Some((corr, gids)) =>
                val descs = gids.map { g =>
                  groups.synchronized { groups.get(g) } match {
                    case None =>
                      // real brokers answer Dead, not an error, for an
                      // unknown group id
                      KafkaWire.GroupDescription(0, g, "Dead", "", "",
                        Nil)
                    case Some(st) => st.synchronized {
                      st.sweep(System.nanoTime())
                      val state =
                        if (st.members.isEmpty && st.roundComplete)
                          "Empty"
                        else if (!st.roundComplete &&
                          st.members.isEmpty && st.prevMembers.isEmpty)
                          "Empty"
                        else if (!st.roundComplete)
                          "PreparingRebalance"
                        else "Stable"
                      val asn = Option(st.assignments)
                        .getOrElse(Map.empty[String, Array[Byte]])
                      val members = st.members.toSeq.sortBy(_._1)
                        .map { case (id, meta) =>
                          KafkaWire.GroupMember(id, "graft_consumer",
                            "/127.0.0.1", meta,
                            asn.getOrElse(id, Array.emptyByteArray))
                        }
                      KafkaWire.GroupDescription(0, g, state,
                        "consumer", if (state == "Stable") "range"
                        else "", members)
                    }
                  }
                }
                KafkaWire.encodeDescribeGroupsResponse(corr, descs)
              case None => null
            }
          case 16 =>
            KafkaWire.parseListGroups(payload) match {
              case Some(corr) =>
                val gs = groups.synchronized {
                  groups.keysIterator.toSeq.sorted
                    .map(g => (g, "consumer"))
                }
                KafkaWire.encodeListGroupsResponse(corr, gs)
              case None => null
            }
          case 10 =>
            KafkaWire.parseFindCoordinator(payload) match {
              case Some((corr, _)) =>
                // single-broker cluster: this node coordinates every
                // group
                KafkaWire.encodeFindCoordinatorResponse(corr, 0, 0,
                  "127.0.0.1", server.getLocalPort)
              case None => null
            }
          case 68 =>
            KafkaWire.parseConsumerGroupHeartbeat(payload) match {
              case Some((corr, g, member, epoch, instanceId, topics,
                  regexOpt, _)) =>
                // (the wire's owned-partitions report is parsed but the
                // ledger tracks grants: members adopt/release on the
                // response, synchronously, before their next planning)
                // KIP-848 regex subscriptions resolve BROKER-side,
                // re-evaluated against the live topic registry on every
                // heartbeat — a newly created matching topic flows into
                // the target assignment with no client resubscribe
                val regexCompiled = regexOpt.map { r =>
                  try Right(java.util.regex.Pattern.compile(r))
                  catch { case _: Exception => Left(r) }
                }
                val gr = groups848.synchronized {
                  groups848.getOrElseUpdate(g, new Group848)
                }
                gr.synchronized {
                  gr.sweep(System.nanoTime())
                  if (epoch == -1) {
                    // leave: membership shrinks, nobody else pauses
                    if (gr.members.remove(member).isDefined)
                      gr.epoch += 1
                    gr.lastSeenNs.remove(member)
                    gr.instanceIds.filterInPlace((_, id) => id != member)
                    KafkaWire.encodeConsumerGroupHeartbeatResponse(
                      corr, 0, member, -1, Nil)
                  } else {
                    // static membership: an empty member id with a
                    // KNOWN instance id resumes the OLD identity — no
                    // epoch bump, no rebalance for anyone
                    val staticBack = member.isEmpty &&
                      instanceId.exists(gr.instanceIds.contains)
                    val isNew = member.isEmpty && !staticBack
                    val id =
                      if (staticBack) gr.instanceIds(instanceId.get)
                      else if (isNew) {
                        gr.nextId += 1; s"m848-${gr.nextId}"
                      } else member
                    if (!isNew && !gr.members.contains(id))
                      KafkaWire.encodeConsumerGroupHeartbeatResponse(
                        corr, 25, id, gr.epoch, Nil) // UNKNOWN_MEMBER
                    else if (!isNew && !staticBack && epoch != 0 &&
                        gr.members.get(id).exists(_._1 != epoch))
                      // KIP-848 fencing: a known member reporting an
                      // epoch that is not the one this broker last
                      // handed it is FENCED_MEMBER_EPOCH (110) — the
                      // real broker fences stale heartbeats, not just
                      // stale commits. Epoch 0 with a retained id is
                      // the protocol's explicit re-join escape hatch
                      // (the fenced member falls back to epoch 0 and
                      // re-reconciles from scratch)
                      KafkaWire.encodeConsumerGroupHeartbeatResponse(
                        corr, 110, id, gr.epoch, Nil)
                    else if (regexCompiled.exists(_.isLeft))
                      // an uncompilable pattern is a malformed request
                      KafkaWire.encodeConsumerGroupHeartbeatResponse(
                        corr, 42, id, gr.epoch, Nil) // INVALID_REQUEST
                    else {
                      if (isNew) {
                        gr.members(id) = (gr.epoch, Set.empty)
                        gr.epoch += 1
                        instanceId.foreach(gr.instanceIds(_) = id)
                      }
                      gr.lastSeenNs(id) = System.nanoTime()
                      val re = regexCompiled.flatMap(_.toOption)
                      val parts = logs.synchronized {
                        logs.keysIterator
                          .filter(k => topics.contains(k._1) ||
                            re.exists(_.matcher(k._1).matches()))
                          .toSeq
                      }
                      gr.recomputeTarget(parts)
                      val myTarget =
                        gr.target.getOrElse(id, Set.empty)
                      // reconcile THIS member: it may own its target
                      // minus whatever other members still hold — the
                      // response both grants and (by omission) revokes
                      val heldByOthers = gr.members.iterator
                        .filter(_._1 != id)
                        .flatMap(_._2._2).toSet
                      val grant = myTarget -- heldByOthers
                      gr.members(id) = (gr.epoch, grant)
                      val byTopic = grant.groupBy(_._1).toSeq
                        .sortBy(_._1)
                        .map { case (t, ps) =>
                          (t, ps.map(_._2).toSeq.sorted)
                        }
                      KafkaWire.encodeConsumerGroupHeartbeatResponse(
                        corr, 0, id, gr.epoch, byTopic)
                    }
                  }
                }
              case None => null
            }
          case 8 =>
            KafkaWire.parseOffsetCommit(payload) match {
              case Some((corr, group, topic, offs)) =>
                // v0: no group identity beyond the name — ungated, the
                // simple-consumer path (q268's generations use it)
                val acks = groupOffsets.synchronized {
                  offs.map { case (p, off) =>
                    groupOffsets((group, topic, p)) = off
                    (p, 0)
                  }
                }
                KafkaWire.encodeOffsetCommitResponse(corr, topic, acks)
              case None => KafkaWire.parseOffsetCommitV1(payload) match {
                case Some((corr, group, gen, member, topic, offs)) =>
                  // v1: FENCED — an evicted member (25) or a stale
                  // generation (22) cannot overwrite committed offsets
                  // no sweep here: liveness is judged on the HEARTBEAT
                  // channel only (the real broker's timer), so a slow
                  // consume-and-commit cycle can never evict anyone
                  val stOpt = groups.synchronized { groups.get(group) }
                  val gr848 = if (stOpt.isDefined) None
                    else groups848.synchronized { groups848.get(group) }
                  val err = (stOpt, gr848) match {
                    case (Some(st), _) => st.synchronized {
                      if (!st.members.contains(member)) 25
                      else if (gen != st.generation) 22
                      else { st.lastSeen(member) = System.nanoTime(); 0 }
                    }
                    case (None, Some(gr)) => gr.synchronized {
                      // KIP-848 fencing: `generation` carries the
                      // member epoch; a stale epoch is STALE_MEMBER_
                      // EPOCH-shaped (22 here), an unknown member 25
                      gr.members.get(member) match {
                        case None => 25
                        case Some((ep, _)) => if (gen != ep) 22 else 0
                      }
                    }
                    case _ => 25
                  }
                  val acks =
                    if (err != 0) offs.map { case (p, _) => (p, err) }
                    else groupOffsets.synchronized {
                      offs.map { case (p, off) =>
                        groupOffsets((group, topic, p)) = off
                        (p, 0)
                      }
                    }
                  KafkaWire.encodeOffsetCommitResponse(corr, topic, acks)
                case None => null
              }
            }
          case 9 =>
            KafkaWire.parseOffsetFetch(payload) match {
              case Some((corr, group, topic, parts)) =>
                val rows = groupOffsets.synchronized {
                  parts.map(p =>
                    (p, groupOffsets.getOrElse((group, topic, p), -1L), 0))
                }
                KafkaWire.encodeOffsetFetchResponse(corr, topic, rows)
              case None => null
            }
          case _ => null
        }
        if (resp == null)
          throw new java.io.IOException(s"unsupported request api=$apiKey")
        out.write(resp)
        out.flush()
      }
    } catch {
      case _: Exception => /* connection closed / malformed: drop, like a
        broker closing on protocol error */
    } finally {
      conns.synchronized { conns -= sock }
      try sock.close() catch { case _: Exception => }
    }
  }
}

object KafkaMiniBroker {

  /** Client-side request/response exchange over an open socket pair:
    * write the size-prefixed request, read one size-prefixed response
    * payload. */
  def exchange(in: DataInputStream, out: DataOutputStream,
               request: Array[Byte]): Array[Byte] = {
    out.write(request); out.flush()
    val size = in.readInt()
    require(size >= 4 && size <= 64 * 1024 * 1024, s"bad response size $size")
    val payload = new Array[Byte](size)
    in.readFully(payload)
    payload
  }

  /** One producer/consumer connection to the broker. */
  def connect(port: Int): (Socket, DataInputStream, DataOutputStream) = {
    val sock = new Socket(InetAddress.getLoopbackAddress, port)
    sock.setTcpNoDelay(true)
    (sock, new DataInputStream(sock.getInputStream),
      new DataOutputStream(sock.getOutputStream))
  }

  /** Consumer-side page walk of one partition: absolute-offset records
    * in [from, until), lazily unfolded one Fetch page at a time (O(page)
    * memory); opens its own connection, closed when the range drains.
    * Range edges matter for the checkpointed source: a batch may span
    * the boundary, so records outside [from, until) are filtered, and
    * the walk stops at the first page reaching `until`. */
  def consumeRange(port: Int, topic: String, partition: Int,
                   from: Long, until: Long, maxBytes: Int = 4096)
      : Iterator[(Long, KafkaWire.Record)] =
    consumeRangeCloseable(port, topic, partition, from, until, maxBytes)._1

  /** [[consumeRange]] plus an idempotent early-close handle, for readers
    * that may terminate before the range drains (task kill, downstream
    * limit) and must not leak the broker connection. */
  def consumeRangeCloseable(port: Int, topic: String, partition: Int,
                            from: Long, until: Long, maxBytes: Int = 4096)
      : (Iterator[(Long, KafkaWire.Record)], () => Unit) = {
    if (until <= from) return (Iterator.empty, () => ())
    val (sock, in, out) = connect(port)
    val closeFn = () => try sock.close() catch { case _: Exception => }
    var corr = 0
    val it = Iterator.unfold(from) { off =>
      if (off >= until) { closeFn(); None }
      else {
        val (_, rs) = KafkaWire.decodeFetchResponse(exchange(in, out,
          KafkaWire.encodeFetch(corr, "graft_consumer", topic, partition,
            off, maxBytes)))
        corr += 1
        val batches = KafkaWire.decodeBatches(rs)
        require(batches.nonEmpty, s"stuck fetch at $off/$until")
        val recs = batches.flatMap { case (base, rr) =>
          rr.zipWithIndex.map { case (r, i) => (base + i, r) }
        }.filter { case (o, _) => o >= from && o < until }
        // Advance on decoded record counts; a stored batch whose records
        // fail CRC decodes to zero records, which would pin the offset —
        // fail fast rather than refetch the same page forever.
        val next = batches.map { case (b, rr) => b + rr.size }.max
        require(next > off, s"no offset progress at $off/$until " +
          "(undecodable batch in the log)")
        Some((recs, next))
      }
    }.flatten
    (it, closeFn)
  }

  /** Back-compat walk of [0, hw). */
  def consume(port: Int, topic: String, partition: Int, hw: Long,
              maxBytes: Int = 4096): Iterator[(Long, KafkaWire.Record)] =
    consumeRange(port, topic, partition, 0L, hw, maxBytes)

  /** Producer-task body: one connection, one Produce request per batch
    * group, every ack checked (acks=1) — shared by the live gates. */
  def produceAll(port: Int, clientId: String,
                 it: Iterator[Seq[KafkaWire.PartitionBatch]],
                 baseTs: Long = 1700000000000L): Unit = {
    if (!it.hasNext) return
    val (sock, in, out) = connect(port)
    try {
      var corr = 0
      it.foreach { pbs =>
        val acks = KafkaWire.decodeProduceResponse(exchange(in, out,
          KafkaWire.encodeProduce(corr, clientId, pbs, baseTs)))
        require(acks.nonEmpty && acks.forall(_._3 == 0),
          "produce not acked")
        corr += 1
      }
    } finally sock.close()
  }

  /** Transactional producer handshake over an open connection:
    * InitProducerId for the transactional.id → (producerId, epoch).
    * Re-initializing the same id fences any live producer holding it. */
  def initProducer(in: DataInputStream, out: DataOutputStream,
                   txnId: String): (Long, Int) = {
    val (err, pid, epoch) = KafkaWire.decodeInitProducerIdResponse(
      exchange(in, out, KafkaWire.encodeInitProducerId(0, "graft_txn",
        txnId)))
    require(err == 0, s"InitProducerId failed: error $err")
    (pid, epoch)
  }

  /** EndTxn round trip; returns the error code (0 ok, 47 fenced,
    * 48 invalid state = already committed / unknown). */
  def endTxn(in: DataInputStream, out: DataOutputStream, txnId: String,
             pid: Long, epoch: Int, commit: Boolean): Int =
    KafkaWire.decodeEndTxnResponse(exchange(in, out,
      KafkaWire.encodeEndTxn(1, "graft_txn", txnId, pid, epoch, commit)))

  /** The consumer's discovery round: Metadata for the partition map +
    * ListOffsets(latest) per partition, over one connection — what a
    * real client does before its first fetch. */
  def discoverEnds(port: Int, topics: Seq[String] = Nil)
      : Seq[(String, Int, Long)] = {
    val (sock, in, out) = connect(port)
    try {
      val meta = KafkaWire.decodeMetadataResponse(exchange(in, out,
        KafkaWire.encodeMetadata(0, "graft_consumer", topics)))
      meta.flatMap { case (t, parts) =>
        parts.map { p =>
          val off = KafkaWire.decodeListOffsetsResponse(exchange(in, out,
            KafkaWire.encodeListOffsets(1, "graft_consumer", t, p, -1L)))
          (t, p, off)
        }
      }
    } finally sock.close()
  }

  /** Consumer-group recovery round: FindCoordinator for the group, then
    * OffsetFetch — the exact first moves a restarted librdkafka
    * consumer makes. Returns (partition → committed offset); missing
    * partitions (nothing ever committed) come back -1. */
  def fetchCommitted(port: Int, group: String, topic: String,
                     parts: Seq[Int]): Map[Int, Long] = {
    val (sock, in, out) = connect(port)
    try {
      val (err, _, host, coordPort) = KafkaWire.decodeFindCoordinatorResponse(
        exchange(in, out,
          KafkaWire.encodeFindCoordinator(0, "graft_consumer", group)))
      require(err == 0, s"FindCoordinator error $err")
      // single-broker: the coordinator IS this connection's peer — a
      // multi-node client would re-connect to (host, coordPort) here
      require(host.nonEmpty && coordPort == port,
        s"unexpected coordinator $host:$coordPort")
      KafkaWire.decodeOffsetFetchResponse(exchange(in, out,
        KafkaWire.encodeOffsetFetch(1, "graft_consumer", group, topic,
          parts)))
        .map { case (p, off, e) =>
          require(e == 0, s"OffsetFetch error $e on partition $p"); p -> off
        }.toMap
    } finally sock.close()
  }

  /** One member's full membership round: JoinGroup (blocking until the
    * declared round fills), leader-side RANGE assignment over the
    * topic's partitions (contiguous chunks across sorted members —
    * the range assignor's semantics, computed CLIENT-side exactly as
    * Kafka's consumer does, the broker only relays bytes), SyncGroup.
    * Returns (memberId, generation, assigned partitions). */
  def groupAssign(port: Int, group: String, topic: String,
                  memberId: String = "", sessionTimeoutMs: Int = 30000)
      : (String, Int, Seq[Int]) = {
    val (me, gen, byTopic) = groupAssignTopics(port, group, Seq(topic),
      memberId, sessionTimeoutMs)
    (me, gen, byTopic.collectFirst { case (`topic`, ps) => ps }
      .getOrElse(Seq.empty))
  }

  /** Multi-topic membership round. The leader decodes every member's
    * ConsumerProtocolSubscription and range-assigns EACH topic over
    * the members subscribed to it (Kafka's RangeAssignor is per-topic:
    * n = parts/subscribers, the first parts%subscribers members take
    * one extra) — subscriptions in a group need not be identical.
    * Returns (memberId, generation, [(topic, partitions)]). */
  def groupAssignTopics(port: Int, group: String, topics: Seq[String],
                        memberId: String = "",
                        sessionTimeoutMs: Int = 30000)
      : (String, Int, Seq[(String, Seq[Int])]) = {
    val (sock, in, out) = connect(port)
    try {
      val (err, gen, leader, me, members) =
        KafkaWire.decodeJoinGroupResponse(exchange(in, out,
          KafkaWire.encodeJoinGroupTopics(0, "graft_consumer", group,
            memberId, topics, sessionTimeoutMs)))
      require(err == 0, s"JoinGroup error $err")
      val assignments: Seq[(String, Array[Byte])] =
        if (me == leader) {
          val subs = members.map { case (m, meta) =>
            (m, KafkaWire.decodeSubscription(meta).getOrElse(Seq.empty))
          }
          val allTopics = subs.flatMap(_._2).distinct.sorted
          val ends = discoverEnds(port, allTopics)
          val perMember = mutable.Map[String, Vector[(String, Seq[Int])]]()
            .withDefaultValue(Vector.empty)
          allTopics.foreach { t =>
            val parts = ends.collect { case (`t`, p, _) => p }.sorted
            val ms = subs.collect { case (m, ts) if ts.contains(t) => m }
              .sorted
            if (ms.nonEmpty) {
              val n = parts.size / ms.size
              val extra = parts.size % ms.size
              var at = 0
              ms.zipWithIndex.foreach { case (m, i) =>
                val take = n + (if (i < extra) 1 else 0)
                val slice = parts.slice(at, at + take)
                at += take
                if (slice.nonEmpty)
                  perMember(m) = perMember(m) :+ ((t, slice))
              }
            }
          }
          members.map { case (m, _) =>
            (m, KafkaWire.encodeAssignment(perMember(m)))
          }
        } else Nil
      val (serr, mine) = KafkaWire.decodeSyncGroupResponse(
        exchange(in, out, KafkaWire.encodeSyncGroup(1, "graft_consumer",
          group, gen, me, assignments)))
      require(serr == 0, s"SyncGroup error $serr")
      val byTopic = KafkaWire.decodeAssignmentAll(mine)
        .getOrElse(Seq.empty)
      (me, gen, byTopic)
    } finally sock.close()
  }

  /** One Heartbeat round trip; returns the coordinator's error code
    * (0 alive, 27 rebalance in progress → rejoin, 25 evicted, 22
    * stale generation). */
  def heartbeat(port: Int, group: String, generation: Int,
                memberId: String): Int = {
    val (sock, in, out) = connect(port)
    try KafkaWire.decodeHeartbeatResponse(exchange(in, out,
      KafkaWire.encodeHeartbeat(0, "graft_consumer", group, generation,
        memberId)))
    finally sock.close()
  }

  /** DeleteGroups round trip: per-group error codes (0 deleted, 68
    * non-empty, 69 unknown). */
  def deleteGroups(port: Int, groupIds: Seq[String])
      : Seq[(String, Int)] = {
    val (sock, in, out) = connect(port)
    try KafkaWire.decodeDeleteGroupsResponse(exchange(in, out,
      KafkaWire.encodeDeleteGroups(0, "graft_admin", groupIds)))
    finally sock.close()
  }

  /** SASL/PLAIN login on an open connection: SaslHandshake v1 then
    * SaslAuthenticate v0 with the RFC 4616 token. Returns the
    * authenticate error code (0 = in). */
  def authenticate(in: DataInputStream, out: DataOutputStream,
                   user: String, pass: String): Int = {
    val (herr, mechs) = KafkaWire.decodeSaslHandshakeResponse(
      exchange(in, out,
        KafkaWire.encodeSaslHandshake(0, "graft_consumer", "PLAIN")))
    require(herr == 0 && mechs.contains("PLAIN"),
      s"handshake refused: $herr $mechs")
    KafkaWire.decodeSaslAuthenticateResponse(exchange(in, out,
      KafkaWire.encodeSaslAuthenticate(1, "graft_consumer",
        KafkaWire.saslPlainToken(user, pass))))._1
  }

  /** SCRAM login on an open connection (RFC 5802/7677 over Kafka
    * SaslAuthenticate frames): handshake the mechanism, then the two
    * challenge-response round-trips. Returns 0 when BOTH directions
    * authenticated (the server's v= signature verified), the server's
    * error code on refusal, or -1 when the server-final signature is
    * wrong (a broker that doesn't hold ServerKey — MITM posture). */
  def authenticateScram(in: DataInputStream, out: DataOutputStream,
                        user: String, pass: String,
                        mechanism: String = "SCRAM-SHA-256"): Int = {
    val (herr, mechs) = KafkaWire.decodeSaslHandshakeResponse(
      exchange(in, out,
        KafkaWire.encodeSaslHandshake(0, "graft_consumer", mechanism)))
    require(herr == 0 && mechs.contains(mechanism),
      s"handshake refused: $herr $mechs")
    val cnonce = java.util.UUID.randomUUID().toString.replace("-", "")
    val cl = new Scram.Client(mechanism, user, pass, cnonce)
    val (e1, _, serverFirst) =
      KafkaWire.decodeSaslAuthenticateResponseFull(exchange(in, out,
        KafkaWire.encodeSaslAuthenticate(1, "graft_consumer",
          cl.firstMessage)))
    if (e1 != 0) return e1
    val (e2, _, serverFinal) =
      KafkaWire.decodeSaslAuthenticateResponseFull(exchange(in, out,
        KafkaWire.encodeSaslAuthenticate(2, "graft_consumer",
          cl.finalMessage(serverFirst))))
    if (e2 != 0) e2
    else if (cl.verifyServerFinal(serverFinal)) 0
    else -1
  }

  /** One KIP-848 heartbeat round trip: returns (error, memberId,
    * memberEpoch, assignment by topic). memberId "" joins; memberEpoch
    * −1 leaves. */
  def heartbeat848(port: Int, group: String, memberId: String,
                   memberEpoch: Int, topics: Seq[String],
                   owned: Seq[(String, Seq[Int])],
                   instanceId: Option[String] = None,
                   topicRegex: Option[String] = None)
      : (Int, String, Int, Seq[(String, Seq[Int])]) = {
    val (sock, in, out) = connect(port)
    try {
      val (err, id, ep, wire) =
        KafkaWire.decodeConsumerGroupHeartbeatResponse(exchange(in, out,
          KafkaWire.encodeConsumerGroupHeartbeat(0, "graft_848", group,
            memberId, memberEpoch, topics, owned, instanceId,
            topicRegex)))
      // regex grants can name topics the client never listed — resolve
      // their UUIDs from a Metadata round, the real client's topic-id
      // resolution path
      val known =
        if (topicRegex.isEmpty) topics
        else topics ++ KafkaWire.decodeMetadataResponse(exchange(in, out,
          KafkaWire.encodeMetadata(1, "graft_848", Nil))).map(_._1)
      val uuidOf = known.distinct
        .map(t => KafkaWire.topicUuid(t) -> t).toMap
      (err, id, ep, wire.flatMap { case (hi, lo, ps) =>
        uuidOf.get((hi, lo)).map(t => (t, ps))
      })
    } finally sock.close()
  }

  /** DescribeGroups round trip: coordinator state + full membership
    * with subscription metadata and assignment bytes per member. */
  def describeGroups(port: Int, groupIds: Seq[String])
      : Seq[KafkaWire.GroupDescription] = {
    val (sock, in, out) = connect(port)
    try KafkaWire.decodeDescribeGroupsResponse(exchange(in, out,
      KafkaWire.encodeDescribeGroups(0, "graft_admin", groupIds)))
    finally sock.close()
  }

  /** ListGroups round trip: every group id the coordinator holds. */
  def listGroups(port: Int): Seq[(String, String)] = {
    val (sock, in, out) = connect(port)
    try KafkaWire.decodeListGroupsResponse(exchange(in, out,
      KafkaWire.encodeListGroups(0, "graft_admin")))._2
    finally sock.close()
  }

  /** One LeaveGroup round trip (the graceful consumer-close path);
    * returns the coordinator's error code (0 left, 25 unknown). */
  def leaveGroup(port: Int, group: String, memberId: String): Int = {
    val (sock, in, out) = connect(port)
    try KafkaWire.decodeLeaveGroupResponse(exchange(in, out,
      KafkaWire.encodeLeaveGroup(0, "graft_consumer", group, memberId)))
    finally sock.close()
  }

  /** Generation-fenced OffsetCommit v1; returns per-partition error
    * codes so gates can observe a REJECTED commit (22/25) instead of
    * requiring success. */
  def commitOffsetsFenced(port: Int, group: String, generation: Int,
                          memberId: String, topic: String,
                          offsets: Seq[(Int, Long)]): Seq[(Int, Int)] = {
    val (sock, in, out) = connect(port)
    try KafkaWire.decodeOffsetCommitResponse(exchange(in, out,
      KafkaWire.encodeOffsetCommitV1(0, "graft_consumer", group,
        generation, memberId, topic, offsets)))
    finally sock.close()
  }

  /** Commit each partition's NEXT offset to read (the Kafka convention:
    * committed offset = last processed + 1) under the group. */
  def commitOffsets(port: Int, group: String, topic: String,
                    offsets: Seq[(Int, Long)]): Unit = {
    val (sock, in, out) = connect(port)
    try {
      val acks = KafkaWire.decodeOffsetCommitResponse(exchange(in, out,
        KafkaWire.encodeOffsetCommit(0, "graft_consumer", group, topic,
          offsets)))
      require(acks.size == offsets.size && acks.forall(_._2 == 0),
        s"OffsetCommit rejected: $acks")
    } finally sock.close()
  }
}
