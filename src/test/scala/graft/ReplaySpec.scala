package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Replay/savefile source (SURVEY §2.1 `pcap_savefile_replay` /
  * `pcap_savefile_delay`, CONFIG-KEYS:484-524): the engine's replay knob
  * is the file stream source's `maxFilesPerTrigger` — each trigger
  * ingests a bounded slice of the recorded data, giving pmacct's
  * paced-replay semantics under Structured Streaming. */
class ReplaySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("paced replay: maxFilesPerTrigger bounds each micro-batch") {
    val dir = Files.createTempDirectory("graft_replay").toString
    // three "capture files" of known sizes
    Seq(3, 5, 7).zipWithIndex.foreach { case (n, i) =>
      (0 until n).map(j => (i.toLong, j.toLong)).toDF("f", "v")
        .coalesce(1).write.parquet(s"$dir/part_$i")
    }
    val schema = spark.read.parquet(s"$dir/part_0").schema
    val batchSizes = scala.collection.mutable.Buffer[Long]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part_*")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = b.count()
        if (c > 0) batchSizes.synchronized { batchSizes += c }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // each replayed batch carried exactly one capture file
    assert(batchSizes.sorted == Seq(3L, 5L, 7L))
  }

  test("pcap savefile ingests end-to-end via binaryFile scan") {
    import graft.sources.Pcap
    val dir = Files.createTempDirectory("graft_pcap").toString
    val tuples = (1 to 25).map(i => Pcap.FlowTuple(
      0x0A000000L + i, 0x0B000000L + i, if (i % 3 == 0) 17 else 6,
      1024 + i, 80, 100L + i, 1710000000000000L + i * 1000L))
    // two capture files on disk, exactly what a recorder would leave
    Files.write(java.nio.file.Paths.get(s"$dir/cap0.pcap"),
      Pcap.write(tuples.take(10).map(Pcap.frame)))
    Files.write(java.nio.file.Paths.get(s"$dir/cap1.pcap"),
      Pcap.write(tuples.drop(10).map(Pcap.frame)))
    val decoded = spark.read.format("binaryFile")
      .load(s"$dir/*.pcap")
      .select("content").as[Array[Byte]]
      .mapPartitions(_.flatMap { bytes =>
        val sf = Pcap.read(bytes)
        sf.packets.flatMap(p => Pcap.parse(p, sf.linkType))
      })
    val got = decoded.collect()
    assert(got.length == 25)
    assert(got.map(_.ipLen).sum == tuples.map(_.ipLen).sum)
    assert(got.count(_.proto == 17) == tuples.count(_.proto == 17))
    assert(got.map(_.portSrc).toSet == tuples.map(_.portSrc).toSet)
  }

  test("live UDP source: NetFlow v9 datagrams arrive through the stream") {
    import graft.sources.{NetFlowV9, UdpDatagramSource}
    import NetFlowV9.IE
    // pick a free port, then hand it to the source
    val probe = new java.net.DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val name = "udp_sink_test"
    val q = spark.readStream
      .format("graft.sources.UdpDatagramSource")
      .option("port", port.toString).load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      assert(UdpDatagramSource.awaitBound(port), "listener never bound")
      val t = NetFlowV9.Template(500,
        Seq(IE.Protocol -> 1, IE.InBytes -> 4))
      val h = NetFlowV9.V9Header(0L, 0L, 0L, 42L)
      val recs = (1 to 30).map(i =>
        Map(IE.Protocol -> 6L, IE.InBytes -> i.toLong))
      val dgs = Seq(NetFlowV9.encodeTemplate(h, t)) ++
        recs.grouped(10).map(b => NetFlowV9.encodeData(h, t, b))
      val sock = new java.net.DatagramSocket()
      val addr = java.net.InetAddress.getLoopbackAddress
      dgs.foreach { d =>
        sock.send(new java.net.DatagramPacket(d, d.length, addr, port))
        Thread.sleep(5)
      }
      sock.close()
      val deadline = System.currentTimeMillis() + 30000
      def landed() = spark.table(name).count()
      while (landed() < dgs.size && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(landed() == dgs.size)
      val rows = spark.table(name)
        .select("exporter", "payload").collect()
      assert(rows.forall(_.getString(0).startsWith(
        addr.getHostAddress + ":")))
      // template cache absorbs any arrival interleaving (buffering), so
      // decoding the landed payloads recovers every record exactly once
      val cache = new NetFlowV9.TemplateCache
      val decoded = rows.flatMap(r =>
        cache.observe(r.getAs[Array[Byte]]("payload")))
      assert(decoded.length == 30)
      assert(decoded.map(_(IE.InBytes)).sum == (1 to 30).sum)
    } finally q.stop()
  }

  test("streaming template state survives micro-batches (nfacctd shape)") {
    import graft.sources.NetFlowV9
    import graft.streaming.NetFlowStream
    import NetFlowV9.IE
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = NetFlowV9.Template(510, Seq(IE.Protocol -> 1, IE.InBytes -> 4))
    val h = NetFlowV9.V9Header(0L, 0L, 0L, 9L)
    def data(vals: Seq[Long]) = NetFlowV9.encodeData(h, t,
      vals.map(v => Map(IE.Protocol -> 6L, IE.InBytes -> v)))
    val mem = MemoryStream[NetFlowStream.Datagram](spark)
    val q = NetFlowStream.decode(mem.toDS())
      .writeStream.format("memory").queryName("nf_stream")
      .outputMode("append").start()
    try {
      // batch 1: template + first data
      mem.addData(
        NetFlowStream.Datagram("ex1", NetFlowV9.encodeTemplate(h, t)),
        NetFlowStream.Datagram("ex1", data(Seq(10L, 20L))))
      q.processAllAvailable()
      // batch 2: DATA ONLY — decodes because the template persisted in
      // the state store across micro-batches
      mem.addData(NetFlowStream.Datagram("ex1", data(Seq(30L, 40L))))
      q.processAllAvailable()
      val vals = spark.table("nf_stream")
        .selectExpr(s"fields[${IE.InBytes}] as b")
        .as[Long].collect().sorted.toSeq
      assert(vals == Seq(10L, 20L, 30L, 40L))
    } finally q.stop()
  }

  test("transformWithState template decode matches (RocksDB state)") {
    import graft.sources.NetFlowV9
    import graft.streaming.NetFlowStream
    import NetFlowV9.IE
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val t = NetFlowV9.Template(511,
        Seq(IE.Protocol -> 1, IE.InBytes -> 4))
      val h = NetFlowV9.V9Header(0L, 0L, 0L, 9L)
      def data(vals: Seq[Long]) = NetFlowV9.encodeData(h, t,
        vals.map(v => Map(IE.Protocol -> 17L, IE.InBytes -> v)))
      val mem = MemoryStream[NetFlowStream.Datagram](spark)
      val q = NetFlowStream.decodeTws(mem.toDS())
        .writeStream.format("memory").queryName("nf_tws")
        .outputMode("append").start()
      try {
        mem.addData(
          NetFlowStream.Datagram("ex2", NetFlowV9.encodeTemplate(h, t)),
          NetFlowStream.Datagram("ex2", data(Seq(5L))))
        q.processAllAvailable()
        mem.addData(NetFlowStream.Datagram("ex2", data(Seq(6L, 7L))))
        q.processAllAvailable()
        val vals = spark.table("nf_tws")
          .selectExpr(s"fields[${IE.InBytes}] as b")
          .as[Long].collect().sorted.toSeq
        assert(vals == Seq(5L, 6L, 7L))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("pcap reader handles little-endian and nanosecond magics") {
    import graft.sources.Pcap
    val pkt = Pcap.frame(Pcap.FlowTuple(1L, 2L, 6, 1, 2, 40L, 5000001L))
    val be = Pcap.write(Seq(pkt))
    // flip to little-endian by rewriting header+record words
    val buf = java.nio.ByteBuffer.wrap(be)
    val le = java.nio.ByteBuffer.allocate(be.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    le.putInt(buf.getInt(0)) // magic, now byte-swapped on disk
    le.putShort(2).putShort(4).putInt(0).putInt(0)
    le.putInt(65535).putInt(Pcap.LinkEthernet)
    le.putInt(buf.getInt(24)).putInt(buf.getInt(28))
    le.putInt(buf.getInt(32)).putInt(buf.getInt(36))
    le.put(pkt.data)
    assert(Pcap.read(le.array()).packets == Seq(pkt))
    // nanosecond magic: fractional part is ns, floored to µs
    val ns = Pcap.write(Seq(pkt))
    val nsBuf = java.nio.ByteBuffer.wrap(ns)
    nsBuf.putInt(0, Pcap.MagicNanos.toInt)
    nsBuf.putInt(28, 1999) // 1999 ns -> 1 µs
    val got = Pcap.read(ns).packets.head
    assert(got.tsUs == 5000001L)
  }
}
