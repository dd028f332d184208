package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import org.scalatest.funsuite.AnyFunSuite

/** Batch planning of the live UDP source: one socket, many workers
  * (the reference's collector model, `src/nfacctd.c:1525`,
  * `docs/INTERNALS:86-190`). A multi-datagram batch must fan out across
  * multiple InputPartitions — keyed by exporter so template state stays
  * co-located — and a post-restart offset outside the driver buffer must
  * fail fast instead of silently serving an empty slice. */
class UdpPartitionSpec extends AnyFunSuite {

  private def sendFrom(socks: Seq[DatagramSocket], port: Int,
                       perSock: Int): Unit = {
    val addr = InetAddress.getLoopbackAddress
    for (s <- socks; i <- 0 until perSock) {
      val d = Array.fill[Byte](8 + i)(i.toByte)
      s.send(new DatagramPacket(d, d.length, addr, port))
    }
  }

  private def awaitCount(st: UdpMicroBatchStream, n: Long): Unit = {
    val deadline = System.currentTimeMillis() + 15000
    while (st.latestOffset().asInstanceOf[UdpOffset].count < n &&
           System.currentTimeMillis() < deadline) Thread.sleep(20)
  }

  test("multi-datagram batch plans >1 partition, exporters co-located") {
    val st = new UdpMicroBatchStream(0, 1 << 16, numPartitions = 4)
    try {
      val port = st.boundPort
      assert(UdpDatagramSource.awaitBound(port))
      // 6 distinct exporters (distinct source sockets), 5 datagrams each
      val socks = Seq.fill(6)(new DatagramSocket())
      sendFrom(socks, port, 5)
      socks.foreach(_.close())
      awaitCount(st, 30)
      val end = st.latestOffset()
      assert(end.asInstanceOf[UdpOffset].count == 30)
      val parts = st.planInputPartitions(UdpOffset(0), end)
        .map(_.asInstanceOf[UdpPartition])
      assert(parts.length > 1, "batch must fan out across partitions")
      assert(parts.map(_.rows.length).sum == 30)
      // each exporter's datagrams land in exactly one partition
      val homes = parts.zipWithIndex.flatMap { case (p, i) =>
        p.rows.map(_._1 -> i)
      }.groupBy(_._1).values
      assert(homes.forall(_.map(_._2).distinct.length == 1))
    } finally st.stop()
  }

  test("offset outside the driver buffer fails fast (not recoverable)") {
    val st = new UdpMicroBatchStream(0, 1 << 16, numPartitions = 4)
    try {
      // a checkpoint from a previous incarnation would resume past the
      // fresh stream's empty buffer — that must throw, not return []
      intercept[IllegalStateException] {
        st.planInputPartitions(UdpOffset(10), UdpOffset(20))
      }
      // and the empty [0,0) slice of a fresh stream is legitimately empty
      assert(st.planInputPartitions(UdpOffset(0), UdpOffset(0)).isEmpty)
    } finally st.stop()
  }
}
