import graft.operators.GoldenReplay
import graft.sources.{NetFlowV9, Pcap}
import java.nio.ByteBuffer
import scala.collection.mutable
object DumpIes {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val sf = Pcap.read(bytes)
    val caches = mutable.Map[(String, Long), NetFlowV9.TemplateCache]()
    val keys = mutable.Map[String, Int]()
    var n = 0
    sf.packets.foreach { p =>
      GoldenReplay.udpPayload(p.data) match {
        case Some((src, dport, pay)) if GoldenReplay.CollectorPorts(dport) && pay.length >= 20 =>
          val ver = ((pay(0) & 0xff) << 8) | (pay(1) & 0xff)
          if (ver == 9 || ver == 10) {
            val buf = ByteBuffer.wrap(pay)
            val domain = if (ver == 9) buf.getInt(16) & 0xffffffffL else buf.getInt(12) & 0xffffffffL
            val cache = caches.getOrElseUpdate((src, domain), new NetFlowV9.TemplateCache)
            cache.observeX(pay).foreach { r =>
              n += 1
              if (n <= 3) println("REC " + r.toSeq.sortBy(_._1.toString).map { case (k, v) => s"$k=${v.toString.take(30)}" }.mkString(" "))
              r.keysIterator.foreach(k => keys(k.toString) = keys.getOrElse(k.toString, 0) + 1)
            }
          }
        case _ => ()
      }
    }
    println("IE-HIST " + keys.toSeq.sortBy(_._1).map { case (k, c) => s"$k:$c" }.mkString(" "))
    println(s"records=$n udp-srcs=${caches.keys.map(_._1).toSet}")
  }
}
