package graft.sinks

import java.io.{BufferedInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.mutable

/** In-process Redis server speaking the RESP subset the reference's
  * health keyspace uses (redis_common.c: SETEX heartbeats + PING) — the
  * sandbox stand-in for the env-blocked real Redis, mirroring
  * [[KafkaMiniBroker]]'s role for test 900. Restartable on the same
  * port with the keyspace retained, so the connection-loss replay
  * (q250, reference test 901) can drive the down/up cycle the golden
  * logs describe.
  */
final class RespMiniServer {

  /** key -> (last value, SETEX count) — the health keyspace plus the
    * refresh counter the replay reconciles. */
  val keyspace = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Long)]()

  private var server: ServerSocket = _
  @volatile private var running = false
  /** Protocol-level down-ness: the listener stays bound (rebinding a
    * freed ephemeral port races the kernel's port allocator under
    * load); while down, new connections reset on accept and live ones
    * are severed — what a dead redis-server looks like to a client. */
  @volatile private var down = false
  private val conns = mutable.Set[Socket]()

  /** Bind on first call; later calls (after [[stop]]) lift the down
    * flag with the keyspace retained. */
  def start(port: Int = 0): Int = synchronized {
    if (server != null && !server.isClosed) { down = false; return server.getLocalPort }
    server = new ServerSocket()
    server.setReuseAddress(true)
    server.bind(new java.net.InetSocketAddress(
      InetAddress.getLoopbackAddress, port), 16)
    running = true
    down = false
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          if (down) sock.close()
          else {
            val t = new Thread(() => serve(sock), "resp-mini-conn")
            t.setDaemon(true); t.start()
          }
        } catch { case _: Exception => /* closed */ }
      }
    }, "resp-mini-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  /** The server "process" goes away: sever live connections — a held
    * client connection must see EOF/reset on its next heartbeat, not a
    * half-served reply. */
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

  /** Snapshot (key, lastValue, nSetex) sorted by key. */
  def snapshot: Seq[(String, String, Long)] = {
    import scala.jdk.CollectionConverters._
    keyspace.asScala.toSeq.map { case (k, (v, n)) => (k, v, n) }
      .sortBy(_._1)
  }

  private def serve(sock: Socket): Unit = {
    conns.synchronized { conns += sock }
    try {
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      def line(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\r') { sb.append(c.toChar); c = in.read() }
        if (c == -1) throw new java.io.EOFException
        in.read()                            // the \n
        sb.toString
      }
      while (running && !down) {
        val head = line()
        if (head.isEmpty || head.charAt(0) != '*')
          throw new java.io.IOException(s"bad RESP head: $head")
        val n = head.drop(1).toInt
        val args = (0 until n).map { _ =>
          val bulk = line()
          require(bulk.startsWith("$"), s"bad bulk: $bulk")
          val len = bulk.drop(1).toInt
          val bytes = new Array[Byte](len)
          var got = 0
          while (got < len) {
            val r = in.read(bytes, got, len - got)
            if (r < 0) throw new java.io.EOFException
            got += r
          }
          in.read(); in.read()               // trailing \r\n
          new String(bytes, "UTF-8")
        }
        val reply: String = args.map(_.toUpperCase).headOption match {
          case Some("PING") => "+PONG\r\n"
          case Some("SETEX") if args.size == 4 =>
            keyspace.compute(args(1), (_, prev) =>
              (args(3), (if (prev == null) 0L else prev._2) + 1))
            "+OK\r\n"
          case Some("GET") if args.size == 2 =>
            Option(keyspace.get(args(1))) match {
              case Some((v, _)) =>
                val b = v.getBytes("UTF-8")
                s"$$${b.length}\r\n$v\r\n"
              case None => "$-1\r\n"
            }
          case _ => "-ERR unknown command\r\n"
        }
        out.write(reply.getBytes("UTF-8"))
        out.flush()
      }
    } catch {
      case _: Exception => /* closed / malformed: drop the connection */
    } finally {
      conns.synchronized { conns -= sock }
      try sock.close() catch { case _: Exception => }
    }
  }
}

object RespMiniServer {

  /** One client connection; send a command, read one reply line (the
    * health path only uses simple-string/error replies). */
  final class Conn(port: Int) {
    val sock = new Socket(InetAddress.getLoopbackAddress, port)
    sock.setTcpNoDelay(true)
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out = new DataOutputStream(sock.getOutputStream)

    /** Send one command, require an +OK/+PONG class reply; any IO
      * failure or -ERR surfaces as an exception (the caller's WARN
      * lane). */
    def call(args: Seq[String]): String = {
      out.write(Resp.command(args)); out.flush()
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\r') { sb.append(c.toChar); c = in.read() }
      if (c == -1) throw new java.io.EOFException("server gone")
      in.read()
      val reply = sb.toString
      if (reply.startsWith("-"))
        throw new java.io.IOException(s"server error: $reply")
      reply
    }

    def close(): Unit = try sock.close() catch { case _: Exception => }
  }
}
